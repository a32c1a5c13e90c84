"""OpenAI-compatible LLM client, env-configured (A1 live arm).

The reference builds a lazily-initialized OpenAI-compatible client per
process from endpoint configuration (IMK/src/kg_construction/
llm_integration.py:28-50).  This module is the engine's live arm of that
contract: :func:`env_client_factory` reads

    KG_LLM_BASE_URL   e.g. "http://localhost:8000/v1" (required to enable)
    KG_LLM_MODEL      model name sent in the request body (required)
    KG_LLM_API_KEY    bearer token (optional; many local servers ignore it)
    KG_LLM_TIMEOUT_S  per-request timeout, default 60

and returns a zero-argument factory suitable for
``LLMTripleExtractor(client_factory=...)`` — or ``None`` when no endpoint
is configured, in which case callers fall back to the recorded-response
``ReplayLLMClient`` (stages/llm_replay.py), the CI arm.

The transport is stdlib ``urllib`` (this container has no HTTP client
deps and no network; the class is exercised in tests through a
monkeypatched ``urlopen``).  One client per ACTOR (built in ``__init__``
of the map_batches class), one POST per prompt — rate limiting and
retries belong to the serving side, matching the reference.
"""

from __future__ import annotations

import json
import os
import urllib.request


class OpenAICompatClient:
    """``.generate(prompt) -> str`` over an OpenAI-compatible
    ``/chat/completions`` endpoint."""

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str = "",
        timeout_s: float = 60.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.timeout_s = timeout_s

    def generate(self, prompt: str, **_kwargs) -> str:
        body = json.dumps(
            {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "temperature": 0,
            }
        ).encode("utf-8")
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            f"{self.base_url}/chat/completions", data=body, headers=headers
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            payload = json.load(resp)
        return payload["choices"][0]["message"]["content"]


def env_client_factory(env=None):
    """Factory-of-factories from environment config; ``None`` when no
    endpoint is configured (callers then use the replay arm or raise)."""
    env = os.environ if env is None else env
    base_url = env.get("KG_LLM_BASE_URL")
    if not base_url:
        return None
    model = env.get("KG_LLM_MODEL")
    if not model:
        raise ValueError("KG_LLM_BASE_URL is set but KG_LLM_MODEL is not")
    api_key = env.get("KG_LLM_API_KEY", "")
    timeout_s = float(env.get("KG_LLM_TIMEOUT_S", "60"))

    def factory() -> OpenAICompatClient:
        return OpenAICompatClient(base_url, model, api_key, timeout_s)

    return factory
