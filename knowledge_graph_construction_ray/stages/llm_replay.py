"""Recorded-response LLM client — the offline stand-in for the reference's
OpenAI-compatible endpoint (llm_integration.py:28-68).

A recording is a JSON object {prompt_key: response_text} captured once
against a real endpoint; ``ReplayLLMClient`` replays it deterministically
so the A1 client lifecycle + A2 extraction path get a CORRECTNESS-style
regression test without network.  Keys are content hashes of the rendered
prompt, so any drift in prompt templates or span text invalidates the
recording LOUDLY (strict mode raises) instead of silently returning the
wrong completion.
"""

from __future__ import annotations

import hashlib
import json


def prompt_key(prompt: str) -> str:
    """Stable content key for a rendered prompt (whitespace-trimmed)."""
    return hashlib.sha256(prompt.strip().encode("utf-8")).hexdigest()[:24]


class ReplayLLMClient:
    """``.generate(prompt) -> str`` backed by recorded responses."""

    def __init__(self, recordings: dict[str, str], *, strict: bool = True):
        self.recordings = dict(recordings)
        self.strict = strict

    @classmethod
    def from_json(cls, path: str, *, strict: bool = True) -> "ReplayLLMClient":
        with open(path, "r", encoding="utf-8") as f:
            return cls(json.load(f), strict=strict)

    def generate(self, prompt: str, **_kwargs) -> str:
        key = prompt_key(prompt)
        if key in self.recordings:
            return self.recordings[key]
        if self.strict:
            raise KeyError(
                f"no recorded response for prompt key {key} "
                f"(prompt head: {prompt.strip()[:80]!r})"
            )
        return "[]"  # lenient mode: the extractor's empty-result fallback


def save_recordings(path: str, prompt_response_pairs: "list[tuple[str, str]]") -> None:
    """Capture helper: [(rendered_prompt, response)] → recording file."""
    rec = {prompt_key(p): r for p, r in prompt_response_pairs}
    with open(path, "w", encoding="utf-8") as f:
        json.dump(rec, f, ensure_ascii=False, indent=1)
