"""Prompt-template surface (reference: prompt_engineering.py:5-56 QA
template + system role, text_graph_builder.py:30-54 extraction schema
prompt).

A declared extension point of the reference: users override the templates
while the pipeline keeps the same contract — the extractor expects a JSON
triple list back (possibly fenced; the engine strips fences), the QA
prompt expects {graph_context}/{question} slots.  Kept as data + tiny
helpers so both the actor-pool LLM stage and offline tooling can render
them without importing Ray.
"""

from __future__ import annotations

# QA prompt (prompt_engineering.py:5-20): graph context + user question.
QA_PROMPT_TEMPLATE = """基于以下知识图谱信息，回答用户问题：

知识图谱信息：
{graph_context}

用户问题：{question}

请生成准确、专业的回答，并注明信息来源。
回答格式：
• 直接答案

• 依据：[相关三元组]
"""

# System role (prompt_engineering.py:46-56).
DEFAULT_SYSTEM_PROMPT = (
    "你是保险与医养知识图谱问答助手，请根据提供的知识图谱信息准确、专业地回答问题。"
)

# Schema-constrained extraction prompt (text_graph_builder.py:30-54): the
# entity/relation inventory IS the extraction schema; output contract is a
# bare JSON list of {head, type, relation, tail, tail_type} objects.
EXTRACTION_PROMPT_TEMPLATE = """你是一个知识图谱构建专家。请从下面的【保险条款文本】中提取实体和关系，并以严格的 JSON 列表格式输出。

【目标实体类型】:
- Insurance (保险产品)
- Disease (疾病)
- AgeRange (年龄范围)
- Exclusion (除外责任/拒保情形)

【目标关系类型】:
- COVERS (覆盖/保障)
- EXCLUDES (不保/除外)
- ALLOWS_AGE (投保年龄)
- REFUSES_DISEASE (拒保疾病)

【保险条款文本】:
{text}

【输出要求】:
1. 仅输出 JSON 列表，不要包含 Markdown 标记（如 ```json）。
2. 格式示例:
[
    {{"head": "产品名", "type": "Insurance", "relation": "COVERS", "tail": "疾病名", "tail_type": "Disease"}},
    {{"head": "产品名", "type": "Insurance", "relation": "ALLOWS_AGE", "tail": "0-65周岁", "tail_type": "AgeRange"}}
]
"""


def build_qa_prompt(graph_context: str, question: str,
                    template: str | None = None, **kwargs: str) -> str:
    """RAG QA prompt assembly (prompt_engineering.py:23-43)."""
    return (template or QA_PROMPT_TEMPLATE).format(
        graph_context=graph_context, question=question, **kwargs
    )


def get_system_prompt(role: str | None = None) -> str:
    return role if role else DEFAULT_SYSTEM_PROMPT


def build_extraction_prompt(text: str, template: str | None = None) -> str:
    """Extraction prompt for the LLM triple extractor variant."""
    return (template or EXTRACTION_PROMPT_TEMPLATE).format(text=text)
