"""Text normalization as a zero-copy Arrow stage — the hygiene pass run
before shingling/dedup/tokenization so that case and punctuation noise
doesn't split otherwise-identical documents.

Chain (in order, all RE2 via ``pyarrow.compute`` — no pandas, no Python
per row): lower-case → strip non-alphanumerics to spaces → collapse
whitespace runs → trim.  DuckDB's ``lower`` + ``regexp_replace(...,
'g')`` run the same utf8proc/RE2 machinery, so the oracle SQL nests the
identical steps and the outputs match byte-for-byte
(query/relational.py::TEXT_NORMALIZE_SQL) — the same parity discipline
as stages/pii.py.

No counterpart in the reference repo (its corpus is pre-cleaned); part
of the training-data curation suite (SURVEY.md §2.9 extension).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (RE2 pattern, replacement) — applied in order AFTER lower-casing
NORMALIZE_PATTERNS: list[tuple[str, str]] = [
    (r"[^a-z0-9]+", " "),  # punctuation/symbol runs become one space
    (r"^ +| +$", ""),      # trim
]


def normalize_strings(arr):
    """Lower-case + pattern chain over one Arrow string (chunked) array."""
    arr = pc.utf8_lower(arr)
    for pattern, repl in NORMALIZE_PATTERNS:
        arr = pc.replace_substring_regex(arr, pattern=pattern, replacement=repl)
    return arr


def normalize_columns_kernel(columns: list[str]):
    """``map_batches(batch_format="pyarrow")`` kernel normalizing the
    named string columns in place; other columns pass through."""

    def kernel(t: pa.Table) -> pa.Table:
        for c in columns:
            idx = t.schema.get_field_index(c)
            t = t.set_column(idx, c, normalize_strings(t.column(c)))
        return t

    return kernel


def sql_normalize_expr(col: str) -> str:
    """The DuckDB expression equivalent to ``normalize_strings`` —
    identical steps in identical order, for oracle parity."""
    expr = f"lower({col})"
    for pattern, repl in NORMALIZE_PATTERNS:
        pat_sql = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    return expr
