"""PII scrubbing as a zero-copy Arrow stage.

Large-scale training corpora are scrubbed before anything else touches
them: e-mail addresses, phone-shaped digit runs and residual digits are
masked in place.  The kernel is a chain of ``pyarrow.compute.
replace_substring_regex`` calls over Arrow string columns — RE2, no
pandas conversion, no Python per row — so the stage streams at block
granularity like every other ``map_batches`` transform.

Pattern notes (RE2-safe — no lookahead/lookbehind):
- patterns apply IN ORDER; the broad digit mask runs last so it only
  touches digits not already folded into ``[EMAIL]`` / ``[PHONE]``;
- DuckDB's ``regexp_replace(..., 'g')`` is the same RE2 engine, so the
  oracle SQL nests the identical patterns in the identical order and the
  outputs match byte-for-byte (query/relational.py::PII_SCRUB_SQL).

No counterpart in the reference repo (its corpus is pre-cleaned); this is
part of the training-data curation suite (SURVEY.md §2.9 extension).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied in order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # 8+ chars starting/ending in a digit, with digits/space/()/./- inside
    ("phone", r"\+?[0-9][0-9() .-]{6,}[0-9]", "[PHONE]"),
    ("digit", r"[0-9]", "*"),
]


def scrub_strings(arr):
    """Apply the full pattern chain to one Arrow string array/chunked
    array (returns a new array; input blocks stay zero-copy)."""
    for _name, pattern, repl in PII_PATTERNS:
        arr = pc.replace_substring_regex(arr, pattern=pattern, replacement=repl)
    return arr


def scrub_columns_kernel(columns: list[str]):
    """``map_batches(batch_format="pyarrow")`` kernel masking PII in the
    named string columns; every other column passes through untouched."""

    def kernel(t: pa.Table) -> pa.Table:
        for c in columns:
            idx = t.schema.get_field_index(c)
            t = t.set_column(idx, c, scrub_strings(t.column(c)))
        return t

    return kernel


def sql_scrub_expr(col: str) -> str:
    """The DuckDB expression equivalent to ``scrub_strings`` on ``col`` —
    the same RE2 patterns nested in the same order, for oracle parity."""
    expr = col
    for _name, pattern, repl in PII_PATTERNS:
        pat_sql = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    return expr
