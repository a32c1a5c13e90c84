"""Dataset readers / writers behind a format switch (SURVEY.md §2.1).

The north_star input is a Lance table; this sandbox has no pylance, so the
storage layer is a ``format='lance'|'parquet'|'auto'`` switch defaulting to
parquet (the driver's testdata is parquet anyway).  All readers prune
columns at the read and keep fragment-level parallelism.

Reference source operators re-expressed (file:line cites into
/root/reference/insurance_medical_kgqa):

* S1/S2 JSON list + nested-sheet reader (neo4j_loader.py:85-86,158-165) →
  ``read_json_records`` + caller-side flatten.
* S3 CSV reader, utf-8-sig (neo4j_loader.py:190-192) → ``read_csv_records``.
* S4 tolerant JSON-lines reader with bad-line skip
  (DataCleaned/Diseases/filter_disease.py:19-45) → ``read_json_tolerant``.
* S5 raw-text reader (text_graph_builder.py:96-101) → ``read_text_docs``.
* S6/S7 graph sinks → ``write_table`` partitioned parquet/lance.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

import ray.data as rd


def have_lance() -> bool:
    try:  # pragma: no cover - pylance absent in this sandbox
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _resolve_format(path: str, format: str) -> str:
    if format != "auto":
        return format
    if str(path).endswith(".lance") and have_lance():
        return "lance"
    return "parquet"


def read_docs(path: str, format: str = "auto", **kwargs: Any) -> "rd.Dataset":
    """Read a span-doc table (doc_id, spans) as a streaming Dataset."""
    fmt = _resolve_format(path, format)
    if fmt == "lance":  # pragma: no cover
        return rd.read_lance(path, **kwargs)
    return rd.read_parquet(path, **kwargs)


def read_table(path: str, columns: list[str] | None = None, format: str = "auto", **kwargs: Any) -> "rd.Dataset":
    """Generic columnar read with column pruning at the source."""
    fmt = _resolve_format(path, format)
    if fmt == "lance":  # pragma: no cover
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds: "rd.Dataset", path: str, format: str = "auto", **kwargs: Any) -> None:
    fmt = _resolve_format(path, format)
    if fmt == "lance":  # pragma: no cover
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)


def read_json_records(path: str, **kwargs: Any) -> "rd.Dataset":
    """S1: JSON list file(s) → row Dataset (raw-fixture path only; the
    production input is the span-doc table)."""
    return rd.read_json(path, **kwargs)


def read_csv_records(path: str, **kwargs: Any) -> "rd.Dataset":
    """S3: CSV with utf-8-sig headers."""
    return rd.read_csv(path, **kwargs)


def read_json_tolerant_lines(lines: list[str]) -> list[dict[str, Any]]:
    """S4 kernel: whole-payload JSON, else per-line parse skipping bad lines
    (filter_disease.py:19-45).  Pure function, applied inside map_batches
    by callers reading with ``rd.read_text``."""
    content = "\n".join(lines).strip()
    try:
        data = json.loads(content)
        return data if isinstance(data, list) else [data]
    except json.JSONDecodeError:
        out = []
        for line in lines:
            line = line.strip()
            if not line:
                continue
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                continue
        return out


def read_text_docs(path: str, **kwargs: Any) -> "rd.Dataset":
    """S5: raw text files, one row per line."""
    return rd.read_text(path, **kwargs)


def read_json_tolerant(path: str) -> "rd.Dataset":
    """S4 pipeline: whole-file-JSON-else-per-line with bad-line skip, as a
    Dataset (read_binary_files → per-file tolerant parse; the reference
    does this single-process in filter_disease.py:19-45)."""
    import pyarrow as pa

    files = rd.read_binary_files(path)

    def parse(batch: pa.Table) -> pa.Table:
        import json as _json

        rows: list[str] = []
        for payload in batch.column("bytes").to_pylist():
            for rec in read_json_tolerant_lines(
                payload.decode("utf-8", errors="replace").splitlines()
            ):
                rows.append(_json.dumps(rec, ensure_ascii=False))
        return pa.Table.from_pydict({"record_json": rows})

    return files.map_batches(parse, batch_format="pyarrow")


def append_csv(df, path: str, encoding: str = "utf-8-sig") -> None:
    """S9: CSV append sink — header only when the file doesn't exist yet
    (spider_nursing_home.py:118-135 semantics; small driver-side frames)."""
    import os

    df.to_csv(
        path, mode="a", header=not os.path.exists(path), index=False,
        encoding=encoding,
    )


def write_json_records(ds: "rd.Dataset", path: str, **kwargs: Any) -> None:
    """S10: JSON sink (directory of part files — resumable layout)."""
    ds.write_json(path, **kwargs)


def from_arrow_docs(table: pa.Table, override_num_blocks: int | None = None) -> "rd.Dataset":
    """In-memory docs table → Dataset (tests / bench)."""
    if override_num_blocks:
        return rd.from_arrow(table, override_num_blocks=override_num_blocks)
    return rd.from_arrow(table)
