"""Result sinks (SURVEY.md §2.1 S15-S16; reference cli.py:551-567, 113-125).

Distributed writers for corpus-scale outputs; `single_file=True` coalesces
to one part for CLI-sized results (the reference always writes one file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S15: header CSV with standard quote-escaping."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(path)
    )


def write_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S16: JSONL output (one JSON object per row)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Columnar ORC output (splittable, predicate-pushdown-friendly — the
    interchange format for ORC-based warehouses; parquet stays the
    native format everywhere else in this engine)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").orc(path)
