"""Sinks (SURVEY.md §2.1: S8 parquet, S9 csv, S10 json).

Thin, but deliberate: every sink partitions explicitly (at 100 TB an
unpartitioned write is a file-listing bomb for every reader after
you) and goes through one place so table layout stays consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
