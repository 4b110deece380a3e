"""Writers (SURVEY.md §2.1 S2, S5, S7-S8): Parquet/JSON/CSV sinks with
scale-correct defaults.

Replaces the reference's sink anti-patterns:
- O(n²) read-extend-rewrite of a growing JSON file
  (dataset_generator.py:424-427) → append-mode writes;
- driver-side 500-row batched KV puts with retry loops
  (load_hbase.py:191-217) → partitioned Parquet with sort-within-
  partitions (task retry is the framework's);
- ``coalesce(1)`` single-file output (clv_integration.py:65) → kept
  only behind ``single_file=True`` for report-sized results, never the
  default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None,
                  sort_within: list[str] | None = None,
                  max_records_per_file: int | None = None) -> None:
    """Parquet sink. ``partition_by`` gives partition pruning on the
    read side (the role of HBase row-key prefixes, load_hbase.py:116);
    ``sort_within`` gives range locality inside files (the row-key
    sort suffix); ``max_records_per_file`` bounds file size (the
    reference's manual 100k-row batching, S2)."""
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite",
               max_records_per_file: int | None = None) -> None:
    """JSONL sink (S2) — splittable, append-friendly; batch-by-count
    via maxRecordsPerFile instead of driver-side chunking."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True, single_file: bool = False) -> None:
    """CSV sink (S5). ``single_file=True`` reproduces the reference's
    coalesce(1) report artifact — serializes the write; only for
    driver-consumable result sizes."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list[str] | None = None,
              sort_within: list[str] | None = None) -> None:
    """ORC sink with the same partition/sort locality knobs as
    write_parquet — the interchange format for Hive/Trino consumers."""
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
