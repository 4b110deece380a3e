"""Table maintenance: small-file compaction and schema-evolution
reads — the operational half of owning a 100 TB Parquet lake.

Streaming sinks and incremental CDC appends produce many small files;
scan throughput collapses when file count dominates (footer reads,
task scheduling, no vectorized runs). Compaction rewrites a directory
into size-targeted files. Schema evolution is the read-side
complement: yesterday's files lack today's columns, and a union-read
must reconcile them without rewriting history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 << 20


def compact_parquet(spark: SparkSession, path: str,
                    target_file_bytes: int = TARGET_FILE_BYTES,
                    out_path: str | None = None) -> int:
    """Rewrite a Parquet directory into ~``target_file_bytes`` files.
    Returns the output file count.

    File count comes from the *measured input size* (the scan's
    listed bytes), not row counts or partition counts — the same
    volume-based policy as the graph operators.

    This function only ever writes to a destination DISTINCT from the
    input — ``out_path`` if given, else a ``<path>_compacted`` sibling
    — and never replaces the input directory (overwriting a path while
    reading it is undefined). A caller wanting true in-place
    compaction owns the final swap: write to a sibling, then rename /
    manifest-commit over the original (cheap on object stores, a
    rename on local FS)."""
    df = spark.read.parquet(path)
    total = _dir_bytes(path)
    n_files = max(1, total // target_file_bytes
                  + (1 if total % target_file_bytes else 0))
    dest = out_path or (path.rstrip("/") + "_compacted")
    df.repartition(int(n_files)).write.mode("overwrite").parquet(dest)
    out = [f for f in _list_parquet(dest)]
    return len(out)


def _dir_bytes(path: str) -> int:
    import os
    return sum(os.path.getsize(os.path.join(dp, f))
               for dp, _, fs in os.walk(path) for f in fs
               if f.endswith(".parquet"))


def _list_parquet(path: str) -> list[str]:
    import os
    return [os.path.join(dp, f) for dp, _, fs in os.walk(path)
            for f in fs if f.endswith(".parquet")]


def read_evolved(spark: SparkSession, *paths: str,
                 fill_missing: dict | None = None) -> DataFrame:
    """Read Parquet directories written under different schema
    versions as one frame: ``mergeSchema`` unions the schemas
    (missing columns → NULL), and ``fill_missing`` optionally maps
    column → default for NULL backfill. Columns present in later
    versions must be *added*, never retyped — retypes need a rewrite,
    which is what makes additive evolution the only free kind."""
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    if fill_missing:
        for col, default in fill_missing.items():
            df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return df
