"""Order-insensitive result comparison between a Spark DataFrame and a
DuckDB oracle query — a local stand-in for the driver's correctness
gate (row-count + schema + sorted value-hash).

Canonicalization: columns sorted by name, every value rendered to a
canonical string (floats via repr, timestamps via ISO format, NULL as a
sentinel), rows sorted, md5 over the whole block. Two results match iff
their canonical hashes match — i.e. bit-identical values, which is the
bar the queries are designed to hit (see functions/money.py for how).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import duckdb
import pandas as pd


@dataclass
class CompareResult:
    name: str
    match: bool
    spark_rows: int
    oracle_rows: int
    detail: str


def _canon_value(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        if v == 0.0:  # normalize -0.0
            v = 0.0
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(int(v))
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> tuple[int, str, list[str]]:
    """(row_count, md5_of_sorted_rows, sorted_columns)."""
    cols = sorted(df.columns)
    rows = []
    for tup in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in tup:
            if v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                vals.append("<NULL>")
            elif hasattr(v, "item") and not isinstance(v, (list, tuple)):
                vals.append(_canon_value(v.item()))  # numpy scalar → python
            else:
                vals.append(_canon_value(v))
        rows.append("\x1f".join(vals))
    rows.sort()
    digest = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(rows), digest, cols


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.sql(sql).df()


def compare(name: str, spark_df, oracle_sql: str, sf_dir: str) -> CompareResult:
    spark_pd = spark_df.toPandas()
    oracle_pd = run_oracle(oracle_sql, sf_dir)
    n_s, h_s, c_s = canonicalize(spark_pd)
    n_o, h_o, c_o = canonicalize(oracle_pd)
    if c_s != c_o:
        return CompareResult(name, False, n_s, n_o, f"columns differ: {c_s} vs {c_o}")
    if n_s != n_o:
        return CompareResult(name, False, n_s, n_o, "row counts differ")
    if h_s != h_o:
        # find first differing row for debugging
        detail = _first_diff(spark_pd, oracle_pd)
        return CompareResult(name, False, n_s, n_o, f"value hash differs; {detail}")
    return CompareResult(name, True, n_s, n_o, "ok")


def _first_diff(a: pd.DataFrame, b: pd.DataFrame) -> str:
    cols = sorted(a.columns)

    def rows(df):
        out = []
        for tup in df[cols].itertuples(index=False, name=None):
            out.append(tuple(_canon_value(v.item() if hasattr(v, "item") and not isinstance(v, (list, tuple)) else v) for v in tup))
        return sorted(out)

    ra, rb = rows(a), rows(b)
    for i, (x, y) in enumerate(zip(ra, rb)):
        if x != y:
            return f"first diff at sorted row {i}: spark={x} oracle={y} (cols={cols})"
    return f"prefix equal; lengths {len(ra)} vs {len(rb)}"
