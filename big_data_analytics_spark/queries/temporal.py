"""Temporal-join queries: as-of (point-in-time) join and banded range
join over the events table (SURVEY §2.3 extension surface — operators
the reference computes with per-row Python loops, e.g. the
price_history lookup dataset_generator.py:208-215).

Both have full DuckDB oracles (ASOF JOIN is native DuckDB; the band
join is a plain inequality join), so the distributed implementations
are hash-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_sum
from big_data_analytics_spark.operators.temporal import (
    asof_join,
    range_band_join,
    scd2_history,
)
from big_data_analytics_spark.queries import query


# --------------------------------------------------------------------
# AJ1 — as-of join: for each purchase event, the user's most recent
# view event at-or-before it (attribution: "which page view led to
# this purchase").
# --------------------------------------------------------------------
@query(
    "aj1_asof_purchase_view",
    oracle="""
    SELECT p.event_id, p.user_id,
           COALESCE(v.event_id, -1) AS view_event_id,
           COALESCE(epoch_us(p.ts) - epoch_us(v.ts), -1) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def aj1_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time attribution via the distributed as-of join: one
    shuffle on user_id, a running last-non-null over the merged event
    stream — never the quadratic join-then-argmax. Purchases with no
    prior view keep -1 sentinels (left semantics)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts")
    joined = asof_join(purchases, views, on="ts", by="user_id",
                       right_cols=["event_id"])
    return joined.select(
        "event_id", "user_id",
        F.coalesce(F.col("event_id_right"), F.lit(-1)).alias("view_event_id"),
        F.coalesce(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts_right")),
            F.lit(-1),
        ).alias("gap_us"),
    )


# --------------------------------------------------------------------
# AJ2 — forward as-of with tolerance: for each view event, the next
# purchase within 30 minutes (conversion attribution window).
# --------------------------------------------------------------------
_TOL_US = 30 * 60 * 1_000_000


@query(
    "aj2_forward_asof_tolerance",
    oracle=f"""
    SELECT v.event_id, v.user_id,
           CASE WHEN p.event_id IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.ts) <= {_TOL_US}
                THEN p.event_id ELSE -1 END AS next_purchase_id,
           CASE WHEN p.event_id IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(v.ts) <= {_TOL_US}
                THEN epoch_us(p.ts) - epoch_us(v.ts) ELSE -1 END AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
)
def aj2_forward_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-direction as-of with a 30-minute tolerance: same
    union+window plan as aj1 (descending time order), with the
    tolerance nulling matches beyond the attribution window after the
    nearest match is chosen — identical to the oracle's post-ASOF
    CASE."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    joined = asof_join(views, purchases, on="ts", by="user_id",
                       right_cols=["event_id"], direction="forward",
                       tolerance_micros=_TOL_US)
    return joined.select(
        "event_id", "user_id",
        F.coalesce(F.col("event_id_right"), F.lit(-1)).alias("next_purchase_id"),
        F.coalesce(
            F.unix_micros(F.col("ts_right")) - F.unix_micros(F.col("ts")),
            F.lit(-1),
        ).alias("gap_us"),
    )


# --------------------------------------------------------------------
# RJ1 — banded range join: classify event values into irregular,
# hand-authored bands via a broadcast inequality join.
# --------------------------------------------------------------------
_BANDS = [  # (band, lo, hi) — irregular on purpose (not bucketizable)
    ("micro", 0.0, 5.0),
    ("small", 5.0, 25.0),
    ("mid", 25.0, 150.0),
    ("large", 150.0, 1000.0),
]

_BANDS_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)


@query(
    "rj1_value_band_join",
    oracle=f"""
    SELECT COALESCE(b.band, 'none') AS band,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total_value
    FROM events e
    LEFT JOIN (VALUES {_BANDS_SQL}) AS b(band, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY COALESCE(b.band, 'none')
    """,
)
def rj1_value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join against a tiny band table: explicit broadcast →
    BroadcastNestedLoopJoin, linear in the fact side, zero shuffle
    before the final 4-group aggregate."""
    ev = load_table(spark, sf_dir, "events")
    bands = ev.sparkSession.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (
        range_band_join(ev, bands, "value")
        .groupBy(F.coalesce(F.col("band"), F.lit("none")).alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("value").alias("total_value"),
        )
    )


# --------------------------------------------------------------------
# IJ1 — interval join (multi-touch attribution): every (view,
# purchase) pair for the same user within a 30-minute horizon. The
# same transform is the stream-stream join in streaming/events.py;
# here it runs in batch mode against the oracle.
# --------------------------------------------------------------------
@query(
    "ij1_view_purchase_pairs",
    oracle=f"""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON p.user_id = v.user_id
     AND p.ts >= v.ts
     AND epoch_us(p.ts) - epoch_us(v.ts) <= {_TOL_US}
    """,
)
def ij1_view_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution interval join. Batch plan: one shuffle
    on user_id (equi-key), interval bounds as a residual predicate on
    the sort-merge join — never a cross join. The streaming twin
    (streaming/events.view_purchase_interval_join) is the same
    function; its watermark + interval bound give Spark a state-expiry
    proof for the stream-stream join."""
    from big_data_analytics_spark.streaming.events import (
        view_purchase_interval_join,
    )
    ev = load_table(spark, sf_dir, "events")
    return view_purchase_interval_join(ev, horizon="30 minutes").select(
        "user_id", "view_id", "purchase_id", "gap_us", "purchase_value")


# --------------------------------------------------------------------
# SCD1 — type-2 slowly-changing-dimension history: per-user
# event_type run-length history with validity intervals.
# --------------------------------------------------------------------
@query(
    "scd1_user_state_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
    )
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           event_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           COALESCE(epoch_us(LEAD(ts) OVER w), -1) AS valid_to_us,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd1_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension build (operators/temporal.scd2_history): each
    user's event_type run-length history as [valid_from, valid_to)
    versions. One shuffle on user_id; the change-detection lag, the
    version row_number, and the interval lead all reuse that
    partitioning (single Exchange in the plan)."""
    ev = load_table(spark, sf_dir, "events")
    hist = scd2_history(
        ev.select("user_id", "event_type", "ts", "event_id"),
        entity_col="user_id", attr_cols=["event_type"],
        order_cols=["ts", "event_id"],
    )
    return hist.select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts")).alias("valid_from_us"),
        "event_id",
        F.col("version").cast("long").alias("version"),
        F.coalesce(F.unix_micros(F.col("valid_to")), F.lit(-1))
        .alias("valid_to_us"),
        "is_current",
    )
