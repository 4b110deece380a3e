"""Structured Streaming surface over the event stream (SURVEY.md §2.10).

The reference is batch-only; its closest analogues define this
extension surface:

- 500-row HBase micro-batches with cross-batch accumulator state
  (/root/reference/load_hbase.py:191-211) → stateful streaming
  aggregation in update mode (and idempotent, unlike the reference:
  re-running the loader double-counts its counters);
- daily ProductMetrics counters (load_hbase.py:127-134) → tumbling
  event-time window with a watermark (the reference recomputes from
  full files — effectively watermark = ∞);
- generated sessions with start/end/duration
  (dataset_generator.py:263-321) → ``session_window`` gap sessions.

Every transformation takes a DataFrame (batch or streaming) and returns
one, so the exact same plan runs in both modes — tests exercise the
streaming path with a file source + ``trigger(availableNow)`` and
check equivalence against the batch run, which is the Structured
Streaming correctness model (incrementalized batch query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_event_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 1-day window per event_type: count + value sum.

    Streaming form of queries.relational.a12_event_daily_metrics. The
    watermark bounds state: late events beyond it are dropped (the
    batch reference has no such bound because it rereads everything).
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.floor(F.col("value") * 10000.0 + 0.5)).cast("double")
             / 10000.0).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("day"),
            "event_type", "n_events", "value_sum",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessions per user (session_window) — the streaming
    twin of queries.windows.w7_sessionize_events.

    State per (user, open session); sessions close when the watermark
    passes start+gap, so state is bounded by active users × gap.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events_within_watermark(events: DataFrame,
                                  watermark: str = "1 hour",
                                  keys: tuple[str, ...] = ("event_id",)
                                  ) -> DataFrame:
    """Streaming exactly-once-per-key dedup — the stream twin of
    operators/dedup.exact_dedup, for at-least-once sources that replay
    records (Kafka redelivery, file re-drops).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes the key's first-seen event time, so state is
    bounded by (key arrival rate × watermark) instead of growing
    forever like a plain dropDuplicates on a stream. Duplicates
    arriving later than the watermark are NOT caught — the contract is
    "dedup within the redelivery horizon", which is the right trade at
    100 TB/day ingest. On a batch frame this degrades to plain
    dropDuplicates (same keys, no state)."""
    if not events.isStreaming:
        return events.dropDuplicates(list(keys))
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cross-batch accumulator state (the load_hbase.py:191-211
    pattern): per-user lifetime event count and value total, updated
    every micro-batch. Run with outputMode('update') or 'complete'."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.floor(F.col("value") * 10000.0 + 0.5)).cast("double")
         / 10000.0).alias("value_total"),
    )


def stream_from_parquet(spark, path: str, schema) -> DataFrame:
    """File-source stream over a parquet directory (the test harness's
    replayable source; production swaps in Kafka with the same plan)."""
    return spark.readStream.schema(schema).parquet(path)


def start_upsert_metrics_sink(spark, source: DataFrame, target_dir: str,
                              checkpoint_dir: str):
    """foreachBatch upsert of the daily-metrics rollup into a Parquet
    target — the streaming restatement of the reference's batched
    HBase loader (/root/reference/load_hbase.py:191-217), with the two
    properties that loader lacks:

    - **idempotence**: each micro-batch *overwrites* the day-partition
      keys it touches (dynamic partition overwrite) instead of
      incrementing counters, so replays don't double-count;
    - **resumability**: progress lives in the checkpoint, not in a
      Python loop's local state.

    Semantics are last-writer-wins per day-partition: correct when a
    micro-batch carries complete days (e.g. daily file drops). For
    finer-grained batches, compute the rollup with the stateful
    ``daily_event_counts`` aggregation in update mode instead, or
    merge-read the target inside the batch function — this sink
    demonstrates the idempotent-overwrite mechanism.

    Returns the StreamingQuery (caller awaits/stops).
    """
    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        rollup = daily_event_counts(batch_df)
        (rollup.withColumn("day_key", F.date_format("day", "yyyyMMdd"))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("day_key")
         .parquet(target_dir))

    return (
        source.writeStream
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_stateful_upsert_sink(source: DataFrame, target_dir: str,
                               checkpoint_dir: str,
                               watermark: str = "1 day",
                               on_batch_committed=None):
    """Update-mode stateful rollup -> key-partitioned dynamic-overwrite
    Parquet upsert: the PRODUCTION exactly-once sink pattern, correct
    for arbitrarily split micro-batches (unlike
    ``start_upsert_metrics_sink``'s per-batch rollup, which needs each
    batch to carry complete days).

    Mechanics: the engine's stateful ``daily_event_counts`` aggregate
    holds the running totals (update mode emits each key's CURRENT
    cumulative value whenever it changes), and foreachBatch overwrites
    exactly the (day, event_type) partitions present in the batch —
    partitioning by the FULL aggregation key matters: update mode
    emits only changed keys, so a coarser partition (day alone) would
    drop that day's unchanged event_types on overwrite. Last writer
    per key wins with the newest cumulative total, so the finished
    target equals the batch aggregate; replays rewrite identical
    values (idempotent), and progress lives in the checkpoint
    (resumable). Requires a bounded-disorder source (file order within
    the watermark): update mode drops input older than the watermark,
    unlike sm1's complete mode which never evicts.

    ``on_batch_committed(batch_id)`` is a post-target-write hook used
    by the crash-recovery test to fail the query in the WORST window —
    after the batch's output landed in the target but before the
    checkpoint commit log records it — forcing the restart to replay
    that batch against an already-written target. The dynamic
    partition overwrite makes the replay a byte-identical rewrite,
    which is exactly the idempotence "exactly-once" rests on.

    Returns the StreamingQuery (caller awaits/stops).
    """
    agg = daily_event_counts(source, watermark)
    out = agg.withColumn("day_key", F.date_format("day", "yyyyMMdd"))

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("day_key", "event_type")
         .parquet(target_dir))
        if on_batch_committed is not None:
            on_batch_committed(batch_id)

    return (
        out.writeStream
        .foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


#: Output / state schemas for the custom stateful operator below.
_USER_STATE_SCHEMA = "n_events BIGINT, value_qsum BIGINT"
_USER_OUT_SCHEMA = ("user_id BIGINT, n_events BIGINT, value_sum DOUBLE, "
                    "batch_events INT")


def user_lifetime_stats_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful per-user accumulator via applyInPandasWithState
    (SURVEY.md §2.10: the reference's cross-batch Python accumulator
    dicts, load_hbase.py:178-180, as managed streaming state).

    State per user: lifetime (n_events, value_qsum) where value_qsum
    is the EXACT INTEGER 1e-4 fixed-point sum — the state never holds
    a float, so the emitted value_sum (one final division) is
    bit-identical to a batch engine's SUM(quantized)/1e4 no matter
    how events split across micro-batches. Each micro-batch emits the
    user's updated lifetime totals plus how many events this batch
    contributed. Unlike the built-in aggregation
    (running_user_totals) this shape can hold *arbitrary* Python
    state — the escape hatch for operators Spark's aggregates can't
    express.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.exists:
            n, vq = state.get
        else:
            n, vq = 0, 0
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            n += len(pdf)
            # fixed-point accumulate (portable exactness, money.py):
            # np.floor matches the batch F.floor(x*1e4+0.5) half-up
            # convention for negatives (plain int64 cast truncates
            # toward zero), and nulls are skipped like F.sum skips them
            v = pdf["value"].dropna()
            vq += int(np.floor(v * 10000.0 + 0.5).astype("int64").sum())
        state.update((n, vq))
        # float(vq) first: round the integer to double, THEN divide —
        # the same order as Spark's CAST(BIGINT AS DOUBLE)/1e4 and the
        # DuckDB oracle. Python's int/float division is exact-rational
        # and can differ in the last ulp once vq exceeds 2^53.
        yield pd.DataFrame([{
            "user_id": key[0], "n_events": n,
            "value_sum": float(vq) / 10000.0, "batch_events": batch_n,
        }])

    return (
        events.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType=_USER_OUT_SCHEMA,
            stateStructType=_USER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_funnel(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "1 hour") -> DataFrame:
    """Per-session ordered-step funnel (view → click ≥ view →
    purchase ≥ click) — the streaming twin of
    queries.funnels.fn1_session_funnel's step detection.

    ``session_window`` owns the gap-based sessionization (state per
    open session, closed when the watermark passes end+gap); the
    session's events are collected and the chained conditional step
    minima — which need the session's *final* event set, because a
    late view can lower v_ts and admit earlier clicks — are computed
    as array expressions on the closed session. State per open
    session is its event list (bounded by session length × arrival
    rate), the price of exact ordered-step semantics; unordered
    funnels (any-time steps) could keep three running minima instead.

    Batch semantics note: ``session_window`` starts a new session when
    the inter-event gap is ≥ gap (strict overlap test), while the
    batch lag-based variant splits only when the gap is > gap; they
    differ only on microsecond-exact gap boundaries. On a static
    frame this function degrades to a plain aggregation (stream ==
    batch, tested)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    sess = (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.sort_array(F.collect_list(
                F.struct("ts", "event_id", "event_type"))).alias("evs"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )

    def step_ts(pred):
        return F.array_min(
            F.transform(F.filter("evs", pred), lambda e: e["ts"]))

    with_steps = (
        sess
        .withColumn("v_ts", step_ts(lambda e: e["event_type"] == "view"))
        .withColumn("c_ts", step_ts(
            lambda e: (e["event_type"] == "click")
            & (e["ts"] >= F.col("v_ts"))))
        .withColumn("p_ts", step_ts(
            lambda e: (e["event_type"] == "purchase")
            & (e["ts"] >= F.col("c_ts"))))
    )
    return with_steps.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
        F.col("v_ts").isNotNull().alias("s_view"),
        F.col("c_ts").isNotNull().alias("s_click"),
        F.col("p_ts").isNotNull().alias("s_buy"),
    )


def view_purchase_interval_join(events: DataFrame,
                                horizon: str = "30 minutes",
                                watermark: str = "1 hour",
                                join_type: str = "inner") -> DataFrame:
    """Stream-stream interval self-join: every (view, purchase) pair
    for the same user where the purchase lands within ``horizon`` after
    the view — the multi-touch attribution join (vs aj1/aj2's
    single-touch as-of).

    Streaming semantics: both sides carry a watermark and the join
    condition bounds purchase_ts to [view_ts, view_ts + horizon], so
    Spark can expire buffered view state once the purchase-side
    watermark passes view_ts + horizon — state is (view arrival rate ×
    horizon), not the whole stream. On a batch frame the identical
    plan is a user_id equi-join with the interval as a residual
    predicate; both modes run through this one function and the tests
    assert stream == batch.

    ``join_type="left_outer"`` emits unconverted views too (null
    purchase columns) — in streaming, the null row for a view is
    FINALIZED only once the watermark passes view_ts + horizon
    (before that a matching purchase could still arrive), so outer
    results trail the data by watermark + horizon. Consumers must
    apply that finalization cutoff when comparing to batch; the
    output carries view_ts so they can.
    """
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("buyer_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        views = views.withWatermark("view_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    joined = views.join(
        purchases,
        F.expr(f"""
            user_id = buyer_id
            AND purchase_ts >= view_ts
            AND purchase_ts <= view_ts + INTERVAL {horizon}
        """),
        join_type,
    )
    return joined.select(
        "user_id", "view_id", "view_ts", "purchase_id",
        (F.unix_micros(F.col("purchase_ts"))
         - F.unix_micros(F.col("view_ts"))).alias("gap_us"),
        "purchase_value",
    )


#: Output / state schemas for the streaming CUSUM operator below.
_CUSUM_STATE_SCHEMA = ("s BIGINT, n_events BIGINT, n_alarms BIGINT, "
                       "peak BIGINT, first_alarm BIGINT")
_CUSUM_OUT_SCHEMA = ("user_id BIGINT, n_events BIGINT, n_alarms BIGINT, "
                     "cusum_peak_cents BIGINT, first_alarm_event_id BIGINT")


def cusum_alarms_stateful(events: DataFrame, drift_cents: int,
                          h_cents: int) -> DataFrame:
    """Per-user one-sided CUSUM against a FIXED in-control level,
    executed incrementally by the streaming engine via
    applyInPandasWithState — the true per-event recursion
    S_t = max(0, S_{t-1} + (x_t − drift)) that ts7's batch Lindley
    closed form replaces. State per user is five int64s (current S,
    event count, alarm count, running peak, first alarming event id —
    −1 until a crossing); nothing in state is ever a float, so the
    result is bit-identical to the batch restatement no matter how
    events split across micro-batches, PROVIDED arrival is event-time
    ordered across batches (the ordered fixture's contract — a Kafka
    time-ordered partition in production). Within a batch the group's
    chunks are concatenated and sorted by (ts, event_id) before the
    fold; across batches the source's disjoint increasing time ranges
    supply the order.

    Unlike sm6's commutative sums, CUSUM is ORDER-SENSITIVE — this is
    the stateful-operator case that genuinely needs sequential
    per-key state and cannot be expressed as a mergeable aggregate;
    at 100 TB the state is 5 longs per user, partitioned by user_id."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.exists:
            s, n, na, peak, first = state.get
        else:
            s, n, na, peak, first = 0, 0, 0, 0, -1
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        vcs = np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(
            "int64")
        eids = batch["event_id"].to_numpy()
        # Vectorized Lindley fold with carried state: for within-batch
        # deviation prefix sums c and incoming state s0,
        #   S_i = max(0, s0 + c_i, c_i - min_{0<=t<i} c_t)
        # (the three arms = never-reset-yet, reset inside the batch,
        # reset at i) — identical to the per-event recursion
        # S_i = max(0, S_{i-1} + d_i), property-verified in
        # tests/test_streaming.py. All int64; the per-event Python
        # loop was 6-7x the wall-clock at the 10x probe step.
        d = vcs - drift_cents
        c = np.cumsum(d)
        cm = np.minimum.accumulate(np.concatenate(([0], c[:-1])))
        series = np.maximum(np.maximum(s + c, c - cm), 0)
        n += len(series)
        if len(series):
            peak = max(peak, int(series.max()))
            over = series > h_cents
            na += int(over.sum())
            if first < 0 and over.any():
                first = int(eids[int(np.argmax(over))])
            s = int(series[-1])
        state.update((s, n, na, peak, first))
        yield pd.DataFrame([{
            "user_id": key[0], "n_events": n, "n_alarms": na,
            "cusum_peak_cents": peak,
            "first_alarm_event_id": None if first < 0 else first,
        }])

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType=_CUSUM_OUT_SCHEMA,
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
