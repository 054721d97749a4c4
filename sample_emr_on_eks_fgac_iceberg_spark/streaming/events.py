"""Structured Streaming operators over the events table (SURVEY.md
§2.B "Streaming"): watermarked tumbling/sliding/session windows,
stateful dedup, and batch-equivalent queries for the oracle gate.

Design: every windowed transformation is written once against a plain
DataFrame, so the same function serves `spark.read` (batch, checked
against the DuckDB oracle) and `spark.readStream` (incremental,
checked in tests/test_streaming.py with availableNow triggers). That
is Spark's unified-batch-and-streaming model — the batch plan is the
semantic spec for the streaming one.

Scale notes: streaming aggregations shuffle on (window, key) with
state in the state store; watermarks bound state size (here 2 hours of
event-time per key); dropDuplicatesWithinWatermark keeps the dedup
state bounded the same way.
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import (  # noqa: F401
    SESSION_GAP_SECONDS,
    register,
)
from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import load_table

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)



# ---------------------------------------------------------------- shared
def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event type (batch or stream)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (state-backed when streaming)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


# ---------------------------------------------------------- batch oracle
@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY window_start, event_type
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "events_sliding_windows",
    oracle="""
    SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' * k.k AS window_start,
           event_type, COUNT(*) AS n_events
    FROM events CROSS JOIN (VALUES (0), (1)) k(k)
    GROUP BY window_start, event_type
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark assigns each event to the two 30-min-aligned hour windows
    # covering it; the oracle enumerates the same two starts per event.
    return sliding_counts(load_table(spark, sf_dir, "events"))


@register(
    "events_sessionization",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, value,
               LAG(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts) > {SESSION_GAP_SECONDS}
                       THEN 1 ELSE 0 END AS new_session
        FROM seq),
    numbered AS (
        SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged)
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, session_seq
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as a composition of lag + cumulative
    sum + aggregate — the batch mirror of session_window_counts,
    SQL-expressible so the oracle can check it."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # ts may arrive as TIMESTAMP or TIMESTAMP_NTZ (parquet
    # inferTimestampNTZ) — NTZ has no direct cast to BIGINT, so route
    # through TIMESTAMP first; the session-tz offset cancels in the diff.
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    gap_s = epoch("ts") - F.lag(epoch("ts")).over(w)
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap_s > SESSION_GAP_SECONDS), 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_seq", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )


@register(
    "events_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) AS rn
          FROM events) t
    WHERE rn = 1
    """,
)
def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup per (user, event_type) — the
    batch mirror of dropDuplicatesWithinWatermark."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "events_enriched_segments",
    oracle="""
    SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
           c.c_mktsegment AS segment
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def events_enriched_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of the stream-static dim-enrichment join
    (enrich_with_segments); the streaming equivalence is proven in
    tests/test_streaming.py::test_stream_static_join_matches_batch."""
    return enrich_with_segments(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )


# ------------------------------------------------------------- streaming
def read_event_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events directory (schema pinned — a
    streaming source cannot infer). max_files_per_trigger throttles the
    micro-batch size (source option, so it applies under availableNow
    replays too)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful streaming dedup with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def enrich_with_segments(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: enrich each event with the customer's market
    segment from a static dimension. The static side is broadcast, so
    the streaming plan stays stateless (no watermark, no state store) —
    each micro-batch hash-probes the dim in place. That is the 100 TB
    posture for dim enrichment: the alternative (stream-stream join)
    would buffer the dim in state per key. Works identically on a batch
    DataFrame (unified model)."""
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return events.join(dim, "user_id").select(
        "event_id", "ts", "user_id", "event_type", "value", "segment"
    )


def run_to_memory(
    sdf: DataFrame,
    name: str,
    output_mode: str = "complete",
) -> None:
    """Drain a stream with an availableNow trigger into an in-memory
    table `name` (test/driver harness; production sinks are
    foreachBatch → warehouse tables)."""
    query = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


# ------------------------------------------------- custom stateful op
RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, cents long"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count + value total carried in the state
    store across micro-batches (the engine's escape hatch for
    aggregation logic Spark's built-in streaming aggs can't express).

    Value totals accumulate as exact integer cents in state, so
    emitted doubles are order/batch-boundary independent. State is one
    (count, cents) pair per user — bounded by key cardinality, the
    same contract as a streaming groupBy count.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_STAGED_STREAMS: dict[tuple[str, str], str] = {}


def _staged_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table as a multi-file parquet directory for the
    file stream source, once per (application, sf_dir) — the testdata
    directory is read-only so a copy is unavoidable, but it is written
    at full write parallelism (no coalesce(1) single-task funnel),
    reused across invocations (bench runs each query twice), and
    removed at interpreter exit."""
    import atexit
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _STAGED_STREAMS:
        dst = tempfile.mkdtemp(prefix="events_stream_")
        load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(dst)
        atexit.register(shutil.rmtree, dst, ignore_errors=True)
        _STAGED_STREAMS[key] = dst
    return _STAGED_STREAMS[key]


@register(
    "events_running_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM events GROUP BY user_id
    """,
)
def events_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState operator driven batch-style through an
    availableNow drain of the staged events directory. The update-mode
    memory sink holds one row per (user, micro-batch touching that
    user); the final state per user is the row with the greatest
    n_events — counts are strictly increasing — so the result is
    deterministic no matter how availableNow splits the files.
    tests/test_streaming.py additionally replays it in two chunks to
    prove state carries across micro-batches."""
    import uuid

    src = os.path.join(sf_dir, "_events_stream")
    if not os.path.isdir(src):
        src = _staged_events_dir(spark, sf_dir)
    name = f"running_totals_{uuid.uuid4().hex[:8]}"
    stream = read_event_stream(spark, src)
    run_to_memory(running_user_totals(stream), name, output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@register(
    "events_session_window_native",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, ts, value, LAG(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts >= INTERVAL {SESSION_GAP_SECONDS} SECOND
                       THEN 1 ELSE 0 END AS new_session
        FROM seq),
    numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {SESSION_GAP_SECONDS} SECOND AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_seq
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window operator (state-backed when
    streaming). Sessions merge events whose inter-arrival gap is
    strictly below the gap; window end = last event + gap. The oracle
    re-derives identical sessions by gap-chaining at full timestamp
    precision (a >= gap boundary starts a new session in both)."""
    return session_window_counts(
        load_table(spark, sf_dir, "events"), gap="30 minutes"
    )


# ------------------------------------------------- stream-stream join
def join_click_purchase_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval inner join — the ad-tech conversion
    pairing: every (click, purchase) of the same user with the purchase
    inside [click_ts, click_ts + horizon]. On streams BOTH sides are
    watermarked and the join condition carries two-sided event-time
    bounds, so Spark's symmetric hash join can evict buffered rows once
    the watermark passes — bounded state, the thing that separates a
    production stream-stream join from an unbounded buffer. On batch
    frames the same function is a plain interval equi-join (unified
    model; the batch plan is the semantic spec for the streaming one,
    proven in tests/test_streaming.py)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return c.join(p, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


@register(
    "events_stream_stream_conversions",
    oracle="""
    WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'),
    j AS (SELECT c.user_id, c.click_id, p.purchase_id,
                 (epoch_us(p.purchase_ts) - epoch_us(c.click_ts))
                     // 1000000 AS lat_s
          FROM c JOIN p ON c.user_id = p.user_id
            AND p.purchase_ts >= c.click_ts
            AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT click_id) AS BIGINT) AS n_clicks_converted,
           CAST(MIN(lat_s) AS BIGINT) AS min_latency_s
    FROM j GROUP BY user_id
    """,
)
def events_stream_stream_conversions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch mirror of the watermarked stream-stream interval join
    (join_click_purchase_streams): per-user (click, purchase) pairs
    within the 30-minute conversion horizon, rolled up to pair / 
    converted-click counts and the minimum latency. The true streaming
    plan (two watermarked file streams, symmetric hash join, append
    mode) is proven row-identical to this batch plan in
    tests/test_streaming.py::test_stream_stream_join_matches_batch."""
    e = load_table(spark, sf_dir, "events")
    pairs = join_click_purchase_streams(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )
    lat = F.expr(
        "(unix_micros(cast(purchase_ts AS timestamp)) "
        "- unix_micros(cast(click_ts AS timestamp))) div 1000000"
    )
    return pairs.withColumn("lat_s", lat).groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("click_id").cast("bigint").alias("n_clicks_converted"),
        F.min("lat_s").cast("bigint").alias("min_latency_s"),
    )


@register(
    "sessions_entry_exit_matrix",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               LAG(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR date_diff('second', prev_ts, ts)
                            > {SESSION_GAP_SECONDS}
                       THEN 1 ELSE 0 END AS new_session
        FROM seq),
    numbered AS (
        SELECT *, CAST(SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                                     ORDER BY ts, event_id) AS rn_a,
                  ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                                     ORDER BY ts DESC, event_id DESC)
                      AS rn_d,
                  COUNT(*) OVER (PARTITION BY user_id, session_seq) AS m
        FROM numbered),
    sess AS (
        SELECT user_id, session_seq,
               MAX(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
               MAX(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
               MAX(m) AS n_ev
        FROM ranked GROUP BY user_id, session_seq),
    tot AS (SELECT COUNT(*) AS n FROM sess)
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (n_ev = 1) AS BIGINT) AS n_single_event,
           CAST(SUM(n_ev) AS BIGINT) AS total_events,
           CAST(COUNT(*) * 1000000 // (SELECT n FROM tot) AS BIGINT)
               AS share_ppm
    FROM sess GROUP BY entry_type, exit_type
    """,
)
def sessions_entry_exit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-type × exit-type session matrix — 'what do sessions start
    and end with' (the landing/abandonment view product analytics
    reads next to the funnel), composed on the engine's gap
    sessionization: per session the first and last event type by
    (ts, event_id), rolled into a ≤|types|² matrix with single-event
    (bounce) counts and truncated-ppm shares.

    Plan shape at 100 TB: ONE hash partition on user_id serves the
    lag, the running session counter AND both per-session rank
    windows (same key prefix — no extra exchange); the matrix rollup
    is a tiny hash agg; the denominator rides a broadcast 1-row cross
    join. Session state never leaves the user partition."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    gap_s = epoch("ts") - F.lag(epoch("ts")).over(w)
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap_s > SESSION_GAP_SECONDS), 1
    ).otherwise(0)
    numbered = e.withColumn("new_session", new_session).withColumn(
        "session_seq", F.sum("new_session").over(wrun)
    )
    ws = Window.partitionBy("user_id", "session_seq")
    ranked = (
        numbered.withColumn(
            "rn_a", F.row_number().over(ws.orderBy("ts", "event_id"))
        )
        .withColumn(
            "rn_d",
            F.row_number().over(
                ws.orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ),
        )
        .withColumn("m", F.count(F.lit(1)).over(ws))
    )
    sess = ranked.groupBy("user_id", "session_seq").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("event_type"))).alias(
            "entry_type"
        ),
        F.max(F.when(F.col("rn_d") == 1, F.col("event_type"))).alias(
            "exit_type"
        ),
        F.max("m").alias("n_ev"),
    )
    tot = sess.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
    return (
        sess.groupBy("entry_type", "exit_type")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"),
            F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_single_event"),
            F.sum("n_ev").cast("bigint").alias("total_events"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "entry_type",
            "exit_type",
            F.col("cnt").cast("bigint").alias("n_sessions"),
            "n_single_event",
            "total_events",
            F.expr("CAST((cnt * 1000000) div n AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )
