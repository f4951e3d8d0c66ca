"""Structured Streaming queries over the events fixture.

Beyond-reference extension (SURVEY.md §2.10: the reference has no
event-time streaming runtime — its Kafka connector scans topics as
batch tables). Each query here is a real streaming pipeline
(readStream -> watermark -> windowed/stateful op -> sink) executed to
completion with Trigger.AvailableNow so the builder contract and the
DuckDB batch oracle both hold: bounded replay of a stream must equal
the batch computation over the same data (the streaming unit-test
methodology Spark itself uses).

Float sums cross the decimal(18,6) hop (functions/compat.py) because
streaming aggregation order is as nondeterministic as batch shuffle
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_0_235_spark.functions.compat import dec_sum, oracle_dec_sum
from presto_0_235_spark.queries.registry import register
from presto_0_235_spark.streaming.engine import read_events_stream, run_to_batch


@register(
    "stream_tumbling_agg",
    oracle=f"""
SELECT time_bucket(INTERVAL 6 HOUR, ts) AS ws,
       event_type,
       count(*) AS n_events,
       {oracle_dec_sum('value', 'sum_value')}
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation with a watermark:
    window(ts, 6h) x event_type -> count/sum. The watermark bounds
    state (1h lateness); 6h buckets align to the epoch on both
    engines, so the batch oracle is a plain time_bucket GROUP BY."""
    events = read_events_stream(spark, sf_dir)
    windowed = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value", "sum_value"),
        )
    )
    return run_to_batch(windowed).select(
        F.col("window.start").alias("ws"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "stream_sliding_agg",
    oracle=f"""
WITH slid AS (
  SELECT time_bucket(INTERVAL 6 HOUR, ts) AS base_ws, ts, event_type, value
  FROM events
),
assigned AS (
  SELECT base_ws AS ws, event_type, value FROM slid
  UNION ALL
  SELECT base_ws - INTERVAL 6 HOUR AS ws, event_type, value FROM slid
)
SELECT ws, event_type, count(*) AS n_events,
       {oracle_dec_sum('value', 'sum_value')}
FROM assigned
GROUP BY 1, 2
""",
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (12h length, 6h slide) aggregation: every event
    lands in exactly two windows. The oracle replicates each event to
    its two window starts (base bucket and base-6h) — the same Expand
    Spark plans for sliding windows."""
    events = read_events_stream(spark, sf_dir)
    windowed = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "12 hours", "6 hours"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value", "sum_value"),
        )
    )
    return run_to_batch(windowed).select(
        F.col("window.start").alias("ws"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "stream_session_window",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 4 HOUR
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM gaps
)
SELECT user_id, min(ts) AS sess_start, count(*) AS n_events,
       {oracle_dec_sum('value', 'sum_value')}
FROM sess
GROUP BY user_id, sess_id
""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (4h inactivity gap) per user — Spark's native
    stateful session_window operator. The oracle sessionizes with the
    classic lag/flag/cumsum idiom; an event exactly at gap distance
    starts a new session (session end is exclusive), hence >= in the
    oracle's gap test."""
    events = read_events_stream(spark, sf_dir)
    sessions = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "4 hours"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value", "sum_value"),
        )
    )
    return run_to_batch(sessions).select(
        "user_id",
        F.col("session_window.start").alias("sess_start"),
        "n_events",
        "sum_value",
    )


@register("stream_dedup_watermark", oracle=None)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state:
    dropDuplicatesWithinWatermark on (user_id, event_type) keeps one
    row per key per watermark horizon — the streaming analog of exact
    dedup with O(keys-in-horizon) state instead of O(all-history).
    Which row survives depends on arrival order -> rows-only check."""
    events = read_events_stream(spark, sf_dir)
    deduped = events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    return run_to_batch(deduped, output_mode="append").select(
        "user_id", "event_type", "ts", "value"
    )


@register(
    "stream_interval_join",
    oracle="""
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
 AND v.ts <= p.ts
""",
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (beyond-reference — SURVEY.md
    §2.10): purchases joined to the same user's views within the
    preceding 30 minutes. Watermarks on both sides bound the join
    state to the interval+lateness horizon; the bounded replay must
    equal the batch range join the oracle computes."""
    events = read_events_stream(spark, sf_dir)
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("v_ts") <= F.col("p_ts")),
    )
    return run_to_batch(joined, output_mode="append").select(
        "purchase_id", "view_id", "user_id"
    )


@register(
    "stream_stateful_user_profile",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       min(value) AS min_value,
       max(value) AS max_value,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
GROUP BY user_id
""",
)
def stream_stateful_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState,
    streaming/stateful.py): per-user running profile in GroupState.
    Only order-independent state (count/min/max bounds) is kept, so
    the bounded replay equals the batch GROUP BY — a custom stateful
    operator that still passes the exact differential gate."""
    from presto_0_235_spark.streaming.stateful import user_profile_stream

    events = read_events_stream(spark, sf_dir)
    return run_to_batch(user_profile_stream(events), output_mode="update")


@register(
    "stream_static_enrich",
    oracle=f"""
SELECT c_mktsegment, count(*) AS n_events,
       {oracle_dec_sum('value', 'sum_value')}
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the streaming side is enriched against a
    static dimension (the broadcast-dimension pattern for streams —
    no state needed, the static side is just re-read per batch).
    Aggregated per segment; bounded replay equals the batch join."""
    from presto_0_235_spark.catalog import load_table as _lt

    events = read_events_stream(spark, sf_dir)
    cust = _lt(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = events.join(cust, events.user_id == cust.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        dec_sum("value", "sum_value"),
    )
    return run_to_batch(agg, output_mode="complete")


@register(
    "stream_topk_per_window",
    oracle="""
WITH agg AS (
  SELECT time_bucket(INTERVAL 12 HOUR, ts) AS ws, user_id,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT ws, user_id, n_events,
         row_number() OVER (PARTITION BY ws
                            ORDER BY n_events DESC, user_id) AS rnk
  FROM agg
)
SELECT ws, CAST(user_id AS BIGINT) AS user_id,
       CAST(n_events AS BIGINT) AS n_events, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k per event-time window — the trending-items
    query. Structured Streaming forbids ranking windows on a live
    stream, so the production shape is two stages: the STREAM
    maintains per-(window, user) counts under a watermark (bounded
    state); the settled results are ranked with a group-limit window
    per batch/downstream (here: on the AvailableNow-settled table —
    in production, inside foreachBatch or over the sink table).
    Replay equals the batch oracle exactly."""
    from pyspark.sql import Window

    events = read_events_stream(spark, sf_dir)
    counts = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "12 hours"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    settled = run_to_batch(counts).select(
        F.col("window.start").alias("ws"), "user_id", "n_events"
    )
    w = Window.partitionBy("ws").orderBy(
        F.col("n_events").desc(), F.col("user_id")
    )
    return (
        settled.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("ws", "user_id", "n_events", F.col("rnk").cast("long").alias("rnk"))
    )


@register(
    "stream_interval_join_left",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     v AS (SELECT * FROM events WHERE event_type = 'view'),
     wm AS (SELECT least((SELECT max(ts) FROM p), (SELECT max(ts) FROM v))
                   - INTERVAL 1 HOUR AS w)
SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id
FROM p
LEFT JOIN v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
 AND v.ts <= p.ts
WHERE v.event_id IS NOT NULL OR p.ts < (SELECT w FROM wm)
""",
)
def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the harder state-
    management case: an unmatched left row can only emit once the
    watermark proves no match can still arrive, so outer results are
    a function of watermark PROGRESS, not just data. The oracle
    replays that rule exactly: the final event-time watermark of a
    bounded AvailableNow run is min(max p_ts, max v_ts) - delay
    (multipleWatermarkPolicy=min default), matched rows always emit,
    and unmatched purchases emit only if p_ts is strictly below the
    final watermark (younger state is still "open" at termination —
    the documented outer-join semantics, not an approximation).
    Watermarks bound the buffered state to the interval+lateness
    horizon on both sides."""
    events = read_events_stream(spark, sf_dir)
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "left_outer",
    )
    return run_to_batch(joined, output_mode="append").select(
        "purchase_id", "view_id", "user_id"
    )


@register(
    "stream_interval_join_full",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
     v AS (SELECT * FROM events WHERE event_type = 'view'),
     wm AS (SELECT least((SELECT max(ts) FROM p), (SELECT max(ts) FROM v))
                   - INTERVAL 1 HOUR AS w)
SELECT p.event_id AS purchase_id, v.event_id AS view_id,
       coalesce(p.user_id, v.user_id) AS user_id
FROM p
FULL JOIN v
  ON p.user_id = v.user_id
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
 AND v.ts <= p.ts
WHERE (p.event_id IS NOT NULL AND v.event_id IS NOT NULL)
   OR (v.event_id IS NULL AND p.ts < (SELECT w FROM wm))
   OR (p.event_id IS NULL
       AND v.ts < (SELECT w FROM wm) - INTERVAL 30 MINUTE)
""",
)
def stream_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — both sides' unmatched
    rows gated on watermark progress, each by its own eviction
    horizon: an unmatched purchase emits when the watermark passes
    p_ts (no earlier-or-equal view can arrive); an unmatched view
    emits when the watermark passes v_ts + 30min (no purchase within
    its forward-looking match window can arrive). The oracle replays
    BOTH rules against the final bounded-replay watermark
    (min of the two sides' max event time - delay) — full-outer
    state semantics as a checked value, the symmetric completion of
    stream_interval_join_left."""
    events = read_events_stream(spark, sf_dir)
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "full_outer",
    )
    return run_to_batch(joined, output_mode="append").select(
        "purchase_id",
        "view_id",
        F.coalesce(F.col("user_id"), F.col("v_user")).alias("user_id"),
    )
