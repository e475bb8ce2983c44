"""Events / time handling + streaming parity entries (SURVEY.md SS2.8).

Split out of the original single-module catalog (round 6); registration
order is preserved by the import order in ``catalog/__init__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_mark1_spark.catalog._registry import ORACLE, query, t

# ---------------------------------------------------------------------------
# Events / time handling (SURVEY.md §2.8 extension)
# ---------------------------------------------------------------------------

@query("events_hourly", """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2
""")
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NB: F.date_trunc coerces TIMESTAMP_NTZ through the session timezone
    (wall times shift under non-UTC sessions); make_timestamp_ntz from the
    extracted fields truncates timezone-independently."""
    hour = F.make_timestamp_ntz(
        F.year("ts"), F.month("ts"), F.dayofmonth("ts"), F.hour("ts"),
        F.lit(0), F.lit(0)).alias("hour")
    return (t(spark, sf_dir, "events")
            .groupBy(hour, "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum")))


@query("events_window_tumbling", """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2
""")
def events_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window tumbling 1h — the streaming-compatible batch formulation."""
    return (t(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
            .select(F.col("w").start.alias("window_start"), "event_type",
                    "n_events", "value_sum"))


@query("streaming_hourly")
def streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming (AvailableNow) over the same events parquet —
    same results as the batch plan, through the streaming engine. Reads the
    TIMESTAMP(NANOS) source directly via the distributed nanosAsLong path
    (no staging copy). Oracle shared with events_window_tumbling (set after
    definition)."""
    from etl_mark1_spark.streaming.events import (
        hourly_event_aggregate, read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = hourly_event_aggregate(stream)
    return run_available_now(agg, table_name="stream_hourly_out",
                             output_mode="complete")


@query("streaming_window_sliding")
def streaming_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows through the STREAMING engine (2h size, 1h slide,
    AvailableNow complete mode) — must equal the batch sliding aggregate,
    which is exactly what the oracle (set below) checks."""
    from etl_mark1_spark.streaming.events import (
        hourly_event_aggregate, read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = hourly_event_aggregate(stream, slide="1 hour", size="2 hours")
    return run_available_now(agg, table_name="stream_sliding_out",
                             output_mode="complete")


ORACLE["streaming_window_sliding"] = """
    SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS value_sum
    FROM events CROSS JOIN (VALUES (0), (1)) AS t(k)
    GROUP BY 1, 2
"""


ORACLE["streaming_hourly"] = """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2
"""


@query("events_window_sliding", """
    SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS value_sum
    FROM events CROSS JOIN (VALUES (0), (1)) AS t(k)
    GROUP BY 1, 2
""")
def events_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows in batch: 2-hour windows sliding by 1 hour — every
    event lands in exactly two windows (F.window's explode). The oracle
    reproduces the assignment as trunc(hour) - k for k in {0, 1}."""
    return (t(spark, sf_dir, "events")
            .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
            .select(F.col("w").start.alias("window_start"), "event_type",
                    "n_events", "value_sum"))


@query("streaming_restart_drain")
def streaming_restart_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed restart at data scale: events arrive as two time-ordered
    file batches; the second AvailableNow drain resumes from the first's
    checkpoint and merges new files into restored state. Equal to the batch
    hourly aggregate over all events — the oracle."""
    from etl_mark1_spark.streaming.events import restart_drain

    return restart_drain(spark, f"{sf_dir}/events.parquet")


ORACLE["streaming_restart_drain"] = """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum(value), 2) AS value_sum
    FROM events GROUP BY 1, 2
"""


@query("streaming_dedup", """
    SELECT DISTINCT event_id FROM events
""")
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup through real duplicate pressure: the source is
    unioned with itself (every event arrives twice), dropDuplicates keyed
    on event_id with a watermark bounding state. AvailableNow drain must
    equal batch DISTINCT — the oracle."""
    from etl_mark1_spark.streaming.events import (
        dedup_stream, read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    doubled = stream.union(read_events_stream(
        spark, f"{sf_dir}/events.parquet"))
    deduped = dedup_stream(doubled).select("event_id")
    return run_available_now(deduped, table_name="stream_dedup_out",
                             output_mode="append")


@query("streaming_enrich_count", """
    SELECT c_mktsegment, count(*) AS n_events
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
""")
def streaming_enrich_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: events stream enriched against the customer
    dimension (planned per micro-batch, broadcast-sized) then counted per
    market segment; complete-mode AvailableNow equals the batch join —
    the oracle."""
    from etl_mark1_spark.streaming.events import (
        enrich_stream, read_events_stream, run_available_now)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    dim = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = enrich_stream(stream, dim,
                           F.col("user_id") == F.col("c_custkey"))
    counted = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"))
    return run_available_now(counted, table_name="stream_enrich_out",
                             output_mode="complete")


@query("streaming_bloom_filter", """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE user_id IN (SELECT c_custkey FROM customer
                      WHERE c_mktsegment = 'BUILDING')
    GROUP BY event_type
""")
def streaming_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-side membership screening with the Bloom prefilter
    (operators/bloom.py) inside Structured Streaming: events from
    BUILDING-segment customers, counted per type. The bloom probe is a
    stateless pure expression, so the definite-non-member majority of
    the stream is dropped IN the micro-batch map stage — no state store,
    no join — and only bloom survivors reach the exact stream-static
    semi-join confirm. Complete-mode AvailableNow equals the batch
    semi-join oracle because the filter has no false negatives."""
    from etl_mark1_spark.operators.bloom import (bloom_maybe_contains,
                                                 build_bloom,
                                                 optimal_num_bits,
                                                 optimal_num_hashes)
    from etl_mark1_spark.streaming.events import (read_events_stream,
                                                  run_available_now)

    ref = (t(spark, sf_dir, "customer")
           .filter(F.col("c_mktsegment") == "BUILDING")
           .select(F.col("c_custkey").cast("long").alias("user_id")))
    n = ref.count()
    m = optimal_num_bits(n, fpp=0.01)
    k = optimal_num_hashes(m, n)
    words = build_bloom(ref, "user_id", m, k)

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    maybe = bloom_maybe_contains(F.col("user_id").cast("long"), words, m, k)
    confirmed = (stream.filter(maybe)
                 .join(ref, "user_id", "left_semi"))
    counted = confirmed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return run_available_now(counted, table_name="stream_bloom_out",
                             output_mode="complete")


