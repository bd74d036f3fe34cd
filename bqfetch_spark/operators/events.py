"""Event-stream analytics over the `events` table (SURVEY.md §2.C
C16-C17, C21) — batch idioms; the Structured Streaming incremental
variants live in bqfetch_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.operators.relational import r6
from bqfetch_spark.registry import register

DEC_VALUE = "decimal(18,6)"

TUMBLING_ORACLE = """
SELECT
  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
  event_type,
  count(*) AS n_events,
  count(DISTINCT user_id) AS n_users,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
FROM events
GROUP BY 1, 2
"""


@register("q30_tumbling_window", oracle=TUMBLING_ORACLE, tags=("events", "window-agg"))
def q30_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window — the same operator a
    readStream + watermark pipeline uses, here in batch mode. Single
    shuffle on (window, event_type)."""
    ev = load_catalog(spark, sf_dir).table("events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            r6(F.sum(F.col("value").cast(DEC_VALUE)).cast("double")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "total_value",
        )
    )


SESSION_ORACLE = """
WITH ordered AS (
  SELECT
    user_id, event_id, ts, value,
    CASE
      WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
      WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           > 1800000000 THEN 1
      ELSE 0
    END AS is_new_session
  FROM events
),
sessions AS (
  SELECT
    user_id, event_id, ts, value,
    sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM ordered
)
SELECT
  user_id,
  CAST(session_seq AS BIGINT) AS session_seq,
  count(*) AS n_events,
  min(ts) AS session_start,
  max(ts) AS session_end,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS session_value
FROM sessions
GROUP BY user_id, session_seq
"""


@register("q31_sessionization", oracle=SESSION_ORACLE, tags=("events", "session"))
def q31_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-min inactivity gap via lag + cumulative
    sum of session-start flags (SURVEY.md §7 step 5). One shuffle on
    user_id serves both windows and the final agg (same key)."""
    ev = load_catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    is_new = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("is_new_session", is_new)
        .withColumn("session_seq", F.sum("is_new_session").over(cum).cast("bigint"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            r6(F.sum(F.col("value").cast(DEC_VALUE)).cast("double")).alias("session_value"),
        )
    )


SKEW_ORACLE = """
WITH counts AS (
  SELECT event_type AS value, count(*) AS cnt FROM events GROUP BY event_type
),
stats AS (
  SELECT avg(cnt) AS mean_cnt FROM counts
)
SELECT
  value,
  cnt,
  round(mean_cnt, 6) AS mean_cnt,
  round(abs(cnt - mean_cnt) / mean_cnt, 6) AS dispersion,
  CAST(abs(cnt - mean_cnt) > 0.25 * mean_cnt AS BOOLEAN) AS is_dispersed
FROM counts, stats
"""


@register("q32_skew_report", oracle=SKEW_ORACLE, tags=("events", "stats"))
def q32_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dispersion diagnostic (bqfetch/bqfetch.py:410-419:
    values outside ±25% of the mean count) as a first-class operator.
    Mean is a 1-row broadcast-joined scalar, not a collect."""
    ev = load_catalog(spark, sf_dir).table("events")
    counts = ev.groupBy(F.col("event_type").alias("value")).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(F.avg("cnt").alias("mean_cnt"))
    return counts.crossJoin(F.broadcast(stats)).select(
        "value",
        "cnt",
        r6(F.col("mean_cnt")).alias("mean_cnt"),
        r6(F.abs(F.col("cnt") - F.col("mean_cnt")) / F.col("mean_cnt")).alias("dispersion"),
        (F.abs(F.col("cnt") - F.col("mean_cnt")) > 0.25 * F.col("mean_cnt")).alias("is_dispersed"),
    )


JSON_ORACLE = """
SELECT
  event_type,
  count(*) AS n_events,
  round(CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_k,
  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


@register("q33_json_extract", oracle=JSON_ORACLE, tags=("events", "json"))
def q33_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload: get_json_object on the props column —
    JVM-side JSON path evaluation, no Python UDF."""
    ev = load_catalog(spark, sf_dir).table("events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        r6(F.sum(k.cast(DEC_VALUE)).cast("double")).alias("total_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )
