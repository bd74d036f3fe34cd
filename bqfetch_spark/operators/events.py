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
from bqfetch_spark.session import shuffle_partitions

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


SESSION_WINDOW_ORACLE = """
WITH ordered AS (
  SELECT
    user_id, event_id, ts, value,
    CASE
      WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
      WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           >= 1800000000 THEN 1
      ELSE 0
    END AS is_new_session
  FROM events
),
sessions AS (
  SELECT
    user_id, ts, value,
    sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM ordered
)
SELECT
  user_id,
  min(ts) AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  count(*) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS session_value
FROM sessions
GROUP BY user_id, session_seq
"""


@register("q84_session_window", oracle=SESSION_WINDOW_ORACLE, tags=("events", "session"))
def q84_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window operator — the
    same 30-min-gap semantics as q31's lag+cumsum idiom but expressed
    as a single groupBy, which Catalyst plans as one MergingSessions
    aggregate on a user_id exchange (no window-function sort pass),
    and which carries unchanged into Structured Streaming.

    Boundary pin (both engines): an event exactly gap after its
    predecessor starts a NEW session — session windows are [start,
    end) with end = last_ts + gap, so the oracle's new-session test is
    `>=`, not q31's `>`."""
    ev = load_catalog(spark, sf_dir).table("events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r6(F.sum(F.col("value").cast(DEC_VALUE)).cast("double")).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


MULTI_GRAIN_ORACLE = """
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
         count(*) AS n_events,
         sum(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1
)
SELECT 'hour' AS grain, bucket_start, n_events, round(CAST(v AS DOUBLE), 6) AS total_value
FROM hourly
UNION ALL
SELECT 'day', CAST(date_trunc('day', bucket_start) AS TIMESTAMP),
       CAST(sum(n_events) AS BIGINT), round(CAST(sum(v) AS DOUBLE), 6)
FROM hourly GROUP BY 2
UNION ALL
SELECT 'week', CAST(date_trunc('week', bucket_start) AS TIMESTAMP),
       CAST(sum(n_events) AS BIGINT), round(CAST(sum(v) AS DOUBLE), 6)
FROM hourly GROUP BY 2
"""


@register("q85_multi_grain_rollup", oracle=MULTI_GRAIN_ORACLE, tags=("events", "rollup"))
def q85_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hour, day, and week
    aggregates of `events` in one job — the coarser grains re-aggregate
    the HOURLY PARTIALS (sum-of-sums over exact decimals; decimal
    addition is associative so sum-of-sums is bit-identical to a flat
    sum), never the raw table, so each re-agg shuffles only
    bucket-count rows (calendar-bounded, not data-bounded — the
    property that matters at 100 TB of events).

    The hourly aggregate is MATERIALIZED (localCheckpoint) before
    fan-out — exactly what a continuous-aggregate/hypertable system
    does with its finest grain. Without the barrier Catalyst re-scans
    the raw table once per union branch: the branches' date_trunc
    expression ids differ, so ReuseExchange never fires (verified on
    the explain output); with it, raw data is scanned exactly once and
    the checkpointed state is bucket-count rows, tiny at any scale."""
    ev = load_catalog(spark, sf_dir).table("events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket_start")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC_VALUE)).alias("v"),
    ).localCheckpoint(eager=True)
    daily = hourly.groupBy(F.date_trunc("day", "bucket_start").alias("bucket_start")).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("v").alias("v"),
    )
    weekly = hourly.groupBy(F.date_trunc("week", "bucket_start").alias("bucket_start")).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.sum("v").alias("v"),
    )

    def leveled(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket_start",
            "n_events",
            r6(F.col("v").cast("double")).alias("total_value"),
        )

    return leveled(hourly, "hour").unionByName(leveled(daily, "day")).unionByName(
        leveled(weekly, "week")
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


# ---------------------------------------------------------------------------
# q89: funnel analysis (ordered event-sequence matching)
# ---------------------------------------------------------------------------

FUNNEL_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN event_type = 'view' THEN ts END AS view_ts,
    min(CASE WHEN event_type = 'view' THEN ts END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_view
  FROM events
),
clicked AS (
  SELECT *,
    min(click_q) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_click
  FROM (
    SELECT *, CASE WHEN event_type = 'click' AND first_view IS NOT NULL THEN ts END AS click_q
    FROM flagged
  )
),
users AS (
  SELECT
    user_id,
    min(view_ts) AS u_view,
    min(click_q) AS u_click,
    min(CASE WHEN event_type = 'purchase' AND first_click IS NOT NULL THEN ts END) AS u_purchase
  FROM clicked
  GROUP BY user_id
)
SELECT
  CAST(count(u_view) AS BIGINT) AS n_view_users,
  CAST(count(u_click) AS BIGINT) AS n_click_users,
  CAST(count(u_purchase) AS BIGINT) AS n_purchase_users,
  round(CAST(count(u_click) AS DOUBLE) / nullif(count(u_view), 0), 6) AS view_to_click,
  round(CAST(count(u_purchase) AS DOUBLE) / nullif(count(u_click), 0), 6) AS click_to_purchase
FROM users
"""


@register("q89_funnel", oracle=FUNNEL_ORACLE, tags=("events", "funnel"))
def q89_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER their first qualified click — sequence
    matching via running-min window chains, the single-scan spelling
    (the join spelling re-reads events once per stage; this one scans
    once, and both window passes share one (user_id) sort, so the
    whole funnel costs a single exchange).

    Tie policy, pinned in both engines: events ordered by (ts,
    event_id); a click at the same ts as the first view qualifies iff
    it sorts after it."""
    ev = load_catalog(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_type = lambda t: F.col("event_type") == t  # noqa: E731
    view_ts = F.when(is_type("view"), F.col("ts"))
    flagged = ev.withColumn("view_ts", view_ts).withColumn(
        "first_view", F.min(view_ts).over(w)
    )
    click_q = F.when(is_type("click") & F.col("first_view").isNotNull(), F.col("ts"))
    clicked = flagged.withColumn("click_q", click_q).withColumn(
        "first_click", F.min(click_q).over(w)
    )
    purchase_q = F.when(is_type("purchase") & F.col("first_click").isNotNull(), F.col("ts"))
    users = clicked.groupBy("user_id").agg(
        F.min("view_ts").alias("u_view"),
        F.min("click_q").alias("u_click"),
        F.min(purchase_q).alias("u_purchase"),
    )
    n_view = F.count("u_view")
    n_click = F.count("u_click")
    n_purchase = F.count("u_purchase")
    return users.agg(
        n_view.cast("bigint").alias("n_view_users"),
        n_click.cast("bigint").alias("n_click_users"),
        n_purchase.cast("bigint").alias("n_purchase_users"),
        r6(n_click.cast("double") / F.nullif(n_view, F.lit(0))).alias("view_to_click"),
        r6(n_purchase.cast("double") / F.nullif(n_click, F.lit(0))).alias("click_to_purchase"),
    )


# ---------------------------------------------------------------------------
# q92: last-touch attribution (self as-of via one running window)
# ---------------------------------------------------------------------------

# (ts, event_id) encoded as one lexicographically ordered string so a
# single running MAX finds "latest prior click" identically in both
# engines (a struct-max inside a window frame is not portable SQL)
_CLICK_KEY_SQL = (
    "concat(lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0'),"
    " lpad(CAST(event_id AS VARCHAR), 10, '0'))"
)

ATTRIBUTION_ORACLE = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
    max(CASE WHEN event_type = 'click' THEN {_CLICK_KEY_SQL} END)
      OVER (PARTITION BY user_id
            ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_key
  FROM events
  WHERE event_type IN ('click', 'purchase')
)
SELECT
  user_id,
  event_id AS purchase_id,
  ts AS purchase_ts,
  CAST(substring(click_key, 21, 10) AS BIGINT) AS click_id,
  make_timestamp(CAST(substring(click_key, 1, 20) AS BIGINT)) AS click_ts,
  value
FROM tagged
WHERE kind = 0
"""


@register("q92_attribution", oracle=ATTRIBUTION_ORACLE, tags=("events", "attribution"))
def q92_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase joined to the user's most
    recent STRICTLY PRIOR click — an as-of self-join, spelled as the
    union-scan running-window idiom (q37): one scan, one user_id
    exchange, no per-row range join. Purchases sort before
    same-timestamp clicks, so a click at the purchase's exact ts never
    attributes (tie policy pinned in both engines). The (ts, event_id)
    pair rides the frame as one zero-padded sortable string because a
    running struct-max is not portable oracle SQL."""
    ev = load_catalog(spark, sf_dir).table("events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    kind = F.when(F.col("event_type") == "purchase", 0).otherwise(1)
    click_key = F.when(
        F.col("event_type") == "click",
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 10, "0"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", kind, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.withColumn("kind", kind).withColumn("click_key", F.max(click_key).over(w))
    return tagged.filter(F.col("kind") == 0).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.substring("click_key", 21, 10).cast("bigint").alias("click_id"),
        F.timestamp_micros(F.substring("click_key", 1, 20).cast("bigint")).alias("click_ts"),
        "value",
    )


# ---------------------------------------------------------------------------
# q93: cohort retention
# ---------------------------------------------------------------------------

COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
  FROM events
)
SELECT
  f.cohort_week,
  CAST(datediff('day', f.cohort_week, a.active_week) // 7 AS INTEGER) AS week_offset,
  CAST(count(*) AS BIGINT) AS n_users
FROM activity a JOIN firsts f ON a.user_id = f.user_id
GROUP BY 1, 2
"""


@register("q93_cohort_retention", oracle=COHORT_ORACLE, tags=("events", "cohort"))
def q93_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted in every later week they return — the (cohort_week,
    week_offset) -> n_users table behind every retention curve.

    One user_id exchange serves the first-event aggregate, the
    distinct (user, week) activity set, AND their join; the final
    matrix agg shuffles only cohort-sized rows (weeks², not events)."""
    ev = load_catalog(spark, sf_dir).table("events")
    base = ev.select("user_id", F.date_trunc("week", "ts").alias("active_week")).repartition(
        shuffle_partitions(spark), "user_id"
    )
    firsts = base.groupBy("user_id").agg(F.min("active_week").alias("cohort_week"))
    activity = base.dropDuplicates(["user_id", "active_week"])
    return (
        activity.join(firsts.hint("shuffle_hash"), "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# q94: rolling distinct users via mergeable HLL sketches
# ---------------------------------------------------------------------------


ROLLING_HLL_ORACLE = """
WITH daily AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
  FROM events
),
fanned AS (
  SELECT daily.day + o * INTERVAL '1 day' AS day, user_id
  FROM daily CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o)
),
rolled AS (
  SELECT
    day,
    count(DISTINCT user_id) AS exact_users_7d,
    abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
      <= 0.05 * count(DISTINCT user_id) AS sketch_within_5pct
  FROM fanned GROUP BY day
)
SELECT r.* FROM rolled r SEMI JOIN daily d ON r.day = d.day
"""


@register(
    "q94_rolling_distinct_hll",
    oracle=ROLLING_HLL_ORACLE,
    tags=("events", "sketch", "window-agg"),
)
def q94_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, the sketch way: one HLL
    sketch per day (hll_sketch_agg over the raw events — map-side
    partial, fixed-size state), then each day UNIONS the sketches of
    its trailing window (hll_union_agg) and estimates.

    This is THE scale pattern for rolling distincts: daily distinct
    counts cannot be summed across days, and an exact rolling
    count-distinct re-scans every event 7 times. Sketches make the
    rolling pass day-granular: 7 × ~1.5 KB binaries per output row,
    independent of event volume.

    Bounded oracle (upgraded from rows-only, round 6): raw HLL
    estimates differ across engines, so both sides emit the exact
    trailing-7d distinct plus a within-±5% assertion on their OWN
    sketch — hash matches iff the exact rollups agree and each
    engine's sketch is in-band. The exact leg exists for the oracle
    contract; at 100 TB you run only the sketch half."""
    ev = load_catalog(spark, sf_dir).table("events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    # each day contributes its sketch to itself and the 6 following
    # days: explode a 0..6 offset, re-key, union per target day
    offsets = F.explode(F.sequence(F.lit(0), F.lit(6)))
    fanned = daily.withColumn("offset", offsets).select(
        F.timestamp_seconds(
            F.unix_timestamp("day") + F.col("offset").cast("long") * 86400
        ).alias("day"),
        "sketch",
    )
    approx = fanned.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users_7d")
    )
    # exact leg: distinct (day, user) pairs fan out over the same
    # 7-day window — one extra exchange at day grain, oracle-only cost
    pairs = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    exact = (
        pairs.withColumn("offset", offsets)
        .select(
            F.timestamp_seconds(
                F.unix_timestamp("day") + F.col("offset").cast("long") * 86400
            ).alias("day"),
            "user_id",
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_users_7d"))
    )
    return (
        exact.join(approx, "day")
        .join(daily.select("day"), "day", "left_semi")  # real days only
        .select(
            "day",
            "exact_users_7d",
            (
                F.abs(F.col("approx_users_7d") - F.col("exact_users_7d"))
                <= 0.05 * F.col("exact_users_7d")
            ).alias("sketch_within_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# qx162 — debounce: collapse rapid-fire repeats of the same event key
# ---------------------------------------------------------------------------

DEBOUNCE_SECONDS = 600  # 10 minutes

DEBOUNCE_ORACLE = f"""
WITH g AS (
  SELECT event_id, user_id, event_type, ts,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT event_id, user_id, event_type, ts,
       CAST(coalesce(gap_us // 1000000, -1) AS BIGINT) AS gap_s
FROM g
WHERE gap_us IS NULL OR gap_us > {DEBOUNCE_SECONDS} * 1000000
"""


@register(
    "qx162_debounce",
    oracle=DEBOUNCE_ORACLE,
    doc="Debounce: drop events within 10min of the previous same-key event",
    tags=("events", "dedup", "sequence"),
)
def qx162_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event debouncing — the clickstream-hygiene pass that collapses
    rapid-fire repeats (double-clicks, retry storms, bot bursts): an
    event survives iff it is the first for its (user_id, event_type)
    key or arrived more than DEBOUNCE_SECONDS after the PREVIOUS
    event of that key (lag-based gap semantics — each event is judged
    against its immediate predecessor). One hash exchange on the key,
    one lag window per partition; at 100 TB this is the same
    partition-and-scan shape as sessionization (q31), and the
    streaming spelling is a 1-element GroupState keeping last-seen ts.
    gap_s = -1 marks key-first events (NULL gap), kept by
    definition."""
    ev = load_catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_us = (
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    )
    return (
        ev.select("event_id", "user_id", "event_type", "ts", gap_us.alias("gap_us"))
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") > DEBOUNCE_SECONDS * 1_000_000))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            F.coalesce(F.expr("gap_us div 1000000"), F.lit(-1)).cast("bigint").alias("gap_s"),
        )
    )


# ---------------------------------------------------------------------------
# qx163 — per-key rate limiting (keep first N per key per window)
# ---------------------------------------------------------------------------

RATE_LIMIT_N = 3  # events kept per (user, hour)

RATE_LIMIT_ORACLE = f"""
SELECT event_id, user_id, ts,
       CAST(rn AS BIGINT) AS slot,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start
FROM (
  SELECT event_id, user_id, ts,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn <= {RATE_LIMIT_N}
"""


@register(
    "qx163_rate_limit",
    oracle=RATE_LIMIT_ORACLE,
    doc="Rate limit: keep the first 3 events per (user, hour)",
    tags=("events", "sampling", "sequence"),
)
def qx163_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key rate limiting / throttling — cap a key's contribution
    per time window (the ingestion guard against hot users and bot
    floods, and the per-source example-cap rule of a training-data
    pipeline applied on the time axis): keep the earliest
    RATE_LIMIT_N events per (user_id, hour), deterministic total
    order (ts, event_id). One exchange on (user_id, hour) — the
    window key joins the partition key, so a hot user's traffic still
    spreads across hour partitions instead of one reducer, which is
    what makes this shape safe under the exact skew it exists to
    police."""
    ev = load_catalog(spark, sf_dir).table("events")
    win = F.date_trunc("hour", F.col("ts"))
    w = Window.partitionBy("user_id", win).orderBy("ts", "event_id")
    return (
        ev.withColumn("slot", F.row_number().over(w).cast("bigint"))
        .filter(F.col("slot") <= RATE_LIMIT_N)
        .select("event_id", "user_id", "ts", "slot", win.alias("window_start"))
    )


# ---------------------------------------------------------------------------
# qx203 — peak interval concurrency (sweep line over ±1 deltas)
# ---------------------------------------------------------------------------

CONCURRENCY_HOLD_MIN = 10  # each event holds a resource for 10 minutes

PEAK_CONCURRENCY_ORACLE = f"""
WITH deltas AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL {CONCURRENCY_HOLD_MIN} MINUTE, -1 FROM events
),
walked AS (
  SELECT event_type, t, delta,
         sum(delta) OVER (ORDER BY event_type, t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM deltas
),
peaks AS (
  SELECT event_type, max(cum) AS peak FROM walked GROUP BY event_type
)
SELECT w.event_type,
       CAST(p.peak AS BIGINT) AS peak_concurrency,
       min(w.t) AS first_peak_at
FROM walked w JOIN peaks p
  ON p.event_type = w.event_type AND w.cum = p.peak
GROUP BY w.event_type, p.peak
"""


@register(
    "qx203_peak_concurrency",
    oracle=PEAK_CONCURRENCY_ORACLE,
    doc="peak concurrent 10-minute event intervals per type (sweep line)",
    tags=("events", "temporal", "sweep-line"),
)
def qx203_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency — the capacity-planning sweep line: each event
    holds a resource for CONCURRENCY_HOLD_MIN minutes; the answer is
    the maximum number of simultaneously-open intervals per type (and
    when it is first reached). The classic spelling is ±1 deltas at
    interval starts/ends walked in time order with a running sum.

    Scale shape — the reason this operator is interesting on Spark:
    the walk needs a PER-TYPE time ordering, and a per-type window is
    a skew trap (one hot type = one giant sorting task). Instead the
    deltas ride plans/ranks' bucket-exchange GLOBAL cumsum ordered by
    (event_type, t, delta) — and because every +1 has a matching −1,
    each type's deltas sum to zero, so the global running sum RESETS
    to exactly zero at every type boundary and IS the per-type
    concurrency walk. No per-type task ever sorts more than one range
    partition. Ordering (t, delta) processes interval ENDS before the
    starts sharing their timestamp (half-open [t, t+10min)); ties
    among equal (t, delta) rows permute prefix values without
    changing the prefix-value multiset, so the max is deterministic.
    first_peak_at is the min t attaining the peak — deterministic,
    ties collapse."""
    from bqfetch_spark.plans.ranks import with_global_cumsum
    from bqfetch_spark.session import shuffle_partitions

    ev = load_catalog(spark, sf_dir).table("events").select("event_type", "ts")
    starts = ev.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr(f"INTERVAL {CONCURRENCY_HOLD_MIN} MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionByName(ends)
    walked = with_global_cumsum(
        deltas, ["event_type", "t", "delta"], "delta",
        shuffle_partitions(spark), "cum",
    )
    peaks = walked.groupBy("event_type").agg(F.max("cum").alias("peak"))
    return (
        walked.join(F.broadcast(peaks), "event_type")
        .filter(F.col("cum") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("t").alias("first_peak_at"))
        .select(
            "event_type",
            F.col("peak").cast("bigint").alias("peak_concurrency"),
            "first_peak_at",
        )
    )


# ---------------------------------------------------------------------------
# qx245: watermark late-data audit (streaming admission replayed in batch)
# ---------------------------------------------------------------------------

WM_DELAY_MOD = 3600  # synthetic network delay: md5(event_id) % 1h, seconds
WM_LATENESS = 1800  # watermark horizon W (seconds)

LATE_AUDIT_ORACLE = f"""
WITH e AS (
  SELECT event_id, ts,
         epoch_us(ts) AS ev_us,
         epoch_us(ts) + (CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4)
                               AS BIGINT) % {WM_DELAY_MOD}) * 1000000 AS arr_us
  FROM events
),
wm AS (
  SELECT event_id, ts, ev_us, arr_us,
         max(ev_us) OVER (ORDER BY arr_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_us
  FROM e
)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN hwm_us IS NOT NULL
                      AND ev_us < hwm_us - {WM_LATENESS} * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late_dropped,
       CAST(max(arr_us - ev_us) // 1000000 AS BIGINT) AS max_lag_s
FROM wm
GROUP BY 1
ORDER BY 1
"""


@register(
    "qx245_late_data_audit",
    oracle=LATE_AUDIT_ORACLE,
    doc="watermark admission replayed in batch: per-window late-drop counts under horizon W",
    tags=("events", "streaming-semantics", "audit"),
)
def qx245_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a streaming watermark WOULD have dropped, computed in
    batch — the audit a pipeline runs before picking its lateness
    horizon (too small silently drops data; too big holds state). Each
    event gets a deterministic synthetic arrival time (event time + an
    md5-hashed delay < {WM_DELAY_MOD}s — rerun-stable, engine-portable);
    the watermark at an event's arrival is the EXCLUSIVE running max
    of event time in arrival order minus W — exactly Spark's
    high-water-mark rule, replayed as one global exclusive cummax.
    Output per event-time hour: events, would-be-dropped count, and
    the worst arrival lag.

    Scale shape: the cummax is plans/ranks.with_global_cummax_excl —
    the adaptive one-shuffle bucket spelling (max is associative, so
    it decomposes like the rank offsets); everything after is one
    partial-aggregated hourly rollup. No single-task sort of the
    stream's history."""
    from bqfetch_spark.plans.ranks import with_global_cummax_excl

    ev = load_catalog(spark, sf_dir).table("events").select("event_id", "ts")
    delay_s = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % WM_DELAY_MOD
    )
    e = ev.select(
        "event_id",
        "ts",
        (F.unix_micros("ts")).alias("ev_us"),
        (F.unix_micros("ts") + delay_s * F.lit(1_000_000)).alias("arr_us"),
    )
    wm = with_global_cummax_excl(
        e, ["arr_us", "event_id"], "ev_us", shuffle_partitions(spark), "hwm_us"
    )
    late = F.col("hwm_us").isNotNull() & (
        F.col("ev_us") < F.col("hwm_us") - F.lit(WM_LATENESS * 1_000_000)
    )
    return (
        wm.groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(late.cast("int")).cast("bigint").alias("n_late_dropped"),
            F.floor(F.max(F.col("arr_us") - F.col("ev_us")) / 1_000_000)
            .cast("bigint")
            .alias("max_lag_s"),
        )
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# qx256: watermark horizon sweep (late% per candidate W, one pass)
# ---------------------------------------------------------------------------

WM_SWEEP = (300, 900, 1800, 3600)  # candidate horizons, seconds

_sweep_cols_sql = ",\n       ".join(
    f"CAST(sum(CASE WHEN hwm_us IS NOT NULL AND ev_us < hwm_us - CAST({w} AS BIGINT) * 1000000 "
    f"THEN 1 ELSE 0 END) AS BIGINT) AS n_late_w{w}"
    for w in WM_SWEEP
)

WM_SWEEP_ORACLE = f"""
WITH e AS (
  SELECT event_id,
         epoch_us(ts) AS ev_us,
         epoch_us(ts) + (CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4)
                               AS BIGINT) % {WM_DELAY_MOD}) * 1000000 AS arr_us
  FROM events
),
wm AS (
  SELECT ev_us, arr_us,
         max(ev_us) OVER (ORDER BY arr_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_us
  FROM e
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       {_sweep_cols_sql}
FROM wm
"""


@register(
    "qx256_watermark_sweep",
    oracle=WM_SWEEP_ORACLE,
    doc="late-drop counts for every candidate watermark horizon in one stream pass",
    tags=("events", "streaming-semantics", "audit"),
)
def qx256_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision table behind qx245: would-be-dropped counts for
    EVERY candidate lateness horizon ({', '.join(str(w) for w in WM_SWEEP)}s),
    computed in ONE pass — the high-water mark is horizon-independent,
    so one exclusive global cummax feeds all the per-W conditional
    sums (k horizons cost k expressions, not k stream replays). This
    is the table an operator actually reads before setting
    withWatermark: pick the knee where additional state horizon stops
    buying admitted data.

    Scale shape: identical to qx245 (adaptive one-shuffle cummax) plus
    a single 1-row partial-aggregated final."""
    from bqfetch_spark.plans.ranks import with_global_cummax_excl

    ev = load_catalog(spark, sf_dir).table("events").select("event_id", "ts")
    delay_s = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % WM_DELAY_MOD
    )
    e = ev.select(
        "event_id",
        F.unix_micros("ts").alias("ev_us"),
        (F.unix_micros("ts") + delay_s * F.lit(1_000_000)).alias("arr_us"),
    )
    wm = with_global_cummax_excl(
        e, ["arr_us", "event_id"], "ev_us", shuffle_partitions(spark), "hwm_us"
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_events")]
    for w in WM_SWEEP:
        late = F.col("hwm_us").isNotNull() & (
            F.col("ev_us") < F.col("hwm_us") - F.lit(w * 1_000_000)
        )
        aggs.append(F.sum(late.cast("int")).cast("bigint").alias(f"n_late_w{w}"))
    return wm.agg(*aggs)
