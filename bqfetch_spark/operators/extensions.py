"""Round-5 extension operators — analytics/curation shapes beyond the
round-4 inventory (SURVEY.md §2 extensions; none exist in the reference,
which is a fetch client — bqfetch/bqfetch.py:1 has no query layer):

- qx104 arbitrary GROUPING SETS (completes the C13 rollup/cube/pivot
  family with non-hierarchical set lists)
- qx105 training-window document chunking (fixed-size/stride text
  windows — the map step every LLM pre-tokenization pipeline runs)
- qx106 statistical outlier flags (exact decimal moments -> z-scores)
- qx107 token co-occurrence (vocab-bounded pair mining)
- qx108 fuzzy string join (length-banded levenshtein blocking)
- qx109 relational division ("for all" membership)

Naming: the driver's CORRECTNESS file caps at the first 50 sorted query
names; ``qx…`` sorts after every ``q\\d…`` name so these never displace
an existing driver-green row (they are covered by the identical pytest
oracle gate and CORRECTNESS_SELF artifact instead).

Determinism: the registry conventions (decimal-exact accumulation,
round-6 surfacing, unique tie-break keys on every top-k boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.operators.relational import dsum, r6
from bqfetch_spark.registry import register

# ---------------------------------------------------------------------------
# qx104 — arbitrary GROUPING SETS (C13 family completion)
# ---------------------------------------------------------------------------

GROUPING_SETS_ORACLE = """
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
  CAST(GROUPING(CAST(year(o_orderdate) AS INT)) AS INT) AS g_year,
  CAST(count(*) AS BIGINT) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(16,6))) AS DOUBLE), 6) AS revenue
FROM orders
GROUP BY GROUPING SETS (
  (o_orderstatus, o_orderpriority),
  (o_orderstatus, CAST(year(o_orderdate) AS INT)),
  (CAST(year(o_orderdate) AS INT))
)
"""


@register(
    "qx104_grouping_sets",
    oracle=GROUPING_SETS_ORACLE,
    doc="arbitrary (non-hierarchical) grouping-set lists with grouping flags",
    tags=("relational", "grouping-sets"),
)
def qx104_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS with a set list neither rollup nor cube
    can express: {(status, priority), (status, year), (year)} — the
    (priority)-alone and () sets are absent, (status, year) crosses
    dimensions. One scan, one expand+exchange: Spark plans grouping
    sets as a single Expand over the base rows, so the cost is 3x the
    row stream into ONE hash aggregate — no per-set rescans, which is
    what makes this shape usable at 100 TB.

    Per-column grouping flags (not a combined grouping_id) keep the
    oracle portable — bit order of GROUPING_ID is engine-defined,
    per-column GROUPING() is SQL standard in both engines."""
    o = load_catalog(spark, sf_dir).table("orders").withColumn("o_year", F.year("o_orderdate"))
    return o.groupingSets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus", "o_year"], ["o_year"]],
        "o_orderstatus",
        "o_orderpriority",
        "o_year",
    ).agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping("o_year").cast("int").alias("g_year"),
        F.count("*").cast("bigint").alias("n_orders"),
        r6(dsum(F.col("o_totalprice"))).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# qx105 — training-window document chunking (LLM pre-tokenization map)
# ---------------------------------------------------------------------------

CHUNK_LEN = 120
CHUNK_STRIDE = 80

DOC_CHUNK_ORACLE = f"""
WITH ch AS (
  SELECT
    doc_id,
    text,
    unnest(range(0, CAST(ceil(length(text) / {CHUNK_STRIDE}.0) AS BIGINT))) AS chunk_idx
  FROM documents
  WHERE length(text) > 0
)
SELECT
  doc_id,
  CAST(chunk_idx AS BIGINT) AS chunk_idx,
  CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS BIGINT) AS chunk_start,
  CAST(length(substr(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_LEN}))
       AS BIGINT) AS chunk_len,
  md5(substr(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_LEN})) AS chunk_md5
FROM ch
"""


@register(
    "qx105_doc_chunking",
    oracle=DOC_CHUNK_ORACLE,
    doc=f"fixed-size ({CHUNK_LEN}) / stride ({CHUNK_STRIDE}) overlapping text windows per document",
    tags=("llm", "chunking", "explode"),
)
def qx105_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into fixed-size overlapping character
    windows (size 120, stride 80) — the context-window chunking step
    that precedes tokenization in a training-data pipeline. Purely a
    narrow map (sequence + explode + substring, all JVM codegen): no
    exchange, no Python, scales linearly with corpus bytes and keeps
    whatever partitioning the scan produced. Chunk text is surfaced as
    md5 so the result stays narrow; chunk_len shows the ragged tail."""
    docs = load_catalog(spark, sf_dir).table("documents").filter(F.length("text") > 0)
    n_chunks = F.ceil(F.length("text") / F.lit(float(CHUNK_STRIDE))).cast("bigint")
    chunk = F.expr(
        f"substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_LEN})"
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            (F.col("chunk_idx") * CHUNK_STRIDE + 1).cast("bigint").alias("chunk_start"),
            chunk.alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_start",
            F.length("chunk").cast("bigint").alias("chunk_len"),
            F.md5("chunk").alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# qx106 — statistical outlier flags (exact moments -> z-score)
# ---------------------------------------------------------------------------

ZSCORE_ORACLE = """
WITH s AS (
  SELECT
    event_type,
    count(*) AS n,
    sum(CAST(value AS DECIMAL(18,6))) AS s,
    sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS sq
  FROM events
  GROUP BY event_type
)
SELECT
  event_id,
  e.event_type,
  value,
  round((value - CAST(s.s AS DOUBLE) / n)
        / sqrt((CAST(sq AS DOUBLE) - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE) / n)
               / (n - 1)), 6) AS zscore
FROM events e JOIN s ON e.event_type = s.event_type
WHERE abs((value - CAST(s.s AS DOUBLE) / n)
          / sqrt((CAST(sq AS DOUBLE) - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE) / n)
                 / (n - 1))) > 3
"""


@register(
    "qx106_zscore_outliers",
    oracle=ZSCORE_ORACLE,
    doc="per-event-type z-score outlier flags from exact decimal moments",
    tags=("stats", "anomaly"),
)
def qx106_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag events whose value sits more than 3 sample standard
    deviations from its event-type mean. Two-pass shape: (1) one
    partial-aggregated groupBy computes count/sum/sum-of-squares per
    type — the moments are accumulated in DECIMAL so both engines see
    bit-identical sums regardless of partitioning or add order (double
    accumulation would drift with parallelism); (2) the tiny per-type
    stats frame is broadcast back onto the event stream, so the flag
    pass is exchange-free. mean/variance/z are then derived in double
    with the expression written identically to the oracle (same
    operation order -> same IEEE result)."""
    ev = load_catalog(spark, sf_dir).table("events")
    d = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d).alias("s"),
        F.sum(d * d).alias("sq"),
    )
    j = ev.join(F.broadcast(stats), "event_type")
    mean = F.col("s").cast("double") / F.col("n")
    # try_divide: a singleton group (n=1) or zero-variance group must
    # yield NULL z (filtered out, matching the oracle's NaN falling out
    # of the > 3 predicate), not an ANSI DIVIDE_BY_ZERO crash
    var = F.try_divide(
        F.col("sq").cast("double") - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n"),
        (F.col("n") - 1).cast("double"),
    )
    z = F.try_divide(F.col("value") - mean, F.sqrt(var))
    return j.where(F.abs(z) > 3).select(
        "event_id", "event_type", "value", r6(z).alias("zscore")
    )


# ---------------------------------------------------------------------------
# qx107 — token co-occurrence (vocab-bounded pair mining)
# ---------------------------------------------------------------------------

COOCCUR_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
occ AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
vocab AS (SELECT token FROM occ ORDER BY n DESC, token LIMIT 200),
dt AS (
  SELECT DISTINCT doc_id, token FROM tok
  WHERE token IN (SELECT token FROM vocab)
),
pairs AS (
  SELECT a.token AS t1, b.token AS t2, count(*) AS n_docs
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY a.token, b.token
)
SELECT t1, t2, CAST(n_docs AS BIGINT) AS n_docs
FROM (
  SELECT t1, t2, n_docs,
         row_number() OVER (ORDER BY n_docs DESC, t1, t2) AS rn
  FROM pairs
)
WHERE rn <= 50
"""


@register(
    "qx107_token_cooccurrence",
    oracle=COOCCUR_ORACLE,
    doc="top-50 co-occurring token pairs within a broadcast top-200 vocabulary",
    tags=("text", "cooccurrence"),
)
def qx107_token_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top document-co-occurrence pairs, vocabulary-bounded: global
    token counts pick a top-200 vocab (TakeOrderedAndProject — no full
    sort), the distinct (doc, token) stream is semi-joined against the
    BROADCAST vocab, and pairs come from a doc_id equi-self-join. The
    vocab bound is the scale control: per-doc pair fan-out is capped at
    C(|vocab|,2) regardless of corpus size, so the pair stream grows
    linearly with documents — the unbounded-vocabulary spelling would
    be quadratic in document length and is never planned. Final top-50
    is again TakeOrdered with a (count desc, t1, t2) total order."""
    docs = load_catalog(spark, sf_dir).table("documents")
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(200)
        .select("token")
    )
    dt = tok.distinct().join(F.broadcast(vocab), "token")
    a, b = dt.alias("a"), dt.alias("b")
    pairs = a.join(
        b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.token") < F.col("b.token"))
    )
    return (
        pairs.groupBy(F.col("a.token").alias("t1"), F.col("b.token").alias("t2"))
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy(F.desc("n_docs"), "t1", "t2")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# qx108 — fuzzy string join (length-banded levenshtein blocking)
# ---------------------------------------------------------------------------

FUZZY_JOIN_ORACLE = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT
  a.p_name AS name_lo,
  b.p_name AS name_hi,
  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM names a
JOIN names b
  ON a.p_name < b.p_name
 AND abs(length(a.p_name) - length(b.p_name)) <= 3
 AND levenshtein(a.p_name, b.p_name) <= 3
"""


@register(
    "qx108_fuzzy_name_join",
    oracle=FUZZY_JOIN_ORACLE,
    doc="edit-distance<=3 name pairs via lossless length-band blocking",
    tags=("similarity", "fuzzy-join"),
)
def qx108_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity self-join on the part-name DOMAIN: all distinct name
    pairs within levenshtein distance 3. The all-pairs spelling is
    quadratic; the blocking here is LOSSLESS for the threshold — edit
    distance <= 3 implies |len(a)-len(b)| <= 3, so each name emits its
    own length plus the 3 below it as join keys and every qualifying
    pair meets on an EQUI-join key exactly once (longer-as-left when
    lengths differ; lexicographic tie-break when equal). levenshtein
    runs only on banded candidates, JVM-side. Domain-first matters at
    scale: dedup to distinct names BEFORE pairing (64 names stand in
    for 2000 part rows at sf0.01; the ratio only improves with SF)."""
    names = load_catalog(spark, sf_dir).table("part").select("p_name").distinct()
    left = names.select(
        F.col("p_name").alias("name_a"), F.length("p_name").alias("len_a")
    ).select(
        "name_a",
        "len_a",
        F.explode(F.sequence(F.col("len_a") - 3, F.col("len_a"))).alias("len_key"),
    )
    right = names.select(
        F.col("p_name").alias("name_b"), F.length("p_name").alias("len_b")
    )
    cand = left.join(right, F.col("len_key") == F.col("len_b")).where(
        (F.col("len_a") > F.col("len_b"))
        | ((F.col("len_a") == F.col("len_b")) & (F.col("name_a") < F.col("name_b")))
    )
    matched = cand.where(F.levenshtein("name_a", "name_b") <= 3)
    return matched.select(
        F.least("name_a", "name_b").alias("name_lo"),
        F.greatest("name_a", "name_b").alias("name_hi"),
        F.levenshtein("name_a", "name_b").cast("bigint").alias("edit_dist"),
    )


# ---------------------------------------------------------------------------
# qx109 — relational division ("for all" membership)
# ---------------------------------------------------------------------------

DIVISION_ORACLE = """
SELECT c_custkey, c_name, CAST(n_quarters AS BIGINT) AS n_quarters
FROM customer
JOIN (
  SELECT o_custkey, count(DISTINCT quarter(o_orderdate)) AS n_quarters
  FROM orders
  WHERE year(o_orderdate) = 1995
  GROUP BY o_custkey
  HAVING count(DISTINCT quarter(o_orderdate)) = 4
) q ON c_custkey = o_custkey
"""


@register(
    "qx109_relational_division",
    oracle=DIVISION_ORACLE,
    doc="customers with orders in ALL four quarters of 1995 (division via distinct-count)",
    tags=("relational", "division"),
)
def qx109_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division: customers whose 1995 orders cover ALL four
    quarters. Division is spelled as distinct-count-equals-domain-size
    — one partial-aggregated groupBy over the year-filtered fact (the
    year predicate is pushed to the scan), never a per-element chain of
    semi-joins. The qualifying-key frame joins back to `customer` on
    the key both sides can shuffle-partition on; with a selective
    divisor AQE converts it to a broadcast join at runtime, so neither
    spelling is hard-coded."""
    cat = load_catalog(spark, sf_dir)
    o = cat.table("orders").where(F.year("o_orderdate") == 1995)
    q4 = (
        o.groupBy("o_custkey")
        .agg(F.countDistinct(F.quarter("o_orderdate")).alias("n_quarters"))
        .where(F.col("n_quarters") == 4)
    )
    cust = cat.table("customer")
    return cust.join(q4, cust.c_custkey == q4.o_custkey).select(
        "c_custkey", "c_name", F.col("n_quarters").cast("bigint").alias("n_quarters")
    )


# ---------------------------------------------------------------------------
# qx110 — Pearson correlation from exact decimal moments
# ---------------------------------------------------------------------------

CORRELATION_ORACLE = """
WITH per_order AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS xc,
         CAST(year(o_orderdate) AS INT) AS o_year,
         count(*) AS n_items
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey, o_totalprice, year(o_orderdate)
),
m AS (
  SELECT o_year,
    count(*) AS n,
    CAST(sum(xc) AS DOUBLE) AS sx,
    CAST(sum(CAST(n_items AS BIGINT)) AS DOUBLE) AS sy,
    CAST(sum(xc * xc) AS DOUBLE) AS sxx,
    CAST(sum(CAST(n_items AS BIGINT) * CAST(n_items AS BIGINT)) AS DOUBLE) AS syy,
    CAST(sum(xc * CAST(n_items AS BIGINT)) AS DOUBLE) AS sxy
  FROM per_order
  GROUP BY o_year
)
SELECT o_year,
  CAST(n AS BIGINT) AS n_orders,
  round((n * sxy - sx * sy)
        / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
    AS price_items_corr
FROM m
"""


@register(
    "qx110_correlation",
    oracle=CORRELATION_ORACLE,
    doc="per-year Pearson corr(order price, item count) from exact decimal moments",
    tags=("stats", "correlation"),
)
def qx110_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics: per-year Pearson correlation between an
    order's total price and its lineitem count. Built-in ``F.corr``
    accumulates in double, so its result depends on partitioning/add
    order; here the five moments (Σx, Σy, Σx², Σy², Σxy) accumulate
    EXACTLY — prices become integer cents (2-dp money survives the
    double round-trip bit-exactly; Pearson is scale-invariant so the
    ×100 cancels), per-row products stay inside int64, and the sums
    run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact,
    order-independent, mergeable map-side. The correlation is then
    derived in double from the exact sums with the expression mirrored
    in the oracle. Two exchanges total: the orderkey join/group (one
    partitioning serves both) and the tiny per-year moment agg."""
    cat = load_catalog(spark, sf_dir)
    xc = F.round(F.col("o_totalprice") * 100).cast("bigint")
    per_order = (
        cat.table("orders")
        .join(cat.table("lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_totalprice", F.year("o_orderdate").alias("o_year"))
        .agg(F.count("*").alias("n_items"))
        .select(xc.alias("xc"), F.col("n_items").cast("bigint").alias("y"), "o_year")
    )
    big = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = per_order.groupBy("o_year").agg(
        F.count("*").alias("n"),
        big(F.col("xc")).alias("sx"),
        big(F.col("y")).alias("sy"),
        big(F.col("xc") * F.col("xc")).alias("sxx"),
        big(F.col("y") * F.col("y")).alias("syy"),
        big(F.col("xc") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # try_divide: a degenerate year (one order, or constant price /
    # item count) has zero variance on one axis — corr is NULL there
    # (the oracle's NaN canonicalizes the same), not an ANSI crash
    corr = F.try_divide(
        n * sxy - sx * sy, F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "o_year", n.cast("bigint").alias("n_orders"), r6(corr).alias("price_items_corr")
    )


# ---------------------------------------------------------------------------
# qx111 — fixed-width histogram (profiling)
# ---------------------------------------------------------------------------

HISTOGRAM_ORACLE = """
WITH b AS (
  SELECT CAST(floor(value / 25.0) AS INT) AS bucket, count(*) AS n
  FROM events
  GROUP BY 1
)
SELECT
  bucket,
  CAST(bucket * 25 AS DOUBLE) AS lo,
  CAST((bucket + 1) * 25 AS DOUBLE) AS hi,
  CAST(n AS BIGINT) AS n,
  round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) AS frac
FROM b
"""


@register(
    "qx111_value_histogram",
    oracle=HISTOGRAM_ORACLE,
    doc="fixed-width (25.0) histogram of event values with mass fractions",
    tags=("stats", "profiling", "histogram"),
)
def qx111_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram — the profiling shape behind range
    partition advice and skew reports. One partial-aggregated groupBy
    on floor(value/width) reduces the fact to ~dozens of bucket rows;
    the normalizing total is a window over that REDUCED frame (a
    single-partition pass over bucket counts, never over events).
    Portable spelling: floor-division buckets, not width_bucket —
    identical semantics in both engines including negatives."""
    ev = load_catalog(spark, sf_dir).table("events")
    b = (
        ev.groupBy(F.floor(F.col("value") / 25.0).cast("int").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    return b.select(
        "bucket",
        (F.col("bucket") * 25).cast("double").alias("lo"),
        ((F.col("bucket") + 1) * 25).cast("double").alias("hi"),
        F.col("n").cast("bigint").alias("n"),
        r6(F.col("n").cast("double") / total).alias("frac"),
    )


# ---------------------------------------------------------------------------
# qx112 — hopping (sliding) time windows (C16 family completion)
# ---------------------------------------------------------------------------

HOP_US = 30 * 60 * 1_000_000  # 30-minute hop
SIZE_US = 60 * 60 * 1_000_000  # 1-hour window

HOPPING_ORACLE = f"""
WITH expanded AS (
  SELECT
    make_timestamp((epoch_us(ts) // {HOP_US}) * {HOP_US} - i * {HOP_US}) AS window_start,
    event_type,
    value
  FROM events, unnest(range(0, {SIZE_US // HOP_US})) AS t(i)
)
SELECT
  window_start,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
FROM expanded
GROUP BY window_start, event_type
"""


@register(
    "qx112_hopping_window",
    oracle=HOPPING_ORACLE,
    doc="1-hour windows hopping every 30 min (each event in 2 overlapping windows)",
    tags=("events", "window-agg", "sliding"),
)
def qx112_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) time-window aggregation — the overlapping
    companion to q30's tumbling windows: 1-hour windows every 30
    minutes, so each event lands in exactly size/hop = 2 windows.
    Native ``F.window(ts, size, hop)`` plans the expansion as a single
    Expand (factor size/hop) feeding one partial-aggregated hash agg —
    the same one-exchange shape as a plain groupBy, with cost linear in
    events × overlap factor. Epoch-aligned starts in both engines, so
    the oracle reconstructs identical window assignment from integer
    microsecond arithmetic. The spelling is streaming-portable: the
    identical ``F.window`` call runs under readStream with a watermark
    (streaming/windows.py does exactly this for tumbling)."""
    ev = load_catalog(spark, sf_dir).table("events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            r6(F.sum(F.col("value").cast("decimal(18,6)")).cast("double")).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


STREAM_HOPPING_ORACLE = f"""
WITH expanded AS (
  SELECT
    make_timestamp((epoch_us(ts) // {HOP_US}) * {HOP_US} - i * {HOP_US}) AS window_start,
    event_type
  FROM events, unnest(range(0, {SIZE_US // HOP_US})) AS t(i)
)
SELECT
  window_start,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events
FROM expanded
GROUP BY window_start, event_type
"""


@register(
    "qx113_streaming_hopping",
    oracle=STREAM_HOPPING_ORACLE,
    doc="qx112's hopping windows run incrementally under a watermark",
    tags=("streaming", "window-agg", "sliding"),
)
def qx113_streaming_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping windows as a STREAM: the identical F.window(size, slide)
    aggregation run incrementally (AvailableNow replay, complete mode)
    — with a bounded replay no rows are late, so the result must equal
    the batch/oracle answer exactly. State is bounded by watermark
    horizon × overlap factor; 8 state partitions for the fixture-sized
    replay (the deployment-sized knob run_to_memory documents)."""
    from bqfetch_spark.streaming.windows import (
        hopping_counts_stream,
        run_to_memory,
        streaming_events,
    )

    stream = hopping_counts_stream(streaming_events(spark, sf_dir))
    return run_to_memory(stream, "qx113_streaming_hopping_sink", state_partitions=8)


# ---------------------------------------------------------------------------
# qx114 — chi-square independence test (contingency analysis)
# ---------------------------------------------------------------------------

CHISQUARE_ORACLE = """
WITH cells AS (
  SELECT c_mktsegment AS seg, o_orderpriority AS pri, count(*) AS cnt
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
),
tot AS (
  SELECT seg, pri, cnt,
    sum(cnt) OVER (PARTITION BY seg) AS row_tot,
    sum(cnt) OVER (PARTITION BY pri) AS col_tot,
    sum(cnt) OVER () AS grand
  FROM cells
)
SELECT
  round(sum(
    (CAST(cnt AS DOUBLE)
     - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(grand AS DOUBLE))
    * (CAST(cnt AS DOUBLE)
       - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(grand AS DOUBLE))
    / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(grand AS DOUBLE))
  ), 6) AS chi2,
  CAST((count(DISTINCT seg) - 1) * (count(DISTINCT pri) - 1) AS BIGINT) AS dof,
  CAST(max(grand) AS BIGINT) AS n_obs
FROM tot
"""


@register(
    "qx114_chisquare",
    oracle=CHISQUARE_ORACLE,
    doc="chi-square independence of market segment vs order priority",
    tags=("stats", "contingency"),
)
def qx114_chisquare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer market segment
    and order priority. The fact join REDUCES to the |seg|x|pri|
    contingency table first (one partial-aggregated groupBy — the only
    exchange that touches fact-sized data); the expected-count windows
    and the statistic then run over the ~25-cell frame, so the test
    costs the same as a grouped count no matter the SF. Cell counts are
    exact BIGINTs in both engines; chi2 derives in double with the
    expression mirrored (expected count spelled identically in all
    three positions). ``df.stat.crosstab`` pivots the same table but
    would leave the statistic to the driver — this stays declarative."""
    cat = load_catalog(spark, sf_dir)
    cells = (
        cat.table("orders")
        .join(cat.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri"))
        .agg(F.count("*").alias("cnt"))
    )
    tot = cells.select(
        "seg",
        "pri",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("seg")).alias("row_tot"),
        F.sum("cnt").over(Window.partitionBy("pri")).alias("col_tot"),
        F.sum("cnt").over(Window.partitionBy()).alias("grand"),
    )
    e = F.col("row_tot").cast("double") * F.col("col_tot").cast("double") / F.col(
        "grand"
    ).cast("double")
    term = (F.col("cnt").cast("double") - e) * (F.col("cnt").cast("double") - e) / e
    return tot.agg(
        r6(F.sum(term)).alias("chi2"),
        ((F.countDistinct("seg") - 1) * (F.countDistinct("pri") - 1))
        .cast("bigint")
        .alias("dof"),
        F.max("grand").cast("bigint").alias("n_obs"),
    )


# ---------------------------------------------------------------------------
# qx121 — stream-static enrichment join (lookup topology)
# ---------------------------------------------------------------------------

STREAM_ENRICH_ORACLE = """
SELECT
  c_mktsegment AS segment,
  CAST(count(*) AS BIGINT) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


@register(
    "qx121_streaming_enrich",
    oracle=STREAM_ENRICH_ORACLE,
    doc="stream-static broadcast enrichment join + running per-segment totals",
    tags=("streaming", "join", "enrichment"),
)
def qx121_streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static lookup join run incrementally: the event stream
    broadcast-joins the customer dimension per micro-batch (stateless
    — no join state, no watermark needed on a stream-static inner
    join), feeding a running per-segment aggregate whose state is a
    |segments|-row store. With a bounded AvailableNow replay nothing
    is late, so the result must equal the batch join/group-by oracle
    exactly (decimal-exact sums, one rounding at the edge). This is
    the dimension-lookup topology of every production stream; only
    the source/sink bindings change on a cluster."""
    from bqfetch_spark.streaming.enrich import enriched_segment_counts_stream
    from bqfetch_spark.streaming.windows import run_to_memory, streaming_events

    out = enriched_segment_counts_stream(
        streaming_events(spark, sf_dir), spark, sf_dir
    )
    mat = run_to_memory(out, "qx121_streaming_enrich_sink", state_partitions=8)
    return mat.select(
        "segment",
        F.col("n_events").cast("bigint").alias("n_events"),
        r6(F.col("sum_value").cast("double")).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# qx134 — percent_rank / cume_dist (relative-standing window functions)
# ---------------------------------------------------------------------------

PCTRANK_ORACLE = """
SELECT
  event_id,
  event_type,
  round(CAST(value AS DOUBLE), 6) AS value,
  round(percent_rank() OVER (
    PARTITION BY event_type ORDER BY value, event_id
  ), 6) AS pct_rank,
  round(cume_dist() OVER (
    PARTITION BY event_type ORDER BY value, event_id
  ), 6) AS cume
FROM events
"""


@register(
    "qx134_percent_rank",
    oracle=PCTRANK_ORACLE,
    doc="percent_rank and cume_dist relative standing per event type",
    tags=("events", "window-rank", "stats"),
)
def qx134_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing — completes the C11 ranking family beyond
    row_number/rank/ntile: percent_rank ((rank-1)/(n-1), the "better
    than X% of peers" number) and cume_dist (rows ≤ current / n, the
    empirical CDF evaluated at each row). Both are rational functions
    of exact integer ranks, so engine parity is exact-division-exact.
    Partitioned by event_type: the window sorts per-type partitions,
    never globally — the same one-exchange shape as the other event
    sequence operators, and the (value, event_id) tie-break makes
    every rank a deterministic total order."""
    ev = load_catalog(spark, sf_dir).table("events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        r6(F.col("value").cast("double")).alias("value"),
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
    )


# ---------------------------------------------------------------------------
# qx135 — streaming top-k (continuous leaderboard)
# ---------------------------------------------------------------------------

STREAM_TOPK_ORACLE = """
SELECT event_type, n_events, total_value
FROM (
  SELECT
    event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value,
    row_number() OVER (ORDER BY count(*) DESC, event_type) AS rn
  FROM events
  GROUP BY event_type
)
WHERE rn <= 3
"""


@register(
    "qx135_streaming_topk",
    oracle=STREAM_TOPK_ORACLE,
    doc="continuous top-3 leaderboard over an event stream (complete-mode rank)",
    tags=("streaming", "top-k"),
)
def qx135_streaming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous leaderboard: the top-3 event types by running count,
    maintained incrementally — complete output mode is what licenses
    sort+limit on a stream (append mode cannot retract a displaced
    leader; the |types|-row aggregate state makes complete mode cheap
    here, the standard trade). Each micro-batch updates the running
    per-type counts/sums in state and re-ranks the tiny aggregate
    frame; with a bounded AvailableNow replay the final leaderboard
    must equal the batch top-k oracle exactly (decimal-exact sums,
    count-then-name tie-break)."""
    from bqfetch_spark.streaming.windows import run_to_memory, streaming_events

    agg = (
        streaming_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
    )
    ranked = agg.orderBy(F.desc("n_events"), "event_type").limit(3)
    mat = run_to_memory(ranked, "qx135_streaming_topk_sink", state_partitions=8)
    return mat.select(
        "event_type",
        "n_events",
        r6(F.col("sum_value").cast("double")).alias("total_value"),
    )
