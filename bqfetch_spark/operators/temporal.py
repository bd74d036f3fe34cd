"""Temporal join/window operators the reference has no equivalent for:
range-frame windows, as-of joins, and the MLlib LSH similarity-join
variant. These are the "operator Spark lacks as a single primitive →
compose existing DataFrame ops" cases (build brief, custom-operator
path a).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.operators.relational import r6
from bqfetch_spark.registry import register

HOUR_US = 3_600_000_000

RANGE_FRAME_ORACLE = f"""
SELECT
  event_id,
  user_id,
  ts,
  CAST(count(*) OVER w - 1 AS BIGINT) AS prior_events_1h,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w - CAST(value AS DECIMAL(18,6)) AS DOUBLE), 6)
    AS prior_value_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN {HOUR_US} PRECEDING AND CURRENT ROW
)
"""


@register("q36_range_frame", oracle=RANGE_FRAME_ORACLE, tags=("window", "range"))
def q36_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame: events by the same user in the
    trailing hour (self excluded by subtraction — the [t-1h, t] frame
    includes the current row on both engines, so count-1/sum-value
    gives the strictly-prior aggregate even when timestamps tie).
    RANGE frames over epoch-µs ordering — one shuffle on user_id."""
    ev = load_catalog(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-HOUR_US, Window.currentRow)
    )
    val_dec = F.col("value").cast("decimal(18,6)")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.count(F.lit(1)).over(w) - 1).cast("bigint").alias("prior_events_1h"),
        r6((F.sum(val_dec).over(w) - val_dec).cast("double")).alias("prior_value_1h"),
    )


ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         max(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
  FROM events
)
SELECT event_id, user_id, ts AS purchase_ts, last_click_ts,
       CAST(CASE WHEN last_click_ts IS NULL THEN NULL
                 ELSE epoch_us(ts) - epoch_us(last_click_ts) END AS BIGINT) AS us_since_click
FROM tagged
WHERE event_type = 'purchase'
"""


@register("q37_asof_join", oracle=ASOF_ORACLE, tags=("join", "asof"))
def q37_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest strictly-
    preceding click. Implemented as the union-scan window idiom (tag
    rows, running max of click timestamps over a ROWS frame) — a single
    shuffle on user_id, no range join explosion; this is the scalable
    spelling of MERGE ASOF / ASOF JOIN and works identically in the
    DuckDB oracle."""
    ev = load_catalog(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    tagged = ev.withColumn("last_click_ts", F.max(click_ts).over(w))
    return tagged.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_click_ts",
        F.when(
            F.col("last_click_ts").isNull(), F.lit(None).cast("bigint")
        )
        .otherwise(F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts")))
        .alias("us_since_click"),
    )


@register("q49_mllib_minhash_lsh", oracle=None, tags=("dedup", "mllib", "lsh"))
def q49_mllib_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH variant of q47: token sets → HashingTF sparse
    vectors → MinHashLSH approxSimilarityJoin (Jaccard distance ≤ 0.9).
    Rows-only (MLlib hash seeds are internal); exists to show the
    built-in LSH path beside the hand-rolled one — on a cluster the
    two scale identically (band-bucket shuffle)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_catalog(spark, sf_dir).table("documents")
    toks = docs.select("doc_id", F.array_distinct(F.split("text", " ")).alias("tokens"))
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 16)
    feats = tf.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.9, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            r6(F.col("jaccard_dist")).alias("jaccard_dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


@register("q54_brp_lsh_neighbors", oracle=None, tags=("similarity", "mllib", "lsh"))
def q54_brp_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH (Euclidean) ANN over the embedding
    column — the MLlib vector-LSH path beside the hand-rolled IVF
    (q53): project onto seeded random hyperplanes, bucket by quantized
    projection, candidate pairs from same-bucket joins. Rows-only
    (internal hash seeds); approxNearestNeighbors for the same 5 query
    vectors as q50, so recall vs the exact top-k is inspectable."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_catalog(spark, sf_dir).table("embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(emb)
    hashed = model.transform(emb).cache()
    queries = hashed.filter(F.col("vec_id") < 5).collect()
    out = None
    for row in queries:
        nn = model.approxNearestNeighbors(hashed, row.features, 11).filter(
            F.col("vec_id") != row.vec_id
        ).limit(10)
        nn = nn.select(
            F.lit(row.vec_id).cast("bigint").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            r6(F.col("distCol")).alias("euclidean_dist"),
        )
        out = nn if out is None else out.unionByName(nn)
    return out.orderBy("query_id", "euclidean_dist", "neighbor_id")
