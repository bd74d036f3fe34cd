"""End-to-end LLM training-data pipeline: the composition the engine
exists for — quality-filter → exact-dedup → near-dup-removal → token
accounting — as ONE oracle-checked lazy plan.

Each stage is the same operator family the standalone queries expose
(q43 quality, q40 dedup, q46 n-gram Jaccard); composing them keeps
everything in one Catalyst plan, so column pruning and filter ordering
happen across stage boundaries — there is no materialization between
stages (at scale, insert .checkpoint() after dedup if the near-dup
join re-reads the corpus multiple times).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.operators.llm_pipeline import (
    SHINGLE_DF_CAP,
    STOPWORD_PATTERN,
    dedup_exact,
)
from bqfetch_spark.operators.relational import r6
from bqfetch_spark.registry import register
from bqfetch_spark.session import shuffle_partitions

QUALITY_THRESHOLD = 0.45  # keeps ~60% of the fixture corpus
JACCARD_THRESHOLD = 0.5
MIN_SHARED = 2

PIPELINE_ORACLE = rf"""
WITH scored AS (
  SELECT doc_id, text, lang,
    round(
      0.4 * (CAST(len(regexp_extract_all(text, '{STOPWORD_PATTERN}')) AS DOUBLE)
             / len(string_split(text, ' ')))
      + 0.3 * least(1.0, CAST(len(string_split(text, ' ')) AS BIGINT) / 100.0)
      + 0.3 * (1 - CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                   / length(text)),
    6) AS quality_score
  FROM documents
),
quality AS (
  SELECT * FROM scored WHERE quality_score >= {QUALITY_THRESHOLD}
),
deduped AS (
  SELECT doc_id, text, lang, quality_score
  FROM (
    SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM quality
  ) WHERE rn = 1
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t) - 2),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gs
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM deduped)
  WHERE len(t) >= 3
),
flat AS (
  SELECT doc_id, g FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
  QUALIFY count(*) OVER (PARTITION BY g) <= {SHINGLE_DF_CAP}
),
sizes AS (SELECT doc_id, len(gs) AS n_grams FROM grams),
near_dup_losers AS (
  SELECT DISTINCT greatest(p.adoc, p.bdoc) AS doc_id
  FROM (
    SELECT a.doc_id AS adoc, b.doc_id AS bdoc, count(*) AS n_shared
    FROM flat a JOIN flat b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_SHARED}
  ) p
  JOIN sizes sa ON sa.doc_id = p.adoc
  JOIN sizes sb ON sb.doc_id = p.bdoc
  WHERE round(CAST(p.n_shared AS DOUBLE)
        / (sa.n_grams + sb.n_grams - p.n_shared), 6) >= {JACCARD_THRESHOLD}
),
survivors AS (
  SELECT d.* FROM deduped d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
)
SELECT
  doc_id,
  lang,
  quality_score,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM survivors
"""


@register("q65_training_pipeline", oracle=PIPELINE_ORACLE, tags=("pipeline", "dedup", "quality"))
def q65_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quality filter (score ≥ 0.45 on the rounded value,
    so both engines make identical keep decisions) → exact dedup (min
    doc_id per text) → n-gram-Jaccard near-dup removal (drop the
    higher doc_id of any pair with rounded J ≥ 0.5) → per-doc token
    accounting."""
    docs = load_catalog(spark, sf_dir).table("documents")

    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    stop_ratio = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(STOPWORD_PATTERN), 0)).cast("double")
        / F.size(F.split(F.col("text"), " "))
    )
    # try_divide: an empty text must yield NULL punct_ratio (the
    # oracle's double/0 NaN canonicalizes the same), not an ANSI crash
    punct_ratio = F.try_divide(
        F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9 ]", "")).cast("double"),
        F.length("text").cast("double"),
    )
    quality = r6(
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * F.least(F.lit(1.0), n_tokens.cast("double") / 100)
        + F.lit(0.3) * (F.lit(1) - punct_ratio)
    )
    scored = docs.select("doc_id", "text", "lang", quality.alias("quality_score"))
    kept = scored.filter(F.col("quality_score") >= QUALITY_THRESHOLD)

    # exact dedup shuffled on the 8-byte xxhash64(text) pre-key, text
    # only compared on hash ties (operators/llm_pipeline.dedup_exact)
    deduped = dedup_exact(kept, shuffle_partitions(spark))

    # near-dup candidates via shared-shingle join (same shape as q46,
    # incl. the shuffle barrier that materializes the token arrays)
    t = F.split(F.col("text"), " ")
    tokenized = (
        deduped.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 3)
        .repartition(shuffle_partitions(spark), "doc_id")
    )
    # 3-grams as flat rows (arrays_zip(slice×3) → explode → codegen'd
    # concat_ws; the HOF-lambda spelling is 2× slower — see q46); the
    # per-doc gram dedup rides the doc_id exchange, and one join-key
    # exchange then feeds the DF-cap window, both self-join sides, and
    # the sizes aggregate
    n2 = F.size("t") - 2
    z = F.arrays_zip(
        F.slice("t", 1, n2).alias("w1"),
        F.slice("t", 2, n2).alias("w2"),
        F.slice("t", 3, n2).alias("w3"),
    )
    fr = (
        tokenized.select("doc_id", F.explode(z).alias("z"))
        .select("doc_id", F.concat_ws(" ", "z.w1", "z.w2", "z.w3").alias("g"))
        .dropDuplicates(["doc_id", "g"])
        .repartition(shuffle_partitions(spark), "g")
    )
    sizes = fr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    # stop-shingle cut on the join-key exchange (see q46: join cost is
    # Σ df², hot shingles dominate; the window reuses the g-exchange)
    flat = (
        fr.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .filter(F.col("__df") <= SHINGLE_DF_CAP)
        .drop("__df")
    )
    a, b = flat.alias("a"), flat.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("adoc"), F.col("b.doc_id").alias("bdoc"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED)
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    losers = (
        pairs.join(F.broadcast(sa), F.col("sa.doc_id") == F.col("adoc"))
        .join(F.broadcast(sb), F.col("sb.doc_id") == F.col("bdoc"))
        .filter(
            r6(
                F.col("n_shared").cast("double")
                / (F.col("sa.n_grams") + F.col("sb.n_grams") - F.col("n_shared"))
            )
            >= JACCARD_THRESHOLD
        )
        .select(F.greatest("adoc", "bdoc").alias("doc_id"))
        .distinct()
    )

    survivors = deduped.join(losers, "doc_id", "left_anti")
    return survivors.select(
        "doc_id",
        "lang",
        "quality_score",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
