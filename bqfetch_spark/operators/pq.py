"""Product-quantization (PQ) ANN: the compressed-index scale path for
embedding search (complements IVF q53/q55/q69 — IVF prunes WHICH
vectors to score, PQ shrinks WHAT is scored).

A 64-dim float32 vector is 256 bytes; its PQ code here is M=8 bytes
(one uint8 per 8-dim subspace, k=32 centroids each) — 32× smaller.
At 100 TB of embeddings the codes fit in a fraction of cluster memory,
so candidate scoring is a linear scan over codes plus per-query lookup
tables, and only the top candidates touch the full vectors (exact
re-rank). That two-tier layout (codes hot, vectors cold) is the
standard billion-scale serving shape (FAISS IVFPQ's PQ half).

Spark-first construction:
- TRAIN: all M sub-codebooks in ONE job — subvectors are exploded to
  (subspace_id, subvector) rows and ``applyInPandas`` groups by
  subspace, running a seeded numpy Lloyd's per group in parallel. At
  100 TB the fit input is a sample; each group's sample fits one task
  by construction.
- ENCODE: codebooks broadcast as a literal array; nearest-centroid
  per subspace via one vectorized ``mapInPandas`` pass (Arrow
  batches, no per-row Python).
- SEARCH (ADC — asymmetric distance): per query, a M×k distance
  table; each code's approximate distance is M table lookups, done
  JVM-side with an array-literal lookup expression — the scan over
  codes never touches Python or the full vectors.
- RE-RANK: exact rounded cosine on the top ``RERANK`` candidates
  only (broadcast join back to the vectors by id).

Rows-only check (approximation has no SQL oracle); recall@10 vs the
exact q50 baseline is pytest-gated, and encode/decode reconstruction
error is bounded in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.functions.vectors import as_double, cosine
from bqfetch_spark.operators.relational import r6
from bqfetch_spark.registry import register

PQ_M = 8  # subspaces → 8-byte codes (32× smaller than 256-byte vectors)
PQ_K = 32  # centroids per subspace (one uint8 per subspace)
PQ_ITERS = 10
PQ_RERANK = 100  # exact re-rank depth per query (constant in N)
PQ_SEED = 42


def _lloyd(sub: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded numpy Lloyd's — deterministic, runs inside one task per
    subspace. FP64 accumulation; empty clusters re-seeded from the
    farthest points (k << n here, so this converges in a few rounds)."""
    rng = np.random.RandomState(seed)
    centroids = sub[rng.choice(len(sub), size=k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d2 = ((sub[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        empties = []
        for c in range(k):
            members = sub[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
            else:
                empties.append(c)
        if empties:
            # reseed AFTER this round's mean updates, against fresh
            # distances, giving the i-th empty cluster the i-th farthest
            # point — the old spelling reused one stale farthest point
            # for every empty cluster in the round, collapsing them onto
            # a single centroid (round-4 advice, quality-only)
            d2_new = ((sub[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d2_new.min(axis=1))[::-1]
            for i, c in enumerate(empties):
                centroids[c] = sub[order[i % len(order)]]
    return centroids


def train_codebooks(emb: DataFrame, dim: int) -> np.ndarray:
    """All M sub-codebooks in one applyInPandas job → ndarray
    (M, K, dim//M). Returns driver-side (codebooks are tiny: M*K*d/M
    floats — the broadcast side of every later stage)."""
    sub_d = dim // PQ_M
    # few-partition explode: the fit input is sample-sized by design
    # (see q69's fit note) — per-task overhead dominates at 32 slots
    emb = emb.coalesce(8)
    exploded = emb.select(
        F.posexplode(
            F.array(
                *[
                    F.slice("v", i * sub_d + 1, sub_d)
                    for i in range(PQ_M)
                ]
            )
        ).alias("subspace", "sub")
    )

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        space = int(pdf["subspace"].iloc[0])
        sub = np.vstack(pdf["sub"].to_numpy())
        cent = _lloyd(sub, PQ_K, PQ_ITERS, PQ_SEED + space)
        return pd.DataFrame(
            {
                "subspace": space,
                "centroid": range(PQ_K),
                "vec": [c.tolist() for c in cent],
            }
        )

    rows = (
        exploded.groupBy("subspace")
        .applyInPandas(_fit, "subspace int, centroid int, vec array<double>")
        .collect()
    )
    books = np.zeros((PQ_M, PQ_K, sub_d))
    for r in rows:
        books[r["subspace"], r["centroid"]] = r["vec"]
    return books


def encode(emb: DataFrame, books: np.ndarray, extra: tuple = ()) -> DataFrame:
    """(vec_id, v[, *extra]) → (vec_id[, *extra], code array<int> of
    length M): nearest sub-centroid per subspace, vectorized numpy over
    Arrow batches. ``extra`` columns pass through untouched (IVF-PQ
    keeps the coarse cell_id alongside the residual code)."""
    m, k, sub_d = books.shape

    def _enc(batches):
        for pdf in batches:
            vecs = np.vstack(pdf["v"].to_numpy())
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for s in range(m):
                sub = vecs[:, s * sub_d : (s + 1) * sub_d]
                d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            out = {"vec_id": pdf["vec_id"]}
            for c in extra:
                out[c] = pdf[c]
            out["code"] = [c.tolist() for c in codes]
            yield pd.DataFrame(out)

    extra_schema = "".join(f", {c} int" for c in extra)
    return emb.mapInPandas(_enc, f"vec_id bigint{extra_schema}, code array<int>")


def unit_normalized(emb: DataFrame) -> DataFrame:
    """(vec_id, v) with v scaled to unit L2 norm — JVM-side fold. On
    the unit sphere L2 order == cosine order (||a-b||² = 2-2cos), so
    squared-L2 PQ/IVF machinery ranks by the exact baseline's metric."""
    norm = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return emb.select("vec_id", F.transform("v", lambda x: x / norm).alias("v"))


@register("q101_ann_pq", oracle=None, tags=("similarity", "ann", "pq"))
def q101_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN top-10 for the 5 standard query vectors (same
    contract as q50/q53/q55): train → encode → ADC scan over 8-byte
    codes with a JVM-side lookup-table expression → exact cosine
    re-rank of the top PQ_RERANK. Rows-only; recall@10 ≥ threshold vs
    q50 is pytest-gated (tests/test_ann_recall.py)."""
    emb = load_catalog(spark, sf_dir).table("embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    # PQ indexes the UNIT-normalized vectors (un-normalized training
    # measured recall 0.32; normalized ≥0.9) — see unit_normalized
    emb_n = unit_normalized(emb)
    # queries double as the dim probe — one collect, one fewer job
    queries = sorted(
        (int(r["vec_id"]), np.array(r["v"]) / np.linalg.norm(r["v"]))
        for r in emb.filter(F.col("vec_id") < 5).collect()
    )
    dim = len(queries[0][1])
    books = train_codebooks(emb_n, dim)
    codes = encode(emb_n, books)
    m, k, sub_d = books.shape
    # One broadcast LUT row per query (M×K distance table); the ADC
    # scan is ONE pass over codes × queries with M nested array
    # lookups per pair, entirely JVM-side — no Python, no full
    # vectors, and the codes are scanned once however many queries.
    lut_rows = []
    for qid, qv in queries:
        tables = [
            ((qv[s * sub_d : (s + 1) * sub_d][None, :] - books[s]) ** 2)
            .sum(axis=1)
            .tolist()
            for s in range(m)
        ]
        lut_rows.append((qid, tables))
    luts = spark.createDataFrame(
        lut_rows, "query_id bigint, lut array<array<double>>"
    )
    adc = None
    for s in range(m):
        term = F.element_at(F.element_at("lut", s + 1), F.col("code")[s] + 1)
        adc = term if adc is None else adc + term
    scored = (
        codes.crossJoin(F.broadcast(luts))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", adc.alias("adc_d2"))
    )

    # Two-phase top-PQ_RERANK per query: a plain per-query window would
    # sort ALL code rows in n_queries tasks (the single-task-sort shape
    # plans/ranks.py exists to avoid). Phase 1 takes the local top-K in
    # each (query, salt) slice — SALT_BUCKETS-way parallel, each task
    # sorts N/SALT_BUCKETS rows; phase 2's exact window then runs over
    # at most n_queries × SALT_BUCKETS × K survivor rows (tiny).
    SALT_BUCKETS = 32
    scored = scored.withColumnRenamed("vec_id", "neighbor_id")
    local_w = Window.partitionBy("query_id", "salt").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id")
    )
    final_w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn(
            "salt", F.pmod(F.xxhash64("neighbor_id"), F.lit(SALT_BUCKETS)).cast("int")
        )
        .withColumn("local_rank", F.row_number().over(local_w))
        .filter(F.col("local_rank") <= PQ_RERANK)
        .withColumn("adc_rank", F.row_number().over(final_w))
        .filter(F.col("adc_rank") <= PQ_RERANK)
    )
    # exact re-rank: only RERANK×n_queries rows re-touch full vectors
    qdf = spark.createDataFrame(
        [(qid, qv.tolist()) for qid, qv in queries], "query_id bigint, qv array<double>"
    )
    rerank_w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(emb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            r6(cosine(F.col("qv"), F.col("v"))).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(rerank_w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


IVFPQ_CELLS = 8  # coarse cells (k ∝ √N at scale, like q69)
IVFPQ_PROBE = 3  # cells scanned per query


def train_coarse_centroids(spark: SparkSession, emb_n: DataFrame) -> np.ndarray:
    """Trained coarse quantizer (seeded KMeans, few-partition fit —
    same rationale as q69): returns (IVFPQ_CELLS, dim) centroids."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    km = KMeans(
        k=IVFPQ_CELLS, seed=42, maxIter=8,
        featuresCol="features", predictionCol="__cell",
    )
    model = km.fit(emb_n.withColumn("features", array_to_vector("v")).coalesce(8))
    return np.array([[float(x) for x in c] for c in model.clusterCenters()])


def ivfpq_residuals(
    spark: SparkSession, emb_n: DataFrame, cents: np.ndarray
) -> DataFrame:
    """(vec_id, v) → (vec_id, cell_id, v=residual): top-1 cell via a
    broadcast-centroid argmin, residual computed JVM-side (zip_with)."""
    cent_df = spark.createDataFrame(
        [(i, c.tolist()) for i, c in enumerate(cents)], "cell_id int, cv array<double>"
    )
    d2 = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda a, x: a + x
    )
    assign_w = Window.partitionBy("vec_id").orderBy("d2", "cell_id")
    return (
        emb_n.crossJoin(F.broadcast(cent_df))
        .select("vec_id", "v", "cell_id", "cv", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id", "cell_id", F.zip_with("v", "cv", lambda x, y: x - y).alias("v")
        )
    )


def ivfpq_encode(
    spark: SparkSession, emb_n: DataFrame, cents: np.ndarray, books: np.ndarray
) -> DataFrame:
    """Assign + residual-encode a (vec_id, v) frame against FROZEN
    index artifacts → (vec_id, cell_id, code). One broadcast join plus
    one Arrow-batched numpy pass; O(wave) however large the existing
    index is — the insert path of an IVF-PQ index."""
    return encode(ivfpq_residuals(spark, emb_n, cents), books, extra=("cell_id",))


def ivfpq_search(
    spark: SparkSession,
    codes: DataFrame,
    emb: DataFrame,
    queries: list,
    cents: np.ndarray,
    books: np.ndarray,
) -> DataFrame:
    """ADC scan + exact re-rank over an IVF-PQ code table (shared by
    q56's one-shot build and q57's incrementally-maintained store).

    Per query: probe the IVFPQ_PROBE nearest cells, build an M×K LUT
    over the QUERY RESIDUAL per probed cell (the asymmetric-distance
    table of IVF-PQ), broadcast the LUT rows onto a cell_id equi-join
    with the codes — a query never touches codes outside its probed
    cells — then salted two-phase top-PQ_RERANK and an exact cosine
    re-rank of only those candidates."""
    m, k, sub_d = books.shape
    lut_rows = []
    for qid, qv in queries:
        probe_cells = np.argsort(((qv[None, :] - cents) ** 2).sum(axis=1))[:IVFPQ_PROBE]
        for cell in probe_cells:
            qr = qv - cents[cell]
            tables = [
                ((qr[s * sub_d : (s + 1) * sub_d][None, :] - books[s]) ** 2)
                .sum(axis=1)
                .tolist()
                for s in range(m)
            ]
            lut_rows.append((qid, int(cell), tables))
    luts = spark.createDataFrame(
        lut_rows, "query_id bigint, cell_id int, lut array<array<double>>"
    )
    adc = None
    for s in range(m):
        term = F.element_at(F.element_at("lut", s + 1), F.col("code")[s] + 1)
        adc = term if adc is None else adc + term
    scored = (
        codes.join(F.broadcast(luts), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), adc.alias("adc_d2"))
    )

    SALT_BUCKETS = 32
    local_w = Window.partitionBy("query_id", "salt").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id")
    )
    final_w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id")
    )
    cand = (
        scored.withColumn(
            "salt", F.pmod(F.xxhash64("neighbor_id"), F.lit(SALT_BUCKETS)).cast("int")
        )
        .withColumn("local_rank", F.row_number().over(local_w))
        .filter(F.col("local_rank") <= PQ_RERANK)
        .withColumn("adc_rank", F.row_number().over(final_w))
        .filter(F.col("adc_rank") <= PQ_RERANK)
    )
    qdf = spark.createDataFrame(
        [(qid, qv.tolist()) for qid, qv in queries], "query_id bigint, qv array<double>"
    )
    rerank_w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(emb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            r6(cosine(F.col("qv"), F.col("v"))).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(rerank_w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


@register("q56_ann_ivfpq", oracle=None, tags=("similarity", "ann", "ivf", "pq"))
def q56_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ combined ANN — the full FAISS-IVFPQ serving shape, built
    from the engine's two halves: the coarse quantizer (trained KMeans
    cells, q55/q69) prunes WHICH vectors are scored (only IVFPQ_PROBE
    of IVFPQ_CELLS cells per query), and PQ (q101) shrinks WHAT is
    scored (8-byte RESIDUAL codes — v minus its cell centroid, the
    encoding FAISS uses because residuals have ~cells× less variance
    than raw vectors, so the same 8 bytes quantize finer).

    Plan shape, all stages scale-safe:
    - one KMeans fit + one broadcast-centroid argmin assignment pass
      (residuals computed JVM-side with zip_with);
    - codebooks trained in ONE applyInPandas job on residuals;
    - the ADC scan is a broadcast equi-JOIN of codes to per-(query,
      probed-cell) LUT rows on cell_id (ivfpq_search);
    - salted two-phase top-K, exact cosine re-rank of PQ_RERANK only.
    Rows-only (approximate); recall@10 vs exact q50 is pytest-gated
    (tests/test_ann_recall.py)."""
    emb = load_catalog(spark, sf_dir).table("embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    emb_n = unit_normalized(emb)
    queries = sorted(
        (int(r["vec_id"]), np.array(r["v"]))
        for r in emb_n.filter(F.col("vec_id") < 5).collect()
    )
    dim = len(queries[0][1])
    cents = train_coarse_centroids(spark, emb_n)
    residuals = ivfpq_residuals(spark, emb_n, cents)
    books = train_codebooks(residuals.select("v"), dim)
    codes = encode(residuals, books, extra=("cell_id",))
    return ivfpq_search(spark, codes, emb, queries, cents, books)
