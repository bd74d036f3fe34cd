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
- TRAIN: on a BOUNDED DETERMINISTIC SAMPLE (hash-ordered top-k, a
  ``TakeOrderedAndProject`` — never a full scan collect), fit with
  seeded numpy Lloyd's driver-side. This is the FAISS shape: the
  training input of a trillion-vector index is a sample by design
  (``PQ_FIT_SAMPLE`` rows ≈ 8 MB), the artifacts are KB-sized and
  broadcast to every later stage. Distributing Lloyd's over a
  16k-row sample is per-task overhead, not scale — measured 4.5 s
  of job overhead at sf0.1 vs <0.2 s driver-side for identical
  centroids.
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


PQ_FIT_SAMPLE = 16_384  # training-sample cap (~8 MB at dim 64)


def fit_sample(emb: DataFrame, cap: int = PQ_FIT_SAMPLE) -> np.ndarray:
    """Bounded DETERMINISTIC training sample as a driver-side matrix:
    the ``cap`` rows with the smallest ``xxhash64(vec_id)`` — a
    hash-ordered top-k, which Spark plans as TakeOrderedAndProject
    (per-partition heaps, no global sort, no full collect). At any
    corpus size the result is the same ≤cap×dim matrix, so training
    cost is O(cap), independent of N."""
    rows = (
        emb.select("vec_id", "v")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(cap)
        .collect()
    )
    return np.array([r["v"] for r in rows])


def train_codebooks(sample: np.ndarray, dim: int) -> np.ndarray:
    """All M sub-codebooks from the bounded fit sample → ndarray
    (M, K, dim//M): seeded numpy Lloyd's per subspace, driver-side
    (see module docstring — the sample IS the scale contract; the
    artifacts are tiny: M*K*d/M floats, the broadcast side of every
    later encode/search stage)."""
    sub_d = dim // PQ_M
    books = np.zeros((PQ_M, PQ_K, sub_d))
    for s in range(PQ_M):
        books[s] = _lloyd(
            sample[:, s * sub_d : (s + 1) * sub_d], PQ_K, PQ_ITERS, PQ_SEED + s
        )
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


@register("qx240_ann_pq", oracle=None, tags=("similarity", "ann", "pq"))
def qx240_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    books = train_codebooks(fit_sample(emb_n), dim)
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


def train_coarse_centroids(
    spark: SparkSession, emb_n: DataFrame, sample: np.ndarray | None = None
) -> np.ndarray:
    """Trained coarse quantizer: seeded Lloyd's over the bounded fit
    sample (same train-on-sample contract as the codebooks — an
    iterative MLlib fit over a sample-sized input is pure scheduler
    overhead, measured ~5 s at sf0.1 for 2 000 vectors). Returns
    (IVFPQ_CELLS, dim) centroids; pass ``sample`` to share one
    fit_sample collect across coarse + codebook training."""
    if sample is None:
        sample = fit_sample(emb_n)
    return _lloyd(sample, IVFPQ_CELLS, PQ_ITERS, PQ_SEED)


def ivfpq_residuals(
    spark: SparkSession, emb_n: DataFrame, cents: np.ndarray
) -> DataFrame:
    """(vec_id, v) → (vec_id, cell_id, v=residual): top-1 cell and
    residual as PURE narrow JVM expressions over literal centroid
    arrays — argmin via array_position(d2s, array_min(d2s)) (first
    match = lowest cell_id tie-break), residual via zip_with against
    element_at of the literal centroid matrix. Zero shuffle, zero row
    explode; the earlier spelling (8× broadcast crossJoin + per-vec_id
    row_number window) shuffled 8N rows to pick 1-of-8 — this one
    never leaves the scan stage, so assignment cost at 100 TB is the
    scan itself."""
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    d2s = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    "v",
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            for c in cents
        ]
    )
    cell = (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")
    return emb_n.withColumn("cell_id", cell).select(
        "vec_id",
        "cell_id",
        F.zip_with(
            "v", F.element_at(cent_lit, F.col("cell_id") + 1), lambda x, y: x - y
        ).alias("v"),
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
    of IVFPQ_CELLS cells per query), and PQ (qx240) shrinks WHAT is
    scored (8-byte RESIDUAL codes — v minus its cell centroid, the
    encoding FAISS uses because residuals have ~cells× less variance
    than raw vectors, so the same 8 bytes quantize finer).

    Plan shape, all stages scale-safe:
    - coarse centroids + residual codebooks trained on ONE bounded
      hash-ordered sample (fit_sample), driver-side seeded Lloyd's —
      the FAISS train-on-sample contract, O(PQ_FIT_SAMPLE) at any N;
    - assignment + residuals are narrow JVM expressions in the scan
      stage (ivfpq_residuals — no shuffle, no row explode);
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
    # ONE bounded sample collect feeds both trainers; the sample's
    # residuals are computed in numpy (same argmin the distributed
    # encode path applies), so training adds no distributed pass
    sample = fit_sample(emb_n)
    cents = train_coarse_centroids(spark, emb_n, sample=sample)
    assign = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    books = train_codebooks(sample - cents[assign], dim)
    codes = encode(ivfpq_residuals(spark, emb_n, cents), books, extra=("cell_id",))
    return ivfpq_search(spark, codes, emb, queries, cents, books)
