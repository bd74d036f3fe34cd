"""Incrementally-maintained IVF-PQ index — the streaming leg of the
ANN family (one-shot build: q56_ann_ivfpq), and the vector twin of the
incremental dedup store (streaming/incremental.py).

A production vector index doesn't retrain on every insert: the coarse
centroids and PQ codebooks are trained once (on a sample) and FROZEN
as index artifacts; each ingest wave of new vectors is assigned to its
nearest frozen cell, residual-encoded with the frozen codebooks, and
its 8-byte codes APPENDED to the code store — FAISS's ``add``
after ``train``, as an external-state streaming topology:

- The ARTIFACTS (centroids + codebooks, a few KB) and the CODE STORE
  (vec_id, cell_id, 8-byte code — partitioned by (ingest_batch,
  cell_id): probed searches prune on the cell_id level, and the
  batch level makes wave appends retry-idempotent) are the only state
  that persists between waves; the streaming query itself holds none.
- Per-wave cost is O(wave): one broadcast-centroid argmin + one
  Arrow-batched encode pass + an append. History is never read.
  At 100 TB of embeddings the store is ~32× smaller than the vectors
  and the waves never touch the vectors already indexed.
- Because the artifacts are frozen, wave-encoded codes are
  BIT-IDENTICAL to one-shot-encoded codes over the same corpus
  (pytest-pinned) — slicing ingest differently cannot change the
  index, the same additivity stance as the rollup store partials.
- Retraining (drift) is an offline rebuild: new artifacts, re-encode,
  swap — deliberately out of the wave path.

Search over the maintained store goes through the same
``ivfpq_search`` ADC scan + exact re-rank as q56_ann_ivfpq; recall@10 vs the
exact baseline is gated in tests/test_ann_recall.py.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bqfetch_spark.operators.pq import (
    ivfpq_encode,
    train_codebooks,
    train_coarse_centroids,
    unit_normalized,
)

# deterministic 3-way ingest split: 60% initial build, two 20% waves.
# A function, not a module-level Column: building a Column requires an
# active SparkContext, which must not be an import-time prerequisite.
def _wave_of() -> "F.Column":
    return F.pmod(F.col("vec_id"), F.lit(5))


def build_index(
    spark: SparkSession, emb_n: DataFrame, dim: int, index_dir: str
) -> tuple[np.ndarray, np.ndarray]:
    """Train centroids + residual codebooks on a bounded sample of the
    initial corpus (fit_sample — the FAISS train-on-sample contract)
    and persist them as the frozen index artifacts: two KB-sized
    parquet files written driver-side with pyarrow. Artifacts are
    driver/broadcast data by construction — routing a 16 KB write
    through a Spark job is scheduler overhead, not distribution."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bqfetch_spark.operators.pq import fit_sample

    sample = fit_sample(emb_n)
    cents = train_coarse_centroids(spark, emb_n, sample=sample)
    assign = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    books = train_codebooks(sample - cents[assign], dim)
    m, k, sub_d = books.shape
    os.makedirs(index_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {"cell_id": list(range(len(cents))), "cv": [c.tolist() for c in cents]}
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "subspace": [s for s in range(m) for _ in range(k)],
                "centroid": [c for _ in range(m) for c in range(k)],
                "vec": [books[s, c].tolist() for s in range(m) for c in range(k)],
            }
        ),
        os.path.join(index_dir, "codebooks.parquet"),
    )
    return cents, books


def load_index(spark: SparkSession, index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Frozen artifacts back as numpy (a few KB — the broadcast side
    of every encode/search stage; read driver-side, like any
    checkpoint sidecar)."""
    import pyarrow.parquet as pq

    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet")).to_pydict()
    cents = np.zeros((len(ct["cell_id"]), len(ct["cv"][0])))
    for i, cv in zip(ct["cell_id"], ct["cv"]):
        cents[i] = cv
    bt = pq.read_table(os.path.join(index_dir, "codebooks.parquet")).to_pydict()
    m = max(bt["subspace"]) + 1
    k = max(bt["centroid"]) + 1
    books = np.zeros((m, k, len(bt["vec"][0])))
    for s, c, vec in zip(bt["subspace"], bt["centroid"], bt["vec"]):
        books[s, c] = vec
    return cents, books


def _clustered_for_store(codes: DataFrame) -> DataFrame:
    """Cluster codes on (cell_id, bounded salt) before the partitioned
    write: a raw ``partitionBy`` writes tasks × cells files (256 per
    wave at 32 slots — the small-file debris q39's compactor exists to
    clean up); clustering bounds it at salt files per cell per wave
    while the salt keeps the write parallel at scale."""
    return codes.repartition(
        F.col("cell_id"), F.pmod(F.xxhash64("vec_id"), F.lit(4))
    )


def append_wave(
    spark: SparkSession,
    wave_emb_n: DataFrame,
    index_dir: str,
    batch_id: int | None = None,
) -> None:
    """One ingest wave: encode against the FROZEN artifacts, append
    codes to the store (partitioned by (ingest_batch, cell_id) — a
    probed search still prunes on the cell_id level). O(wave); never
    reads the store.

    Pass the foreachBatch ``batch_id`` to make the append IDEMPOTENT
    under micro-batch retry (round-6 fix, same class as
    streaming/incremental.py): the wave then lands as a dynamic
    overwrite of its own ingest_batch partitions, so a re-run replaces
    its half-written codes instead of appending duplicates that a
    top-k search would surface twice. Without a batch_id (manual bulk
    adds) the write is a plain append under ingest_batch=-1."""
    import pyspark.sql.functions as F

    cents, books = load_index(spark, index_dir)
    codes = _clustered_for_store(
        ivfpq_encode(spark, wave_emb_n, cents, books)
    ).withColumn(
        "ingest_batch",
        F.lit(-1 if batch_id is None else int(batch_id)).cast("bigint"),
    )
    writer = codes.write.partitionBy("ingest_batch", "cell_id")
    if batch_id is None:
        writer.mode("append").parquet(os.path.join(index_dir, "codes"))
    else:
        (
            writer.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(os.path.join(index_dir, "codes"))
        )


def run_incremental_ann_index(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """Bounded streaming run: 60% of the embeddings build the index;
    the rest arrives as two wave files through a foreachBatch stream
    that appends codes against the frozen artifacts. Returns the
    IVF-PQ top-10 search over the maintained store (ivfpq_search)."""
    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.functions.vectors import as_double
    from bqfetch_spark.operators.pq import ivfpq_search

    from bqfetch_spark.streaming.ownership import claim_store, owner_key_for_checkpoint

    index_dir = os.path.join(work_dir, "index")
    incoming_dir = os.path.join(work_dir, "incoming")
    ckpt_dir = os.path.join(work_dir, "ckpt")

    emb = load_catalog(spark, sf_dir).table("embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    emb_n = unit_normalized(emb)
    initial = emb_n.filter(_wave_of() <= 2)
    dim = emb_n.select(F.size("v").alias("d")).first()["d"]
    cents, books = build_index(spark, initial, dim, index_dir)
    (
        _clustered_for_store(ivfpq_encode(spark, initial, cents, books))
        .withColumn("ingest_batch", F.lit(-1).cast("bigint"))
        .write.mode("overwrite")
        .partitionBy("ingest_batch", "cell_id")
        .parquet(os.path.join(index_dir, "codes"))
    )
    # after the backfill overwrite: the codes store keys appends on the
    # foreachBatch id — claim it for this checkpoint lineage so a fresh
    # checkpoint can't restart at batch 0 over it (streaming/ownership.py)
    claim_store(os.path.join(index_dir, "codes"), owner_key_for_checkpoint(ckpt_dir))

    # the two remaining slices arrive as separate files → separate
    # micro-batches (maxFilesPerTrigger=1)
    os.makedirs(incoming_dir, exist_ok=True)
    for wave in (3, 4):
        emb_n.filter(_wave_of() == wave).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(incoming_dir, f"wave_{wave}")
        )
    schema = spark.read.parquet(os.path.join(incoming_dir, "wave_3")).schema
    incoming = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(incoming_dir, "wave_*"))
    )

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        append_wave(spark, batch, index_dir, batch_id=batch_id)

    q = (
        incoming.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    queries = sorted(
        (int(r["vec_id"]), np.array(r["v"]))
        for r in emb_n.filter(F.col("vec_id") < 5).collect()
    )
    cents, books = load_index(spark, index_dir)
    return ivfpq_search(spark, codes, emb, queries, cents, books)


# ---------------------------------------------------------------------------
# Drift-triggered retrain: when ingest waves stop looking like the
# training distribution, rebuild the frozen artifacts
# ---------------------------------------------------------------------------

# Jensen-Shannon divergence (base 2, so 0..1) between a wave's
# cell-occupancy distribution and the trained baseline above which the
# artifacts are declared stale. Composes qx231's drift-monitor stance
# (distribution shift measured on cheap integer partials) with this
# index: occupancy is a free by-product of assignment — no extra pass.
ANN_DRIFT_JSD = 0.15


def cell_occupancy(codes: DataFrame, n_cells: int) -> np.ndarray:
    """Normalized cell-occupancy histogram of a code frame — the
    n_cells-bucket fingerprint of WHERE vectors land in the coarse
    quantizer. O(rows) partial-aggregated groupBy; the collected frame
    is n_cells rows (the artifacts are KB — so is this)."""
    rows = codes.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n")).collect()
    occ = np.zeros(n_cells, dtype=np.float64)
    for r in rows:
        occ[int(r["cell_id"])] = float(r["n"])
    total = occ.sum()
    return occ / total if total else occ


def occupancy_jsd(p: np.ndarray, q: np.ndarray) -> float:
    """Jensen-Shannon divergence, base 2 (symmetric, bounded [0,1],
    defined even when a cell is empty on one side — the reason it
    beats raw KL for occupancy comparison)."""
    m = (p + q) / 2.0

    def kl(a: np.ndarray, b: np.ndarray) -> float:
        mask = a > 0
        return float((a[mask] * np.log2(a[mask] / b[mask])).sum())

    return 0.5 * kl(p, m) + 0.5 * kl(q, m)


def retrain_index(
    spark: SparkSession, emb_n_all: DataFrame, dim: int, index_dir: str
) -> tuple[np.ndarray, np.ndarray]:
    """The offline rebuild the module docstring promises: retrain
    centroids + codebooks on (a bounded sample of) the CURRENT corpus,
    re-encode every vector, and swap the store. At 100 TB the rebuild
    is one encode pass over the vectors — exactly the one-shot build
    cost — and runs beside the serving store until the swap; here the
    swap is an in-place overwrite (the parquet store's dynamic
    partition overwrite)."""
    cents, books = build_index(spark, emb_n_all, dim, index_dir)
    (
        _clustered_for_store(ivfpq_encode(spark, emb_n_all, cents, books))
        .withColumn("ingest_batch", F.lit(-1).cast("bigint"))
        .write.mode("overwrite")
        .partitionBy("ingest_batch", "cell_id")
        .parquet(os.path.join(index_dir, "codes"))
    )
    return cents, books


def ingest_with_drift_monitor(
    spark: SparkSession,
    emb_n_corpus: DataFrame,
    wave_emb_n: DataFrame,
    dim: int,
    index_dir: str,
    threshold: float = ANN_DRIFT_JSD,
) -> dict:
    """Append one wave with the drift check in the loop: encode the
    wave against the frozen artifacts (O(wave)), compare its cell
    occupancy to the trained baseline's, and when the JSD crosses
    ``threshold`` rebuild the artifacts on corpus+wave and re-encode
    (retrain_index). Returns the decision record the monitoring table
    stores per wave: {'jsd', 'retrained', 'n_wave'}.

    ``emb_n_corpus`` is the already-indexed vector corpus — only read
    when a retrain actually fires (the wave path itself never touches
    history, preserving q57's O(wave) append contract)."""
    cents, books = load_index(spark, index_dir)
    n_cells = len(cents)
    store = os.path.join(index_dir, "codes")
    baseline = cell_occupancy(spark.read.parquet(store), n_cells)
    wave_codes = ivfpq_encode(spark, wave_emb_n, cents, books)
    wave_occ = cell_occupancy(wave_codes, n_cells)
    jsd = occupancy_jsd(baseline, wave_occ)
    n_wave = wave_emb_n.count()
    if jsd > threshold:
        retrain_index(spark, emb_n_corpus.unionByName(wave_emb_n), dim, index_dir)
        return {"jsd": jsd, "retrained": True, "n_wave": n_wave}
    append_wave(spark, wave_emb_n, index_dir)
    return {"jsd": jsd, "retrained": False, "n_wave": n_wave}


# planted drift workload (shared by qx242 and its recall pytest): a
# dense 2-mode cloud in seeded directions the fixture corpus never
# produced — unit-norm, tighter than the rerank budget, so frozen
# artifacts measurably lose recall there and a retrain recovers it
DRIFT_MODES = 2
DRIFT_N = 1200
DRIFT_SPREAD = 0.05
DRIFT_SEED = 7
DRIFT_ID_BASE = 2_000_000


def drifted_wave(spark: SparkSession, dim: int) -> DataFrame:
    """Deterministic drifted ingest wave: DRIFT_N unit vectors packed
    around DRIFT_MODES seeded directions (spread DRIFT_SPREAD). Size
    is fixed (not SF-proportional): it models a NEW modality arriving,
    and the pytest gate needs the cloud denser than PQ_RERANK."""
    rng = np.random.RandomState(DRIFT_SEED)
    modes = rng.randn(DRIFT_MODES, dim)
    modes /= np.linalg.norm(modes, axis=1, keepdims=True)
    rows = []
    for i in range(DRIFT_N):
        v = modes[i % DRIFT_MODES] + DRIFT_SPREAD * rng.randn(dim)
        v = v / np.linalg.norm(v)
        rows.append((DRIFT_ID_BASE + i, v.tolist()))
    return spark.createDataFrame(rows, "vec_id bigint, v array<double>")
