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
    from bqfetch_spark.operators.pq import fit_sample

    sample = fit_sample(emb_n)
    cents = train_coarse_centroids(spark, emb_n, sample=sample)
    assign = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    books = train_codebooks(sample - cents[assign], dim)
    _write_artifacts(cents, books, index_dir)
    return cents, books


def _write_artifacts(cents: np.ndarray, books: np.ndarray, index_dir: str) -> None:
    """Persist the KB-sized frozen artifacts driver-side (pyarrow)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    m, k, _sub_d = books.shape
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


def save_baseline_occupancy(index_dir: str, counts: np.ndarray) -> None:
    """The trained cell-occupancy histogram IS an index artifact
    (FAISS keeps the same per-list sizes for imbalance monitoring):
    persisting it means the drift monitor never re-reads the code
    store just to rebuild a KB-sized baseline each wave."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "cell_id": list(range(len(counts))),
                "n": [int(x) for x in counts],
            }
        ),
        os.path.join(index_dir, "occupancy.parquet"),
    )


def invalidate_baseline_occupancy(index_dir: str) -> None:
    """Drop the occupancy artifact after a retrain: the store just
    changed shape, and rebuilding the histogram eagerly would cost a
    store scan the retrain itself doesn't need — the NEXT monitored
    wave rebuilds it on demand (load returns None → one scan)."""
    path = os.path.join(index_dir, "occupancy.parquet")
    if os.path.exists(path):
        os.remove(path)


def load_baseline_occupancy(index_dir: str, n_cells: int) -> np.ndarray | None:
    """Baseline occupancy COUNTS from the artifact, or None if absent
    (pre-round-11 index dirs fall back to a store scan)."""
    import pyarrow.parquet as pq

    path = os.path.join(index_dir, "occupancy.parquet")
    if not os.path.exists(path):
        return None
    t = pq.read_table(path).to_pydict()
    counts = np.zeros(n_cells, dtype=np.float64)
    for c, n in zip(t["cell_id"], t["n"]):
        if int(c) < n_cells:
            counts[int(c)] = float(n)
    return counts


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


def cell_counts(codes: DataFrame, n_cells: int) -> np.ndarray:
    """Raw cell-occupancy COUNTS of a code frame — n_cells-bucket
    fingerprint of WHERE vectors land in the coarse quantizer.
    O(rows) partial-aggregated groupBy; the collected frame is n_cells
    rows (the artifacts are KB — so is this). Counts, not shares: the
    sum doubles as the frame's row count, so callers never pay a
    separate .count() job for wave sizes."""
    rows = codes.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n")).collect()
    occ = np.zeros(n_cells, dtype=np.float64)
    for r in rows:
        occ[int(r["cell_id"])] = float(r["n"])
    return occ


def _normalized(counts: np.ndarray) -> np.ndarray:
    total = counts.sum()
    return counts / total if total else counts


def cell_occupancy(codes: DataFrame, n_cells: int) -> np.ndarray:
    """Normalized cell-occupancy histogram (cell_counts / total)."""
    return _normalized(cell_counts(codes, n_cells))


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
    invalidate_baseline_occupancy(index_dir)
    return cents, books


# A cell is HOT when the wave lands more than DRIFT_HOT_FACTOR times
# its uniform share there; drift counts as LOCALIZED (→ partial
# retrain) when the hot cells hold at least DRIFT_LOCALIZED_SHARE of
# the wave. A diffuse shift (every cell a little off) fails the share
# test and falls back to the full rebuild.
DRIFT_HOT_FACTOR = 2.0
DRIFT_LOCALIZED_SHARE = 0.5
DRIFT_SUBCELLS = 4  # new centroids carved out of the hot region


def partial_retrain(
    spark: SparkSession,
    emb_n_corpus: DataFrame,
    wave_emb_n: DataFrame,
    wave_codes: DataFrame,
    index_dir: str,
    hot_cells: list[int],
    cents: np.ndarray,
    books: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """LOCALIZED rebuild (VERDICT r10 #6 — the production shape when
    drift concentrates in a cell subset, FAISS's 'retrain the lists
    that changed'): instead of retraining every centroid and
    re-encoding the whole corpus,

    1. DRIFT_SUBCELLS new centroids are trained (driver-side seeded
       Lloyd's over a bounded sample) on ONLY the wave vectors that
       landed in hot cells — the region the frozen quantizer
       under-resolves — and APPENDED to the frozen centroid set (cold
       cells keep their ids, so their codes stay bit-valid);
    2. the ENCODE pass — the part that touches raw vectors, i.e. the
       expensive pass at 100 TB — runs only over the affected slice:
       corpus vectors whose stored cell is hot (partition-pruned read
       of those cell directories, then an id-join back to the
       vectors) plus the hot-cell wave rows. Residual codebooks stay
       frozen: residuals against the new, tighter centroids are
       smaller than the ones the books were trained on, so they
       quantize at least as well (recall gate in
       tests/test_ann_recall.py pins this).
    3. the store swap writes cold codes (pass-through, 8-byte rows —
       32× smaller than vectors) plus the re-encoded slice to a fresh
       directory and renames it over the old one (the
       run-beside-then-swap rebuild; rewriting only the hot cell
       directories in place is the next refinement, blocked today by
       the (ingest_batch, cell_id) layout making stale-partition
       cleanup non-atomic).

    Cold-cell wave rows are appended with the frozen artifacts (their
    nearest OLD cell is unchanged; a cold vector whose true nearest
    becomes a NEW cell is mis-binned by at most the old assignment —
    the standard partial-retrain approximation, bounded by the probe
    redundancy)."""
    from bqfetch_spark.operators.pq import PQ_ITERS, PQ_SEED, _lloyd, fit_sample

    store = os.path.join(index_dir, "codes")
    hot = [int(c) for c in hot_cells]
    hot_wave_ids = wave_codes.filter(F.col("cell_id").isin(hot)).select("vec_id")
    hot_wave = wave_emb_n.join(hot_wave_ids, "vec_id")
    sample = fit_sample(hot_wave)
    cents_new = np.vstack(
        [cents, _lloyd(sample, DRIFT_SUBCELLS, PQ_ITERS, PQ_SEED)]
    )

    old = spark.read.parquet(store)
    affected_ids = old.filter(F.col("cell_id").isin(hot)).select("vec_id")
    affected = emb_n_corpus.join(affected_ids, "vec_id").unionByName(hot_wave)
    recoded = (
        _clustered_for_store(ivfpq_encode(spark, affected, cents_new, books))
        .withColumn("ingest_batch", F.lit(-1).cast("bigint"))
    )
    cold_old = old.filter(~F.col("cell_id").isin(hot)).select(recoded.columns)
    # cold wave rows reuse the codes ALREADY computed for the drift
    # histogram — their frozen-artifact encoding is exactly what the
    # store needs (old cells keep their ids), so no second Arrow
    # encode pass over the wave
    cold_wave = (
        _clustered_for_store(wave_codes.filter(~F.col("cell_id").isin(hot)))
        .withColumn("ingest_batch", F.lit(-1).cast("bigint"))
    )
    tmp = store + ".retrain"
    (
        cold_old.unionByName(cold_wave)
        .unionByName(recoded)
        .write.mode("overwrite")
        .partitionBy("ingest_batch", "cell_id")
        .parquet(tmp)
    )
    import shutil

    shutil.rmtree(store)
    os.rename(tmp, store)
    _write_artifacts(cents_new, books, index_dir)
    invalidate_baseline_occupancy(index_dir)
    return cents_new, books


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
    occupancy to the trained baseline's (read from the occupancy
    ARTIFACT — no store re-scan per wave), and when the JSD crosses
    ``threshold`` rebuild: a LOCALIZED partial_retrain when the drift
    concentrates in hot cells, the full retrain_index otherwise.
    Returns the decision record the monitoring table stores per wave:
    {'jsd', 'retrained', 'mode', 'n_wave'} with mode in
    (None, 'partial', 'full').

    ``emb_n_corpus`` is the already-indexed vector corpus — only read
    (and for the partial path, only its hot-cell slice) when a retrain
    actually fires; the wave path itself never touches history,
    preserving q57's O(wave) append contract. The wave size rides the
    occupancy counts — no separate count job."""
    cents, books = load_index(spark, index_dir)
    n_cells = len(cents)
    store = os.path.join(index_dir, "codes")
    base_counts = load_baseline_occupancy(index_dir, n_cells)
    if base_counts is None:
        base_counts = cell_counts(spark.read.parquet(store), n_cells)
        save_baseline_occupancy(index_dir, base_counts)
    wave_codes = ivfpq_encode(spark, wave_emb_n, cents, books)
    wave_counts = cell_counts(wave_codes, n_cells)
    n_wave = int(wave_counts.sum())
    wave_occ = _normalized(wave_counts)
    jsd = occupancy_jsd(_normalized(base_counts), wave_occ)
    if jsd > threshold:
        # the retrain paths consume wave_codes several times (hot-id
        # splits, cold pass-through) — materialize the wave-sized code
        # frame once instead of re-running the Arrow encode per consumer
        wave_codes = wave_codes.localCheckpoint(eager=True)
        hot = [int(c) for c in np.nonzero(wave_occ > DRIFT_HOT_FACTOR / n_cells)[0]]
        if hot and float(wave_occ[hot].sum()) >= DRIFT_LOCALIZED_SHARE:
            partial_retrain(
                spark, emb_n_corpus, wave_emb_n, wave_codes, index_dir,
                hot, cents, books,
            )
            return {"jsd": jsd, "retrained": True, "mode": "partial", "n_wave": n_wave}
        retrain_index(spark, emb_n_corpus.unionByName(wave_emb_n), dim, index_dir)
        return {"jsd": jsd, "retrained": True, "mode": "full", "n_wave": n_wave}
    append_wave(spark, wave_emb_n, index_dir)
    new_counts = base_counts + wave_counts
    save_baseline_occupancy(index_dir, new_counts)
    return {"jsd": jsd, "retrained": False, "mode": None, "n_wave": n_wave}


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
