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
