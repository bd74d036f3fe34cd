"""Incrementally-maintained source-mix drift monitor — the data-ops
alarm a continuously-ingesting corpus needs: "has the share of source X
moved since the baseline snapshot?" catches upstream crawler breakage,
licensing cutoffs, and mixture regressions before they reach training.

Store design (the round-6/7 incremental-store conventions): per-source
DOC COUNTS are integers, and integer addition is exact and associative —
so per-wave partial counts are perfectly additive and the store-merged
totals are BIT-IDENTICAL to a one-shot groupBy over the same corpus,
however ingest is sliced. The registry query over the maintained store
therefore carries a FULL value-hash oracle (qx200's trick applied to the
mix monitor). Each wave lands as a sources-sized frame under its own
ingest_batch partition: O(wave) cost, history never re-read; retries are
dynamic overwrites of the wave's own partition; the store is claimed by
its checkpoint lineage (streaming/ownership.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BACKFILL_BATCH_ID = -1
MANUAL_BATCH_ID = -2  # manual append_mix_wave calls without a foreachBatch id


def _wave_of() -> "F.Column":
    # deterministic 3-way ingest split, the pca_stats/ann_index family
    # convention: 60% backfill, two 20% waves
    return F.pmod(F.col("doc_id"), F.lit(5))


def mix_counts(docs: DataFrame) -> DataFrame:
    """(source, n_docs, n_tokens) for a document frame — the per-wave
    partial the store accumulates. One sources-sized partial-agg'd
    exchange over the wave only."""
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )


def append_mix_wave(
    spark: SparkSession,
    wave_docs: DataFrame,
    store_dir: str,
    batch_id: int | None = None,
) -> None:
    """One ingest wave: the wave's per-source counts land under its own
    ingest_batch partition. With a foreachBatch ``batch_id`` the write
    is a dynamic overwrite of that partition (retry-idempotent);
    manual calls land under MANUAL_BATCH_ID."""
    bid = MANUAL_BATCH_ID if batch_id is None else int(batch_id)
    frame = mix_counts(wave_docs).withColumn(
        "ingest_batch", F.lit(bid).cast("bigint")
    )
    writer = frame.coalesce(1).write.partitionBy("ingest_batch")
    if batch_id is None:
        writer.mode("append").parquet(store_dir)
    else:
        (
            writer.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(store_dir)
        )


def drift_report(spark: SparkSession, store_dir: str) -> DataFrame:
    """Per-source mix drift computed FROM THE MAINTAINED STORE:
    baseline share (the backfill partition) vs current share (all
    partitions), and their difference. All inputs are store-merged
    integer counts, so the report is bit-equal to a one-shot spelling
    over the same corpus slices."""
    store = spark.read.parquet(store_dir)
    base = (
        store.filter(F.col("ingest_batch") == BACKFILL_BATCH_ID)
        .groupBy("source")
        .agg(F.sum("n_docs").cast("bigint").alias("n_docs_baseline"))
    )
    total = store.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs_total")
    )
    nb = base.agg(F.sum("n_docs_baseline").alias("__nb"))
    nt = total.agg(F.sum("n_docs_total").alias("__nt"))
    share_b = F.coalesce("n_docs_baseline", F.lit(0)).cast("double") / F.col("__nb")
    share_t = F.col("n_docs_total").cast("double") / F.col("__nt")
    return (
        total.join(base, "source", "left")
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nt))
        .select(
            "source",
            F.coalesce("n_docs_baseline", F.lit(0))
            .cast("bigint")
            .alias("n_docs_baseline"),
            "n_docs_total",
            F.round(share_b, 6).alias("share_baseline"),
            F.round(share_t, 6).alias("share_total"),
            F.round(share_t - share_b, 6).alias("drift"),
        )
        .orderBy("source")
    )


def run_incremental_source_mix(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """Bounded streaming run: 60% of the documents backfill the mix
    store; the remaining two slices arrive through a foreachBatch
    stream (AvailableNow — integer additivity makes the store merge
    bit-equal however the trigger slices them). Returns the drift
    report computed from the maintained store."""
    return drift_report(spark, build_mix_store(spark, sf_dir, work_dir))


def build_mix_store(spark: SparkSession, sf_dir: str, work_dir: str) -> str:
    """Backfill + stream the per-source mix store and return its path —
    shared by the drift report (qx231) and the streaming water-filling
    planner (qx281), which read DIFFERENT columns of the same additive
    store."""
    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.streaming.ownership import (
        claim_store,
        owner_key_for_checkpoint,
    )

    store_dir = os.path.join(work_dir, "mix")
    incoming_dir = os.path.join(work_dir, "incoming")
    ckpt_dir = os.path.join(work_dir, "ckpt")

    docs = load_catalog(spark, sf_dir).table("documents").select(
        "doc_id", "source", "text"
    )
    (
        mix_counts(docs.filter(_wave_of() <= 2))
        .withColumn("ingest_batch", F.lit(BACKFILL_BATCH_ID).cast("bigint"))
        .coalesce(1)
        .write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(store_dir)
    )
    claim_store(store_dir, owner_key_for_checkpoint(ckpt_dir))

    os.makedirs(incoming_dir, exist_ok=True)
    for wave in (3, 4):
        docs.filter(_wave_of() == wave).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(incoming_dir, f"wave_{wave}")
        )
    schema = spark.read.parquet(os.path.join(incoming_dir, "wave_3")).schema
    # No maxFilesPerTrigger cap (round 14, guide §1.2 — the qx200
    # precedent): AvailableNow folds every pending wave file into ONE
    # micro-batch instead of one batch per file, saving the fixed
    # scheduler + checkpoint-commit fee per extra batch. Semantics
    # unchanged: the batch folds through the SAME append_mix_wave
    # dynamic-overwrite path, and integer count additivity makes the
    # store-merged totals bit-equal however ingest is sliced (the
    # tested design property). Production tunes the trigger to its
    # latency target, not to one-file batches.
    incoming = (
        spark.readStream.schema(schema)
        .parquet(os.path.join(incoming_dir, "wave_*"))
    )

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        append_mix_wave(spark, batch, store_dir, batch_id=batch_id)

    q = (
        incoming.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return store_dir
