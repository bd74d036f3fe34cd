"""Incrementally-maintained benchmark decontamination — qx259's scan as
a continuously-ingesting pipeline: the benchmark shingle set is a
FROZEN artifact (eval suites change rarely and deliberately), and every
arriving training wave is checked against it on ingest, so contaminated
documents are flagged before they ever reach a training mix instead of
by a full-corpus sweep after the fact.

Store design (the round-6/7 incremental conventions): each wave's
flagged-doc rows land under their own ingest_batch partition — O(wave)
cost, the frozen benchmark store is read-only and history is never
re-scanned. A document belongs to exactly ONE wave, so its flagged row
is final the moment its wave commits — the store-merged report is
therefore BIT-IDENTICAL to the one-shot scan over the same corpus
(stronger than the integer-additivity argument qx200/qx231 need: here
rows don't even merge), and the registry query over the maintained
store carries qx259's FULL value-hash oracle verbatim. Retries are
dynamic overwrites of the wave's own partition; the store is claimed by
its checkpoint lineage (streaming/ownership.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bqfetch_spark.operators.llm_pipeline import CONTAM_MOD, contam_shingles

BACKFILL_BATCH_ID = -1
MANUAL_BATCH_ID = -2


def _wave_of() -> "F.Column":
    # deterministic 3-way ingest split, the drift/pca_stats convention:
    # 60% backfill, two 20% waves
    return F.pmod(F.col("doc_id"), F.lit(5))


def build_benchmark_store(docs: DataFrame, bench_dir: str) -> None:
    """The frozen artifact: distinct (h, g) shingles of the benchmark
    subset. At real scale this is eval-suite-sized (small); the h
    column is the 64-bit join bucket, g the collision recheck."""
    (
        contam_shingles(docs.filter(F.col("doc_id") % CONTAM_MOD == 0))
        .select("h", F.col("g").alias("bg"))
        .distinct()
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(bench_dir)
    )


def flag_wave(
    spark: SparkSession,
    wave_docs: DataFrame,
    bench_dir: str,
    store_dir: str,
    batch_id: int | None = None,
) -> None:
    """One ingest wave: the wave's shingles join the frozen benchmark
    store (hash bucket + gram recheck — the q40 collision-safe
    pattern), and per-doc distinct-shared-gram counts land under the
    wave's own ingest_batch partition."""
    bid = MANUAL_BATCH_ID if batch_id is None else int(batch_id)
    bench = spark.read.parquet(bench_dir)
    sh = contam_shingles(wave_docs)
    flagged = (
        sh.join(F.broadcast(bench), (sh["h"] == bench["h"]) & (sh["g"] == bench["bg"]))
        .groupBy("doc_id")
        .agg(F.count_distinct("g").cast("bigint").alias("n_shared_ngrams"))
        .withColumn("ingest_batch", F.lit(bid).cast("bigint"))
    )
    writer = flagged.coalesce(1).write.partitionBy("ingest_batch")
    if batch_id is None:
        writer.mode("append").parquet(store_dir)
    else:
        (
            writer.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(store_dir)
        )


FLAG_STORE_SCHEMA = "doc_id long, n_shared_ngrams long, ingest_batch long"


def contamination_report(spark: SparkSession, store_dir: str) -> DataFrame:
    """Flagged docs FROM THE MAINTAINED STORE. Each doc's row was
    finalized by its own wave, so this is bit-equal to the one-shot
    qx259 scan — same schema, same values, same oracle. The explicit
    schema keeps the zero-contamination case honest: a store whose
    waves flagged nothing has no part files, and a schema-inferring
    read would raise instead of returning the empty frame."""
    return (
        spark.read.schema(FLAG_STORE_SCHEMA)
        .parquet(store_dir)
        .select("doc_id", "n_shared_ngrams")
        .orderBy("doc_id")
    )


def run_incremental_decontamination(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """Bounded streaming run: freeze the benchmark store, backfill 60%
    of the training docs, stream the remaining two slices through
    foreachBatch (AvailableNow — per-doc flags are batch-slicing
    invariant), and report from the store."""
    from bqfetch_spark.catalog import load_catalog
    from bqfetch_spark.streaming.ownership import (
        claim_store,
        owner_key_for_checkpoint,
    )

    bench_dir = os.path.join(work_dir, "bench")
    store_dir = os.path.join(work_dir, "flags")
    incoming_dir = os.path.join(work_dir, "incoming")
    ckpt_dir = os.path.join(work_dir, "ckpt")

    docs = load_catalog(spark, sf_dir).table("documents").select(
        "doc_id", "text"
    )
    build_benchmark_store(docs, bench_dir)
    train = docs.filter(F.col("doc_id") % CONTAM_MOD != 0)

    flag_wave(
        spark,
        train.filter(_wave_of() <= 2),
        bench_dir,
        store_dir,
        batch_id=BACKFILL_BATCH_ID,
    )
    claim_store(store_dir, owner_key_for_checkpoint(ckpt_dir))

    os.makedirs(incoming_dir, exist_ok=True)
    for wave in (3, 4):
        train.filter(_wave_of() == wave).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(incoming_dir, f"wave_{wave}")
        )
    schema = spark.read.parquet(os.path.join(incoming_dir, "wave_3")).schema
    # No maxFilesPerTrigger cap (round 14, guide §1.2 — the qx200
    # precedent): AvailableNow folds every pending wave file into ONE
    # micro-batch instead of one batch per file, saving the fixed
    # scheduler + checkpoint-commit fee per extra batch. Semantics
    # unchanged: flag_wave is per-doc against the FROZEN benchmark
    # store and each doc lives in exactly one wave, so a doc's flag row
    # is identical whichever micro-batch carried it; the report
    # aggregates across ingest_batch partitions. Production tunes the
    # trigger to its latency target, not to one-file batches.
    incoming = (
        spark.readStream.schema(schema)
        .parquet(os.path.join(incoming_dir, "wave_*"))
    )

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        flag_wave(spark, batch, bench_dir, store_dir, batch_id=batch_id)

    q = (
        incoming.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return contamination_report(spark, store_dir)
