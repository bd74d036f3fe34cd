"""Incrementally-maintained rollup: the streaming materialized-view
pattern for the engine's time-window aggregates (batch: q30/q85).

A nightly/continuous pipeline doesn't recompute its hourly metrics
table from 100 TB of history — it UPSERTS the buckets each ingest wave
touches. Topology (same external-state stance as incremental.py's
dedup store):

- The STORE is a parquet table of per-(hour, event_type) partials —
  count + exact DECIMAL sum — partitioned into DAY directories
  (``day=...``; rows stay hour-grain). It is the only artifact that
  persists between waves; what a Delta/Hudi table would be in
  production. Day grain (round-5 change, was ``hr=``) is the
  scale-correct layout twice over: a month of history is ~30
  directories instead of ~720 (the hour-grain backfill spent ~11 s of
  its ~11.6 s in per-directory commits on local FS; day grain cuts the
  same wave to ~number-of-days commits), and hourly partials are so
  small (24 × n_event_types rows per day) that hour directories are a
  small-files antipattern at 100 TB.
- Each micro-batch (foreachBatch) aggregates ITS OWN rows to partials
  (map-side combine over at most one wave of data), then merges them
  with the store rows for the AFFECTED DAYS ONLY and rewrites just
  those day partitions (dynamic partition overwrite). Days not touched
  by the wave are never read or written — per-wave cost is
  O(wave + touched-days), independent of history size.
- Merging is exact because the partials are ADDITIVE (counts add,
  DECIMAL sums add); the final read renders the decimal as a rounded
  double, so the result is bit-identical to a one-shot batch rollup
  regardless of how ingest was sliced into waves.
- NULL-ts events land in a NULL bucket, stored under Spark's
  ``day=__HIVE_DEFAULT_PARTITION__`` directory; the touched-partition
  probe maps the NULL day to that directory name so prior NULL-bucket
  partials merge instead of being overwritten (round-4 advice: the
  old probe looked for a literal ``hr=None`` path and silently
  dropped NULL-bucket history).

The streaming query itself holds no state (foreachBatch + external
store), so a restart resumes from the checkpoint + the store.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC_SUM = "decimal(18,6)"  # per-row cast before summing
# The STORED sum type is pinned wider and identical in EVERY write
# path: Spark widens sum(decimal(18,6)) to decimal(28,6), so letting
# the first-write path store the widened type while the merge path
# re-cast produced mixed decimal widths across partitions of one store
# — unreadable as a whole (physical FIXED_LEN_BYTE_ARRAY width varies
# with precision). (38,6) is also the overflow-safe choice for a
# 100 TB store.
STORE_SUM = "decimal(38,6)"

# Spark's directory name for a NULL partition value.
HIVE_NULL_PART = "__HIVE_DEFAULT_PARTITION__"


def _partials(batch: DataFrame) -> DataFrame:
    """Additive per-(hour, event_type) partial aggregates of one wave."""
    return batch.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC_SUM)).cast(STORE_SUM).alias("sum_value"),
    )


def _day_dir(store_dir: str, day) -> str:
    part = HIVE_NULL_PART if day is None else str(day)
    return os.path.join(store_dir, f"day={part}")


def upsert_rollup(spark: SparkSession, batch: DataFrame, store_dir: str) -> None:
    """Merge one wave's partials into the store, rewriting only the
    day partitions the wave touches."""
    partials = _partials(batch).withColumn(
        "day", F.date_format("bucket_start", "yyyyMMdd").cast("long")
    )
    if not os.path.isdir(store_dir) or not any(
        e.startswith("day=") for e in os.listdir(store_dir)
    ):
        merged = partials
    else:
        affected = [r["day"] for r in partials.select("day").distinct().collect()]
        # read ONLY the touched day directories (basePath keeps the day
        # partition column). A full-store read + filter is wrong twice
        # at scale: the listing alone is O(history), and dir-name type
        # inference (day= digits → int) defeated isin pruning against
        # string literals — caught by scripts/scale_check.py, where the
        # wave cost scaled 6× with a 10× store instead of staying flat.
        # NULL days probe the __HIVE_DEFAULT_PARTITION__ directory.
        touched = [
            p for d in affected if os.path.isdir(p := _day_dir(store_dir, d))
        ]
        if not touched:
            existing = None
        else:
            existing = spark.read.option("basePath", store_dir).parquet(*touched)
        merged = (
            (partials if existing is None else existing.unionByName(partials))
            .groupBy("bucket_start", "event_type", "day")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").cast(STORE_SUM).alias("sum_value"),
            )
            # materialize BEFORE the write: the write overwrites the very
            # partitions `existing` reads (self-overwrite is otherwise an
            # AnalysisException / a correctness hazard)
            .localCheckpoint(eager=True)
        )
    # dynamic mode replaces only the day= partitions present in `merged`.
    # repartition on day (not coalesce(1)): each day still lands in ONE
    # file, but a wide wave (e.g. a backfill writing a month) fans its
    # partition writes across tasks instead of one task writing dozens
    # of directories sequentially. Steady-state waves touch 1-2 days
    # and run in ~0.5 s regardless of history size
    # (scripts/scale_check.py).
    (
        merged.repartition(F.col("day"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(store_dir)
    )


def run_rollup_maintenance(spark: SparkSession, sf_dir: str, work_dir: str) -> DataFrame:
    """Bounded streaming run: the events table replays as a stream
    whose waves upsert the hourly store. Returns the maintained store
    rendered exactly like a one-shot batch rollup (rounded-double
    sums), which is what the q98 oracle checks."""
    from bqfetch_spark.streaming.windows import streaming_events

    store_dir = os.path.join(work_dir, "rollup_store")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    incoming = streaming_events(spark, sf_dir)

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        upsert_rollup(spark, batch, store_dir)

    q = (
        incoming.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store_dir).select(
        "bucket_start",
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("sum_value").cast("double"), 6).alias("total_value"),
    )
