"""SparkSession construction with scale-appropriate defaults.

The reference (bqfetch/bqfetch.py:52-93) wraps a credentialed BigQuery
client; our equivalent of "client/session" is the SparkSession itself
(SURVEY.md §1.1). Config here is chosen for the 100 TB posture:

- AQE on (runtime coalescing, skew-join splitting, join re-planning).
- Arrow on for every pandas edge (the reference's wire format was Arrow,
  bqfetch/bqfetch.py:487).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- shuffle.partitions sized by env (32 locally; a real cluster overrides —
  AQE coalesces down, so over-provisioning is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(app_name: str = "bqfetch-spark") -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster, master/memory come from spark-submit; the builder
    only fills local-mode defaults when nothing is set.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # let Python DataSources (sources/chunked_source.py) receive
        # pushed filters — the reference's row_restriction contract
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # runtime bloom-filter semi-join pruning: a selective dimension
        # filter (q06/q18/q88 shapes) builds a bloom filter that prunes
        # the fact-side SCAN before the shuffle — at 100 TB this is the
        # difference between shuffling the filtered and the full fact
        # (runtimeFilter.semiJoinReduction stays OFF: enabling it hung
        # multi-join planning outright on this Spark build)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # fixtures store events.ts as timestamp[ns]; read the raw int64
        # and convert in the catalog (FIXTURES.md, SURVEY.md §7 risks)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_MASTER") and "SPARK_ENV_LOADED" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()


def shuffle_partitions(spark: SparkSession) -> int:
    """Current shuffle parallelism — use for explicit repartition()
    calls so operators scale with cluster config instead of a local
    constant."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return DEFAULT_SHUFFLE_PARTITIONS
