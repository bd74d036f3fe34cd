"""Stream-static enrichment join — the lookup topology every streaming
deployment runs: a fact stream joined to a slowly-changing dimension
snapshot (SURVEY.md §2.C C16 note — the reference is batch-only;
streams are engine-added).

Stream-static inner joins are STATELESS in Structured Streaming: each
micro-batch broadcast-joins against the current static snapshot, so
there is no join state to bound and no watermark requirement on the
join itself — the dimension is re-resolved per batch, which is exactly
the live-lookup semantics a cluster deployment wants (swap the parquet
dim for a Delta/JDBC dim and the topology is unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bqfetch_spark.catalog import load_catalog


def enriched_segment_counts_stream(
    events: DataFrame, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Enrich the event stream with the customer dimension (user_id ->
    market segment) and aggregate per segment. The dim is a broadcast
    static side — stateless per-batch hash join, never shuffled by the
    stream; the running per-segment totals are the only state (a
    |segments|-row store)."""
    dim = (
        load_catalog(spark, sf_dir)
        .table("customer")
        .select("c_custkey", "c_mktsegment")
    )
    return (
        events.join(F.broadcast(dim), events.user_id == dim.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
    )
