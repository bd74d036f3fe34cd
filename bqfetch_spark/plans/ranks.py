"""Scalable global ranking: exact row_number/ntile over a total order
WITHOUT an unpartitioned window (which sorts the entire input in one
task — the first OOM at 100× scale).

Spelling: range-repartition on the order key (each partition holds a
contiguous, disjoint key range), rank locally inside each partition,
then add the number of rows in all earlier partitions. The per-
partition row counts are metadata (one row per partition), so the
cumulative-offset window runs over ~dozens of rows; the data-sized
work is one range exchange plus one pid-clustered local sort.

This replaces the reference-shaped `ntile-over-everything` plans
(q25 quartiles, Fetcher.chunks domain bucketing) with the same exact
semantics: ranks are independent of where the sampled range
boundaries land, because offsets are computed from the actual
partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int,
    rank_col: str = "__rank",
    total_col: str = "__total",
) -> DataFrame:
    """Exact 1-based global row_number over ``order_cols`` (which must
    end in a unique tie-break key for a deterministic total order).
    Adds ``rank_col`` and ``total_col`` (the overall row count).

    Plan shape: RangeExchange(order_cols) → [tiny: per-partition
    counts + cumulative offsets] → broadcast-join offsets back →
    local sort + window per partition. No single-task stage touches
    more than one partition's rows.

    Known cost note: ``spark_partition_id()`` is flagged
    nondeterministic, which disables Catalyst's ReuseExchange between
    the counts branch and the data branch — the range exchange
    therefore EXECUTES twice (two corpus passes, still zero
    single-task stages). Both spellings that would collapse it to one
    pass trade laziness away (persist leaks across queries;
    localCheckpoint swaps the second exchange for a full local-disk
    materialization and hides the upstream plan from every
    plan-shape assertion), so the two-pass cost is the documented
    price of an exact, deterministic, lazily-composable global rank;
    callers that rank the same frame repeatedly should checkpoint at
    the call site (see qx219's stats checkpoint for the pattern).
    """
    ranged = df.repartitionByRange(n_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # windows below run over n_partitions rows (metadata, not data)
    prior = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    everything = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(prior), F.lit(0)).alias("__offset"),
        F.sum("__cnt").over(everything).alias(total_col),
    )
    local = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__offset") + F.row_number().over(local)).cast("bigint"))
        .drop("__pid", "__offset")
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    n_partitions: int,
    cum_col: str = "__cum",
) -> DataFrame:
    """Exact inclusive running sum of ``val_col`` over a global order,
    same two-pass shape as :func:`with_global_rank`: range-exchange on
    the order key, per-partition local running sums, plus the sum of
    all earlier partitions' totals (a window over n_partitions
    metadata rows). No single task ever sorts more than one
    partition's rows — this is the scalable spelling of
    ``sum(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``."""
    return with_global_cumsums(df, order_cols, {val_col: cum_col}, n_partitions)


def with_global_cumsums(
    df: DataFrame,
    order_cols: list[str],
    val_to_cum: dict[str, str],
    n_partitions: int,
) -> DataFrame:
    """Multi-column :func:`with_global_cumsum`: one range exchange and
    one local sort produce an exact inclusive running sum for EVERY
    ``val_col -> cum_col`` in ``val_to_cum`` (e.g. the two per-sample
    CDF counters of a KS test). Sharing the exchange is the point —
    calling the single-column helper k times would range-shuffle the
    data k times for the same order."""
    ranged = df.repartitionByRange(n_partitions, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    totals = ranged.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__pt_{v}") for v in val_to_cum]
    )
    prior = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        *[
            F.coalesce(F.sum(f"__pt_{v}").over(prior), F.lit(0)).alias(f"__off_{v}")
            for v in val_to_cum
        ],
    )
    local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = ranged.join(F.broadcast(offsets), "__pid")
    for v, cum_col in val_to_cum.items():
        out = out.withColumn(
            cum_col, (F.col(f"__off_{v}") + F.sum(v).over(local)).cast("bigint")
        )
    return out.drop("__pid", *[f"__off_{v}" for v in val_to_cum])


# Crossover for the adaptive chooser (VERDICT r3 #6): below this
# estimated input size a plain `ntile() OVER (ORDER BY ...)` — one
# single-task sort — beats the range-exchange + offset-join machinery
# (measured at sf0.1: 0.99 s single-window vs 2.45 s scalable for q25's
# 150k-row orders projection). 256 MB sorts in well under a second on
# one core; anything bigger takes the scalable path.
SINGLE_SORT_BYTES = 256 << 20


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate for ``df`` in bytes —
    zero Spark jobs (pure plan statistics: file sizes × column-pruning
    fraction, propagated through operators). Unavailable internals
    (Connect, API drift) return +inf so callers fall back to the
    scale-safe path, never the single-task one."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return 1 << 62


def with_ntile_auto(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int,
    n_partitions: int,
    bucket_col: str,
) -> DataFrame:
    """Exact global ntile with an adaptive physical spelling: inputs
    whose plan-estimated size is under ``SINGLE_SORT_BYTES`` use the
    plain single-window ntile (cheapest at small scale); larger inputs
    use :func:`with_global_ntile` (no single-task sort — the only
    correct plan at 100× scale). Both spellings are bit-identical in
    output, so the choice is purely physical."""
    if plan_size_bytes(df) <= SINGLE_SORT_BYTES:
        w = Window.orderBy(*order_cols)
        return df.withColumn(bucket_col, F.ntile(n_buckets).over(w).cast("bigint"))
    return with_global_ntile(df, order_cols, n_buckets, n_partitions, bucket_col)


def with_global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int,
    n_partitions: int,
    bucket_col: str,
) -> DataFrame:
    """Exact SQL ntile(n_buckets) over a global order, built on
    ``with_global_rank``: the first (total mod n) buckets get
    ceil(total/n) rows, the rest floor(total/n) — bit-identical to
    the single-task `ntile() OVER (ORDER BY ...)` spelling."""
    ranked = with_global_rank(df, order_cols, n_partitions)
    r, n = F.col("__rank"), F.col("__total")
    q = F.floor(n / n_buckets)  # small-bucket size
    m = n % n_buckets  # number of (q+1)-sized leading buckets
    big = q + 1
    bucket = F.when(r <= m * big, F.floor((r - 1) / big) + 1).otherwise(
        m + F.floor((r - m * big - 1) / F.greatest(q, F.lit(1))) + 1
    )
    return ranked.withColumn(bucket_col, bucket.cast("bigint")).drop("__rank", "__total")
