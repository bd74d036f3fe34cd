"""Scalable global ranking: exact row_number/ntile/cumsum over a total
order with an ADAPTIVE physical spelling — a plain unpartitioned
window below the measured single-sort crossover (cheapest when the
frame is small), and above it a one-shuffle bucket plan that never
sorts the whole input in one task (the first OOM at 100× scale).

Scale spelling: assign each row a DETERMINISTIC range-bucket id (count of
sampled boundary keys ≤ its key — a broadcast expression), count rows
per bucket with a map-side partial aggregate of the UN-shuffled frame
(no corpus shuffle — the deterministic id is what makes this legal),
hash-exchange the data on the bucket id ONCE, rank locally inside
each bucket, then add the number of rows in all earlier buckets. The
per-bucket row counts are metadata (one row per bucket), so the
cumulative-offset window runs over ~dozens of rows; the data-sized
work is one exchange plus one bucket-clustered local sort, with a
cheap key-column TakeOrdered pass for the boundaries.

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

# boundary-sample size per requested bucket (hash-min top-k rows)
RANK_SAMPLE_PER_BUCKET = 32


def _lex_ge(order_cols: list[str], boundary) -> F.Column:
    """Deterministic lexicographic ``(c1, c2, …) >= boundary``.
    ``boundary`` is either a Python tuple of literals or a struct
    Column (an element of the broadcast boundary array) whose fields
    are named after ``order_cols``. A NULL anywhere yields SQL NULL,
    which the caller folds to 0 — null keys sort first under Spark's
    asc NULLS FIRST, so 'always below every boundary' is exactly the
    monotone bucket they need."""
    if isinstance(boundary, tuple):
        parts = [F.lit(b) for b in boundary]
    else:
        parts = [boundary[c] for c in order_cols]
    ge = F.lit(True)
    for c, b in reversed(list(zip(order_cols, parts))):
        ge = (F.col(c) > b) | ((F.col(c) == b) & ge)
    return ge


def _bucket_expr(df: DataFrame, order_cols: list[str], n_buckets: int) -> F.Column:
    """DETERMINISTIC range-bucket id for the global-rank machinery:
    boundaries come from a hash-min sample of the order key (a
    ``TakeOrderedAndProject`` over just the key columns — per-partition
    heaps, no shuffle, same rows on every run/retry), and the bucket
    id is the count of boundaries ≤ the row's key — a pure broadcast
    expression.

    Why not ``repartitionByRange + spark_partition_id()``: pid is
    flagged nondeterministic, so the counts branch could only learn a
    row's partition AFTER the exchange ran — forcing the corpus
    through the range exchange TWICE (the round-7 documented double
    pass). A deterministic bucket id is known BEFORE any exchange, so
    per-bucket counts come from a map-side partial aggregate of the
    un-shuffled frame (n_buckets rows per task shuffled, not the
    corpus), and only the data branch pays a corpus shuffle — once.

    Exactness does not depend on where the sampled boundaries land
    (offsets come from actual counts); the sample only balances bucket
    sizes. Monotone by construction, ties share a bucket, and a NULL
    key lands in bucket 0 (nulls-first asc order).

    Physical spelling of the id: the sorted boundary list is a SINGLE
    broadcast array-of-structs literal and the id is
    ``size(filter(boundaries, b -> key >= b))`` — one higher-order
    expression whose codegen loops over array DATA at runtime. The
    naive alternative (one nested WHEN per boundary) grows the
    expression TREE with n_buckets and at ~200 boundaries × multi-column
    compares risks blowing the 64 KB JVM method limit and falling out
    of whole-stage codegen — in the exact plan that exists for scale."""
    key_struct = F.struct(*[F.col(c) for c in order_cols])
    sample = (
        df.select(key_struct.alias("__k"))
        .orderBy(F.xxhash64(F.col("__k")), F.col("__k"))
        .limit(n_buckets * RANK_SAMPLE_PER_BUCKET)
        .collect()
    )
    keys = sorted(
        (tuple(r["__k"]) for r in sample),
        key=lambda t: tuple((v is not None, v) for v in t),
    )
    step = max(1, len(keys) // n_buckets)
    boundaries = []
    for i in range(step, len(keys), step):
        if keys[i] != keys[i - 1] and (not boundaries or keys[i] != boundaries[-1]):
            boundaries.append(keys[i])
        if len(boundaries) >= n_buckets - 1:
            break
    if not boundaries:
        return F.lit(0).cast("int")
    types = {c: df.schema[c].dataType for c in order_cols}
    arr = F.array(
        *[
            F.struct(
                *[
                    F.lit(v).cast(types[c]).alias(c)
                    for c, v in zip(order_cols, b)
                ]
            )
            for b in boundaries
        ]
    )
    # NULL key fields make _lex_ge NULL; filter() drops NULL-predicate
    # elements, so null keys count 0 boundaries → bucket 0, identical
    # to the old fold-to-0 WHEN spelling.
    return F.size(F.filter(arr, lambda b: _lex_ge(order_cols, b))).cast("int")


# rows below which a materialized (checkpointed) frame takes the plain
# single-window spelling: ~SINGLE_SORT_BYTES at a typical ~64 B/row
SINGLE_SORT_ROWS = 4_000_000


def _resolve_rank_input(df: DataFrame) -> tuple[DataFrame, bool]:
    """Physical-plan chooser for the rank/cumsum machinery. Returns
    ``(frame, use_single_window)``.

    - Plan-estimated size under ``SINGLE_SORT_BYTES``: single window,
      untouched frame — one job, cheapest at small scale.
    - Frames built through an Aggregate: Catalyst's size estimate is
      junk above joins (qx151's 15k-row customer-revenue frame
      estimates at 57 GB), and the scale path would re-run the
      expensive upstream THREE times (boundary sample, counts, data
      exchange). Materialize ONCE with a lazy localCheckpoint, count
      it (the count IS the materializing action — not wasted work),
      and decide by exact rows: small → single window over the
      materialized frame, big → bucket machinery over it (re-reads
      now hit executor-local blocks, not the upstream join).
    - Scan-shaped frames past the crossover: bucket machinery on the
      lazy frame — the extra references are cheap column-pruned scans,
      and checkpointing a raw 100 TB corpus to executor disk would be
      the wrong trade."""
    if plan_size_bytes(df) <= SINGLE_SORT_BYTES:
        return df, True
    from bqfetch_spark.compat import optimized_plan_string

    plan = optimized_plan_string(df)
    if plan is None:
        # Connect / API drift: no plan introspection at all. Materialize
        # once and route by exact rows — the same scale-safe shape as the
        # aggregate branch (never a blind single-task sort, never three
        # upstream re-runs).
        ck = df.localCheckpoint(eager=False)
        return (ck, True) if ck.count() <= SINGLE_SORT_ROWS else (ck, False)
    if "LogicalRDD" in plan or "ExistingRDD" in plan or "Scan ExistingRDD" in plan:
        # already materialized (a caller's checkpoint, e.g. qx117's
        # eager counters): counting it is cheap and exact — route by
        # rows without re-checkpointing
        return (df, True) if df.count() <= SINGLE_SORT_ROWS else (df, False)
    if "Aggregate" in plan:
        ck = df.localCheckpoint(eager=False)
        if ck.count() <= SINGLE_SORT_ROWS:
            return ck, True
        return ck, False
    return df, False


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

    Plan shape (ONE corpus shuffle): a hash-min boundary sample over
    just the key columns (TakeOrdered — heaps, no shuffle) →
    deterministic bucket-id expression → the counts branch aggregates
    per-bucket row counts DIRECTLY on the un-shuffled frame (map-side
    partial aggregation: n_buckets rows per task reach the tiny
    offsets window — a column-pruned scan, no corpus shuffle) → the
    data branch hash-exchanges on the bucket id once, broadcast-joins
    the offsets back, and ranks locally per bucket. No single-task
    stage touches more than one bucket's rows.

    Round 7 spelled this with ``repartitionByRange`` +
    ``spark_partition_id()``; pid's nondeterminism meant counts were
    only knowable AFTER an exchange, so the corpus was range-exchanged
    twice. The deterministic bucket id moves the counts before any
    exchange — and task retries recompute identical bucket ids,
    removing pid's retry-reassignment hazard as well. Bucket balance
    comes from the boundary sample; hash placement may co-locate a few
    buckets in one task (bounded small constant).

    Adaptive (see :func:`_resolve_rank_input`): small or
    small-after-materialization inputs take the plain unpartitioned
    window — cheapest at small scale and bit-identical in output;
    genuinely big inputs take the bucket machinery."""
    df, single = _resolve_rank_input(df)
    if single:
        w = Window.orderBy(*order_cols)
        everything = Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return df.withColumn(
            rank_col, F.row_number().over(w).cast("bigint")
        ).withColumn(total_col, F.count(F.lit(1)).over(everything))
    bucketed = df.withColumn("__pid", _bucket_expr(df, order_cols, n_partitions))
    ranged = bucketed.repartition(n_partitions, "__pid")
    counts = bucketed.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
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
    same one-pass shape as :func:`with_global_rank`: map-side partial
    per-bucket totals off the un-shuffled frame, ONE deterministic
    bucket exchange of the data, per-bucket local running sums, plus
    the sum of all earlier buckets' totals (a window over n_buckets
    metadata rows). No single task ever sorts
    more than one bucket's rows — this is the scalable spelling of
    ``sum(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``."""
    return with_global_cumsums(df, order_cols, {val_col: cum_col}, n_partitions)


def with_global_cumsums(
    df: DataFrame,
    order_cols: list[str],
    val_to_cum: dict[str, str],
    n_partitions: int,
) -> DataFrame:
    """Multi-column :func:`with_global_cumsum`: one bucket exchange and
    one local sort produce an exact inclusive running sum for EVERY
    ``val_col -> cum_col`` in ``val_to_cum`` (e.g. the two per-sample
    CDF counters of a KS test). Sharing the exchange is the point —
    calling the single-column helper k times would range-shuffle the
    data k times for the same order. Adaptive like
    :func:`with_global_rank`: under the crossover a plain
    unpartitioned running-sum window, above it the one-shuffle bucket
    machinery — bit-identical outputs either way.

    Output type: integral ``val_col``s produce BIGINT running sums
    (exact, and identical across both physical spellings — integer
    addition is associative). Non-integral inputs keep Spark's native
    ``sum`` result type (double for double, widened decimal for
    decimal) — decimals stay exact across spellings; doubles may
    differ in final ULPs between spellings because float addition is
    not associative."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    casts = {
        v: "bigint" if isinstance(df.schema[v].dataType, integral) else None
        for v in val_to_cum
    }

    def _typed(col: F.Column, v: str) -> F.Column:
        return col.cast(casts[v]) if casts[v] else col

    df, single = _resolve_rank_input(df)
    if single:
        w = (
            Window.orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = df
        for v, cum_col in val_to_cum.items():
            out = out.withColumn(cum_col, _typed(F.sum(v).over(w), v))
        return out
    bucketed = df.withColumn("__pid", _bucket_expr(df, order_cols, n_partitions))
    ranged = bucketed.repartition(n_partitions, "__pid")
    totals = bucketed.groupBy("__pid").agg(
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
            cum_col, _typed(F.col(f"__off_{v}") + F.sum(v).over(local), v)
        )
    return out.drop("__pid", *[f"__off_{v}" for v in val_to_cum])


# Crossover for the adaptive chooser (VERDICT r3 #6): below this
# estimated input size a plain `ntile() OVER (ORDER BY ...)` — one
# single-task sort — beats the bucket-exchange + offset-join machinery
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
    from bqfetch_spark.compat import plan_size_bytes_or_none

    size = plan_size_bytes_or_none(df)
    return size if size is not None else 1 << 62


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


def with_global_cummax_excl(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    n_partitions: int,
    out_col: str = "__cummax",
) -> DataFrame:
    """EXCLUSIVE running max of ``val_col`` over a global order — the
    max over strictly-earlier rows (NULL for the globally-first row).
    This is a streaming watermark's high-water mark replayed in batch:
    ``max(event_time) OVER (ORDER BY arrival ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``.

    Same adaptive one-shuffle shape as :func:`with_global_rank` — max
    is associative, so it decomposes identically: per-bucket maxima
    come from a map-side partial aggregate of the un-shuffled frame,
    the exclusive cross-bucket prefix max is a window over n_buckets
    metadata rows, and each row's value is greatest(earlier-buckets
    max, local exclusive max) — F.greatest skips NULLs, which handles
    both the first bucket (no offset) and each bucket's first row (no
    local prefix)."""
    df, single = _resolve_rank_input(df)
    if single:
        w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, -1)
        return df.withColumn(out_col, F.max(val_col).over(w))
    bucketed = df.withColumn("__pid", _bucket_expr(df, order_cols, n_partitions))
    ranged = bucketed.repartition(n_partitions, "__pid")
    totals = bucketed.groupBy("__pid").agg(F.max(val_col).alias("__bmax"))
    prior = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select("__pid", F.max("__bmax").over(prior).alias("__off"))
    local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.greatest(F.col("__off"), F.max(val_col).over(local)))
        .drop("__pid", "__off")
    )
