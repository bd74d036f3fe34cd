"""Core relational operators (SURVEY.md §2.C C1-C10, C13-C15, C21).

Covers the reference's generated-SQL surface — distinct projection
(bqfetch/bqfetch.py:141-156), grouped count (:105-123), IN-list filter
(:158-181, :483-484) — re-expressed as Catalyst-optimized DataFrame
plans, plus the joins/set-ops/rollups the reference lacks.

Scale notes (100 TB posture):
- Dimension joins broadcast explicitly (`F.broadcast`) — no shuffle of
  the fact side for region/nation/supplier-sized tables.
- Fact-fact joins shuffle on the join key once; AQE handles skew.
- Filters are plain Column predicates → pushed into the Parquet scan
  (verify with .explain: PushedFilters).
- Aggregations are partial (map-side) + final automatically.

Determinism: money arithmetic accumulates in DECIMAL then casts to
DOUBLE (see registry.py docstring) so the DuckDB oracle matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.registry import register

# ---------------------------------------------------------------------------
# Decimal-exact helpers (shared convention with every oracle below)
# ---------------------------------------------------------------------------

DEC_PRICE = "decimal(16,6)"  # extendedprice/totalprice/acctbal magnitude
DEC_FRAC = "decimal(8,6)"  # discount/tax in [0,1)


def dsum(col: F.Column, dec: str = DEC_PRICE) -> F.Column:
    """Exact decimal sum, surfaced as double (bit-identical to DuckDB)."""
    return F.sum(col.cast(dec)).cast("double")


def r6(col: F.Column) -> F.Column:
    return F.round(col, 6)


# ---------------------------------------------------------------------------
# C1+C2+C3+C5+C9 — flagship: TPC-H Q1-shaped pricing summary
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(16,6))) AS DOUBLE), 6) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(16,6))) AS DOUBLE), 6) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(16,6))
               * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS sum_disc_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(16,6))
               * (1 - CAST(l_discount AS DECIMAL(8,6)))
               * (1 + CAST(l_tax AS DECIMAL(8,6)))) AS DOUBLE), 6) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(16,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(16,6))) AS DOUBLE) / count(*), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q01_pricing_summary", oracle=Q1_ORACLE, tags=("scan", "filter", "agg"))
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→agg. Filter pushes to Parquet; agg is
    partial+final hash agg — one shuffle on the 2-value group key."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    qty = F.col("l_quantity").cast(DEC_PRICE)
    price = F.col("l_extendedprice").cast(DEC_PRICE)
    disc = F.col("l_discount").cast(DEC_FRAC)
    tax = F.col("l_tax").cast(DEC_FRAC)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r6(F.sum(qty).cast("double")).alias("sum_qty"),
            r6(F.sum(price).cast("double")).alias("sum_base_price"),
            r6(F.sum(price * (F.lit(1) - disc)).cast("double")).alias("sum_disc_price"),
            r6(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double")).alias("sum_charge"),
            r6(F.sum(qty).cast("double") / n).alias("avg_qty"),
            r6(F.sum(price).cast("double") / n).alias("avg_price"),
            r6(F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A1 — distinct projection (reference: SELECT DISTINCT `col`)
# ---------------------------------------------------------------------------


@register(
    "q02_distinct_values",
    oracle="SELECT DISTINCT c_mktsegment AS value FROM customer",
    tags=("distinct",),
)
def q02_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-key domain discovery (bqfetch/bqfetch.py:141-156). Column
    pruning means the scan reads exactly one column."""
    cust = load_catalog(spark, sf_dir).table("customer")
    return cust.select(F.col("c_mktsegment").alias("value")).distinct()


# ---------------------------------------------------------------------------
# A2 — grouped count (reference skew statistics query)
# ---------------------------------------------------------------------------


@register(
    "q03_grouped_count",
    oracle="SELECT l_returnflag AS value, count(*) AS cnt FROM lineitem GROUP BY l_returnflag",
    tags=("agg",),
)
def q03_grouped_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-value frequencies (bqfetch/bqfetch.py:105-123) — unlike the
    reference, we keep the value column attached to its count."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    return li.groupBy(F.col("l_returnflag").alias("value")).agg(F.count(F.lit(1)).alias("cnt"))


# ---------------------------------------------------------------------------
# A4/A7 — IN-list filter (typed predicates, not stringified)
# ---------------------------------------------------------------------------


@register(
    "q04_filter_inlist",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, round(CAST(c_acctbal AS DECIMAL(16,6)) * 1, 6) AS acctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 0
    """,
    tags=("filter",),
)
def q04_filter_inlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-shaped read: `col IN (...)` (bqfetch/bqfetch.py:483-484) as a
    typed Catalyst predicate — shows up in PushedFilters, unlike the
    reference's string-rendered literals (SURVEY.md §1.3)."""
    cust = load_catalog(spark, sf_dir).table("customer")
    return cust.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY") & (F.col("c_acctbal") > 0)
    ).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round(F.col("c_acctbal").cast(DEC_PRICE).cast("double"), 6).alias("acctbal"),
    )


# ---------------------------------------------------------------------------
# C9 — order by + limit (top-k with deterministic tie-break)
# ---------------------------------------------------------------------------


@register(
    "q05_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(CAST(o_totalprice AS DECIMAL(16,6)) * 1, 6) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sort", "limit"),
)
def q05_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    no global sort shuffle. Tie-break on the unique key."""
    orders = load_catalog(spark, sf_dir).table("orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice").cast(DEC_PRICE).cast("double"), 6).alias("totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# C6 — broadcast dimension join (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

Q3_ORACLE = """
SELECT
  l_orderkey,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(16,6))
             * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q06_shipping_priority", oracle=Q3_ORACLE, tags=("join", "agg", "limit"))
def q06_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: the filtered customer side is broadcast (no shuffle of
    orders/lineitem for it); lineitem⋈orders shuffles once on orderkey."""
    cat = load_catalog(spark, sf_dir)
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = cat.table("orders").filter(F.col("o_orderdate") < cutoff)
    li = cat.table("lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_FRAC)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r6(F.sum(revenue).cast("double")).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# C7 — large-large join (sort-merge / shuffled hash territory)
# ---------------------------------------------------------------------------

Q7_ORACLE = """
SELECT
  o_orderstatus,
  l_linestatus,
  count(*) AS n_lines,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(16,6))) AS DOUBLE), 6) AS total_qty
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus, l_linestatus
"""


@register("q07_fact_fact_join", oracle=Q7_ORACLE, tags=("join", "agg"))
def q07_fact_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem on the natural key. At 100 TB both sides shuffle
    on orderkey (or co-located via bucketing — see sources/bucketing);
    AQE picks SMJ/SHJ and splits skewed partitions."""
    cat = load_catalog(spark, sf_dir)
    orders = cat.table("orders").select("o_orderkey", "o_orderstatus")
    li = cat.table("lineitem").select("l_orderkey", "l_linestatus", "l_quantity")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            r6(dsum(F.col("l_quantity"))).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# C8 — semi / anti joins
# ---------------------------------------------------------------------------


@register(
    "q08_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
    tags=("join",),
)
def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: existence check without duplicating or widening rows."""
    cat = load_catalog(spark, sf_dir)
    big = cat.table("orders").filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return (
        cat.table("customer")
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "q09_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def q09_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders at all."""
    cat = load_catalog(spark, sf_dir)
    orders = cat.table("orders").select("o_custkey")
    return (
        cat.table("customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# C10 — set operations (the reference's only merge was pd.concat, B4)
# ---------------------------------------------------------------------------


@register(
    "q10_union",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
    """,
    tags=("setop",),
)
def q10_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_catalog(spark, sf_dir)
    a = cat.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = cat.table("orders").filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@register(
    "q11_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
)
def q11_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = load_catalog(spark, sf_dir)
    orders = cat.table("orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@register(
    "q12_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
    tags=("setop",),
)
def q12_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """subtract() is Spark's EXCEPT DISTINCT — set semantics regardless
    of input multiplicities. (exceptAll().distinct() is NOT equivalent:
    a left value occurring more often than on the right would survive
    the multiset difference and the distinct.)"""
    cat = load_catalog(spark, sf_dir)
    a = cat.table("customer").select(F.col("c_custkey").alias("custkey"))
    b = cat.table("orders").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


# ---------------------------------------------------------------------------
# C13 — rollup / cube
# ---------------------------------------------------------------------------

ROLLUP_ORACLE = """
SELECT
  r_name,
  n_name,
  count(*) AS n_customers,
  round(CAST(sum(CAST(c_acctbal AS DECIMAL(16,6))) AS DOUBLE), 6) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@register("q13_rollup", oracle=ROLLUP_ORACLE, tags=("agg", "rollup"))
def q13_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals region→nation→grand. Both dims broadcast."""
    cat = load_catalog(spark, sf_dir)
    joined = (
        cat.table("customer")
        .join(F.broadcast(cat.table("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        r6(dsum(F.col("c_acctbal"))).alias("total_balance"),
    )


@register(
    "q14_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def q14_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_catalog(spark, sf_dir).table("orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# ---------------------------------------------------------------------------
# C14 — approximate count distinct (HLL) — nondeterministic vs oracle
# ---------------------------------------------------------------------------


APPROX_DISTINCT_ORACLE = """
SELECT
  count(*) AS n_rows,
  count(DISTINCT l_partkey) AS exact_parts,
  count(DISTINCT l_suppkey) AS exact_supps,
  abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
    <= 0.05 * count(DISTINCT l_partkey) AS parts_within_5pct,
  abs(approx_count_distinct(l_suppkey) - count(DISTINCT l_suppkey))
    <= 0.05 * count(DISTINCT l_suppkey) AS supps_within_5pct
FROM lineitem
"""


@register("q15_approx_distinct", oracle=APPROX_DISTINCT_ORACLE, tags=("agg", "approx"))
def q15_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch — the scale path for COUNT(DISTINCT) at
    100 TB (single pass, fixed memory, no shuffle of raw values).

    Bounded oracle (upgraded from rows-only, round 6): raw sketch
    estimates differ across engines, so BOTH engines emit the exact
    distinct counts plus a within-±5% assertion on their OWN sketch —
    the hash then matches iff each engine's HLL lands inside the same
    tolerance of the same exact values. The exact legs exist for the
    oracle contract; the sketch remains the demonstrated operator (at
    100 TB you run only the approx aggregate)."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    tol = 0.05
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        (
            F.abs(F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey"))
            <= tol * F.countDistinct("l_partkey")
        ).alias("parts_within_5pct"),
        (
            F.abs(F.approx_count_distinct("l_suppkey") - F.countDistinct("l_suppkey"))
            <= tol * F.countDistinct("l_suppkey")
        ).alias("supps_within_5pct"),
    )


# ---------------------------------------------------------------------------
# C15 — scalar function sampler (string / date / math, all JVM-side)
# ---------------------------------------------------------------------------

SCALAR_ORACLE = """
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  substring(p_type, 1, 5) AS type_prefix,
  CAST(length(p_name) AS BIGINT) AS name_len,
  concat(p_brand, '/', p_type) AS brand_type,
  round(CAST(CAST(p_retailprice AS DECIMAL(16,6)) * CAST(1.1 AS DECIMAL(3,1)) AS DOUBLE), 6) AS marked_up,
  CAST(abs(p_size - 25) AS BIGINT) AS size_dev
FROM part
WHERE p_size >= 10
"""


@register("q16_scalar_functions", oracle=SCALAR_ORACLE, tags=("scalar",))
def q16_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalars — all whole-stage-codegen JVM expressions; no
    Python in the row path."""
    part = load_catalog(spark, sf_dir).table("part")
    return part.filter(F.col("p_size") >= 10).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.round(
            (F.col("p_retailprice").cast(DEC_PRICE) * F.lit(1.1).cast("decimal(3,1)")).cast(
                "double"
            ),
            6,
        ).alias("marked_up"),
        F.abs(F.col("p_size") - F.lit(25)).cast("bigint").alias("size_dev"),
    )


DATE_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  CAST(month(o_orderdate) AS BIGINT) AS order_month,
  count(*) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(16,6))) AS DOUBLE), 6) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY 1, 2
"""


@register("q17_date_functions", oracle=DATE_ORACLE, tags=("scalar", "agg"))
def q17_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_catalog(spark, sf_dir).table("orders")
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r6(dsum(F.col("o_totalprice"))).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# C6+C7 — multi-way star join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

Q5_ORACLE = """
SELECT
  n_name,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(16,6))
             * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


@register("q18_local_supplier_volume", oracle=Q5_ORACLE, tags=("join", "agg"))
def q18_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: five-way join. region/nation/supplier broadcast
    (bounded dimensions); the single real shuffle pair is
    lineitem⋈orders on orderkey. customer is NOT force-broadcast — it
    is fact-sized (scales with SF), so the engine leaves the strategy
    to AQE/autoBroadcastJoinThreshold: at small SF AQE still picks a
    broadcast from runtime sizes, past the threshold it degrades
    safely to a shuffle join instead of OOMing the driver."""
    cat = load_catalog(spark, sf_dir)
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    nation_region = (
        cat.table("nation")
        .join(F.broadcast(cat.table("region").filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        cat.table("supplier")
        .join(F.broadcast(nation_region), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    orders = cat.table("orders").filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    cust = cat.table("customer").select("c_custkey", "c_nationkey")
    li = cat.table("lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_FRAC)
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(r6(F.sum(revenue).cast("double")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q88: market share (TPC-H Q8 shape — dimension self-role + ratio of sums)
# ---------------------------------------------------------------------------

MARKET_SHARE_ORACLE = """
SELECT
  CAST(year(o_orderdate) AS INTEGER) AS o_year,
  round(
    CAST(coalesce(sum(CASE WHEN n2.n_name = 'NATION_7'
          THEN CAST(l_extendedprice AS DECIMAL(16,6))
               * (1 - CAST(l_discount AS DECIMAL(8,6))) END), 0) AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice AS DECIMAL(16,6))
               * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS mkt_share,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(16,6))
               * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS total_revenue
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n1.n_regionkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
GROUP BY 1
"""


@register("q88_market_share", oracle=MARKET_SHARE_ORACLE, tags=("join", "star", "ratio"))
def q88_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7's share of PROMO-part revenue in the
    AMERICA market, per order year — an 8-table join tree in which
    `nation` plays two different roles (customer market vs supplier
    origin) and the answer is a ratio of conditional decimal sums.

    Join strategy mirrors the q18 lesson: region/nation are true
    dimensions and broadcast explicitly; part, supplier, customer and
    orders all grow with scale, so their join sides stay AQE-decided
    (broadcast at this SF, shuffle past the threshold) rather than
    forced. The two nation roles are separate broadcast builds, not a
    self-join shuffle."""
    cat = load_catalog(spark, sf_dir)
    n1 = (
        cat.table("nation")
        .join(
            F.broadcast(cat.table("region").filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("mkt_nationkey"))
    )
    n2 = cat.table("nation").select(
        F.col("n_nationkey").alias("supp_nationkey"), F.col("n_name").alias("supp_nation")
    )
    part = cat.table("part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp = cat.table("supplier").select("s_suppkey", "s_nationkey")
    orders = cat.table("orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = cat.table("customer").select("c_custkey", "c_nationkey")
    li = cat.table("lineitem").select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_FRAC)
    )
    joined = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("mkt_nationkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nationkey"))
    )
    nation_rev = F.sum(F.when(F.col("supp_nation") == "NATION_7", revenue))
    total_rev = F.sum(revenue)
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            r6(
                F.coalesce(nation_rev, F.lit(0)).cast("double") / total_rev.cast("double")
            ).alias("mkt_share"),
            r6(total_rev.cast("double")).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q95: churn analysis (FULL OUTER join — the one join type the rest of
# the registry never needed)
# ---------------------------------------------------------------------------

CHURN_ORACLE = """
WITH y1 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
),
y2 AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT
  CASE
    WHEN y1.o_custkey IS NOT NULL AND y2.o_custkey IS NOT NULL THEN 'retained'
    WHEN y1.o_custkey IS NOT NULL THEN 'churned'
    ELSE 'new'
  END AS status,
  CAST(count(*) AS BIGINT) AS n_customers
FROM y1 FULL OUTER JOIN y2 ON y1.o_custkey = y2.o_custkey
GROUP BY 1
"""


@register("q95_churn_full_outer", oracle=CHURN_ORACLE, tags=("join", "full-outer", "churn"))
def q95_churn_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year churn: customers active in 1996 vs 1997,
    FULL OUTER joined so every row lands in exactly one of
    retained / churned / new. Both sides come from the same scan
    (different pushed date filters); the join shuffles distinct
    custkeys only — at scale that is user-count rows, not order-count —
    and a full outer can never broadcast, so the shuffle spelling IS
    the 100 TB plan."""
    cat = load_catalog(spark, sf_dir)

    def active(year: int) -> DataFrame:
        lo = F.lit(f"{year}-01-01 00:00:00").cast("timestamp")
        hi = F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp")
        return (
            cat.table("orders")
            .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .select(F.col("o_custkey").alias(f"k{year}"))
            .distinct()
        )

    joined = active(1996).join(active(1997), F.col("k1996") == F.col("k1997"), "full_outer")
    status = (
        F.when(F.col("k1996").isNotNull() & F.col("k1997").isNotNull(), "retained")
        .when(F.col("k1996").isNotNull(), "churned")
        .otherwise("new")
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# qx167 — min-cost supplier per part (TPC-H Q2 shape: correlated MIN)
# ---------------------------------------------------------------------------

MINCOST_TOPK = 20

MINCOST_ORACLE = f"""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(16,6))) AS cost
  FROM lineitem GROUP BY 1, 2
),
best AS (
  SELECT l_partkey, min(cost) AS min_cost FROM supply GROUP BY 1
)
SELECT p.p_partkey, s.s_name, n.n_name,
       round(CAST(b.min_cost AS DOUBLE), 6) AS min_cost
FROM best b
JOIN supply sp ON sp.l_partkey = b.l_partkey AND sp.cost = b.min_cost
JOIN part p ON p.p_partkey = b.l_partkey
JOIN supplier s ON s.s_suppkey = sp.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size >= 30
ORDER BY min_cost DESC, p.p_partkey, s.s_name
LIMIT {MINCOST_TOPK}
"""


@register(
    "qx167_min_cost_supplier",
    oracle=MINCOST_ORACLE,
    doc="TPC-H Q2 shape: cheapest supplier per part via correlated MIN",
    tags=("relational", "join", "top-k"),
)
def qx167_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-minimum shape (lineitem standing in for
    partsupp — the fixture has no partsupp table): per part, the
    supplier(s) achieving the minimum supply cost, decorrelated into
    aggregate-then-self-join exactly as Catalyst rewrites the
    correlated form. Costs aggregate in DECIMAL (exact) and the join
    back is on the exact decimal equality — no float in the keep
    decision; only the output column rounds. The two aggregates share
    one (partkey, suppkey) exchange; part/supplier/nation dims are
    broadcast. Top-k via the rounded cost with (p_partkey, s_name)
    tie-break."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    part = load_catalog(spark, sf_dir).table("part")
    supp = load_catalog(spark, sf_dir).table("supplier")
    nat = load_catalog(spark, sf_dir).table("nation")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast(DEC_PRICE)).alias("cost")
    )
    # explicit aliases: `best` derives from `supply`, so column-object
    # equality would resolve both sides to the same attribute (Spark
    # warns "trivially true predicate") — string-qualified names keep
    # the self-join keys distinct
    best = (
        supply.groupBy("l_partkey")
        .agg(F.min("cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "b_partkey")
        .alias("best")
    )
    sp = supply.alias("sp")
    return (
        best.join(
            sp,
            (F.col("sp.l_partkey") == F.col("best.b_partkey"))
            & (F.col("sp.cost") == F.col("best.min_cost")),
        )
        .select(F.col("best.b_partkey").alias("l_partkey"), "l_suppkey", "min_cost")
        .join(F.broadcast(part.filter(F.col("p_size") >= 30)), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            r6(F.col("min_cost").cast("double")).alias("min_cost"),
        )
        .orderBy(F.col("min_cost").desc(), "p_partkey", "s_name")
        .limit(MINCOST_TOPK)
    )


# ---------------------------------------------------------------------------
# qx168 — sole-failing supplier (TPC-H Q21 shape: EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

SOLE_FAIL_TOPK = 15

SOLE_FAIL_ORACLE = f"""
WITH flagged AS (
  SELECT l1.l_suppkey, l1.l_orderkey
  FROM lineitem l1
  JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
  WHERE l1.l_returnflag = 'R'
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_returnflag = 'R')
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM (SELECT DISTINCT l_suppkey, l_orderkey FROM flagged) f
JOIN supplier s ON s.s_suppkey = f.l_suppkey
GROUP BY 1
ORDER BY numwait DESC, s_name
LIMIT {SOLE_FAIL_TOPK}
"""


@register(
    "qx168_sole_failing_supplier",
    oracle=SOLE_FAIL_ORACLE,
    doc="TPC-H Q21 shape: suppliers solely at fault on multi-supplier orders",
    tags=("relational", "semi-join", "anti-join", "top-k"),
)
def qx168_sole_failing_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's double-correlation shape (the fixture lacks
    commit/receipt dates, so 'failed' = returnflag R on a finalized
    order): suppliers whose R-flagged lineitem sits on a
    multi-supplier order where NO OTHER supplier's line was flagged —
    an EXISTS (semi) and a NOT EXISTS (anti) against the same fact
    table. Spelled as ONE per-order aggregate instead of two
    correlated rescans: per (orderkey) count distinct suppliers and
    distinct R-flagged suppliers, then the keep condition is pure
    arithmetic on that tiny frame — the fact table is read once, the
    per-order frame joins back broadcast-free on the shared orderkey
    exchange. Equivalent to the EXISTS/NOT-EXISTS pair because 'some
    other supplier exists' ⇔ n_suppliers > 1 and 'no other R supplier'
    ⇔ n_r_suppliers = 1 (the candidate itself)."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    orders = load_catalog(spark, sf_dir).table("orders")
    supp = load_catalog(spark, sf_dir).table("supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_suppliers"),
    )
    candidates = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(per_order, "l_orderkey")
        .filter((F.col("n_suppliers") > 1) & (F.col("n_r_suppliers") == 1))
    )
    return (
        candidates.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(SOLE_FAIL_TOPK)
    )


# ---------------------------------------------------------------------------
# qx169 — dormant high-balance customers (TPC-H Q22 shape)
# ---------------------------------------------------------------------------

DORMANT_CUTOFF = "2000-01-01"

DORMANT_ORACLE = f"""
WITH avg_bal AS (
  SELECT CAST(avg(CAST(c_acctbal AS DECIMAL(16,6))) AS DECIMAL(16,6)) AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(16,6))) AS DOUBLE), 6) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{DORMANT_CUTOFF}')
GROUP BY 1
"""


@register(
    "qx169_dormant_customers",
    oracle=DORMANT_ORACLE,
    doc="TPC-H Q22 shape: above-average-balance customers with no recent orders",
    tags=("relational", "anti-join", "scalar-subquery"),
)
def qx169_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape (every fixture customer has SOME order, so
    'never ordered' becomes 'no order since {DORMANT_CUTOFF}'):
    customers whose balance beats the positive-balance average and who
    placed no recent order, grouped by nation. The scalar average is a
    1-row DECIMAL frame (exact — the float average would make the keep
    decision engine-dependent) broadcast into the filter; the NOT
    EXISTS is a left-anti join against the date-filtered orders
    projection (pushdown-friendly: the date filter reaches the orders
    scan, so the anti side shrinks before the exchange)."""
    cust = load_catalog(spark, sf_dir).table("customer")
    orders = load_catalog(spark, sf_dir).table("orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg(F.col("c_acctbal").cast(DEC_PRICE)).cast(DEC_PRICE).alias("a")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(DORMANT_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast(DEC_PRICE) > F.col("a"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            r6(F.sum(F.col("c_acctbal").cast(DEC_PRICE)).cast("double")).alias(
                "totacctbal"
            ),
        )
    )


# ---------------------------------------------------------------------------
# qx170 — small-quantity revenue loss (TPC-H Q17 shape: correlated AVG)
# ---------------------------------------------------------------------------

SMALLQTY_ORACLE = """
WITH per_part AS (
  SELECT l_partkey, CAST(avg(CAST(l_quantity AS DECIMAL(16,6))) AS DECIMAL(16,6)) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(16,6))) AS DOUBLE) / 7.0, 6)
         AS avg_yearly
FROM lineitem l
JOIN per_part p ON p.l_partkey = l.l_partkey
JOIN part pt ON pt.p_partkey = l.l_partkey
WHERE pt.p_brand = (SELECT min(p_brand) FROM part)
  AND CAST(l.l_quantity AS DECIMAL(16,6)) < 0.2 * p.avg_qty
"""


@register(
    "qx170_small_quantity_revenue",
    oracle=SMALLQTY_ORACLE,
    doc="TPC-H Q17 shape: revenue of below-20%-of-average-quantity orders",
    tags=("relational", "scalar-subquery", "join"),
)
def qx170_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's correlated-average shape: lineitems whose quantity
    is under 20% of their part's average quantity, for one brand
    (derived as min(p_brand) so no fixture literal), summed into the
    single avg-yearly figure. Decorrelated into a per-part aggregate
    joined back on the shared l_partkey exchange; the 0.2×avg
    comparison runs in exact DECIMAL so the keep decision cannot
    drift between engines; only the final scalar rounds. The brand
    filter is a 1-row broadcast reaching the part dim before its
    broadcast join."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    part = load_catalog(spark, sf_dir).table("part")
    per_part = li.groupBy("l_partkey").agg(
        F.avg(F.col("l_quantity").cast(DEC_PRICE)).cast(DEC_PRICE).alias("avg_qty")
    )
    brand = part.agg(F.min("p_brand").alias("b"))
    brand_parts = (
        part.crossJoin(F.broadcast(brand))
        .filter(F.col("p_brand") == F.col("b"))
        .select("p_partkey")
    )
    return (
        li.join(per_part, "l_partkey")
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            F.col("l_quantity").cast(DEC_PRICE)
            < F.lit(0.2).cast(DEC_PRICE) * F.col("avg_qty")
        )
        .agg(
            r6(
                F.sum(F.col("l_extendedprice").cast(DEC_PRICE)).cast("double") / 7.0
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# qx171 — disjunctive predicate revenue (TPC-H Q19 shape: OR-of-ANDs)
# ---------------------------------------------------------------------------

DISJUNCT_ORACLE = """
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(16,6))
                     * (1 - CAST(l.l_discount AS DECIMAL(16,6)))) AS DOUBLE), 6)
         AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_size BETWEEN 1 AND 10 AND CAST(l.l_quantity AS BIGINT) BETWEEN 1 AND 20)
   OR (p.p_size BETWEEN 11 AND 25 AND CAST(l.l_quantity AS BIGINT) BETWEEN 10 AND 30)
   OR (p.p_size BETWEEN 26 AND 50 AND CAST(l.l_quantity AS BIGINT) BETWEEN 20 AND 40)
"""


@register(
    "qx171_disjunctive_revenue",
    oracle=DISJUNCT_ORACLE,
    doc="TPC-H Q19 shape: OR-of-ANDs join predicate revenue",
    tags=("relational", "join", "pushdown"),
)
def qx171_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19's disjunctive-predicate shape: three (size-band ×
    quantity-band) conjunctions OR-ed across a lineitem⋈part join.
    The optimizer lesson Q19 exists to teach: Catalyst rewrites the
    disjunction's part-only atoms into a single Or filter and pushes
    it INTO the part scan (plan-asserted: PushedFilters shows the
    three size bands OR-ed on the part side) even though the full
    mixed predicate must still evaluate post-join; the quantity atoms
    reference both sides via the disjunction, so lineitem is filtered
    post-join — pre-deriving quantity ∈ [1,40] is a manual rewrite
    Catalyst does not do. Revenue accumulates in exact DECIMAL; part
    side broadcast."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    part = load_catalog(spark, sf_dir).table("part")
    qty = F.col("l_quantity").cast("bigint")
    cond = (
        (F.col("p_size").between(1, 10) & qty.between(1, 20))
        | (F.col("p_size").between(11, 25) & qty.between(10, 30))
        | (F.col("p_size").between(26, 50) & qty.between(20, 40))
    )
    rev = F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_PRICE)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(r6(F.sum(rev).cast("double")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# qx172 — suppliers of surplus parts (TPC-H Q20 shape: nested semi-joins)
# ---------------------------------------------------------------------------

SURPLUS_ORACLE = """
WITH surplus_parts AS (
  SELECT l_partkey, l_suppkey
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
  HAVING sum(CAST(l_quantity AS BIGINT)) > 100
),
named_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '%a%'
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE EXISTS (
  SELECT 1 FROM surplus_parts sp
  JOIN named_parts np ON np.p_partkey = sp.l_partkey
  WHERE sp.l_suppkey = s.s_suppkey
)
ORDER BY s_name
"""


@register(
    "qx172_surplus_part_suppliers",
    oracle=SURPLUS_ORACLE,
    doc="TPC-H Q20 shape: suppliers holding surplus stock of selected parts",
    tags=("relational", "semi-join", "join"),
)
def qx172_surplus_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20's nested-semi-join chain: suppliers who shipped more
    than a threshold quantity of any name-matched part in the recent
    window. The chain reduces INWARD-OUT: the HAVING aggregate shrinks
    lineitem to (part, supplier) surplus pairs first, the name filter
    (broadcast) shrinks those to relevant parts, and only then does
    the tiny supplier set semi-join — each step's output is orders of
    magnitude smaller than its input, which is what makes the Q20
    shape tractable at 100 TB. The date filter is pushed to the
    lineitem scan."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    part = load_catalog(spark, sf_dir).table("part")
    supp = load_catalog(spark, sf_dir).table("supplier")
    nat = load_catalog(spark, sf_dir).table("nation")
    surplus = (
        li.filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 100)
    )
    named = part.filter(F.col("p_name").like("%a%")).select("p_partkey")
    holders = (
        surplus.join(F.broadcast(named), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(holders, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# qx177 — order-priority check (TPC-H Q4 shape: EXISTS semi-join)
# ---------------------------------------------------------------------------

PRIORITY_ORACLE = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY 1
"""


@register(
    "qx177_order_priority_check",
    oracle=PRIORITY_ORACLE,
    doc="TPC-H Q4 shape: priority counts of orders with a flagged lineitem",
    tags=("relational", "semi-join", "agg"),
)
def qx177_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape (late-delivery EXISTS becomes a returnflag
    EXISTS — the fixture has no commitdate): per-priority counts of
    one year's orders having at least one flagged lineitem. The EXISTS
    is a LEFT SEMI join — the lineitem side is pre-filtered and
    projected to the join key alone before the exchange, and the date
    filter is pushed to the orders scan, so both shuffle inputs are
    minimal. The tiny priority-keyed aggregate rides map-side
    partials."""
    orders = load_catalog(spark, sf_dir).table("orders")
    li = load_catalog(spark, sf_dir).table("lineitem")
    year = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    flagged = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        year.join(flagged, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# qx178 — important stock (TPC-H Q11 shape: group vs global threshold)
# ---------------------------------------------------------------------------

STOCK_MULTIPLE = "1.5"  # "important" = above this multiple of the MEAN
# per-part value — scale-free, unlike TPC-H's literal fraction (which
# the spec itself divides by SF because a fixed share of the total
# selects everything at small N and nothing at large N)

STOCK_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(16,6))) AS v
  FROM lineitem GROUP BY 1
),
bar AS (SELECT CAST(avg(v) AS DECIMAL(16,6)) AS a FROM per_part)
SELECT p.l_partkey AS partkey,
       round(CAST(p.v AS DOUBLE), 6) AS part_value
FROM per_part p, bar
WHERE p.v > bar.a * CAST({STOCK_MULTIPLE} AS DECIMAL(2,1))
ORDER BY part_value DESC, partkey
"""


@register(
    "qx178_important_stock",
    oracle=STOCK_ORACLE,
    doc="TPC-H Q11 shape: parts whose value exceeds a fraction of the global total",
    tags=("relational", "scalar-subquery", "agg"),
)
def qx178_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's shape: per-part value compared against a scalar
    derived from ALL groups — the group-vs-global pattern (a HAVING
    whose right side is a scalar subquery). The threshold is a
    MULTIPLE of the mean per-part value rather than Q11's fraction of
    the total (the spec divides its fraction by SF for exactly the
    scale problem a fixed share has). The scalar is a re-agg of the
    per-part frame (fact scanned once), broadcast as one row into the
    filter; comparison on exact DECIMALs so the cut is
    engine-independent. Ordered by the rounded value, key
    tie-break."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(DEC_PRICE)).alias("v")
    )
    bar = per_part.agg(F.avg("v").cast(DEC_PRICE).alias("a"))
    return (
        per_part.crossJoin(F.broadcast(bar))
        .filter(F.col("v") > F.col("a") * F.lit(STOCK_MULTIPLE).cast("decimal(2,1)"))
        .select(
            F.col("l_partkey").alias("partkey"),
            r6(F.col("v").cast("double")).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "partkey")
    )


# ---------------------------------------------------------------------------
# qx179 — top supplier (TPC-H Q15 shape: view + scalar max join-back)
# ---------------------------------------------------------------------------

TOP_SUPPLIER_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(16,6))
             * (1 - CAST(l_discount AS DECIMAL(8,6)))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  GROUP BY 1
),
best AS (SELECT max(total_revenue) AS m FROM revenue)
SELECT s.s_suppkey, s.s_name,
       round(CAST(r.total_revenue AS DOUBLE), 6) AS total_revenue
FROM revenue r
JOIN best b ON r.total_revenue = b.m
JOIN supplier s ON s.s_suppkey = r.l_suppkey
ORDER BY s.s_suppkey
"""


@register(
    "qx179_top_supplier",
    oracle=TOP_SUPPLIER_ORACLE,
    doc="TPC-H Q15 shape: supplier(s) achieving the maximum window revenue",
    tags=("relational", "scalar-subquery", "agg"),
)
def qx179_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15's shape: the revenue view's maximum joined back to
    find every supplier achieving it (ties preserved — the reason Q15
    is not a LIMIT 1). The max is a 1-row broadcast; equality runs on
    the exact DECIMAL revenue, so ties are exact ties, not
    float-coincidences. One fact scan builds the view; the supplier
    dim joins broadcast."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    supp = load_catalog(spark, sf_dir).table("supplier")
    revenue = (
        li.filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC_PRICE)
                * (F.lit(1) - F.col("l_discount").cast(DEC_FRAC))
            ).alias("total_revenue")
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            r6(F.col("total_revenue").cast("double")).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# qx180 — large-volume customers (TPC-H Q18 shape: HAVING-subquery join-back)
# ---------------------------------------------------------------------------

LARGE_QTY_THRESHOLD = 150

LARGE_VOLUME_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS BIGINT)) > {LARGE_QTY_THRESHOLD}
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       round(CAST(CAST(o.o_totalprice AS DECIMAL(16,6)) AS DOUBLE), 6) AS totalprice,
       CAST(b.total_qty AS BIGINT) AS total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice DESC, o.o_orderkey
"""


@register(
    "qx180_large_volume_customers",
    oracle=LARGE_VOLUME_ORACLE,
    doc="TPC-H Q18 shape: customers behind orders above a total-quantity threshold",
    tags=("relational", "agg", "join"),
)
def qx180_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18's shape: orders whose total lineitem quantity clears a
    threshold (the HAVING-in-subquery), joined back to their orders and
    customers. The aggregate runs FIRST — lineitem collapses to
    qualifying orderkeys before any join, so the expensive fact⋈fact
    becomes tiny⋈orders on the orderkey exchange; integer quantities
    make the threshold exact. Ordered by the rounded price with the
    unique orderkey tie-break."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    orders = load_catalog(spark, sf_dir).table("orders")
    cust = load_catalog(spark, sf_dir).table("customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_QTY_THRESHOLD)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            r6(F.col("o_totalprice").cast(DEC_PRICE).cast("double")).alias("totalprice"),
            F.col("total_qty").cast("bigint").alias("total_qty"),
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# qx184 — two-nation trade volume (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

TRADE_NATION_A, TRADE_NATION_B = "NATION_1", "NATION_2"
TRADE_LO, TRADE_HI = "1996-01-01", "1998-01-01"

TRADE_VOLUME_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(16,6))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = '{TRADE_NATION_A}' AND n2.n_name = '{TRADE_NATION_B}')
    OR (n1.n_name = '{TRADE_NATION_B}' AND n2.n_name = '{TRADE_NATION_A}'))
  AND l.l_shipdate >= TIMESTAMP '{TRADE_LO}'
  AND l.l_shipdate <  TIMESTAMP '{TRADE_HI}'
GROUP BY 1, 2, 3
"""


@register(
    "qx184_trade_volume",
    oracle=TRADE_VOLUME_ORACLE,
    doc="TPC-H Q7 shape: shipping volume between two nations by year",
    tags=("relational", "join", "agg", "tpch"),
)
def qx184_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7's two-nation volume shape. The nation pair predicate is
    applied to the DIMENSIONS before any fact joins: supplier and
    customer are each pre-joined (broadcast) to the 2-row filtered
    nation frame, so only ~2/|nation| of each survives and both sides
    broadcast into the fact joins — the disjunctive pair condition
    then needs no post-join filter beyond excluding the two same-nation
    combinations, checked on the two already-attached names. lineitem
    carries the shipdate range down to the parquet scan; the only
    all-fact shuffle is lineitem ⋈ orders on the orderkey exchange.
    Revenue accumulates in DECIMAL, rounds once at the output."""
    cat = load_catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit(TRADE_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(TRADE_HI).cast("timestamp"))
    )
    orders = cat.table("orders")
    pair = cat.table("nation").filter(
        F.col("n_name").isin(TRADE_NATION_A, TRADE_NATION_B)
    )
    supp = (
        cat.table("supplier")
        .join(F.broadcast(pair), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        cat.table("customer")
        .join(F.broadcast(pair), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    revenue = F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_FRAC)
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(r6(F.sum(revenue).cast("double")).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# qx185 — product-line profit by nation and year (TPC-H Q9 shape)
# ---------------------------------------------------------------------------

PROFIT_PART_LIKE = "%red%"

PRODUCT_PROFIT_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(16,6))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,6)))
                    - CAST(p.p_retailprice AS DECIMAL(16,6))
                    * CAST(l.l_quantity AS DECIMAL(16,6))) AS DOUBLE), 6) AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '{PROFIT_PART_LIKE}'
GROUP BY 1, 2
"""


@register(
    "qx185_product_profit",
    oracle=PRODUCT_PROFIT_ORACLE,
    doc="TPC-H Q9 shape: profit on a product line by supplier nation and year",
    tags=("relational", "join", "agg", "tpch"),
)
def qx185_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9's profit rollup (the fixture has no partsupp, so unit
    cost is p_retailprice — reference semantics: revenue minus
    cost·quantity per line, rolled up by the SUPPLIER's nation and the
    ORDER year). The p_name LIKE filter prunes part to ~13% before its
    broadcast into lineitem — the selective dimension join runs first
    so the orderkey exchange (the only fact⋈fact shuffle) carries only
    matching lines. supplier⋈nation pre-joins broadcast into a single
    (suppkey → nation) attachment. Profit accumulates in DECIMAL; one
    round at the output."""
    cat = load_catalog(spark, sf_dir)
    li = cat.table("lineitem")
    orders = cat.table("orders")
    part = cat.table("part").filter(F.col("p_name").like(PROFIT_PART_LIKE)).select(
        "p_partkey", "p_retailprice"
    )
    snat = (
        cat.table("supplier")
        .join(
            F.broadcast(cat.table("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_FRAC)
    ) - F.col("p_retailprice").cast(DEC_PRICE) * F.col("l_quantity").cast(DEC_PRICE)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(snat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(r6(F.sum(profit).cast("double")).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# qx186 — top customers by returned revenue (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

RETURNED_LO, RETURNED_HI = "1996-10-01", "1997-01-01"
RETURNED_TOPK = 20

RETURNED_ITEMS_ORACLE = f"""
SELECT c.c_custkey, c.c_name,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(16,6))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6) AS revenue,
       round(CAST(CAST(c.c_acctbal AS DECIMAL(16,6)) AS DOUBLE), 6) AS acctbal,
       n.n_name
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{RETURNED_LO}'
  AND o.o_orderdate <  TIMESTAMP '{RETURNED_HI}'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 4, 5
ORDER BY revenue DESC, c_custkey
LIMIT {RETURNED_TOPK}
"""


@register(
    "qx186_returned_items",
    oracle=RETURNED_ITEMS_ORACLE,
    doc="TPC-H Q10 shape: top customers by revenue lost to returns in a quarter",
    tags=("relational", "join", "agg", "top-k", "tpch"),
)
def qx186_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: who returned the most revenue in one quarter. The
    plan aggregates BEFORE the wide dimension attach: returns join the
    quarter's orders on the orderkey exchange and reduce to one row per
    o_custkey — so the customer join (and at 100 TB, customer is a
    fact-sized table) moves only |active customers in quarter| rows,
    and the name/balance/nation attach happens after the reduction.
    Top-20 by rounded revenue with the unique custkey tie-break
    (TakeOrderedAndProject — no global sort)."""
    cat = load_catalog(spark, sf_dir)
    returns = cat.table("lineitem").filter(F.col("l_returnflag") == "R")
    orders = cat.table("orders").filter(
        (F.col("o_orderdate") >= F.lit(RETURNED_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(RETURNED_HI).cast("timestamp"))
    )
    revenue = F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_FRAC)
    )
    per_cust = (
        returns.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(revenue).alias("rev"))
    )
    cust = cat.table("customer").join(
        F.broadcast(cat.table("nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        per_cust.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            r6(F.col("rev").cast("double")).alias("revenue"),
            r6(F.col("c_acctbal").cast(DEC_PRICE).cast("double")).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(RETURNED_TOPK)
    )


# ---------------------------------------------------------------------------
# qx187 — priority mix by return class (TPC-H Q12 shape)
# ---------------------------------------------------------------------------

SHIPMODE_YEAR_LO, SHIPMODE_YEAR_HI = "1997-01-01", "1998-01-01"

PRIORITY_MIX_ORACLE = f"""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{SHIPMODE_YEAR_LO}'
  AND l.l_shipdate <  TIMESTAMP '{SHIPMODE_YEAR_HI}'
GROUP BY 1
ORDER BY 1
"""


@register(
    "qx187_priority_mix",
    oracle=PRIORITY_MIX_ORACLE,
    doc="TPC-H Q12 shape: high/low-priority line counts per return class",
    tags=("relational", "join", "agg", "tpch"),
)
def qx187_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12's conditional-count shape (the fixture has no
    l_shipmode, so the grouping column is l_returnflag; the date-window
    filter plays commitdate/receiptdate's role). One fact⋈fact join on
    the orderkey exchange, then a 3-group hash agg whose CASE pair is
    a single pass — both counts come from one sum over a when/otherwise,
    never two scans. The shipdate window pushes to the parquet scan."""
    cat = load_catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit(SHIPMODE_YEAR_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(SHIPMODE_YEAR_HI).cast("timestamp"))
    )
    orders = cat.table("orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_returnflag")
        .join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# qx188 — customer order-count distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------

CUSTDIST_EXCLUDED_PRIORITY = "5-LOW"

CUSTDIST_ORACLE = f"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey,
         CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '{CUSTDIST_EXCLUDED_PRIORITY}'
  GROUP BY 1
) per_cust
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


@register(
    "qx188_customer_distribution",
    oracle=CUSTDIST_ORACLE,
    doc="TPC-H Q13 shape: histogram of per-customer order counts incl. zero",
    tags=("relational", "outer-join", "agg", "tpch"),
)
def qx188_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed k orders, INCLUDING k=0 —
    the left-outer-join + double-aggregation shape (the join filter is
    a priority exclusion; the reference uses an o_comment NOT LIKE the
    fixture lacks). The outer join is never materialized row-per-order:
    orders pre-aggregate to one (custkey, count) row on the custkey
    exchange, customer LEFT-joins that tiny frame on the same key, and
    absent customers surface as count 0 via coalesce — semantically
    identical to COUNT(o_orderkey) over the outer join, because a
    customer with no surviving orders contributes zero countable keys.
    The final histogram agg runs over |distinct counts| rows. Total
    order (custdist, c_count DESC) for the deterministic compare."""
    cat = load_catalog(spark, sf_dir)
    per_cust = (
        cat.table("orders")
        .filter(F.col("o_orderpriority") != CUSTDIST_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        cat.table("customer")
        .select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# qx189 — promo revenue share (TPC-H Q14 shape)
# ---------------------------------------------------------------------------

PROMO_LO, PROMO_HI = "1997-09-01", "1997-10-01"

PROMO_SHARE_ORACLE = f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice AS DECIMAL(16,6))
                        * (1 - CAST(l.l_discount AS DECIMAL(8,6)))
                     ELSE CAST(0 AS DECIMAL(16,6)) END) AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(16,6))
                  * (1 - CAST(l.l_discount AS DECIMAL(8,6)))) AS DOUBLE), 6)
       AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '{PROMO_LO}'
  AND l.l_shipdate <  TIMESTAMP '{PROMO_HI}'
"""


@register(
    "qx189_promo_share",
    oracle=PROMO_SHARE_ORACLE,
    doc="TPC-H Q14 shape: percent of one month's revenue from promo parts",
    tags=("relational", "join", "agg", "scalar", "tpch"),
)
def qx189_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14's conditional-share scalar: promo revenue over total
    revenue for one ship-month. One broadcast join (part carries only
    partkey+type), one global agg computing BOTH sums in a single pass
    — numerator and denominator accumulate in exact DECIMAL and the
    division happens once, in double, on the driver-sized 1-row frame.
    The month window pushes to the lineitem scan."""
    cat = load_catalog(spark, sf_dir)
    li = cat.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit(PROMO_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(PROMO_HI).cast("timestamp"))
    )
    part = cat.table("part").select("p_partkey", "p_type")
    revenue = F.col("l_extendedprice").cast(DEC_PRICE) * (
        F.lit(1) - F.col("l_discount").cast(DEC_FRAC)
    )
    zero = F.lit(0).cast(DEC_PRICE) * (F.lit(1) - F.lit(0).cast(DEC_FRAC))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            r6(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", revenue).otherwise(zero)
                ).cast("double")
                / F.sum(revenue).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# qx190 — supplier counts by part attributes (TPC-H Q16 shape)
# ---------------------------------------------------------------------------

SUPPCNT_EXCLUDED_BRAND = "Brand#1"
SUPPCNT_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)

SUPPLIER_CNT_ORACLE = f"""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> '{SUPPCNT_EXCLUDED_BRAND}'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN {SUPPCNT_SIZES}
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register(
    "qx190_supplier_cnt",
    oracle=SUPPLIER_CNT_ORACLE,
    doc="TPC-H Q16 shape: distinct supplier counts by part attrs with NOT IN",
    tags=("relational", "anti-join", "distinct-agg", "tpch"),
)
def qx190_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16's distinct-supplier census (lineitem's distinct
    (partkey, suppkey) pairs stand in for partsupp; the excluded-
    supplier subquery keys on negative account balance, standing in
    for the reference's complaint-comment scan). The NOT IN spells as
    a BROADCAST anti-join against the handful of excluded suppliers —
    equivalent because s_suppkey is non-null. Part filters (brand/type/
    size IN-list) prune before the broadcast into the pair frame, and
    the countDistinct rides the (brand, type, size) exchange. Total
    order with the full group key as tie-break."""
    cat = load_catalog(spark, sf_dir)
    pairs = (
        cat.table("lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    bad_supp = cat.table("supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    part = cat.table("part").filter(
        (F.col("p_brand") != SUPPCNT_EXCLUDED_BRAND)
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(*SUPPCNT_SIZES))
    )
    return (
        pairs.join(
            F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )
