"""Window-function operators (SURVEY.md §2.C C11-C12).

Ranking and analytic windows the reference has no equivalent for.
Windows shuffle once on the partition key; frames evaluate inside the
sorted partition with no further exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.operators.relational import DEC_PRICE, r6
from bqfetch_spark.registry import register

RANK_ORACLE = """
SELECT c_custkey, o_orderkey, round(CAST(o_totalprice AS DECIMAL(16,6)) * 1, 6) AS totalprice, rn
FROM (
  SELECT
    o_custkey AS c_custkey,
    o_orderkey,
    o_totalprice,
    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("q20_topk_per_group", oracle=RANK_ORACLE, tags=("window",))
def q20_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number over (custkey, price desc).
    One shuffle on custkey; rank filter prunes before projection."""
    orders = load_catalog(spark, sf_dir).table("orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round(F.col("o_totalprice").cast(DEC_PRICE).cast("double"), 6).alias("totalprice"),
            "rn",
        )
    )


RUNNING_ORACLE = """
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(16,6)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS running_total,
  round(CAST(lag(CAST(o_totalprice AS DECIMAL(16,6)), 1)
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE), 6) AS prev_price,
  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
FROM orders
WHERE o_custkey <= 500
"""


@register("q21_running_totals", oracle=RUNNING_ORACLE, tags=("window",))
def q21_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame: running revenue + lag per customer. Decimal
    accumulation keeps the running sum exact at any prefix length."""
    orders = load_catalog(spark, sf_dir).table("orders").filter(F.col("o_custkey") <= 500)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    price_dec = F.col("o_totalprice").cast(DEC_PRICE)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        r6(F.sum(price_dec).over(frame).cast("double")).alias("running_total"),
        r6(F.lag(price_dec, 1).over(w).cast("double")).alias("prev_price"),
        F.rank().over(w).cast("bigint").alias("order_seq"),
    )


MOVAVG_ORACLE = """
SELECT
  order_month,
  monthly_revenue,
  round(
    (monthly_revenue + coalesce(prev1, 0) + coalesce(prev2, 0))
    / (1 + CASE WHEN prev1 IS NULL THEN 0 ELSE 1 END + CASE WHEN prev2 IS NULL THEN 0 ELSE 1 END),
    6) AS moving_avg_3m
FROM (
  SELECT
    order_month,
    monthly_revenue,
    lag(monthly_revenue, 1) OVER (ORDER BY order_month) AS prev1,
    lag(monthly_revenue, 2) OVER (ORDER BY order_month) AS prev2
  FROM (
    SELECT
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
      round(CAST(sum(CAST(o_totalprice AS DECIMAL(16,6))) AS DOUBLE), 6) AS monthly_revenue
    FROM orders
    GROUP BY 1
  )
)
"""


@register("q22_moving_average", oracle=MOVAVG_ORACLE, tags=("window", "agg"))
def q22_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg-then-window: monthly revenue plus a 3-month moving average.
    The moving average is an explicit lag formula (not windowed avg) so
    both engines evaluate the identical scalar expression — windowed
    sliding-avg implementations may accumulate in different orders.
    The window over ~80 month rows is a single-partition frame — cheap
    because the heavy reduction already happened in the grouped agg."""
    orders = load_catalog(spark, sf_dir).table("orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
    ).agg(r6(F.sum(F.col("o_totalprice").cast(DEC_PRICE)).cast("double")).alias("monthly_revenue"))
    w = Window.orderBy("order_month")
    prev1 = F.lag("monthly_revenue", 1).over(w)
    prev2 = F.lag("monthly_revenue", 2).over(w)
    denom = (
        F.lit(1)
        + F.when(prev1.isNull(), 0).otherwise(1)
        + F.when(prev2.isNull(), 0).otherwise(1)
    )
    return monthly.select(
        "order_month",
        "monthly_revenue",
        r6(
            (
                F.col("monthly_revenue")
                + F.coalesce(prev1, F.lit(0.0))
                + F.coalesce(prev2, F.lit(0.0))
            )
            / denom
        ).alias("moving_avg_3m"),
    )
