"""Iterative graph analytics on DataFrames — PageRank over a
fact-derived graph (SURVEY.md §2 extension; the reference is a fetch
client with no query layer, bqfetch/bqfetch.py:1).

The pattern this demonstrates: REDUCE the 100 TB fact tables to a
domain-sized graph first (one multi-join + partial aggregation — the
only stage that touches fact-sized data), then iterate on the tiny
edge/rank frames. Companion to operators/corpus.py's hash-min
connected components (the other iterative-dataflow operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bqfetch_spark.catalog import load_catalog
from bqfetch_spark.operators.relational import r6
from bqfetch_spark.registry import register

PR_DAMPING = 0.85
PR_ITERS = 10

_EDGES_SQL = """
  SELECT n1.n_name AS src, n2.n_name AS dst, count(*) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  GROUP BY 1, 2
"""


def _pagerank_oracle(iters: int = PR_ITERS, d: float = PR_DAMPING) -> str:
    """Unrolled fixed-iteration PageRank as plain SQL: one CTE pair
    (dangling mass, next rank) per iteration — recursive CTEs forbid
    the per-iteration aggregation, so the loop unrolls statically.
    The per-node contribution sum runs over <=|nodes| double terms in
    both engines; drift is ~1 ulp per term, invisible at round-6.
    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and with
    each rank level referenced twice (contribution + dangling) the
    unrolled chain would otherwise expand exponentially — r10 would
    inline 2^10 copies of the 6-table fact join."""
    sql = f"""
WITH edges AS MATERIALIZED ({_EDGES_SQL}),
nodes AS MATERIALIZED (SELECT n_name AS node FROM nation),
outw AS MATERIALIZED (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
"""
    for i in range(iters):
        sql += f"""dm{i} AS MATERIALIZED (
  SELECT coalesce(sum(r.r), 0.0) AS m
  FROM r{i} r LEFT JOIN outw ON r.node = outw.src
  WHERE outw.src IS NULL
),
r{i + 1} AS MATERIALIZED (
  SELECT
    n.node,
    (1.0 - {d}) / (SELECT n FROM nn)
    + {d} * (coalesce(c.contrib, 0.0) + (SELECT m FROM dm{i}) / (SELECT n FROM nn)) AS r
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.r * e.w / o.ow) AS contrib
    FROM r{i} r
    JOIN edges e ON e.src = r.node
    JOIN outw o ON o.src = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
),
"""
    sql = sql.rstrip().rstrip(",")
    sql += f"\nSELECT node AS nation, round(r, 6) AS pagerank FROM r{iters}"
    return sql


@register(
    "qx125_pagerank",
    oracle=_pagerank_oracle(),
    doc="weighted PageRank over the customer->supplier nation trade graph",
    tags=("graph", "iterative", "stats"),
)
def qx125_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph: an edge
    cust_nation -> supp_nation weighted by how many lineitems flowed
    that way. The expensive stage is the FACT REDUCTION — lineitem
    joins orders broadcast-dimension-style down to a <=|nations|² edge
    list in one partially-aggregated pass; the 100 TB posture is that
    iteration never touches facts. The power iteration itself runs
    10 (PR_ITERS) fixed rounds on the tiny rank frame (localCheckpoint per
    round keeps the plan from growing superlinearly), with the
    standard damping + uniform dangling-mass redistribution:
    r'(v) = (1-d)/N + d * (sum_in r(u) w(u,v)/outw(u) + dangling/N).
    The oracle unrolls the identical recurrence as static SQL, so the
    fixed-point is value-checked, not just shape-checked. Determinism:
    weights/out-weights are exact BIGINTs; each per-node contribution
    is a <=|nodes|-term double sum — mirrored expression, ~ulp drift,
    stable at round-6."""
    cat = load_catalog(spark, sf_dir)
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        cat.table(t).createOrReplaceTempView(t)
    edges = spark.sql(_EDGES_SQL).localCheckpoint(eager=True)
    nodes = cat.table("nation").select(F.col("n_name").alias("node"))
    outw = edges.groupBy(F.col("src").alias("osrc")).agg(F.sum("w").alias("ow"))
    n_nodes = float(nodes.count())

    ranks = nodes.select("node", (F.lit(1.0) / F.lit(n_nodes)).alias("r"))
    for it in range(PR_ITERS):
        # dangling mass: rank sitting on nodes with no out-edges,
        # redistributed uniformly (1-row frame, broadcast back)
        # explicit aliases: without a per-iteration checkpoint the rank
        # frame's lineage contains edges/nodes, so the joins below are
        # self-joins and need qualified column references
        rk = ranks.alias("rk")
        dangling = (
            rk.join(outw.alias("ow_"), F.col("rk.node") == F.col("ow_.osrc"), "left_anti")
            .agg(F.coalesce(F.sum("rk.r"), F.lit(0.0)).alias("m"))
        )
        contrib = (
            rk.join(edges.alias("eg"), F.col("rk.node") == F.col("eg.src"))
            .join(outw.alias("ow_"), F.col("eg.src") == F.col("ow_.osrc"))
            .groupBy(F.col("eg.dst").alias("dst"))
            .agg(
                F.sum(F.col("rk.r") * F.col("eg.w") / F.col("ow_.ow")).alias("contrib")
            )
        )
        ranks = (
            nodes.alias("nd").join(contrib, F.col("nd.node") == F.col("dst"), "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - PR_DAMPING) / n_nodes)
                    + F.lit(PR_DAMPING)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("m") / F.lit(n_nodes)
                    )
                ).alias("r"),
            )
        )
        # checkpoint every 2nd iteration: each level references ranks
        # twice (contribution + dangling), so the un-truncated plan
        # doubles per level — a cadence of 2 bounds that at 4 subtree
        # copies while halving the eager-materialization jobs
        if it % 2 == 1 or it == PR_ITERS - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("node").alias("nation"), r6(F.col("r")).alias("pagerank"))
