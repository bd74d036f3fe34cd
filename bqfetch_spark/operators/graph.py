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


# ---------------------------------------------------------------------------
# qx145 — triangle counting on the undirected trade graph
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = f"""
WITH e AS MATERIALIZED ({_EDGES_SQL}),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM e WHERE src <> dst
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
member AS (SELECT unnest([a, b, c]) AS nation FROM tri)
SELECT n.n_name AS nation, CAST(count(member.nation) AS BIGINT) AS n_triangles
FROM nation n LEFT JOIN member ON member.nation = n.n_name
GROUP BY 1
"""


@register(
    "qx145_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    doc="per-nation triangle participation in the undirected trade graph",
    tags=("graph", "join", "stats"),
)
def qx145_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting — the standard graph-cohesion primitive
    (clustering coefficients, community seeds) — as a three-way
    self-join on canonically-ordered edges: store each undirected edge
    once as (u < v), join (a,b)⋈(b,c) to enumerate wedges, then
    semi-check the closing edge (a,c); a < b < c holds by
    construction, so every triangle is produced exactly once with no
    post-hoc dedup. Per-node counts explode the 3 corners and
    left-join back to the full nation list (zeros kept).

    Scale posture mirrors qx125: the only fact-sized stage is the edge
    reduction (one partially-aggregated multi-join of lineitem);
    triangle enumeration runs on the ≤|nations|² edge list. On a graph
    whose edge list is itself huge, the same plan holds with the
    standard degree-ordered orientation (u→v iff deg(u)<deg(v)) — the
    canonical-order join IS that algorithm; integer counts make the
    oracle exact."""
    cat = load_catalog(spark, sf_dir)
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        cat.table(t).createOrReplaceTempView(t)
    e = spark.sql(_EDGES_SQL)
    und = (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)  # referenced 3x below; keep the
        # fact-join lineage out of the triple self-join
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .select(F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c"))
    )
    member = tri.select(F.explode(F.array("a", "b", "c")).alias("nation"))
    nations = cat.table("nation").select(F.col("n_name").alias("nation"))
    return (
        nations.join(member.withColumn("hit", F.lit(1)), "nation", "left")
        .groupBy("nation")
        .agg(F.count("hit").cast("bigint").alias("n_triangles"))
    )


# ---------------------------------------------------------------------------
# qx146 — BFS shortest hops over a sparsified trade digraph
# ---------------------------------------------------------------------------

BFS_SOURCE = "NATION_0"
BFS_MAX_HOPS = 12  # ≥ any reachable distance on a 25-node out-degree-2 graph? no —
# a path-like worst case reaches 24; the cap bounds BOTH engines identically, so
# nodes farther than the cap (none on the fixture) would be NULL on both sides.

_BFS_ORACLE = f"""
WITH RECURSIVE e AS MATERIALIZED ({_EDGES_SQL}),
sparse AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
    FROM e WHERE src <> dst
  ) WHERE rn <= 2
),
walk(node, hop) AS (
  SELECT '{BFS_SOURCE}' AS node, 0 AS hop
  UNION ALL
  SELECT s.dst, w.hop + 1
  FROM walk w JOIN sparse s ON s.src = w.node
  WHERE w.hop < {BFS_MAX_HOPS} - 1
),
dist AS (SELECT node, CAST(min(hop) AS BIGINT) AS hops FROM walk GROUP BY node)
SELECT n.n_name AS nation, dist.hops
FROM nation n LEFT JOIN dist ON dist.node = n.n_name
"""


@register(
    "qx146_bfs_hops",
    oracle=_BFS_ORACLE,
    doc="BFS shortest hop counts from one nation over a top-2-out-edge trade digraph",
    tags=("graph", "iterative"),
)
def qx146_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest hops by frontier-expansion BFS — the
    iterative-dataflow sibling of qx125 (fixed-point ranks) and q74
    (pointer-jumping components). The graph is deliberately SPARSIFIED
    (each nation keeps its top-2 trade partners by weight, tie-broken
    on name) so real multi-hop structure exists; the rank-based rule
    is engine-exact, unlike a weight-threshold cut.

    Each round joins only the NEW frontier against the edge list and
    anti-joins already-settled nodes — classic BFS on Pregel and the
    shape that scales: per-round work is O(frontier out-edges), the
    settled set is touched only as an 8-byte-keyed anti-join build
    side, and the loop exits as soon as a frontier comes back empty
    (the driver check is a count on a ≤|nations| frame). The oracle is
    a capped recursive CTE taking min(hop); both engines bound the
    walk at BFS_MAX_HOPS so the semantics agree exactly, NULL for
    unreachable."""
    cat = load_catalog(spark, sf_dir)
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        cat.table(t).createOrReplaceTempView(t)
    from pyspark.sql.window import Window

    e = spark.sql(_EDGES_SQL).filter(F.col("src") != F.col("dst"))
    rn = F.row_number().over(Window.partitionBy("src").orderBy(F.desc("w"), "dst"))
    sparse = (
        e.withColumn("rn", rn).filter(F.col("rn") <= 2).select("src", "dst")
        .localCheckpoint(eager=True)
    )
    dist = spark.createDataFrame([(BFS_SOURCE, 0)], "node string, hops bigint")
    frontier = dist
    for hop in range(1, BFS_MAX_HOPS):
        frontier = (
            frontier.join(sparse, F.col("node") == F.col("src"))
            .select(F.col("dst").alias("node"), F.lit(hop).cast("bigint").alias("hops"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        dist = dist.unionByName(frontier)
    nations = cat.table("nation").select(F.col("n_name").alias("nation"))
    return nations.join(
        dist.withColumnRenamed("node", "nation"), "nation", "left"
    ).select("nation", "hops")
