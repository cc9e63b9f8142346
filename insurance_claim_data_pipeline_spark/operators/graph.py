"""Iterative graph analytics as Spark dataflow: damped PageRank over the
customer-supplier bipartite graph (who trades with whom, via
orders ⋈ lineitem).

The iteration is the GraphX/Pregel shape — per round, one shuffle join
of the edge list against current ranks and one aggregate of incoming
contributions — expressed directly as DataFrame ops, like
``dedup_components``'s label propagation.

Exactness design: ranks are ×1e12 BIGINT fixed-point. Per-edge
contribution is ``pr div outdeg`` (integer), the damping step is
``base + (85 · Σ) div 100`` (integer), so every quantity is an exact
integer sum — aggregation ORDER cannot move a bit, and the DuckDB
oracle (the same three iterations unrolled as CTEs) hashes identically.
All quantities are positive, so Spark's truncating ``div`` and DuckDB's
flooring ``//`` agree. Float PageRank would be oracle-unhashable (sum
order) — fixed-point is the distributed-determinism trick.

Both endpoints of every edge appear as sources (the graph is stored
undirected as two directed edges), so there are no dangling nodes and
no lost-mass redistribution term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table

PR_SCALE = 10**12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_ITERS = 3


def _pagerank_oracle() -> str:
    prev = "pr0"
    its = []
    for i in range(1, PR_ITERS + 1):
        its.append(
            f"""it{i} AS (
  SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS contrib
  FROM edges e JOIN {prev} p ON e.src = p.node JOIN deg d ON e.src = d.node
  GROUP BY e.dst
), pr{i} AS (
  SELECT node,
         ((15 * ({PR_SCALE} // n_nodes)) // 100)
           + ({PR_DAMP_NUM} * contrib) // {PR_DAMP_DEN} AS pr
  FROM it{i}, n
)"""
        )
        prev = f"pr{i}"
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
), nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
pr0 AS (SELECT node, {PR_SCALE} // n_nodes AS pr FROM nodes, n),
{', '.join(its)}
SELECT node, pr AS pr_e12 FROM {prev}
"""


@register("graph_pagerank", oracle=_pagerank_oracle(), tags=("graph", "iterative", "join"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration damped PageRank (d=0.85) over the customer-supplier
    trade graph in exact ×1e12 integer fixed point (module docstring has
    the determinism argument).

    Scale shape per iteration: one shuffle join of edges against the
    rank vector on src (both sides partitioned by the same key after
    round 1 — AQE reuses the partitioning) and one map-side-combined
    aggregate on dst. Degrees are computed once and joined into the
    edge list up front, so the loop body touches exactly two tables.
    The iteration count is fixed and small (a convergence-thresholded
    variant would localCheckpoint per round like dedup_components)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # pre-join degree into the edge list once; the loop body then only
    # joins ranks (the small changing side) per iteration
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=False)

    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # scalar driver value: node-count, not data
    base = (15 * (PR_SCALE // n_nodes)) // 100

    pr = nodes.select("node", F.lit(PR_SCALE // n_nodes).cast("long").alias("pr"))
    for _ in range(PR_ITERS):
        contrib = (
            edges_deg.join(pr, edges_deg.src == pr.node)
            .select("dst", F.expr("pr div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        pr = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.expr(f"({PR_DAMP_NUM} * contrib) div {PR_DAMP_DEN}"))
            .cast("long")
            .alias("pr"),
        )
    return pr.select("node", F.col("pr").alias("pr_e12"))
