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

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table, pin, pin_eager_observed, tiny_frame_key
from .dedup import COMPONENTS_ORACLE, JACCARD_THRESHOLD, NGRAM_MAX_DF, shingles_sql

PR_SCALE = 10**12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_ITERS = 3


def _pagerank_oracle() -> str:
    prev = "pr0"
    its = []
    for i in range(1, PR_ITERS + 1):
        its.append(
            f"""it{i} AS (
  SELECT e.dst AS node, CAST(SUM(p.pr // d.outdeg) AS BIGINT) AS contrib
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
SELECT node, CAST(pr AS BIGINT) AS pr_e12 FROM {prev}
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
    edges_deg = edges.join(deg, "src").transform(pin)

    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()  # scalar driver value: node-count, not data
    if n_nodes == 0:
        # empty-graph guard: an empty partition/date-slice is routine at
        # scale — return the empty rank frame instead of dividing by the
        # node count below
        return nodes.select("node", F.lit(None).cast("long").alias("pr_e12")).limit(0)
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


TRIANGLE_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
), edges AS (
  SELECT DISTINCT a.pkey AS p1, b.pkey AS p2
  FROM op a JOIN op b ON a.okey = b.okey AND a.pkey < b.pkey
), tri AS (
  SELECT e1.p1, e1.p2, e2.p2 AS p3
  FROM edges e1
  JOIN edges e2 ON e2.p1 = e1.p2
  JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
)
SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT COUNT(*) FROM tri) AS n_triangles
"""


@register("graph_triangle_copurchase", oracle=TRIANGLE_ORACLE, tags=("graph", "join"))
def graph_triangle_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the co-purchase graph (parts co-occurring in an
    order are adjacent), via the DEGREE-ordered node-iterator: edges
    are oriented from the lower-(degree, id) endpoint to the higher,
    wedges come from one self-join on the shared source, and a second
    join checks the closing edge — each triangle produced exactly
    once, and per-vertex wedge fan-out is bounded by the OUT-degree,
    which the orientation caps at O(√m) (Σ out² = O(m^1.5), the
    standard skew-proof bound) where the previous id-ordering left
    Σ deg² — THE hot-vertex term at 100 TB. The count is
    orientation-invariant, so the id-ordered oracle matches unchanged.
    Measured on the sf0.1 co-purchase graph (max degree 222, no real
    hubs, so the bound barely binds): wedge rows 49.3M → 41.1M (−17%),
    wall time neutral (6.2 vs 6.5 s warm) — kept for the skew bound,
    which is the point on corpora whose degree tail this graph lacks
    (r09 scale lab).

    Broadcast note (r10, measured): the rank table is NODE-cardinality
    (grows with the corpus — 200k rows at sf0.1, 2M at the 10× shards),
    so the forced broadcast was A/B'd against plain joins at both
    scales: no-hint read 8.0 s x1 / 77.2 s x10 vs 6.5 / 54.4 with the
    hint — the double sort-merge of the edge frame costs more than
    shipping 2M×16B twice, so the hint stays. At true 100 TB node
    counts (≫ executor memory) drop the hint and let AQE choose; the
    orientation itself — the part that matters — is join-strategy
    agnostic. The r10 full-registry sweep read 23.8× here at k=10; a
    fresh-session re-measure is 8.9× (54.4 s) — the long-session
    elevation documented in BASELINE.md's mover-protocol row, not plan
    order."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")).distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pkey") < F.col("b.pkey")))
        .select(F.col("a.pkey").alias("p1"), F.col("b.pkey").alias("p2"))
        .distinct()
        # consumed 3x (degree build, orientation join, edge count);
        # without the cut each role re-runs the co-occurrence join
        .transform(pin)
    )
    deg = (
        edges.select(F.col("p1").alias("node"))
        .unionAll(edges.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("dg"))
    )
    # total order (degree, id) packed into one comparable long; the
    # packing dg*2^35 + node is collision-free iff BOTH dg < 2^28
    # (keeps the product in int64) AND node < 2^35 (keeps the id out of
    # the degree bits). Nodes are l_partkey: 2e8 parts at TPC-H SF 1000
    # and 2e10 at SF 100k vs 2^35 ≈ 3.4e10 — inside the bound at any
    # target scale, but a corpus with wider ids must switch to a
    # two-column (dg, node) struct ordering instead (ADVICE r09 low).
    rank = deg.select("node", (F.col("dg") * F.lit(2**35) + F.col("node")).alias("rk"))
    r1, r2 = rank.alias("r1"), rank.alias("r2")
    oriented = (
        edges.join(F.broadcast(r1), F.col("p1") == F.col("r1.node"))
        .join(F.broadcast(r2), F.col("p2") == F.col("r2.node"))
        .select(
            F.when(F.col("r1.rk") < F.col("r2.rk"), F.col("p1")).otherwise(F.col("p2")).alias("s"),
            F.when(F.col("r1.rk") < F.col("r2.rk"), F.col("p2")).otherwise(F.col("p1")).alias("d"),
            F.greatest("r1.rk", "r2.rk").alias("drk"),
        )
        .transform(pin)  # consumed 3x (two wedge roles + closing probe)
    )
    o1, o2, o3 = oriented.alias("o1"), oriented.alias("o2"), oriented.alias("o3")
    tri = (
        o1.join(o2, (F.col("o2.s") == F.col("o1.s")) & (F.col("o1.drk") < F.col("o2.drk")))
        .join(o3, (F.col("o3.s") == F.col("o1.d")) & (F.col("o3.d") == F.col("o2.d")))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return n_edges.crossJoin(n_tri)


# ---------------------------------------------------------------------------
# Degree distribution of the co-purchase graph.
# ---------------------------------------------------------------------------

DEGREE_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
), edges AS (
  SELECT DISTINCT a.pkey AS p1, b.pkey AS p2
  FROM op a JOIN op b ON a.okey = b.okey AND a.pkey < b.pkey
), deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT p1 AS node FROM edges UNION ALL SELECT p2 AS node FROM edges
  ) GROUP BY 1
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(node) AS BIGINT) AS min_node
FROM deg GROUP BY 1
"""


@register("graph_degree_distribution", oracle=DEGREE_ORACLE, tags=("graph", "agg"))
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph (same canonical p1<p2
    edge list as graph_triangle_copurchase, lineitem.py parity) — the
    first thing to look at before any graph algorithm: skew here is
    what decides salting/orientation strategy for the joins above.
    min_node per bucket gives the histogram a deterministic witness
    row. Edge build is one co-keyed self-join; the histogram is two
    map-side-combinable aggregates over (node) then (degree)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pkey") < F.col("b.pkey")))
        .select(F.col("a.pkey").alias("p1"), F.col("b.pkey").alias("p2"))
        .distinct()
        .transform(pin)  # both union arms read the same edge list
    )
    nodes = edges.select(F.col("p1").alias("node")).unionAll(
        edges.select(F.col("p2").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("node").cast("long").alias("min_node"),
    )


# ---------------------------------------------------------------------------
# Item-item collaborative filtering over co-purchase counts.
# ---------------------------------------------------------------------------

CF_TOPK = 3
CF_MIN_COMMON = 2  # ignore single-co-occurrence noise pairs

CF_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
), deg AS (
  SELECT pkey, CAST(COUNT(*) AS BIGINT) AS d FROM op GROUP BY 1
), co AS (
  SELECT a.pkey AS p1, b.pkey AS p2, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM op a JOIN op b ON a.okey = b.okey AND a.pkey <> b.pkey
  GROUP BY 1, 2
), scored AS (
  SELECT co.p1, co.p2, co.n_common,
         ROUND(CAST(co.n_common AS DOUBLE) / sqrt(CAST(da.d AS DOUBLE) * db.d), 6)
           AS cosine_sim
  FROM co JOIN deg da ON co.p1 = da.pkey JOIN deg db ON co.p2 = db.pkey
  WHERE co.n_common >= {CF_MIN_COMMON}
)
SELECT p1 AS item, p2 AS similar_item, n_common, cosine_sim, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p1
                               ORDER BY cosine_sim DESC, p2) AS rnk
  FROM scored
) WHERE rnk <= {CF_TOPK}
"""


@register("graph_item_cf_topk", oracle=CF_ORACLE, tags=("graph", "similarity", "join"))
def graph_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for every part, the top-{CF_TOPK}
    most-similar parts by co-purchase cosine
    ``n_common / sqrt(deg_a · deg_b)`` (the classic Amazon-style
    item-to-item recommender). Candidates are ONLY pairs that actually
    co-occur in an order — the co-occurrence join is keyed on the
    order (hash join, output bounded by basket sizes squared, never
    |items|²) — and a minimum-support filter (n_common ≥
    {CF_MIN_COMMON}) drops one-off noise before ranking. Similarity is
    rounded at 6 dp with an item-id tie-break, so the per-item top-k is
    a deterministic total order shared with the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    ).distinct().transform(pin)  # feeds degrees AND the pair join
    deg = op.groupBy("pkey").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a, b = op.alias("a"), op.alias("b")
    co = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pkey") != F.col("b.pkey")))
        .groupBy(F.col("a.pkey").alias("p1"), F.col("b.pkey").alias("p2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= CF_MIN_COMMON)
    )
    da = deg.select(F.col("pkey").alias("p1"), F.col("d").alias("d1"))
    db = deg.select(F.col("pkey").alias("p2"), F.col("d").alias("d2"))
    sim = F.round(
        F.col("n_common").cast("double")
        / F.sqrt(F.col("d1").cast("double") * F.col("d2")),
        6,
    )
    scored = co.join(da, "p1").join(db, "p2").select(
        "p1", "p2", "n_common", sim.alias("cosine_sim")
    )
    w = W.partitionBy("p1").orderBy(F.desc("cosine_sim"), "p2")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= CF_TOPK)
        .select(
            F.col("p1").alias("item"),
            F.col("p2").alias("similar_item"),
            "n_common",
            "cosine_sim",
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Co-purchase edge churn between time halves.
# ---------------------------------------------------------------------------

EDGE_CHURN_SPLIT = "1998-01-01"

EDGE_CHURN_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT o.o_orderdate < DATE '{EDGE_CHURN_SPLIT}' AS early,
         l.l_orderkey AS okey, l.l_partkey AS pkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), ed AS (
  SELECT DISTINCT a.early, a.pkey AS p1, b.pkey AS p2
  FROM op a JOIN op b
    ON a.okey = b.okey AND a.early = b.early AND a.pkey < b.pkey
), flags AS (
  SELECT p1, p2,
         CAST(MAX(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS in_early,
         CAST(MAX(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS in_late
  FROM ed GROUP BY 1, 2
)
SELECT CASE WHEN in_early = 1 AND in_late = 1 THEN 'stable'
            WHEN in_early = 1 THEN 'removed' ELSE 'added' END AS edge_status,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM flags GROUP BY 1
"""


@register("graph_edge_churn", oracle=EDGE_CHURN_ORACLE, tags=("graph", "drift", "agg"))
def graph_edge_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal graph evolution: co-purchase edges classified as
    stable / added / removed between the pre- and post-{EDGE_CHURN_SPLIT}
    halves — the structural-drift counterpart of the value-distribution
    drift family (PSI/KS/KL): a merchandising change shows up as edge
    churn long before degree distributions move. One co-occurrence join
    keyed on (order, half), then a two-flag aggregate per edge — the
    period comparison is a MAX over flags, not a join of two separately
    built graphs (half the scans, no full-outer edge join)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.to_date("o_orderdate") < F.lit(EDGE_CHURN_SPLIT).cast("date")).alias("early"),
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").alias("pkey"),
        )
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    ed = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.early") == F.col("b.early"))
            & (F.col("a.pkey") < F.col("b.pkey")),
        )
        .select(F.col("a.early").alias("early"), F.col("a.pkey").alias("p1"), F.col("b.pkey").alias("p2"))
        .distinct()
    )
    flags = ed.groupBy("p1", "p2").agg(
        F.max(F.when(F.col("early"), 1).otherwise(0)).cast("long").alias("in_early"),
        F.max(F.when(F.col("early"), 0).otherwise(1)).cast("long").alias("in_late"),
    )
    status = (
        F.when((F.col("in_early") == 1) & (F.col("in_late") == 1), "stable")
        .when(F.col("in_early") == 1, "removed")
        .otherwise("added")
    )
    return flags.groupBy(status.alias("edge_status")).agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph.
# ---------------------------------------------------------------------------

ASSORT_ORACLE = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
), edges AS (
  SELECT DISTINCT a.pkey AS p1, b.pkey AS p2
  FROM op a JOIN op b ON a.okey = b.okey AND a.pkey < b.pkey
), deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT p1 AS node FROM edges UNION ALL SELECT p2 AS node FROM edges
  ) GROUP BY 1
), ends AS (
  -- each undirected edge contributes BOTH orientations (standard
  -- assortativity convention: sum over directed stubs)
  SELECT da.d AS dx, db.d AS dy
  FROM edges e JOIN deg da ON e.p1 = da.node JOIN deg db ON e.p2 = db.node
  UNION ALL
  SELECT db.d, da.d
  FROM edges e JOIN deg da ON e.p1 = da.node JOIN deg db ON e.p2 = db.node
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(dx) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
         CAST(CAST(SUM(dy) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
         CAST(CAST(SUM(dx * dy) AS DECIMAL(38,0)) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(dx * dx) AS DECIMAL(38,0)) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(dy * dy) AS DECIMAL(38,0)) AS DOUBLE) AS syy
  FROM ends
)
SELECT n AS n_stubs,
       ROUND((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS assortativity
FROM m
"""


@register("graph_assortativity", oracle=ASSORT_ORACLE, tags=("graph", "stats", "agg"))
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: Pearson
    correlation of endpoint degrees over directed stubs (both
    orientations of every edge — the standard convention). Positive ⇒
    hubs buy with hubs (social-network-like); negative ⇒ hub-and-spoke
    (typical for baskets). Degree moments are exact integers held as
    per-row DECIMAL(38) sums; r is one fixed IEEE tree rounded at 6 dp.
    Reuses the checkpointed canonical edge list discipline — degrees
    and the stub join read one materialization."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pkey")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.pkey") < F.col("b.pkey")))
        .select(F.col("a.pkey").alias("p1"), F.col("b.pkey").alias("p2"))
        .distinct()
        .transform(pin)
    )
    deg = (
        edges.select(F.col("p1").alias("node"))
        .unionAll(edges.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("node").alias("p1"), F.col("d").alias("d1"))
    db = deg.select(F.col("node").alias("p2"), F.col("d").alias("d2"))
    joined = edges.join(da, "p1").join(db, "p2")
    ends = joined.select(F.col("d1").alias("dx"), F.col("d2").alias("dy")).unionAll(
        joined.select(F.col("d2").alias("dx"), F.col("d1").alias("dy"))
    )
    dsum = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")
    m = ends.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(F.col("dx")).alias("sx"),
        dsum(F.col("dy")).alias("sy"),
        dsum(F.col("dx") * F.col("dy")).alias("sxy"),
        dsum(F.col("dx") * F.col("dx")).alias("sxx"),
        dsum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    n = F.col("n")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(n.alias("n_stubs"), F.round(r, 6).alias("assortativity"))


# ---------------------------------------------------------------------------
# k-core peeling (fixed-round) over the customer-supplier trade graph
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ITERS = 4


def _kcore_oracle() -> str:
    prev = "a0"
    its = []
    for i in range(1, KCORE_ITERS + 1):
        its.append(
            f"""a{i} AS (
  SELECT e.src AS node, CAST(COUNT(*) AS BIGINT) AS deg
  FROM edges e
  JOIN {prev} s ON e.src = s.node
  JOIN {prev} d ON e.dst = d.node
  GROUP BY 1
  HAVING COUNT(*) >= {KCORE_K}
)"""
        )
        prev = f"a{i}"
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
), a0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS deg FROM edges),
{', '.join(its)}
SELECT node, deg FROM {prev}
"""


@register("graph_kcore", oracle=_kcore_oracle(), tags=("graph", "iterative", "join"))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round k-core peeling (k=KCORE_K over KCORE_ITERS rounds) of
    the customer-supplier trade graph: each round recomputes degrees
    over the surviving subgraph and drops nodes below k — removing a
    weak node can strip its neighbors below k, which is why peeling
    must iterate and why single-shot degree filtering (the degree-
    distribution view) overstates the core. Surviving nodes with their
    within-core degree are the dense trading backbone (the community-
    detection / fraud-ring pre-filter). Fixed rounds keep the unrolled
    CTE oracle exact; the peel-to-fixpoint variant adds a convergence
    loop like dedup_components, same plan shape per round.

    Scale shape per round: the edge list joins the shrinking alive set
    on BOTH endpoints (two hash joins keyed src/dst — the alive side
    only ever shrinks) and one map-side-combined degree aggregate;
    lineage is cut per round so the plan does not compound."""
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
    return kcore_frame(edges)


def kcore_frame(
    edges: DataFrame, k: int = KCORE_K, iters: int = KCORE_ITERS
) -> DataFrame:
    """Core of :func:`graph_kcore` over any symmetric ``(src, dst)``
    edge list."""
    edges = edges.transform(pin)  # joined twice per round
    alive = edges.select(F.col("src").alias("node")).distinct()
    for rnd in range(iters):
        survivors = (
            edges.join(alive.select(F.col("node").alias("src")), "src")
            .join(alive.select(F.col("node").alias("dst")), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .filter(F.col("deg") >= k)
        )
        # intermediate rounds consume only the node key (the next
        # round's two joins); deg is read solely from the FINAL round's
        # frame, so earlier pins drop it (pin-width audit r09 — a dead
        # per-node long in every round's pin payload at scale).
        if rnd < iters - 1:
            survivors = survivors.select("node")
        alive = survivors.transform(pin)
    return alive.select("node", "deg")


# ---------------------------------------------------------------------------
# Link prediction: common-neighbors / Adamic-Adar over co-purchase
# ---------------------------------------------------------------------------

LINKPRED_TOP_K = 20

LINKPRED_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
), edges AS (
  SELECT DISTINCT a.pkey AS p1, b.pkey AS p2
  FROM op a JOIN op b ON a.okey = b.okey AND a.pkey < b.pkey
), sym AS (
  SELECT p1 AS u, p2 AS v FROM edges
  UNION ALL SELECT p2, p1 FROM edges
), deg AS (
  SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY 1
), wedge AS (
  SELECT a.u AS u, b.u AS v, a.v AS w
  FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
), nonedge AS (
  SELECT w.u, w.v, w.w FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.p1 = w.u AND e.p2 = w.v)
), scored AS (
  SELECT n.u, n.v,
         CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         CAST(SUM(CAST(ROUND(1000000 / ln(CAST(d.d AS DOUBLE))) AS BIGINT))
              AS BIGINT) AS adamic_adar_e6
  FROM nonedge n JOIN deg d ON n.w = d.node
  GROUP BY 1, 2
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY adamic_adar_e6 DESC, u, v) AS rnk
  FROM scored
)
SELECT u, v, common_neighbors, adamic_adar_e6, rnk
FROM ranked WHERE rnk <= {LINKPRED_TOP_K}
"""


@register(
    "graph_link_prediction", oracle=LINKPRED_ORACLE, tags=("graph", "join", "window")
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the part co-purchase graph: for every
    NON-adjacent pair reachable in two hops, the common-neighbor count
    and the Adamic-Adar score (Σ 1/ln deg(w) — rare shared neighbors
    weigh more than promiscuous hubs), global top-{LINKPRED_TOP_K} —
    the classic 'parts likely to be bought together next' /
    recommendation-candidate generator, and the evaluation baseline
    every graph-ML link model must beat.

    Exactness: every common neighbor has degree ≥ 2 (it touches both
    endpoints), so ln(d) > 0; per-neighbor terms quantize ×1e6 once,
    making the pair score an exact integer sum with a total-order
    tie-break. Scale: candidates come from the wedge join (two-hop
    paths — bounded by Σ deg², the quantity the degree-distribution
    op monitors), never from all-pairs; the existing-edge exclusion is
    an anti-join on the pair key. The Adamic-Adar term is attached to
    the edge-scale sym frame BEFORE the wedge join (r09 scale lab:
    sf0.1 makes 148M wedge rows from 1.2M edges — joining deg onto the
    wedge output ran a whole extra operator over the biggest frame in
    the plan; scoring the 2.4M-row side first is the same integer sum
    and measured 77.6/56.7 → 48.4/49.7 s interleaved, identical rows).
    Wedge volume itself is the documented Σ deg² eval-class cost, and
    the k×-shard lab measures it growing linearly (13.0× at k=10 data
    with fixed 32-partition config)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.distinct()
    a = op.alias("a")
    b = op.alias("b")
    edges = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .distinct()
        .transform(pin)  # feeds sym (x2), the anti-join
    )
    sym = edges.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionAll(
        edges.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    # per-shared-neighbor term joined onto the EDGE-scale frame, so the
    # wedge output (the Σ deg² frame) carries its score and never feeds
    # another join; deg is node-cardinality → broadcast. Degree-1 nodes
    # are dropped FIRST: they can never be a shared neighbor (a wedge
    # needs two distinct edges at v), and under ANSI (this session's
    # default) log(1)=0 would make the term a DIVIDE_BY_ZERO crash —
    # the pre-r09 plan only evaluated it on join rows where deg >= 2
    # held structurally (ADVICE r09 high).
    term = deg.filter(F.col("d") > 1).select(
        "node",
        F.round(1_000_000 / F.log(F.col("d").cast("double"))).cast("long").alias("t"),
    )
    sa = (
        sym.join(F.broadcast(term), sym["v"] == term["node"])
        .select("u", "v", "t")
        .alias("sa")
    )
    sb = sym.alias("sb")
    wedge = sa.join(
        sb, (F.col("sa.v") == F.col("sb.v")) & (F.col("sa.u") < F.col("sb.u"))
    ).select(F.col("sa.u").alias("u"), F.col("sb.u").alias("v"), F.col("sa.t").alias("t"))
    nonedge = wedge.join(
        edges,
        (wedge["u"] == edges["p1"]) & (wedge["v"] == edges["p2"]),
        "left_anti",
    )
    scored = nonedge.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum("t").cast("long").alias("adamic_adar_e6"),
    )
    # global top-k via TakeOrderedAndProject (orderBy+limit), NOT a
    # single-partition window over the full candidate frame; the rank
    # column is then computed on the tiny k-row result.
    top = scored.orderBy(F.desc("adamic_adar_e6"), "u", "v").limit(LINKPRED_TOP_K)
    w_rank = W.partitionBy(tiny_frame_key("common_neighbors")).orderBy(
        F.desc("adamic_adar_e6"), "u", "v"
    )
    return top.select("*", F.row_number().over(w_rank).cast("long").alias("rnk"))


# ---------------------------------------------------------------------------
# Bounded-grain link prediction: the production-shaped counterpart of
# the exact eval above (the same eval-vs-pipeline split the dedup family
# has between the brute-force recall certificates and the LSH flagship).
# ---------------------------------------------------------------------------

LINKPRED_Q = 8  # wedge budget: each center contributes at most C(q,2) pairs

LINKPRED_TOPQ_ORACLE = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey FROM lineitem
), edges AS (
  SELECT DISTINCT a.pkey AS p1, b.pkey AS p2
  FROM op a JOIN op b ON a.okey = b.okey AND a.pkey < b.pkey
), sym AS (
  SELECT p1 AS u, p2 AS v FROM edges
  UNION ALL SELECT p2, p1 FROM edges
), deg AS (
  SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY 1
), nbr AS (
  SELECT s.u, s.v,
         ROW_NUMBER() OVER (PARTITION BY s.v ORDER BY d.d, s.u) AS r
  FROM sym s JOIN deg d ON s.u = d.node
), sel AS (
  SELECT u, v FROM nbr WHERE r <= {LINKPRED_Q}
), wedge AS (
  SELECT a.u AS u, b.u AS v, a.v AS w
  FROM sel a JOIN sel b ON a.v = b.v AND a.u < b.u
), nonedge AS (
  SELECT w.u, w.v, w.w FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.p1 = w.u AND e.p2 = w.v)
), scored AS (
  SELECT n.u, n.v,
         CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         CAST(SUM(CAST(ROUND(1000000 / ln(CAST(d.d AS DOUBLE))) AS BIGINT))
              AS BIGINT) AS adamic_adar_e6
  FROM nonedge n JOIN deg d ON n.w = d.node
  GROUP BY 1, 2
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY adamic_adar_e6 DESC, u, v) AS rnk
  FROM scored
)
SELECT u, v, common_neighbors, adamic_adar_e6, rnk
FROM ranked WHERE rnk <= {LINKPRED_TOP_K}
"""


@register(
    "graph_link_prediction_topq",
    oracle=LINKPRED_TOPQ_ORACLE,
    tags=("graph", "join", "window"),
)
def graph_link_prediction_topq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted Adamic-Adar link prediction: identical semantics to
    :func:`graph_link_prediction` except each wedge CENTER contributes
    only its q = LINKPRED_Q = 8 lowest-degree neighbors (deterministic
    (deg, id) order), so the wedge frame is O(n·q²) instead of the exact
    eval's Σ deg² — the bound that turns all-pairs Adamic-Adar from an
    eval query into a pipeline operator (VERDICT r09 #4; the r09 scale
    lab measured the exact variant's 148M-row wedge frame at sf0.1 as
    the slowest plan on record).

    Why lowest-degree-first: the per-neighbor budget is a grain bound,
    not a ranking of evidence — but cutting HIGH-degree endpoints first
    loses the least, because a high-degree endpoint reaches the same
    candidate pairs through its many other centers while a low-degree
    endpoint's wedges exist nowhere else. Scores are an exact lower
    bound of the full Adamic-Adar sum (every counted wedge is a real
    wedge with its true 1/ln deg(center) term; wedges through a center's
    q+1-th neighbor are dropped, never approximated).

    Plan: degree build and neighbor ranking shuffle the 2m-row sym
    frame once each (the rank window partitions by center — bounded
    partitions, no global sort); the selected frame is ≤ n·q rows, the
    wedge self-join fans out to ≤ n·C(q,2), and the center's
    1e6/ln(deg) term is attached to the SELECTED frame before the wedge
    join (the r09 rewrite's lesson: score the small side, never run an
    extra operator over the wedge-grain frame). Degree-1 centers are
    filtered before the term for the same ANSI-DIVIDE_BY_ZERO reason as
    the exact variant — they cannot form a wedge. Top-k is
    TakeOrderedAndProject, not a global window."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.distinct()
    a = op.alias("a")
    b = op.alias("b")
    edges = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .distinct()
        .transform(pin)  # feeds sym (x2), the anti-join
    )
    sym = edges.select(F.col("p1").alias("u"), F.col("p2").alias("v")).unionAll(
        edges.select(F.col("p2").alias("u"), F.col("p1").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    # per-center neighbor budget: rank each center's neighbors by
    # (endpoint degree, id) and keep q. deg is node-cardinality →
    # broadcast onto the 2m-row sym frame.
    dn = deg.select(F.col("node").alias("nbr_node"), F.col("d").alias("du"))
    w_sel = W.partitionBy("v").orderBy("du", "u")
    sel = (
        sym.join(F.broadcast(dn), sym["u"] == dn["nbr_node"])
        .select("u", "v", "du")
        .withColumn("r", F.row_number().over(w_sel))
        .filter(F.col("r") <= LINKPRED_Q)
        .select("u", "v")
        .transform(pin)  # both wedge roles read it
    )
    term = deg.filter(F.col("d") > 1).select(
        "node",
        F.round(1_000_000 / F.log(F.col("d").cast("double"))).cast("long").alias("t"),
    )
    sa = (
        sel.join(F.broadcast(term), sel["v"] == term["node"])
        .select("u", "v", "t")
        .alias("sa")
    )
    sb = sel.alias("sb")
    wedge = sa.join(
        sb, (F.col("sa.v") == F.col("sb.v")) & (F.col("sa.u") < F.col("sb.u"))
    ).select(F.col("sa.u").alias("u"), F.col("sb.u").alias("v"), F.col("sa.t").alias("t"))
    nonedge = wedge.join(
        edges,
        (wedge["u"] == edges["p1"]) & (wedge["v"] == edges["p2"]),
        "left_anti",
    )
    scored = nonedge.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum("t").cast("long").alias("adamic_adar_e6"),
    )
    top = scored.orderBy(F.desc("adamic_adar_e6"), "u", "v").limit(LINKPRED_TOP_K)
    w_rank = W.partitionBy(tiny_frame_key("common_neighbors")).orderBy(
        F.desc("adamic_adar_e6"), "u", "v"
    )
    return top.select("*", F.row_number().over(w_rank).cast("long").alias("rnk"))


# ---------------------------------------------------------------------------
# Modularity of the dedup clustering over the near-dup pair graph.
# ---------------------------------------------------------------------------

MODULARITY_ORACLE = f"""
WITH comp AS ({COMPONENTS_ORACLE.strip()}),
tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id, unnest({shingles_sql('toks')}) AS shingle FROM tok
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), hot AS (
  -- r11: mirror the consumed dedup_ngram_jaccard's NGRAM_MAX_DF cap
  -- (skew-sweep finding: consumer capped, oracle edge re-derivation not)
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > {NGRAM_MAX_DF}
), idx AS (
  SELECT doc_id, shingle FROM sh
  WHERE shingle NOT IN (SELECT shingle FROM hot)
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges AS (
  SELECT doc_a, doc_b FROM cand
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE)
        >= {JACCARD_THRESHOLD}
), deg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS k FROM (
    SELECT doc_a AS doc_id FROM edges UNION ALL SELECT doc_b FROM edges
  ) GROUP BY 1
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM edges
), intra AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m_intra
  FROM edges e
  JOIN comp ca ON e.doc_a = ca.doc_id
  JOIN comp cb ON e.doc_b = cb.doc_id
  WHERE ca.component_id = cb.component_id
), ksum AS (
  SELECT c.component_id, CAST(SUM(d.k) AS BIGINT) AS k_c
  FROM deg d JOIN comp c ON d.doc_id = c.doc_id
  GROUP BY 1
), expect AS (
  SELECT CAST(SUM(k_c * k_c) AS BIGINT) AS sum_kc2,
         CAST(COUNT(*) AS BIGINT) AS n_components
  FROM ksum
)
SELECT m.m_edges, i.m_intra, x.n_components,
       -- NULL on a zero-edge graph (modularity undefined), matching the
       -- Spark side's empty-slice guard
       CASE WHEN m.m_edges > 0 THEN
         CAST(i.m_intra AS DOUBLE) / m.m_edges
           - CAST(x.sum_kc2 AS DOUBLE) / (4.0 * m.m_edges * m.m_edges)
       END AS modularity
FROM m m, intra i, expect x
"""


@register("graph_components_modularity", oracle=MODULARITY_ORACLE, tags=("graph", "dedup", "agg"))
def graph_components_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the dedup components partition over the
    near-dup pair graph: Q = m_intra/m − Σ_c k_c² / (4 m²) — the
    clustering-quality number that says whether the components are
    real structure (Q near its maximum: here EVERY edge is
    intra-component by construction, so Q = 1 − Σ k_c²/4m², the
    partition's theoretical ceiling) or indistinguishable from a
    random wiring (Q ≈ 0).

    Exact by construction: edge count, intra-edge count and
    per-component degree sums are integers from three joins on doc_id
    (each side a reduced frame — no fact-table re-scan), with two
    double divisions at emission. At 100 TB the pair frame and the
    component labels are the inputs you already materialized for
    dedup; the modularity audit is a cheap by-product that belongs in
    every dedup run's metrics."""
    from .dedup import dedup_ngram_jaccard, min_label_components

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b").transform(pin)
    # label the SAME pinned pair frame (dedup_components(sf_dir) would
    # re-run the whole jaccard candidate generation inside its own pin
    # jobs — a duplicate corpus pass the plan audit can't see because
    # it executes eagerly during the components loop, not in the final
    # plan); min_label_components(pairs) is dedup_components' exact
    # body, so values and the shared oracle are unchanged.
    comp = min_label_components(pairs)
    deg = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    m_edges = pairs.count()
    ca = comp.select(F.col("doc_id").alias("doc_a"), F.col("component_id").alias("comp_a"))
    cb = comp.select(F.col("doc_id").alias("doc_b"), F.col("component_id").alias("comp_b"))
    m_intra = (
        pairs.join(ca, "doc_a").join(cb, "doc_b").filter("comp_a = comp_b").count()
    )
    ksum = (
        deg.join(comp, "doc_id")
        .groupBy("component_id")
        .agg(F.sum("k").cast("long").alias("k_c"))
    )
    expect = ksum.agg(
        F.sum(F.col("k_c") * F.col("k_c")).cast("long").alias("sum_kc2"),
        F.count(F.lit(1)).cast("long").alias("n_components"),
    )
    # empty-graph guard: modularity is undefined with zero edges — emit
    # the zero-edge row with NULL modularity instead of dividing by the
    # edge count (an empty slice is routine at scale)
    m_div = float(m_edges) if m_edges else 1.0
    modularity = (
        F.lit(float(m_intra)) / F.lit(m_div)
        - F.col("sum_kc2").cast("double") / (4.0 * m_div * m_div)
    )
    return expect.select(
        F.lit(m_edges).cast("long").alias("m_edges"),
        F.lit(m_intra).cast("long").alias("m_intra"),
        "n_components",
        (F.when(F.lit(m_edges) > 0, modularity)).alias("modularity"),
    )


# ---------------------------------------------------------------------------
# Pointer-jumping root-path aggregation over an implicit tree
# ---------------------------------------------------------------------------

TREE_ROOT = 1  # user_id 1 is the root; parent(u) = u // 2 (heap-shaped)

POINTER_JUMP_ORACLE = """
WITH RECURSIVE val AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE user_id >= 1 GROUP BY 1
), up(user_id, anc, path_sum, depth) AS (
  SELECT user_id, user_id, n_events, 0 FROM val
  UNION ALL
  SELECT u.user_id, u.anc // 2,
         u.path_sum + COALESCE(v.n_events, 0), u.depth + 1
  FROM up u LEFT JOIN val v ON v.user_id = u.anc // 2
  WHERE u.anc > 1
)
SELECT user_id, path_sum, depth
FROM up WHERE anc = 1
"""


@register("graph_pointer_jump_rollup", oracle=POINTER_JUMP_ORACLE, tags=("graph", "iterative", "scale"))
def graph_pointer_jump_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-path aggregation by POINTER JUMPING (path doubling): every
    user sits in the implicit heap-shaped tree parent(u) = u div 2;
    each node needs the sum of per-node values (event counts) along
    its path to the root, plus its depth. The sequential answer walks
    parents one at a time — O(depth) dependent joins. Pointer jumping
    instead maintains (node, jump-target, partial sum) and JOINS THE
    FRAME WITH ITSELF each round, doubling the jump distance: 1, 2,
    4, … ancestors folded per round, so O(log depth) shuffles total —
    the classic PRAM technique (list ranking, Wyllie '79) that makes
    linked structures tractable on a 1000-executor cluster where
    per-level iteration would serialize.

    Each round: frame F maps u → (t(u), s(u)) with s(u) = sum of
    values on the half-open path [u, t(u)); join F with itself on
    t(u) to get u → (t(t(u)), s(u) + s(t(u))). Nodes whose target
    reached the root stop participating. The per-round driver scalar
    is one convergence count, as in the components loops; the oracle
    is the straightforward recursive CTE."""
    val = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") >= 1)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
        .transform(pin)
    )
    # u -> (target = parent(u), s = sum over the HALF-OPEN path
    # [u, t(u)) — the root's own value joins once at finalization)
    f = val.select(
        F.col("user_id"),
        F.floor(F.col("user_id") / 2).cast("long").alias("t"),
        F.when(F.col("user_id") == TREE_ROOT, F.lit(0)).otherwise(F.col("v")).alias("s"),
        F.when(F.col("user_id") == TREE_ROOT, F.lit(0)).otherwise(F.lit(1)).alias("d"),
    )
    # the root's own row: target stays itself with zero extra
    f = f.withColumn("t", F.when(F.col("user_id") == TREE_ROOT, F.lit(TREE_ROOT)).otherwise(F.col("t")))
    for _ in range(8):  # 2^8 ancestors — depth bound for any fixture
        g = f.select(
            F.col("user_id").alias("g_u"),
            F.col("t").alias("g_t"),
            F.col("s").alias("g_s"),
            F.col("d").alias("g_d"),
        )
        f = (
            f.join(g, f.t == g.g_u, "left")
            .select(
                "user_id",
                F.when(F.col("t") == TREE_ROOT, F.lit(TREE_ROOT))
                .otherwise(F.coalesce("g_t", F.col("t")))
                .alias("t"),
                F.when(F.col("t") == TREE_ROOT, F.col("s"))
                .otherwise(F.col("s") + F.coalesce("g_s", F.lit(0)))
                .alias("s"),
                F.when(F.col("t") == TREE_ROOT, F.col("d"))
                .otherwise(F.col("d") + F.coalesce("g_d", F.lit(0)))
                .alias("d"),
            )
        )
        # the not-yet-at-root probe rides the pin's materialization job
        # (observe) instead of a second job re-scanning the pinned frame
        f, m = pin_eager_observed(
            f, [F.max(F.col("t") != TREE_ROOT).alias("pending")]
        )
        if not m["pending"]:
            break
    root_v = val.filter(F.col("user_id") == TREE_ROOT).select(
        F.col("v").alias("root_v")
    )
    return f.crossJoin(F.broadcast(root_v)).select(
        "user_id",
        (F.col("s") + F.col("root_v")).cast("long").alias("path_sum"),
        F.col("d").cast("long").alias("depth"),
    )


# --- label propagation communities ------------------------------------------

LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    its = []
    prev = "l0"
    for i in range(1, LPA_ROUNDS + 1):
        its.append(
            f"""v{i} AS (
  SELECT e.src AS node, l.lbl, COUNT(*) AS cnt
  FROM edges e JOIN {prev} l ON l.node = e.dst GROUP BY 1, 2
), l{i} AS (
  SELECT node, lbl FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn
    FROM v{i})
  WHERE rn = 1
)"""
        )
        prev = f"l{i}"
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS (
  SELECT c * 2 AS src, s * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT s * 2 + 1 AS src, c * 2 AS dst FROM pairs
), nodes AS (SELECT DISTINCT src AS node FROM edges),
l0 AS (SELECT node, node AS lbl FROM nodes),
{', '.join(its)}
SELECT CAST(lbl AS BIGINT) AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM {prev} GROUP BY 1
"""


@register("graph_label_propagation", oracle=_lpa_oracle(), tags=("graph", "iterative", "join"))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al.) over the bipartite customer–supplier co-purchase graph, run
    for a FIXED {LPA_ROUNDS} unrolled rounds so the whole procedure is
    a deterministic DAG the recursive-CTE-free oracle can mirror: each
    node starts labeled by its own id; each round every node adopts
    the most frequent label among its neighbors, ties broken to the
    smallest label (classic async LPA randomizes both visit order and
    ties — this variant replaces both with total orders, trading some
    convergence speed for bit-reproducibility). Output is the
    community-size histogram after round {LPA_ROUNDS}.

    Scale shape per round — the canonical Pregel step as DataFrame
    ops: one shuffle join of the edge list against the |V|-row label
    frame, one (node, label) partial-aggregated count, one map-side-
    combinable per-node struct-min argmax (no window sort). Labels never leave the cluster; rounds are a fixed
    unrolled chain, so Catalyst sees one straight-line plan. Community
    detection complements the modularity audit
    (graph_components_modularity scores a GIVEN partition; this
    PRODUCES one)."""
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
    # edges are consumed LPA_ROUNDS times — cache the one shuffle.
    edges = edges.transform(pin)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(LPA_ROUNDS):
        votes = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy(F.col("src").alias("n2"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.col("n2").alias("node"), "lbl", "cnt")
        )
        # struct-min argmax (cnt desc via exact negation, ties to the
        # smaller label) — map-side combinable, replacing a per-round
        # row_number window's full sort+shuffle of the votes frame.
        labels = (
            votes.groupBy("node")
            .agg(F.min(F.struct((-F.col("cnt")).alias("ncnt"), "lbl")).alias("b"))
            .select("node", F.col("b.lbl").alias("lbl"))
        )
    return labels.groupBy(F.col("lbl").cast("long").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
