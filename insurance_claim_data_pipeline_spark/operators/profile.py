"""One-pass data profiling: per-column completeness / cardinality /
range statistics, the "describe my table" primitive every analytics
engine ships (cf. reference's ad-hoc per-field counters,
``/root/reference/claim_pipeline.py:156-176``, generalized to any
table).

Scale shape: ONE aggregation pass emits every per-column statistic as
columns of a single row, which is then exploded driver-free into the
(col_name, stats...) long format — no per-column scan, no driver loop.
The exact COUNT(DISTINCT) set makes Catalyst plan an Expand (one
duplicated stream per distinct-column) feeding a single shuffled
aggregate; the 100 TB swap to ``F.approx_count_distinct`` (HLL sketch,
no Expand) is IMPLEMENTED as profile_documents_approx — the projection
is the only line that differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def profile_table(df: DataFrame, cols: tuple[str, ...], approx: bool = False) -> DataFrame:
    """Profile ``cols`` of ``df`` in one aggregation pass.

    Returns one row per column: ``col_name, n_rows, n_nonnull,
    n_distinct, min_val, max_val`` (min/max computed in the column's
    native type, then stringified — numeric columns keep numeric
    ordering, not lexicographic). ``approx=True`` swaps the exact
    COUNT DISTINCT for the HLL sketch — the only changed expression.
    """
    n_distinct = (
        (lambda c: F.approx_count_distinct(c, 0.02)) if approx else F.count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__{c}_nn"),
            n_distinct(c).alias(f"__{c}_nd"),
            F.min(c).cast("string").alias(f"__{c}_min"),
            F.max(c).cast("string").alias(f"__{c}_max"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__{c}_nn").alias("n_nonnull"),
                F.col(f"__{c}_nd").alias("n_distinct"),
                F.col(f"__{c}_min").alias("min_val"),
                F.col(f"__{c}_max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def _profile_oracle(table: str, cols: tuple[str, ...]) -> str:
    parts = [
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               COUNT({c}) AS n_nonnull,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_val,
               CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


@register(
    "profile_documents",
    oracle=_profile_oracle("documents", _DOC_COLS),
    tags=("profile", "agg"),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table: completeness, exact
    cardinality, and native-type min/max for every column, one scan."""
    return profile_table(load_table(spark, sf_dir, "documents"), _DOC_COLS)


DQ_ORACLE = """
WITH rowrules AS (
  SELECT 1 AS rule_no, 'totalprice_nonnegative' AS rule,
         COUNT(*) AS n_checked,
         COUNT(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice < 0) AS n_violations
  FROM orders
  UNION ALL
  SELECT 2, 'orderstatus_in_domain', COUNT(*),
         COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                             OR o_orderstatus NOT IN ('O', 'F', 'P'))
  FROM orders
  UNION ALL
  SELECT 3, 'orderdate_in_range', COUNT(*),
         COUNT(*) FILTER (WHERE o_orderdate IS NULL
                             OR o_orderdate <  TIMESTAMP '1992-01-01'
                             OR o_orderdate >= TIMESTAMP '1999-01-01')
  FROM orders
  UNION ALL
  SELECT 4, 'orderkey_unique', COUNT(*),
         COUNT(*) - COUNT(DISTINCT o_orderkey)
  FROM orders
  UNION ALL
  SELECT 5, 'custkey_fk_customer', COUNT(*),
         COUNT(*) FILTER (WHERE o_custkey IS NULL OR c.c_custkey IS NULL)
  FROM orders LEFT JOIN customer c ON o_custkey = c.c_custkey
)
SELECT rule_no, rule, n_checked, n_violations FROM rowrules
"""


@register("dq_violations", oracle=DQ_ORACLE, tags=("profile", "quality"))
def dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over ``orders`` — the
    assert-style checks (not-null, domain, range, uniqueness,
    referential integrity) a warehouse gate runs before publishing a
    partition. One violation-count row per rule.

    Scale shape: rules 1-3 are conditional counts folded into ONE scan
    (a single hash aggregation, no per-rule pass); uniqueness is one
    aggregate comparing COUNT(*) to COUNT(DISTINCT); the FK rule is a
    broadcast left join against the (dimension) customer key set. A
    100 TB gate runs the same plan per partition and alerts on any
    n_violations > 0."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def viol(cond) -> any:
        return F.count(F.when(cond, 1))

    row_rules = orders.agg(
        F.count(F.lit(1)).alias("n_checked"),
        viol(F.col("o_totalprice").isNull() | (F.col("o_totalprice") < 0)).alias("v1"),
        viol(
            F.col("o_orderstatus").isNull() | ~F.col("o_orderstatus").isin("O", "F", "P")
        ).alias("v2"),
        viol(
            F.col("o_orderdate").isNull()
            | (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        ).alias("v3"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("v4"),
    )
    fk = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            viol(F.col("o_custkey").isNull() | F.col("c_custkey").isNull()).alias("v5"),
        )
    )

    # explode ONE aggregated row into per-rule rows — the scan and the
    # hash aggregation run once, not once per rule (a unionAll of
    # projections over the same agg would re-execute it per branch:
    # DataFrame plans share no CTE).
    def rule_struct(rule_no: int, rule: str, vcol: str):
        return F.struct(
            F.lit(rule_no).alias("rule_no"),
            F.lit(rule).alias("rule"),
            F.col("n_checked").alias("n_checked"),
            F.col(vcol).alias("n_violations"),
        )

    exploded = row_rules.select(
        F.explode(
            F.array(
                rule_struct(1, "totalprice_nonnegative", "v1"),
                rule_struct(2, "orderstatus_in_domain", "v2"),
                rule_struct(3, "orderdate_in_range", "v3"),
                rule_struct(4, "orderkey_unique", "v4"),
            )
        ).alias("r")
    ).select("r.rule_no", "r.rule", "r.n_checked", "r.n_violations")
    fk_row = fk.select(rule_struct(5, "custkey_fk_customer", "v5").alias("r")).select(
        "r.rule_no", "r.rule", "r.n_checked", "r.n_violations"
    )
    return exploded.unionAll(fk_row)


@register("profile_documents_approx", tags=("profile", "agg", "approx"))  # rows-only
def profile_documents_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of profile_documents the module docstring
    promises: ``approx_count_distinct`` (HLL sketch, mergeable, no
    Expand stream per distinct column) replaces exact
    ``count_distinct`` — the only changed expression, via
    profile_table(approx=True). Rows-only for the driver (HLL
    estimates are engine-specific);
    tests/test_llm_ops.py::test_approx_swaps_bracket_exact asserts
    every estimate is within HLL tolerance of the exact profile."""
    return profile_table(load_table(spark, sf_dir, "documents"), _DOC_COLS, approx=True)


PROFILE_EMB_ORACLE = """
WITH elem AS (
  SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
SELECT CAST(i AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_e6,
       MIN(CAST(v AS DOUBLE)) AS min_v,
       MAX(CAST(v AS DOUBLE)) AS max_v
FROM elem GROUP BY i
"""


@register("profile_embeddings", oracle=PROFILE_EMB_ORACLE, tags=("profile", "similarity", "llm"))
def profile_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding column (count, fixed-point
    sum, min, max): the data-quality pass that catches dead dimensions
    (constant values), scale drift between embedding-model versions,
    and NaN/Inf corruption before vectors reach an ANN index. Mean is
    recoverable as sum_e6/(1e6·n); the ×1e6 integer sum keeps the
    aggregate exact and engine/order-independent (min/max are exact
    regardless).

    Scale: posexplode to (dim, value) then a 64-group aggregate —
    map-side partial aggregation reduces each task to ≤64 rows before
    the one tiny shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    elem = emb.select(F.posexplode("embedding").alias("pos", "v")).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("v").cast("double").alias("v"),
    )
    return elem.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("v") * 1_000_000).cast("long")).alias("sum_e6"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


# ---------------------------------------------------------------------------
# Key / foreign-key discovery across the star schema
# ---------------------------------------------------------------------------

_FK_PAIRS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _fk_discovery_oracle() -> str:
    parts = []
    for ct, cc, pt, pc in _FK_PAIRS:
        parts.append(f"""
SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
       (SELECT CAST(COUNT(DISTINCT {cc}) AS BIGINT) FROM {ct}) AS n_child_distinct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {pt}) AS n_parent_rows,
       (SELECT CAST(COUNT(DISTINCT {pc}) AS BIGINT) FROM {pt}) AS n_parent_distinct,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT DISTINCT {cc} AS v FROM {ct} WHERE {cc} IS NOT NULL) c
        WHERE NOT EXISTS (SELECT 1 FROM {pt} p WHERE p.{pc} = c.v)) AS n_orphans""")
    return "\nUNION ALL\n".join(parts)


@register("dq_fk_discovery", oracle=_fk_discovery_oracle(), tags=("profile", "quality", "join"))
def dq_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key/foreign-key discovery report over the star schema: for every
    candidate (child → parent) relationship, the child's distinct key
    count, whether the parent column is actually a unique key
    (n_parent_distinct vs n_parent_rows), and the number of ORPHAN
    child values with no parent row — the referential-integrity sweep a
    warehouse runs before trusting joins (and the evidence a catalog
    tool uses to propose constraints). All seven declared TPC-H-style
    relationships are checked in one result.

    Scale shape per pair: the child side reduces to its DISTINCT key
    set first (map-side combined), so the anti-join probes |keys| not
    |rows|; parents are dimension tables (broadcast). Uniqueness is two
    counts on the parent. Nothing shuffles the fact tables beyond the
    distinct aggregates."""
    out = None
    for ct, cc, pt, pc in _FK_PAIRS:
        child = load_table(spark, sf_dir, ct).select(F.col(cc).alias("v"))
        parent = load_table(spark, sf_dir, pt).select(F.col(pc).alias("p"))
        ckeys = child.filter(F.col("v").isNotNull()).distinct()
        orphans = ckeys.join(
            F.broadcast(parent.distinct()), ckeys["v"] == F.col("p"), "left_anti"
        )
        row = (
            ckeys.agg(F.count(F.lit(1)).cast("long").alias("n_child_distinct"))
            .crossJoin(
                parent.agg(
                    F.count(F.lit(1)).cast("long").alias("n_parent_rows"),
                    F.count_distinct("p").cast("long").alias("n_parent_distinct"),
                )
            )
            .crossJoin(orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans")))
            .select(
                F.lit(f"{ct}.{cc}").alias("child"),
                F.lit(f"{pt}.{pc}").alias("parent"),
                "n_child_distinct",
                "n_parent_rows",
                "n_parent_distinct",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
