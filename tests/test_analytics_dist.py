"""The distributed twins of the single-partition analytics must be
bit-identical to the exact operators (they share oracles) AND must not
contain the global single-partition window that motivated them."""

from __future__ import annotations

from insurance_claim_data_pipeline_spark.operators.analytics import (
    lineitem_pareto_abc,
    lineitem_pareto_abc_dist,
    orders_rfm_segmentation,
    orders_rfm_segmentation_dist,
)

from .conftest import SF_ORACLE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rfm_dist_equals_exact(spark):
    assert _rows(orders_rfm_segmentation_dist(spark, SF_ORACLE)) == _rows(
        orders_rfm_segmentation(spark, SF_ORACLE)
    )


def test_pareto_dist_equals_exact(spark):
    assert _rows(lineitem_pareto_abc_dist(spark, SF_ORACLE)) == _rows(
        lineitem_pareto_abc(spark, SF_ORACLE)
    )


def test_dist_plans_have_no_global_ntile_or_unpartitioned_big_window(spark):
    # The exact ops sort ALL rows into one partition for their global
    # windows (ntile / running sum). The dist plans may only ever
    # single-partition the tiny bucket-totals side (≤32 rows); their
    # full-table windows must all be partitioned. Check: every Window
    # node that consumes the fact-side columns carries a partition spec.
    rfm = orders_rfm_segmentation_dist(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    abc = lineitem_pareto_abc_dist(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "ntile(" not in rfm  # closed-form tile, no ntile window at all
    for plan, partitioned_col in ((rfm, "o_custkey"), (abc, "l_partkey")):
        for block in plan.split("Window ")[1:]:
            head = block.split("\n", 1)[0]
            if partitioned_col in head:
                assert "windowspecdefinition(_bkt" in head, head

    # And the exact versions DO have the single-partition shape the
    # dist twins remove (guards that this test keeps meaning something
    # if the exact ops are ever rewritten).
    exact = orders_rfm_segmentation(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in exact


def test_global_rank_matches_python_on_adversarial_distributions(spark):
    """Randomized/adversarial equivalence for the two-level distributed
    rank primitive itself (42 call sites lean on it): seeded md5-derived
    datasets — heavy ties, all-equal values, two-point distributions,
    negatives — ranked by _with_global_rank and compared against
    Python's sorted() under the same (value DESC, key ASC) order. The
    dangerous invariant is boundary handling: equal values must always
    land in one bucket, or the per-bucket row_number splits a tie group
    across buckets and global ranks silently collide."""
    import hashlib

    from insurance_claim_data_pipeline_spark.operators.analytics import (
        _with_global_rank,
    )

    def h(seed: str, i: int, mod: int) -> int:
        return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16) % mod

    cases = {
        "ties-heavy": [(h("t", i, 7) - 3, i) for i in range(500)],
        "all-equal": [(42, i) for i in range(200)],
        "two-point": [(h("b", i, 2) * 1000, i) for i in range(300)],
        "spread": [(h("s", i, 10_000) - 5_000, i) for i in range(400)],
    }
    for label, data in cases.items():
        df = spark.createDataFrame(data, "v long, k long")
        got = {
            r["k"]: (r["rnk"], r["_n_total"])
            for r in _with_global_rank(df, "v", "k", "rnk").collect()
        }
        expected_order = sorted(data, key=lambda t: (-t[0], t[1]))
        n = len(data)
        expected = {k: (i + 1, n) for i, (_, k) in enumerate(expected_order)}
        assert got == expected, label
