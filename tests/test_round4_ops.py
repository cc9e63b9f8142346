"""Targeted property tests for the round-4 continuation operators —
invariants the value-hash parity gate cannot express (parity proves
Spark == oracle; these prove both compute the RIGHT thing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark import registry

from .conftest import SF_DRIVER, SF_ORACLE

SPECS = registry.all_specs()


# --- emb_kmeans_lloyd_step --------------------------------------------------


def test_lloyd_step_partitions_all_vectors(spark):
    """Every vector is assigned to exactly one cluster and every seed
    cluster is non-empty (each seed assigns to itself at distance 0)."""
    from insurance_claim_data_pipeline_spark.session import load_table

    out = SPECS["emb_kmeans_lloyd_step"].fn(spark, SF_ORACLE).toPandas()
    n_vec = load_table(spark, SF_ORACLE, "embeddings").count()
    assert out["n_assigned"].sum() == n_vec
    assert (out["n_assigned"] >= 1).all()
    assert (out["sse_e6"] >= 0).all() and (out["shift_l1_e6"] >= 0).all()


# --- text_naive_bayes -------------------------------------------------------


def test_naive_bayes_beats_chance(spark):
    """Held-out accuracy must beat the uniform-guess baseline — the
    model half of the operator is vacuous otherwise (a bug that, e.g.,
    scored every class identically would still pass parity because the
    oracle would replicate it)."""
    nb = SPECS["text_naive_bayes"].fn(spark, SF_DRIVER).toPandas()
    n_langs = len(set(nb["lang"]))
    acc = nb[nb.lang == nb.pred_lang]["n_docs"].sum() / nb["n_docs"].sum()
    assert n_langs >= 3
    assert acc > 1.0 / n_langs, f"accuracy {acc} not above 1/{n_langs} chance"


# --- graph_label_propagation ------------------------------------------------


def test_lpa_conserves_nodes(spark):
    """Community sizes must partition the vertex set exactly."""
    from insurance_claim_data_pipeline_spark.session import load_table

    out = SPECS["graph_label_propagation"].fn(spark, SF_ORACLE).toPandas()
    orders = load_table(spark, SF_ORACLE, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select((F.col("o_custkey") * 2).alias("c"), (F.col("l_suppkey") * 2 + 1).alias("s"))
        .distinct()
    )
    n_nodes = (
        pairs.select(F.col("c").alias("n"))
        .unionAll(pairs.select(F.col("s").alias("n")))
        .distinct()
        .count()
    )
    assert out["n_nodes"].sum() == n_nodes
    assert (out["n_nodes"] >= 1).all()


# --- privacy ----------------------------------------------------------------


def test_t_closeness_bounds(spark):
    """Variational distance is a metric in [0, 1] (×1e6 fixed point:
    small negative/overshoot values would indicate a fixed-point bug,
    the truncating division can only undershoot by < |values| ulps)."""
    out = SPECS["privacy_t_closeness"].fn(spark, SF_ORACLE).toPandas()
    assert (out["t_variational_e6"] >= 0).all()
    assert (out["t_variational_e6"] <= 1_000_000).all()
    assert (out["skew_risk"] == (out["t_variational_e6"] > 200_000)).all()


def test_dp_counts_reproducible_and_bounded(spark):
    """The seeded mechanism must be replayable (two runs, identical
    noise — the whole point of hash-seeding) and the Laplace noise
    scale must look like b=1: P(|noise| > 5) = e^-5 ≈ 0.7%, so the
    max |noise| over ~400 cells should stay in single digits."""
    a = SPECS["privacy_dp_counts"].fn(spark, SF_ORACLE).toPandas().sort_values(
        ["o_orderpriority", "order_month"]
    )
    b = SPECS["privacy_dp_counts"].fn(spark, SF_ORACLE).toPandas().sort_values(
        ["o_orderpriority", "order_month"]
    )
    assert (a["dp_n_e6"].values == b["dp_n_e6"].values).all()
    assert a["noise_abs_e6"].max() < 15_000_000  # |noise| < 15 at b=1
    assert a["noise_abs_e6"].median() < 2_000_000  # median |Lap(1)| = ln2


# --- sink_bloom_index_stats -------------------------------------------------


def test_bloom_index_no_false_negatives(spark):
    """A Bloom filter may say 'maybe' wrongly but never 'no' wrongly:
    per file, bloom hits ⊇ exact hits, and the overshoot equals the
    false-positive column exactly."""
    out = SPECS["sink_bloom_index_stats"].fn(spark, SF_ORACLE).toPandas()
    assert (out["n_bloom_hits"] >= out["n_exact_hits"]).all()
    assert (
        out["n_false_pos"] == out["n_bloom_hits"] - out["n_exact_hits"]
    ).all()
    assert (out["n_probes"] >= out["n_bloom_hits"]).all()


# --- events_kalman_filter ---------------------------------------------------


def test_kalman_covariance_reaches_steady_state(spark):
    """The error covariance p_t follows a Riccati recursion that
    converges monotonically to a fixed point independent of the data;
    after a few dozen steps every user's p must sit at the same
    steady-state value (data-independent!), and estimates stay inside
    the observed value envelope."""
    out = SPECS["events_kalman_filter"].fn(spark, SF_DRIVER).toPandas()
    last = out.sort_values(["user_id", "ts_us", "event_id"]).groupby("user_id").tail(1)
    assert last["p_e6"].nunique() == 1, "steady-state covariance must be universal"
    # estimate is a convex combination of observations → bounded by them
    lo, hi = out["value"].min() * 1e6 - 1e6, out["value"].max() * 1e6 + 1e6
    assert out["kalman_e6"].between(lo, hi).all()


# --- events_periodogram -----------------------------------------------------


def test_periodogram_finds_daily_cycle(spark):
    """The synthetic event stream carries diurnal seasonality: spectral
    power at the 24 h candidate must dominate the shorter harmonics
    (168 h is excluded — weekly power legitimately rivals daily)."""
    out = (
        SPECS["events_periodogram"].fn(spark, SF_DRIVER).toPandas().set_index("period_h")
    )
    p24 = out.loc[24, "power_e6"]
    for shorter in (6, 8, 12):
        assert p24 > out.loc[shorter, "power_e6"], f"24h power not above {shorter}h"


# --- stats_two_proportion_ztest ---------------------------------------------


def test_two_proportion_ztest_recompute(spark):
    """z must equal the textbook formula recomputed from the released
    integer counts, and the test must be non-degenerate (both arms
    populated, pooled rate strictly inside (0,1))."""
    import math

    r = SPECS["stats_two_proportion_ztest"].fn(spark, SF_ORACLE).toPandas().iloc[0]
    n_a, n_b, c_a, c_b = (int(r[k]) for k in ("n_a", "n_b", "conv_a", "conv_b"))
    assert n_a > 0 and n_b > 0
    pp = (c_a + c_b) / (n_a + n_b)
    assert 0.0 < pp < 1.0, "degenerate test: conversion saturated"
    z = (c_a / n_a - c_b / n_b) / math.sqrt(pp * (1 - pp) * (1 / n_a + 1 / n_b))
    assert abs(z - float(r["z_stat"])) < 1e-9


# --- text_train_novelty -----------------------------------------------------


def test_novelty_bounded_and_nonvacuous(spark):
    """ppm in [0, 1e6]; and at the driver scale the synthetic corpus
    contains cross-split duplicates, so SOME eval doc must show
    non-trivial overlap (novelty < 1e6) — otherwise the train-index
    probe could be silently broken (an empty index yields all-novel,
    which would still pass parity if the oracle broke identically)."""
    out = SPECS["text_train_novelty"].fn(spark, SF_DRIVER).toPandas()
    assert out["novelty_ppm"].between(0, 1_000_000).all()
    assert (out["n_novel"] <= out["n_shingles"]).all()
    assert (out["novelty_ppm"] < 1_000_000).any(), "no cross-split overlap found"


# --- mlfeat_gbm_rounds ------------------------------------------------------


def test_gbm_round1_matches_exhaustive_search(spark):
    """Round 1's winning (feature, split, gain) must equal a brute-force
    pandas scan of every threshold of both features using the same
    exact-integer gain formula — guards the prefix-sum/window split
    search against off-by-one-bin errors that parity alone cannot see
    (the oracle shares the windowed formulation)."""
    from insurance_claim_data_pipeline_spark.session import load_table

    out = SPECS["mlfeat_gbm_rounds"].fn(spark, SF_ORACLE).toPandas()
    assert len(out) == 2 and set(out["round"]) == {1, 2}
    assert (out["gain_sse"] > 0).all()

    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderdate", "o_orderpriority", "o_totalprice"
    ).toPandas()
    import pandas as pd

    dt = pd.to_datetime(orders["o_orderdate"])
    feats = {
        "month": (dt.dt.year * 12 + dt.dt.month - 1).astype(int),
        "prio": orders["o_orderpriority"].str[0].astype(int),
    }
    import numpy as np

    # np.floor(x + 0.5), not Series.round(): pandas rounds half-to-even
    # while Spark/DuckDB ROUND go half-away-from-zero.
    y = pd.Series(np.floor(orders["o_totalprice"].to_numpy() + 0.5)).astype("int64")
    best = None
    for fname, xb in sorted(feats.items()):
        g = pd.DataFrame({"bin": xb, "y": y}).groupby("bin")["y"].agg(["count", "sum"])
        g = g.sort_index()
        nl, sl = g["count"].cumsum(), g["sum"].cumsum()
        nt, st = int(g["count"].sum()), int(g["sum"].sum())
        for b, n_l, s_l in zip(g.index, nl, sl):
            n_l, s_l = int(n_l), int(s_l)
            if n_l == 0 or n_l == nt:
                continue
            num = s_l * (nt - n_l) - (st - s_l) * n_l
            gain = (num * num) // (n_l * (nt - n_l) * nt)  # exact python ints
            key = (-gain, fname, int(b))
            if best is None or key < best:
                best = key
    r1 = out[out["round"] == 1].iloc[0]
    assert (-best[0], best[1], best[2]) == (
        int(r1["gain_sse"]),
        r1["feature"],
        int(r1["split_bin"]),
    )


# --- drift_wasserstein_orders -----------------------------------------------


def test_wasserstein_matches_numpy_recompute(spark):
    """W1 must equal an independent numpy recomputation of
    ∫|F1−F0|dx over the cent-quantized merged support (the closed form
    scipy.stats.wasserstein_distance implements), and the distributed
    lead must stitch bucket boundaries exactly."""
    import numpy as np

    from insurance_claim_data_pipeline_spark.operators.stats import _KS_SPLIT
    from insurance_claim_data_pipeline_spark.session import load_table

    r = SPECS["drift_wasserstein_orders"].fn(spark, SF_ORACLE).toPandas().iloc[0]
    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    v = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).astype("int64")
    g = (orders["o_orderdate"].astype("datetime64[ns]") < _KS_SPLIT).to_numpy()
    a, b = np.sort(v[g]), np.sort(v[~g])
    support = np.unique(v)
    f1 = np.searchsorted(a, support, side="right") / len(a)
    f0 = np.searchsorted(b, support, side="right") / len(b)
    w1 = float(np.sum(np.abs(f1 - f0)[:-1] * np.diff(support)))
    assert int(r["n1"]) == len(a) and int(r["n0"]) == len(b)
    assert abs(w1 - float(r["w1_cents"])) <= 1.0  # trunc-div grain


def test_wasserstein_no_single_partition_window(spark):
    """Every Window node in the W1 plan must carry a partition spec
    (the two-level prefix + boundary-patched lead discipline)."""
    import re

    from .test_plans import physical_plan

    plan = physical_plan(spark, SF_ORACLE, "drift_wasserstein_orders")
    for m in re.finditer(r"Window \[[^\]]*\], \[(?P<part>[^\]]*)\], \[[^\]]*\]", plan):
        assert m.group("part").strip() != ""


# --- stats_sprt_sequential --------------------------------------------------


def test_sprt_first_crossing_matches_replay(spark):
    """Replay the LLR walk sequentially in Python over the same trial
    order and verify the de-sequentialized first-crossing answer —
    guards the affine-collapse argument (llr is affine in (t, S_t), so
    crossing detection via two MINs must equal the ordered scan)."""
    from insurance_claim_data_pipeline_spark.operators.stats import (
        SPRT_A_E6,
        SPRT_B_E6,
        SPRT_LO_E6,
        SPRT_THRESH,
        SPRT_UP_E6,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    r = SPECS["stats_sprt_sequential"].fn(spark, SF_ORACLE).toPandas().iloc[0]
    ev = (
        load_table(spark, SF_ORACLE, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "value")
        .toPandas()
        .sort_values("event_id")
    )
    llr, first, decision = 0, None, "continue"
    for i, v in enumerate(ev["value"], start=1):
        llr += SPRT_A_E6 if float(v) > SPRT_THRESH else SPRT_B_E6
        if first is None and (llr >= SPRT_UP_E6 or llr <= SPRT_LO_E6):
            first = i
            decision = "accept_h1" if llr >= SPRT_UP_E6 else "accept_h0"
    assert int(r["n_trials"]) == len(ev)
    assert int(r["llr_final_e6"]) == llr
    assert decision == r["decision"] != "continue"  # non-vacuous: it crossed
    assert int(r["first_cross_rn"]) == first
