"""Semantic tests for the round-4 statistics / feature-engineering /
time-series operators, beyond oracle parity: each asserts a property
the statistic must have BY CONSTRUCTION (parity alone would also pass
on a consistently-wrong implementation, since the oracle mirrors the
computation)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark.operators import (
    analytics,
    ema,
    eventops,
    graph,
    mlfeat,
    sketches,
    stats,
    textops,
)


def test_zscore_group_mean_is_zero_and_minmax_bounded(spark):
    # Over ALL rows (row thinning off via direct frame math): z-scores
    # of the full population must average ~0 per group; the thinned
    # output must stay within the full-population min-max bounds.
    sf = "/root/testdata/sf0.01"
    out = mlfeat.feat_scale_numeric(spark, sf)
    mm = out.agg(F.min("minmax"), F.max("minmax")).collect()[0]
    assert 0.0 <= mm[0] and mm[1] <= 1.0
    z = out.groupBy("l_returnflag").agg(F.avg("z_score").alias("m")).collect()
    # the thinned sample's mean is not exactly 0, but must be small
    for r in z:
        assert abs(r["m"]) < 0.2


def test_onehot_rows_sum_to_one(spark, sf_dir):
    out = mlfeat.feat_categorical_encode(spark, sf_dir)
    bad = out.filter(
        F.col("is_urgent") + F.col("is_high") + F.col("is_medium")
        + F.col("is_notspec") + F.col("is_low") != 1
    ).count()
    assert bad == 0


def test_target_encode_between_prior_and_rate(spark, sf_dir):
    # Smoothing pulls each category's encoding strictly between its raw
    # rate and the global prior (for n, m > 0).
    rows = mlfeat.feat_target_encode(spark, sf_dir).collect()
    for r in rows:
        raw = r["n_pos"] / r["n_orders"]
        lo, hi = sorted((raw, r["prior"]))
        assert lo - 1e-12 <= r["target_enc"] <= hi + 1e-12


def test_quantile_bins_are_balanced(spark, sf_dir):
    # ntile(10) buckets differ in size by at most 1 over the FULL table;
    # the thinned output must still use every decile.
    out = mlfeat.feat_quantile_bin(spark, sf_dir)
    deciles = {r["decile"] for r in out.select("decile").distinct().collect()}
    assert deciles == set(range(1, 11))


def test_welch_ttest_state_sane(spark, sf_dir):
    row = stats.stats_welch_ttest(spark, sf_dir).collect()[0]
    assert row["n1"] > 0 and row["n2"] > 0
    assert math.isfinite(row["t_stat"]) and row["welch_df"] > 1
    # df is bounded by n1+n2-2 (equality only when variances match)
    assert row["welch_df"] <= row["n1"] + row["n2"] - 2


def test_chi2_is_nonnegative_and_dof_correct(spark, sf_dir):
    row = stats.stats_chi2_independence(spark, sf_dir).collect()[0]
    assert row["chi2_e6"] >= 0
    assert row["dof"] == (5 - 1) * (3 - 1)


def test_corr_matrix_within_bounds_and_price_qty_positive(spark, sf_dir):
    rows = stats.stats_corr_matrix(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 - 1e-9 <= r["pearson_r"] <= 1.0 + 1e-9
    # the synthetic columns are mutually independent by construction,
    # so every |r| must be small — a strong correlation would mean the
    # moment bookkeeping is broken
    for r in rows:
        assert abs(r["pearson_r"]) < 0.2


def test_ks_statistic_bounds_and_counts(spark, sf_dir):
    from insurance_claim_data_pipeline_spark.session import load_table

    row = stats.drift_ks_twosample(spark, sf_dir).collect()[0]
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert row["ks_num"] >= 0
    n = load_table(spark, sf_dir, "orders").count()
    assert row["n0"] + row["n1"] == n  # the split partitions the table


def test_skew_kurtosis_sign_sanity(spark, sf_dir):
    rows = stats.stats_skew_kurtosis(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert math.isfinite(r["skewness"]) and math.isfinite(r["excess_kurtosis"])
        # prices are right-bounded near-uniformish; kurtosis must be
        # platykurtic-to-moderate, never extreme
        assert -3.0 < r["excess_kurtosis"] < 10.0


def test_kl_drift_terms_sum_near_zero_for_stationary_mix(spark, sf_dir):
    # the synthetic event mix is stationary; total KL should be tiny
    rows = stats.events_kl_drift(spark, sf_dir).collect()
    total = sum(r["kl_term_e6"] for r in rows)
    assert abs(total) < 50_000  # < 0.05 nats


def test_holt_constant_series_has_zero_trend_tail(spark, sf_dir):
    # On the real data just assert the recurrence invariants:
    # first row per type has trend 0 and level == n·1e6.
    rows = ema.events_holt_linear(spark, sf_dir).collect()
    byt: dict[str, list] = {}
    for r in rows:
        byt.setdefault(r["event_type"], []).append(r)
    for t, rs in byt.items():
        rs.sort(key=lambda r: r["hour_idx"])
        assert rs[0]["trend_e6"] == 0
        assert rs[0]["level_e6"] == rs[0]["n"] * 1_000_000
        for r in rs:
            assert r["forecast_e6"] == r["level_e6"] + r["trend_e6"]


def test_entropy_bounds(spark, sf_dir):
    rows = eventops.events_hourly_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 ≤ H ≤ ln(n_types), both in ×1e6 (+1 rounding slack per term)
        assert -r["n_types"] <= r["entropy_e6"]
        assert r["entropy_e6"] <= int(math.log(max(r["n_types"], 1)) * 1e6) + r["n_types"]


def test_rake_degree_at_least_freq(spark, sf_dir):
    # every phrase containing w has length ≥ 1, so degree ≥ freq and
    # score_e6 ≥ 1e6; stopwords never appear as keywords.
    rows = textops.text_rake_keywords(spark, sf_dir).collect()
    assert rows
    words = {r["word"] for r in rows}
    assert not words & set(textops._STOPWORDS)
    for r in rows:
        assert r["degree"] >= r["freq"]
        assert r["rake_score_e6"] >= 1_000_000


def test_pmi_margin_identity(spark, sf_dir):
    # PMI of a pair whose margins equal its count: ln(N/c12) exactly.
    rows = textops.text_pmi_bigrams(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n12"] >= textops.PMI_MIN_COUNT


def test_degree_distribution_handshake(spark, sf_dir):
    # Σ degree·n_nodes = 2·|E| (handshake lemma).
    rows = graph.graph_degree_distribution(spark, sf_dir).collect()
    total_deg = sum(r["degree"] * r["n_nodes"] for r in rows)
    assert total_deg % 2 == 0 and total_deg > 0


def test_kmv_estimate_close_to_truth(spark, sf_dir):
    # sf0.001 has fewer distinct users than K → exact small-set mode
    row = sketches.agg_kmv_distinct(spark, sf_dir).collect()[0]
    assert row["in_sketch"] < sketches.KMV_K
    assert row["est_distinct"] == row["true_distinct"]
    # sf0.01 has ~150 users > K → the estimator mode, ~1/sqrt(K) error
    row = sketches.agg_kmv_distinct(spark, "/root/testdata/sf0.01").collect()[0]
    assert row["in_sketch"] == sketches.KMV_K
    err = abs(row["est_distinct"] - row["true_distinct"]) / row["true_distinct"]
    assert err < 0.40, (row["est_distinct"], row["true_distinct"])


def test_open_concurrency_never_negative_and_ends_at_zero(spark, sf_dir):
    rows = analytics.orders_open_concurrency(spark, sf_dir).collect()
    rows.sort(key=lambda r: r["day"])
    assert all(r["open_orders"] >= 0 for r in rows)
    assert rows[-1]["open_orders"] == 0  # every interval eventually closes


def test_burstiness_bounds(spark, sf_dir):
    rows = stats.events_burstiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["fano_factor"] > 0
        assert -1.0 <= r["burstiness"] <= 1.0


def test_zipf_slope_negative(spark, sf_dir):
    # frequency is non-increasing in rank by construction, so the
    # fitted slope can never be positive
    row = textops.text_zipf_fit(spark, sf_dir).collect()[0]
    assert row["n_terms"] > 10
    assert row["zipf_slope"] <= 0.0


def test_feature_prep_pipeline_leakage_safety(spark, sf_dir):
    # encoders are fitted on train only: every split shares the SAME
    # woe/freq value per (bin, priority) — check by cross-split equality
    from insurance_claim_data_pipeline_spark.operators import pipeline as P

    rows = P.feature_prep_pipeline(spark, sf_dir).collect()
    assert rows
    by_bin: dict[int, set] = {}
    for r in rows:
        by_bin.setdefault(r["bin"], set()).add(r["woe_e6"])
        assert r["split"] in ("train", "val", "test")
        assert 1 <= r["bin"] <= P.FEAT_BINS
    for b, woes in by_bin.items():
        assert len(woes) == 1  # one fitted WOE per bin, applied everywhere


def test_heaps_beta_in_unit_interval(spark, sf_dir):
    # vocabulary can't grow faster than tokens (beta <= 1) and must
    # grow (beta > 0) while new terms keep appearing
    row = textops.text_heaps_fit(spark, sf_dir).collect()[0]
    assert row["n_points"] > 5
    assert 0.0 < row["heaps_beta"] <= 1.0


def test_mad_outliers_are_extreme(spark, sf_dir):
    # every flagged value must be beyond the cutoff on the robust scale
    rows = stats.events_outlier_mad(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r["mod_z"]) > stats.MAD_CUTOFF


def test_km_survival_monotone_nonincreasing(spark, sf_dir):
    # S(t) = exp(log_surv) must be non-increasing in t, at-risk counts
    # strictly decreasing across event times
    rows = analytics.events_survival_km(spark, sf_dir).collect()
    assert rows
    rows.sort(key=lambda r: r["dur_h"])
    prev_ls, prev_risk = 1, None
    for r in rows:
        assert r["log_surv_e6"] <= 0
        assert r["log_surv_e6"] <= prev_ls or prev_ls == 1
        if prev_risk is not None:
            assert r["at_risk"] < prev_risk
        prev_ls, prev_risk = r["log_surv_e6"], r["at_risk"]


def test_negative_pairs_never_anchor(spark, sf_dir):
    from insurance_claim_data_pipeline_spark.operators import sampling

    rows = sampling.sample_negative_pairs(spark, sf_dir).collect()
    assert rows
    assert all(r["negative_doc"] != r["anchor_doc"] for r in rows)
    # deterministic: second run identical
    again = sampling.sample_negative_pairs(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    row = stats.agg_bootstrap_ci(spark, sf_dir).collect()[0]
    assert row["ci_lo"] <= row["mean_full"] <= row["ci_hi"]
    assert row["ci_lo"] < row["ci_hi"]
    assert row["n_replicates"] == stats.BOOT_B


def test_cuped_reduces_or_preserves_variance(spark, sf_dir):
    row = stats.stats_cuped_adjustment(spark, sf_dir).collect()[0]
    # var(Y) - cov^2/var(X) <= var(Y) always (Cauchy-Schwarz)
    assert row["var_y_cuped"] <= row["var_y"] + 1e-6
    assert row["var_y_cuped"] >= 0
    assert row["n_users"] > 0


def test_did_near_zero_under_null_split(spark, sf_dir):
    # the md5 split is an A/A on stationary data: DiD must be small
    # relative to the outcome scale (~value means of O(100))
    row = stats.stats_diff_in_diff(spark, sf_dir).collect()[0]
    assert abs(row["did_estimate"]) < 30.0


def test_growth_accounting_identities(spark):
    # active_w = new + retained + resurrected; active_{w-1} = retained_w + churned_w
    sf = "/root/testdata/sf0.01"
    rows = analytics.events_growth_accounting(spark, sf).collect()
    byw: dict[int, dict[str, int]] = {}
    for r in rows:
        byw.setdefault(r["wk"], {})[r["state"]] = r["n_users"]
    active = {
        w: d.get("new", 0) + d.get("retained", 0) + d.get("resurrected", 0)
        for w, d in byw.items()
    }
    for w, d in sorted(byw.items()):
        if w - 1 in active:
            assert active[w - 1] == d.get("retained", 0) + d.get("churned", 0), w


def test_mann_whitney_hand_computed_with_ties(spark):
    """Planted fixture with a 3-way tie, checked against the hand-worked
    rank-sum: A=[1,2,2,3], B=[2,4,5] → the three 2s share midrank 3, so
    R1 = 1+3+3+5 = 12, U1 = R1 − n1(n1+1)/2 = 2 (u1_x2 = 4), and the
    tie term is 3³−3 = 24."""
    import math

    from insurance_claim_data_pipeline_spark.operators.stats import mann_whitney_frame

    rows = [(1, 1), (2, 1), (2, 1), (3, 1), (2, 0), (4, 0), (5, 0)]
    s = spark.createDataFrame(rows, "vc long, g int")
    got = mann_whitney_frame(s).collect()[0]
    assert (got["n1"], got["n2"], got["u1_x2"]) == (4, 3, 4)
    n1, n2, tie_t = 4, 3, 24
    u1 = got["u1_x2"] / 2
    var = n1 * n2 / 12 * ((n1 + n2 + 1) - tie_t / ((n1 + n2) * (n1 + n2 - 1)))
    assert abs(got["z_stat"] - (u1 - n1 * n2 / 2) / math.sqrt(var)) < 1e-12


def test_temperature_mixture_flattens_but_preserves_order(spark):
    """α=0.5 semantics: sampling weights keep the language-size order
    but compress the ratios (w_head/w_tail < n_head/n_tail — the whole
    point of temperature mixing); targets conserve the total budget up
    to per-language integer rounding; repeat factor exceeds 1e6 exactly
    for languages whose target exceeds their corpus."""
    from insurance_claim_data_pipeline_spark.operators.sampling import (
        sample_temperature_mixture,
    )

    rows = sample_temperature_mixture(spark, "/root/testdata/sf0.001").collect()
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    head, tail = by_n[-1], by_n[0]
    assert head["weight_e6"] > tail["weight_e6"]
    assert head["weight_e6"] * tail["n_docs"] < tail["weight_e6"] * head["n_docs"]
    n_tot = sum(r["n_docs"] for r in rows)
    assert abs(sum(r["target_rows"] for r in rows) - n_tot) <= len(rows)
    for r in rows:
        assert (r["repeat_x1e6"] > 1_000_000) == (r["target_rows"] > r["n_docs"])
        if r["repeat_x1e6"] <= 1_000_000:
            assert r["n_kept"] <= r["n_docs"]


def test_spearman_monotone_and_antitone_are_exact_extremes(spark):
    """Spearman semantics on planted data: any strictly monotone
    relation scores exactly +1 (regardless of nonlinearity — the
    property Pearson lacks), strictly antitone scores exactly −1, and
    tied midranks keep |rho| < 1 when the tie breaks strictness."""
    from insurance_claim_data_pipeline_spark.operators.stats import spearman_frame

    mono = spark.createDataFrame(
        [(i, i * i * i) for i in range(1, 30)], "xv long, yv long"
    )
    anti = spark.createDataFrame(
        [(i, 1000 - i * i) for i in range(1, 30)], "xv long, yv long"
    )
    tied = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 20), (4, 40)], "xv long, yv long"
    )
    assert spearman_frame(mono).collect()[0]["rho_spearman"] == 1.0
    assert spearman_frame(anti).collect()[0]["rho_spearman"] == -1.0
    r = spearman_frame(tied).collect()[0]["rho_spearman"]
    assert 0.9 < r < 1.0


def test_holt_winters_seasonal_structure(spark):
    """Structural contract of the composition: the re-seasonalized
    forecast minus (level + trend) must be a pure function of
    (event_type, next hour-of-day) — i.e. exactly the additive seasonal
    index — and the index must be non-trivial (hours genuinely differ)
    while each type's hourly grid matches the plain Holt twin's."""
    from insurance_claim_data_pipeline_spark.operators.ema import (
        events_holt_linear,
        events_holt_winters,
    )

    sf = "/root/testdata/sf0.001"
    hw = events_holt_winters(spark, sf)
    chk = (
        hw.select(
            "event_type",
            F.pmod(F.col("hour_idx") + 1, F.lit(24)).alias("nhod"),
            (F.col("forecast_e6") - F.col("level_e6") - F.col("trend_e6")).alias("s"),
        )
        .groupBy("event_type", "nhod")
        .agg(F.countDistinct("s").alias("k"), F.first("s").alias("s1"))
        .collect()
    )
    assert chk and all(r["k"] == 1 for r in chk)
    per_type: dict[str, set] = {}
    for r in chk:
        per_type.setdefault(r["event_type"], set()).add(r["s1"])
    assert any(len(v) > 1 for v in per_type.values())
    assert hw.count() == events_holt_linear(spark, sf).count()


def test_curation_funnel_monotone_attrition(spark):
    """Funnel contract: every stage only removes rows
    (raw ≥ span-kept ≥ quality-kept ≥ final), every language survives,
    and the temperature stage actually binds somewhere (at least one
    language sampled below its quality-kept count) while rate-1e6
    languages keep everything."""
    from insurance_claim_data_pipeline_spark.operators.pipeline import (
        curation_prep_pipeline,
    )

    rows = curation_prep_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_raw"] >= r["n_kept_span"] >= r["n_kept_quality"] >= r["n_final"]
        if r["rate_e6"] == 1_000_000:
            assert r["n_final"] == r["n_kept_quality"]
    assert any(r["n_final"] < r["n_kept_quality"] for r in rows)


def test_kcore_iteration_beats_single_shot_filter(spark):
    """Peeling semantics: removing a weak node can strip neighbors
    below k, so the fixed-round core must be strictly smaller than the
    naive one-shot degree>=k filter on this graph, and every survivor's
    reported degree is its WITHIN-CORE degree (>= k, and <= its raw
    degree)."""
    from insurance_claim_data_pipeline_spark.operators.graph import (
        KCORE_K,
        graph_kcore,
    )

    sf = "/root/testdata/sf0.001"
    core = {r["node"]: r["deg"] for r in graph_kcore(spark, sf).collect()}
    assert core and all(d >= KCORE_K for d in core.values())

    orders = spark.read.parquet(f"{sf}/orders.parquet").select("o_orderkey", "o_custkey")
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select((F.col("o_custkey") * 2).alias("c"), (F.col("l_suppkey") * 2 + 1).alias("s"))
        .distinct()
    )
    edges = [(r["c"], r["s"]) for r in pairs.collect()]
    from collections import Counter

    deg = Counter()
    for c, s in edges:
        deg[c] += 1
        deg[s] += 1
    one_shot = {n for n, d in deg.items() if d >= KCORE_K}
    assert set(core) <= one_shot
    for n, d in core.items():
        assert d <= deg[n]


def test_kcore_cascade_on_planted_graph(spark):
    """Planted cascade: a hub whose only neighbors are three degree-1
    leaves passes the one-shot degree>=3 filter but must fall in round
    2 once its leaves are peeled — only the 5-clique is the true
    3-core."""
    from insurance_claim_data_pipeline_spark.operators.graph import kcore_frame

    clique = [(a, b) for a in range(1, 6) for b in range(1, 6) if a != b]
    hub = [(100, l) for l in (201, 202, 203)] + [(l, 100) for l in (201, 202, 203)]
    edges = spark.createDataFrame(clique + hub, "src long, dst long")
    core = {r["node"]: r["deg"] for r in kcore_frame(edges).collect()}
    assert set(core) == {1, 2, 3, 4, 5}
    assert all(d == 4 for d in core.values())


def test_croston_hand_computed_recurrence(spark):
    """Hand-worked Croston fixture: demands 1000c at weeks 0, 2, 5 with
    α=0.3 — z stays at 1e9 (constant size), p tracks the widening
    interval: p₁=1e6, p₂=0.3·2e6+0.7·1e6=1.3e6, p₃=0.3·3e6+0.7·1.3e6
    =1.81e6, and the rate falls as gaps widen."""
    from insurance_claim_data_pipeline_spark.operators import ema as ema_mod

    rows = [(7, 0, 1000), (7, 2, 1000), (7, 5, 1000)]
    wk = spark.createDataFrame(rows, "l_partkey long, week_idx long, demand_c long")
    got = {r["week_idx"]: r for r in ema_mod.croston_frame(wk).collect()}
    assert got[0]["p_e6"] == 1_000_000 and got[0]["z_e6"] == 1_000_000_000
    assert got[2]["p_e6"] == 1_300_000
    assert got[5]["p_e6"] == 1_810_000
    assert got[0]["rate_e6"] > got[2]["rate_e6"] > got[5]["rate_e6"]


def test_lift_bootstrap_ci_brackets_null_effect(spark):
    """The exposure is a hash split with no real treatment, so the 95%
    bootstrap CI must straddle zero and contain the observed (noise)
    lift; bounds must be ordered."""
    from insurance_claim_data_pipeline_spark.operators.stats import (
        stats_lift_bootstrap_ci,
    )

    r = stats_lift_bootstrap_ci(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["ci_lo"] <= r["lift_obs"] <= r["ci_hi"]
    assert r["ci_lo"] < 0 < r["ci_hi"]


def test_pit_features_boundary_semantics(spark):
    """Planted leakage boundary: a view AT the label instant is
    excluded (strict '<' — the leakage case), one microsecond earlier
    is included, a view exactly at t−7d is included (closed start),
    and one microsecond before the window opens is excluded."""
    from insurance_claim_data_pipeline_spark.operators.mlfeat import (
        PIT_WINDOW_US,
        pit_features_frame,
    )

    t = 10_000_000_000_000
    views = spark.createDataFrame(
        [
            (1, t, 101, 100),                      # at label instant -> excluded
            (1, t - 1, 102, 200),                  # just inside -> included
            (1, t - PIT_WINDOW_US, 103, 400),      # exactly at start -> included
            (1, t - PIT_WINDOW_US - 1, 104, 800),  # before start -> excluded
        ],
        "user_id long, ts_us long, event_id long, val_c long",
    )
    labels = spark.createDataFrame(
        [(1, t, 900)], "user_id long, ts_us long, event_id long"
    )
    got = pit_features_frame(views, labels).collect()
    assert len(got) == 1
    r = got[0]
    assert r["label_event_id"] == 900
    assert r["n_views_7d"] == 2
    assert r["view_value_c_7d"] == 600


def test_trigram_paths_consistent_with_markov_pairs(spark):
    """Cross-operator consistency: summing trigram-path counts over the
    leading pair can never exceed that pair's first-order transition
    count (every trigram starts with a transition; the last pair of
    each user stream has no third step), and ranks are dense from 1."""
    from insurance_claim_data_pipeline_spark.operators.analytics import (
        events_markov_transitions,
        events_trigram_paths,
    )

    sf = "/root/testdata/sf0.001"
    paths = events_trigram_paths(spark, sf).collect()
    assert [r["rnk"] for r in sorted(paths, key=lambda r: r["rnk"])] == list(
        range(1, len(paths) + 1)
    )
    pairs = {
        (r["src"], r["dst"]): r["n_transitions"]
        for r in events_markov_transitions(spark, sf).collect()
    }
    from collections import Counter

    lead = Counter()
    for r in paths:
        t1, t2, _ = r["path"].split(">")
        lead[(t1, t2)] += r["n"]
    for k, n in lead.items():
        assert n <= pairs[k], k


def test_brown_forsythe_null_and_f_positive(spark):
    """The synthetic event-value groups share one distribution, so the
    variance-equality F must sit in the unremarkable range around 1
    (no rejection at any sane threshold), and the statistic is positive
    by construction."""
    from insurance_claim_data_pipeline_spark.operators.stats import (
        stats_brown_forsythe,
    )

    r = stats_brown_forsythe(spark, "/root/testdata/sf0.001").collect()[0]
    assert r["k"] == 5 and r["n_tot"] == 1000
    assert 0.0 < r["f_stat"] < 3.0


def test_fk_discovery_reports_intact_star_schema(spark):
    """On the generated star schema every declared relationship must
    hold: all seven pairs reported, every parent key unique, zero
    orphans — this doubles as a testdata referential-integrity canary
    (a regen that broke FK containment would surface here first)."""
    from insurance_claim_data_pipeline_spark.operators.profile import dq_fk_discovery

    rows = dq_fk_discovery(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 7
    for r in rows:
        assert r["n_parent_rows"] == r["n_parent_distinct"], r["parent"]
        assert r["n_orphans"] == 0, r["child"]
        assert 0 < r["n_child_distinct"] <= r["n_parent_distinct"]


def test_cusum_fires_on_planted_level_shift(spark):
    """Monitor semantics on planted data: a stationary prefix (n=10)
    followed by a sustained +50% shift (n=15) must stay quiet before
    the shift and fire within the shifted region; a fully stationary
    twin series never alarms."""
    from insurance_claim_data_pipeline_spark.operators.ema import cusum_frame

    shifted = [("a", h, 10) for h in range(40)] + [("a", h, 15) for h in range(40, 80)]
    flat = [("b", h, 10) for h in range(80)]
    hourly = spark.createDataFrame(
        shifted + flat, "event_type string, hour_idx long, n long"
    )
    rows = {(r["event_type"], r["hour_idx"]): r for r in cusum_frame(hourly).collect()}
    assert not any(rows[("b", h)]["alarm"] for h in range(80))
    assert not any(rows[("a", h)]["alarm"] for h in range(40))
    assert any(rows[("a", h)]["alarm"] for h in range(40, 80))
    # S resets at zero during the stationary prefix
    assert rows[("a", 39)]["s_plus_e6"] == 0


def test_retention_decay_fit_null_reading(spark):
    """The synthetic users are uniformly active, so the blended
    retention curve is nearly flat: the fitted power-law exponent must
    be a small non-positive-ish value (|k| < 0.5), with a full
    offsets-1..30 point set (minus any zero-retention offsets)."""
    from insurance_claim_data_pipeline_spark.operators.analytics import (
        events_retention_decay_fit,
    )

    r = events_retention_decay_fit(spark, "/root/testdata/sf0.001").collect()[0]
    assert 10 <= r["n_points"] <= 30
    assert abs(r["decay_exponent"]) < 0.5
    # intercept_ln is ln(rate at offset 1): a probability, so <= 0
    assert r["intercept_ln"] <= 0.0


def test_metric_tree_log_identity(spark):
    """The decomposition is exact in logs: Δln(revenue) must equal the
    sum of the three driver deltas up to the four independent ×1e6
    roundings (|residue| ≤ 4)."""
    from insurance_claim_data_pipeline_spark.operators.analytics import (
        events_metric_tree,
    )

    r = events_metric_tree(spark, "/root/testdata/sf0.001").collect()[0]
    residue = r["dln_rev_e6"] - (
        r["dln_users_e6"] + r["dln_freq_e6"] + r["dln_aov_e6"]
    )
    assert abs(residue) <= 4, residue


def test_price_index_fisher_between_bounds(spark):
    """Index-number algebra: Fisher is the geometric mean of Laspeyres
    and Paasche, so it must lie between them; all indices are positive;
    matched-model part count is bounded by the catalog."""
    from insurance_claim_data_pipeline_spark.operators.analytics import (
        lineitem_price_index,
    )

    r = lineitem_price_index(spark, "/root/testdata/sf0.001").collect()[0]
    lo, hi = sorted((r["laspeyres_e6"], r["paasche_e6"]))
    assert 0 < lo <= r["fisher_e6"] <= hi
    assert 0 < r["n_parts"] <= 200


def test_forecast_ensemble_winner_consistent_and_seasonal_dominates(spark):
    """The winner field must be the argmin of the three reported MAEs
    under the simplest-first tie rule (structural, any scale), and at
    sf0.01 — where the hourly series are dense — the seasonal model
    must beat naive persistence on a majority of types (the hour-of-day
    pattern in the synthetic traffic is real signal, and the ensemble
    detects it)."""
    from insurance_claim_data_pipeline_spark.operators.ema import (
        events_forecast_ensemble,
    )

    rows = events_forecast_ensemble(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    hw_beats = 0
    for r in rows:
        maes = {
            "persistence": r["mae_pers_e6"],
            "holt": r["mae_holt_e6"],
            "holt_winters": r["mae_hw_e6"],
        }
        if maes["persistence"] <= maes["holt"] and maes["persistence"] <= maes["holt_winters"]:
            expect = "persistence"
        elif maes["holt"] <= maes["holt_winters"]:
            expect = "holt"
        else:
            expect = "holt_winters"
        assert r["best_model"] == expect
        if maes["holt_winters"] < maes["persistence"]:
            hw_beats += 1
    assert hw_beats >= 3


def test_feat_drift_psi_terms_nonnegative_and_sum(spark):
    """PSI algebra: every bucket term (p1−p0)·ln(p1/p0) is non-negative
    by construction, the reported total equals the exact term sum, and
    the monitor sees the real structural drift in this data (later
    labels accumulate more view history → PSI well above the 0.1
    watch threshold)."""
    from insurance_claim_data_pipeline_spark.operators.mlfeat import feat_drift_psi

    rows = feat_drift_psi(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    total = rows[0]["psi_total_e6"]
    assert all(r["psi_total_e6"] == total for r in rows)
    assert total == sum(r["psi_term_e6"] for r in rows)
    assert all(r["psi_term_e6"] >= 0 for r in rows)
    assert total > 100_000  # the drift is real, not noise


def test_link_prediction_candidates_are_nonedges_with_real_paths(spark):
    """Prediction contract: no returned pair is an existing edge, every
    pair really shares the reported number of common neighbors
    (recomputed independently in Python), and Adamic-Adar orders the
    result."""
    from collections import defaultdict

    from insurance_claim_data_pipeline_spark.operators.graph import (
        graph_link_prediction,
    )

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_orderkey", "l_partkey")
    orders = defaultdict(set)
    for r in li.distinct().collect():
        orders[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in orders.values():
        ps = sorted(parts)
        for i, p1 in enumerate(ps):
            for p2 in ps[i + 1:]:
                adj[p1].add(p2)
                adj[p2].add(p1)
    rows = graph_link_prediction(spark, sf).collect()
    assert rows
    aa = [r["adamic_adar_e6"] for r in sorted(rows, key=lambda r: r["rnk"])]
    assert aa == sorted(aa, reverse=True)
    for r in rows:
        u, v = r["u"], r["v"]
        assert v not in adj[u], (u, v)
        assert len(adj[u] & adj[v]) == r["common_neighbors"], (u, v)


def test_bot_screen_burst_and_lag_report_sane(spark):
    """Screen contracts: the burst window really counts a trailing
    600-second range (every reported max_burst ≥ 1 and ≤ the user's
    event count), ranks are dense by burst, and the fulfillment-lag
    report covers all five priorities with ordered percentiles."""
    from insurance_claim_data_pipeline_spark.operators.analytics import (
        lineitem_fulfillment_lag,
    )
    from insurance_claim_data_pipeline_spark.operators.eventops import (
        events_bot_screen,
    )

    rows = events_bot_screen(spark, "/root/testdata/sf0.001").collect()
    # sf0.001 has only 15 distinct users — the top-k cap binds at sf0.01+
    assert 1 <= len(rows) <= 25
    for r in rows:
        assert 1 <= r["max_burst"] <= r["n_events"]
        assert r["rate_per_day_e6"] > 0
    lag = lineitem_fulfillment_lag(spark, "/root/testdata/sf0.001").collect()
    assert len(lag) == 5
    for r in lag:
        assert r["min_days"] <= r["p50_days"] <= r["p90_days"] <= r["max_days"]


def test_stickiness_bounds_and_wau_consistency(spark):
    """Ratio contracts: dau ≤ wau (a day's actives are inside its
    trailing week) so stickiness ≤ 1e6; only full-window days report
    (24 of 30); and the wau column equals the standalone rolling-WAU
    op for the same days."""
    from insurance_claim_data_pipeline_spark.operators.analytics import (
        events_rolling_distinct_users,
        events_stickiness_ratio,
    )

    sf = "/root/testdata/sf0.001"
    rows = events_stickiness_ratio(spark, sf).collect()
    assert len(rows) == 24
    wau_ref = {r["day"]: r["wau"] for r in events_rolling_distinct_users(spark, sf).collect()}
    for r in rows:
        assert r["dau"] <= r["wau"]
        assert 0 < r["stickiness_e6"] <= 1_000_000
        assert wau_ref[r["day"]] == r["wau"]


def test_ht_estimator_repairs_stratum_bias(spark):
    """The structural demonstration: temperature mixing downsamples the
    head language, so the naive kept-share of English is badly biased
    low; inverse-keep-rate (Horvitz-Thompson) weighting must land
    strictly closer to the true share — at both gate scales."""
    from insurance_claim_data_pipeline_spark.operators.sampling import (
        sample_ht_estimator,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        r = sample_ht_estimator(spark, sf).collect()[0]
        true_s, naive_s, ht_s = (
            r["true_en_share_e6"],
            r["naive_en_share_e6"],
            r["ht_en_share_e6"],
        )
        assert abs(ht_s - true_s) < abs(naive_s - true_s), sf
        assert r["n_kept"] < r["n_all"]


def test_perm_bh_planted_signal_rejects(spark):
    """Power check for the permutation-BH machinery: a group shifted by
    ~4 within-group sds must reject at q=0.10 (the registered fixture
    query honestly rejects nothing — the gap there is sub-noise — so
    the reject branch is proven here). With one group shifted, ALL
    groups deviate from the pooled mean, so all must reject."""
    from insurance_claim_data_pipeline_spark.operators.stats import perm_bh_frame

    rows = [
        (
            i,
            "shifted" if i % 3 == 0 else ("flat_a" if i % 3 == 1 else "flat_b"),
            1000 + (5000 if i % 3 == 0 else 0) + (i % 7),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v_e2 long")
    out = {r["grp"]: r for r in perm_bh_frame(df, "id", "grp").collect()}
    assert out["shifted"]["reject"] and out["shifted"]["p_value"] == 1.0 / 64
    # p_adj is monotone non-decreasing in bh_rank (BH step-up property)
    by_rank = sorted(out.values(), key=lambda r: r["bh_rank"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert a["p_adj"] <= b["p_adj"] + 1e-12


def test_perm_bh_fixture_not_vacuous(spark, sf_dir):
    out = stats.stats_perm_test_bh(spark, sf_dir).collect()
    assert len(out) == 5
    # p-values are exact multiples of 1/64 (dyadic permutation denominators)
    for r in out:
        assert abs(r["p_value"] * 64 - round(r["p_value"] * 64)) < 1e-12
        assert 1.0 / 64 <= r["p_value"] <= 1.0


def test_watermark_lateness_profile_not_vacuous(spark, sf_dir):
    """The md5-jitter arrival model must produce a multi-band profile
    (the r03-ADVICE vacuity class: event_id is ts-monotone, so without
    modeled arrival delay every event lands in band 0)."""
    from insurance_claim_data_pipeline_spark.operators import maintenance

    rows = {r["band"]: r for r in maintenance.events_watermark_lateness(spark, sf_dir).collect()}
    assert len(rows) >= 3
    assert 0 in rows  # some events still on time
    # max lateness cannot exceed the modeled delay bound
    assert max(r["max_lateness_s"] for r in rows.values()) <= maintenance.WM_MAX_DELAY


def test_compaction_plan_invariants(spark, sf_dir):
    """Next-fit bin packing: per (day) bins are contiguous from 0, file
    ranges are disjoint/ordered, and a bin only exceeds the target by
    less than one trailing file (the straddle allowance)."""
    from insurance_claim_data_pipeline_spark.operators import maintenance

    out = maintenance.sink_compaction_plan(spark, sf_dir).collect()
    assert out
    by_day = {}
    for r in out:
        by_day.setdefault(r["part_day"], []).append(r)
    for day, bins in by_day.items():
        bins.sort(key=lambda r: r["bin_id"])
        assert [b["bin_id"] for b in bins] == list(range(len(bins)))
        for a, b in zip(bins, bins[1:]):
            assert a["last_file_id"] < b["first_file_id"]
        for b in bins:
            assert b["n_files"] >= 1 and b["first_file_id"] <= b["last_file_id"]
            # every packed file is small (< TARGET), so next-fit can
            # overshoot the boundary by at most one small file
            assert b["bin_bytes"] < 2 * maintenance.TARGET_BYTES


def test_ushape_attribution_conserves_credit(spark, sf_dir):
    """Per-conversion credits must total exactly 1.0 (×1e6 integer), so
    the global credit_e6 sum equals 1e6 × the number of purchases with
    at least one prior same-user non-purchase event (computed here
    independently via a running-count window)."""
    from pyspark.sql import Window as W

    from insurance_claim_data_pipeline_spark.operators import analytics
    from insurance_claim_data_pipeline_spark.session import load_table

    out = analytics.events_attribution_ushape(spark, sf_dir).collect()
    total_credit = sum(r["credit_e6"] for r in out)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prior_touches = F.count(
        F.when(F.col("event_type") != "purchase", F.lit(1))
    ).over(w)
    # a path exists only if touches arrived SINCE the previous purchase
    # (earlier touches attribute to that earlier conversion)
    pur = ev.withColumn("pt", prior_touches).filter(F.col("event_type") == "purchase")
    w_pur = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    attributed = (
        pur.withColumn("pt_prev", F.lag("pt", 1, 0).over(w_pur))
        .filter(F.col("pt") > F.col("pt_prev"))
        .count()
    )
    # Each attributed conversion's path credits sum to 1.0 up to ×1e6
    # rounding of 0.2/(L-2) middle shares (≤ L terms, each off by ≤0.5).
    assert abs(total_credit - attributed * 1_000_000) <= attributed * 50


def test_target_encode_cv_leakage_safety_invariants(spark, sf_dir):
    """Out-of-fold bookkeeping: n_in_fold + oof_n is the same category
    total on every fold row; the OOF prior genuinely varies by fold
    (it excludes that fold's labels); encodings stay within [0, 1]."""
    from insurance_claim_data_pipeline_spark.operators import mlfeat

    rows = mlfeat.feat_target_encode_cv(spark, sf_dir).collect()
    assert len(rows) == 5 * mlfeat.TE_CV_FOLDS
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r["cat"], []).append(r)
    for cat, rs in by_cat.items():
        totals = {r["n_in_fold"] + r["oof_n"] for r in rs}
        assert len(totals) == 1, (cat, totals)
        assert all(0.0 <= r["target_enc_cv"] <= 1.0 for r in rs)
    priors = {r["prior_oof"] for r in rows}
    assert len(priors) == mlfeat.TE_CV_FOLDS  # one distinct prior per fold


def test_privacy_audits_consistent(spark, sf_dir):
    """k-anonymity bookkeeping: risky_row_share equals the recomputed
    share of rows in k<K classes; l-diversity: l_distinct is bounded by
    the number of statuses and by the class size."""
    from insurance_claim_data_pipeline_spark.operators import privacy

    k_rows = privacy.privacy_k_anonymity(spark, sf_dir).collect()
    n_all = sum(r["k"] for r in k_rows)
    n_risky = sum(r["k"] for r in k_rows if r["risky"])
    assert all(abs(r["risky_row_share"] - n_risky / n_all) < 1e-12 for r in k_rows)
    assert all((r["k"] < privacy.K_MIN) == r["risky"] for r in k_rows)

    l_rows = privacy.privacy_l_diversity(spark, sf_dir).collect()
    assert all(1 <= r["l_distinct"] <= min(3, r["n"]) for r in l_rows)
    assert all((r["l_distinct"] < privacy.L_MIN) == r["homogeneity_risk"] for r in l_rows)


def test_kneser_ney_mass_conservation(spark, sf_dir):
    """Interpolated KN must be a proper conditional distribution:
    Σ_w2 P_KN(w2|w1) = 1 for every context w1. Checked on the full
    (unlimited) model via the unrounded formula in DuckDB — the same
    arithmetic the parity-gated Spark plan evaluates — because the
    registered query emits only the top-K slice."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    bad = con.sql(
        """
WITH tok AS (
  SELECT string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT toks[i] AS w1, toks[i+1] AS w2
  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
  WHERE len(toks) >= 2
), c2 AS (
  SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, SUM(n12) AS n1, COUNT(*) AS n1plus_fw FROM c2 GROUP BY w1
), bw AS (
  SELECT w2, COUNT(*) AS n1plus_bw FROM c2 GROUP BY w2
), btypes AS (SELECT COUNT(*) AS b_total FROM c2),
p AS (
  SELECT c2.w1, c1.n1, c1.n1plus_fw,
         GREATEST(CAST(n12 AS DOUBLE) - 0.75, 0.0) / n1
         + (0.75 * n1plus_fw / n1) * (CAST(n1plus_bw AS DOUBLE) / b_total) AS pkn,
         CAST(n1plus_bw AS DOUBLE) / b_total AS pcont
  FROM c2 JOIN c1 ON c2.w1 = c1.w1 JOIN bw ON c2.w2 = bw.w2, btypes
)
SELECT COUNT(*) FROM (
  -- observed-pair mass + the backoff mass flowing to UNSEEN w2
  -- (the model frame materializes observed pairs only; proper KN
  -- spreads the rest over the vocabulary via Pcont):
  SELECT w1,
         SUM(pkn) + (0.75 * ANY_VALUE(n1plus_fw) / ANY_VALUE(n1))
                    * (1.0 - SUM(pcont)) AS mass
  FROM p GROUP BY w1
) WHERE abs(mass - 1.0) > 1e-9
"""
    ).fetchone()[0]
    assert bad == 0


def test_benford_bookkeeping_and_uniform_prices_flagged(spark, sf_dir):
    """Counts cover every order ≥ 1; expected_e6 are the baked Benford
    literals summing to ~1e6; the synthetic near-uniform prices must
    FAIL the screen decisively (chi2 far above the 15.5 critical value
    for 8 dof at α=0.05) — a vacuously-passing screen would mean the
    statistic is broken."""
    from insurance_claim_data_pipeline_spark.operators.stats import (
        BENFORD_E6,
        stats_benford_screen,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    rows = stats_benford_screen(spark, sf_dir).collect()
    n_expected = load_table(spark, sf_dir, "orders").filter("o_totalprice >= 1").count()
    assert sum(r["n"] for r in rows) == n_expected
    assert abs(sum(BENFORD_E6.values()) - 1_000_000) <= 2
    for r in rows:
        assert r["expected_e6"] == BENFORD_E6[r["digit"]]
    chi2 = sum(r["chi2_term_e6"] for r in rows) / 1e6
    assert chi2 > 15.5, chi2


def test_shapley_efficiency_axiom_and_symmetry_scale(spark, sf_dir):
    """Σ_c φ_c must equal v(full coalition) = the number of conversions
    with at least one touched channel (efficiency — the axiom no
    heuristic split satisfies by construction); every φ is positive
    here (all channels appear in paths) and exact in 24ths."""
    from insurance_claim_data_pipeline_spark.operators.analytics import (
        events_attribution_shapley,
        events_attribution_ushape,
    )

    rows = events_attribution_shapley(spark, sf_dir).collect()
    assert len(rows) == 4
    total_24 = sum(r["phi_24"] for r in rows)
    # v(full set) = conversions with ≥1 prior touch since the previous
    # purchase == the U-shape op's conversion count (credit_e6 sums to
    # 1e6 per conversion, ±rounding)
    ushape_credit = sum(r["credit_e6"] for r in events_attribution_ushape(spark, sf_dir).collect())
    n_conv = round(ushape_credit / 1_000_000)
    assert total_24 == n_conv * 24
    for r in rows:
        assert r["phi_24"] > 0
        assert abs(r["phi"] * 24 - r["phi_24"]) < 1e-9


def test_m4_buckets_cover_all_points_and_bound_extremes(spark, sf_dir):
    from insurance_claim_data_pipeline_spark.operators.downsample import (
        events_m4_downsample,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    rows = events_m4_downsample(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in rows) == n_events  # every point bucketed once
    for r in rows:
        assert r["t_first"] <= r["t_last"]
        assert r["v_min_e2"] <= r["v_first_e2"] <= r["v_max_e2"]
        assert r["v_min_e2"] <= r["v_last_e2"] <= r["v_max_e2"]


def test_tost_margin_monotone_and_both_branches(spark, sf_dir):
    from insurance_claim_data_pipeline_spark.operators.stats import (
        stats_tost_equivalence,
    )

    rows = sorted(
        stats_tost_equivalence(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r["margin"],
    )
    # equivalence is monotone in the margin; at the driver gate scale
    # the sweep must show both decisions (tight fails, wide passes —
    # at sf0.001 the standard error is too wide for any margin to pass)
    decisions = [r["equivalent"] for r in rows]
    assert decisions == sorted(decisions)
    assert False in decisions and True in decisions


def test_calibration_ece_bookkeeping(spark, sf_dir):
    from insurance_claim_data_pipeline_spark.operators.mlfeat import (
        feat_calibration_ece,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    rows = feat_calibration_ece(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_bin"] for r in rows) == n_orders
    for r in rows:
        assert 0.0 <= r["actual_rate"] <= 1.0
        assert 0.0 <= r["mean_score"] <= 1.0
        assert abs(
            r["ece_term"] * sum(x["n_bin"] for x in rows) / r["n_bin"]
            - abs(r["mean_score"] - r["actual_rate"])
        ) < 1e-9
    # the in-sample smoothed encoding is well calibrated by construction
    assert sum(r["ece_term"] for r in rows) < 0.05


def test_modularity_every_edge_intra_and_bounded(spark, sf_dir):
    from insurance_claim_data_pipeline_spark.operators.graph import (
        graph_components_modularity,
    )

    r = graph_components_modularity(spark, sf_dir).collect()[0]
    # components are closed under edges, so every edge is intra
    assert r["m_intra"] == r["m_edges"] > 0
    # hence Q = 1 − Σk_c²/4m², strictly inside (0, 1) for >1 component
    assert 0.0 < r["modularity"] < 1.0
    assert r["n_components"] > 1


def test_vacuum_plan_retention_guard(spark, sf_dir):
    """The planner must never list expired-but-current files: every
    reported day has n_deletable <= floor(n_files/2) (only the odd,
    superseded generation qualifies) and positive reclaim bytes, and
    no reported day may lie inside the retention horizon."""
    import datetime as dt

    from pyspark.sql import functions as F

    from insurance_claim_data_pipeline_spark.operators.maintenance import (
        VACUUM_RETAIN_DAYS,
        sink_vacuum_plan,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    rows = sink_vacuum_plan(spark, sf_dir).collect()
    assert rows
    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts")).first()[0]
    horizon_day = (max_ts - dt.timedelta(days=VACUUM_RETAIN_DAYS)).strftime("%Y-%m-%d")
    for r in rows:
        assert 0 < r["n_deletable"] <= r["n_files"]
        assert r["reclaim_bytes"] > 0
        assert r["part_day"] <= horizon_day


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer-solved coefficients must match numpy's least-squares
    solution on the same data to ~1e-6 relative (decimal quantization
    of the moments is the only divergence source)."""
    import numpy as np

    from insurance_claim_data_pipeline_spark.operators.stats import (
        stats_ols_normal_equations,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    r = stats_ols_normal_equations(spark, sf_dir).collect()[0]
    pdf = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["l_quantity"].values, pdf["l_discount"].values]
    )
    beta, *_ = np.linalg.lstsq(X, pdf["l_extendedprice"].values, rcond=None)
    got = np.array([r["beta0"], r["beta1"], r["beta2"]])
    assert np.allclose(got, beta, rtol=1e-5, atol=1e-4), (got, beta)
    assert 0.0 <= r["r2"] <= 1.0


def test_logistic_newton_converges_to_numpy_irls(spark):
    """Three unrolled Newton steps must land within 1% relative of a
    fully-converged numpy IRLS fit on the same design, and beat the
    null model's log-likelihood."""
    import math

    import numpy as np

    from insurance_claim_data_pipeline_spark.operators.stats import (
        stats_logistic_newton,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    sf = "/root/testdata/sf0.01"
    r = stats_logistic_newton(spark, sf).collect()[0]

    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem").filter("l_returnflag = 'R'").select(
        "l_orderkey"
    ).distinct()
    pdf = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .selectExpr(
            "CASE WHEN l_orderkey IS NULL THEN 0 ELSE 1 END AS y",
            "CAST(o_totalprice / 100000 AS DOUBLE) AS x1",
            "CAST(CAST(substr(o_orderpriority, 1, 1) AS INT) / 5.0 AS DOUBLE) AS x2",
        )
        .toPandas()
    )
    y = pdf["y"].values
    X = np.column_stack([np.ones(len(pdf)), pdf["x1"].values.astype(float), pdf["x2"].values.astype(float)])
    b = np.zeros(3)
    for _ in range(12):
        p = 1 / (1 + np.exp(-X @ b))
        H = X.T @ (X * (p * (1 - p))[:, None])
        b = b + np.linalg.solve(H, X.T @ (y - p))
    got = np.array([r["beta0"], r["beta1"], r["beta2"]])
    assert np.allclose(got, b, rtol=0.01, atol=1e-3), (got, b)

    base_rate = y.mean()
    ll_null = len(y) * (
        base_rate * math.log(base_rate) + (1 - base_rate) * math.log(1 - base_rate)
    )
    assert r["loglik_e6"] / 1e6 > ll_null


def test_decision_stump_matches_exhaustive_search(spark, sf_dir):
    """The histogram split must equal an exhaustive pandas scan over
    every candidate threshold (same binning), both in split point and
    in the exact integer gain numerator."""
    from insurance_claim_data_pipeline_spark.operators.mlfeat import (
        mlfeat_decision_stump,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    r = mlfeat_decision_stump(spark, sf_dir).collect()[0]

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter("l_returnflag = 'R'").select(
        "l_orderkey"
    ).distinct()
    pdf = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .selectExpr(
            "CAST(FLOOR(ROUND(o_totalprice) / 10000) AS BIGINT) AS xbin",
            "CASE WHEN l_orderkey IS NULL THEN 0 ELSE 1 END AS y",
        )
        .toPandas()
    )
    g = pdf.groupby("xbin")["y"].agg(["count", "sum"]).sort_index()
    nt, pt = int(g["count"].sum()), int(g["sum"].sum())
    best = None
    nl = pl = 0
    for xbin, row in g.iterrows():
        nl += int(row["count"])
        pl += int(row["sum"])
        if nl == 0 or nl == nt:
            continue
        nr, pr = nt - nl, pt - pl
        margin = pl * nr - pr * nl
        gain = margin * margin // (nl * nr)
        if best is None or gain > best[1]:
            best = (int(xbin), gain)
    assert (r["split_bin"], r["gain_num"]) == best


def test_fixed_effects_matches_numpy_demeaning(spark, sf_dir):
    """The within slope must match an explicitly group-demeaned numpy
    regression to ~1e-4 relative (fixed-point quantization of the
    correction terms is the only divergence source)."""
    import numpy as np

    from insurance_claim_data_pipeline_spark.operators.stats import (
        stats_fixed_effects_ols,
    )
    from insurance_claim_data_pipeline_spark.session import load_table

    r = stats_fixed_effects_ols(spark, sf_dir).collect()[0]
    pdf = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_discount", "l_extendedprice"
    ).toPandas()
    gx = pdf.groupby("l_partkey")["l_discount"].transform("mean")
    gy = pdf.groupby("l_partkey")["l_extendedprice"].transform("mean")
    xd = (pdf["l_discount"] - gx).values
    yd = (pdf["l_extendedprice"] - gy).values
    slope_within = float(np.dot(xd, yd) / np.dot(xd, xd))
    assert abs(r["slope_within"] - slope_within) <= max(1e-4 * abs(slope_within), 1e-3)
    x = pdf["l_discount"].values
    y = pdf["l_extendedprice"].values
    slope_pooled = float(np.cov(x, y, bias=True)[0, 1] / np.var(x))
    assert abs(r["slope_pooled"] - slope_pooled) <= max(1e-4 * abs(slope_pooled), 1e-3)


def test_overdispersion_near_one_on_poisson_fixture(spark, sf_dir):
    """The synthetic arrivals are Poisson-like, so the dispersion index
    must hover near 1 (none flagged) — a systematically high or low
    index would mean the variance bookkeeping is wrong."""
    from insurance_claim_data_pipeline_spark.operators.stats import (
        stats_overdispersion_screen,
    )

    rows = stats_overdispersion_screen(spark, "/root/testdata/sf0.01").collect()
    assert rows
    assert all(r["n_days"] >= 10 and r["var_k"] >= 0 for r in rows)
    mean_disp = sum(r["dispersion"] for r in rows) / len(rows)
    assert 0.6 < mean_disp < 1.4, mean_disp
