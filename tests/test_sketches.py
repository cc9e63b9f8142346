"""Deterministic-sketch guarantees that the DuckDB oracle alone cannot
express: HLL accuracy vs the exact count, HLL mergeability (shard-wise
sketch union == global sketch), Bloom-prefilter transparency (result
identical to the filter-free join) and effectiveness (the prefilter
actually drops non-matching fact rows before the join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark.operators import sketches
from insurance_claim_data_pipeline_spark.operators.sketches import (
    HLL_M,
    HLL_W_BITS,
    _bloom_probe_sql,
    _h60,
    agg_hll_deterministic,
    join_bloom_prefilter,
)
from insurance_claim_data_pipeline_spark.session import load_table

from .conftest import SF_DRIVER


def _hll_registers(df):
    """(event_type, bucket) -> max rho registers for an events frame."""
    h = _h60(F.col("user_id"))
    rho = F.when(F.col("w") == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    return (
        df.select(
            "event_type",
            (h % HLL_M).alias("bucket"),
            F.shiftright(h, 8).alias("w"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max(rho).alias("r"))
    )


def test_hll_estimate_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r["event_type"]: r["est_distinct_users"]
        for r in agg_hll_deterministic(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for et, n in exact.items():
        # m=256 -> ~6.5% standard error in HLL mode; linear counting is
        # much tighter at these cardinalities. 15% is 2+ sigma.
        assert abs(est[et] - n) / n < 0.15, (et, n, est[et])


def test_hll_sketch_is_mergeable(spark, sf_dir):
    """MAX-aggregated registers merge losslessly: sketching each day
    separately and MAX-merging the registers gives bit-identical
    registers to sketching the whole table — the property that lets a
    100 TB corpus be sketched shard-by-shard and unioned for free."""
    ev = load_table(spark, sf_dir, "events")
    global_regs = _hll_registers(ev)
    # day-partitioned sketches: registers per (day, event_type, bucket),
    # then merged with a second MAX across days.
    h = _h60(F.col("user_id"))
    rho = F.when(F.col("w") == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    daily = (
        ev.select(
            F.to_date("ts").alias("day"),
            "event_type",
            (h % HLL_M).alias("bucket"),
            F.shiftright(h, 8).alias("w"),
        )
        .groupBy("day", "event_type", "bucket")
        .agg(F.max(rho).alias("r"))
    )
    merged = daily.groupBy("event_type", "bucket").agg(F.max("r").alias("r"))
    assert global_regs.count() == merged.count()
    assert merged.exceptAll(global_regs).count() == 0
    assert global_regs.exceptAll(merged).count() == 0


def test_bloom_prefilter_transparent(spark, sf_dir):
    """The Bloom pre-filter must not change the join result (no false
    negatives; false positives die in the equi-join)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build = orders.filter(F.expr(sketches._BUILD_PRED))
    plain = (
        li.join(build, li.l_orderkey == build.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n_lineitems"))
    )
    got = join_bloom_prefilter(spark, sf_dir).select("order_month", "n_lineitems")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_bloom_prefilter_drops_rows_before_join(spark):
    """Effectiveness at the driver gate scale: the 16 KiB filter must
    reject the overwhelming majority of non-matching fact rows ahead of
    the join shuffle (that reduction IS the 100 TB story)."""
    sf = SF_DRIVER
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    build = orders.filter(F.expr(sketches._BUILD_PRED)).select("o_orderkey")
    pos = F.explode(F.array(*sketches._bloom_positions(F.col("o_orderkey")))).alias(
        "__pos__"
    )
    words = (
        build.select(pos)
        .select(
            (F.col("__pos__") / F.lit(64)).cast("long").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos__, 64) AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__bloom__")
    )
    total = li.count()
    survivors = (
        li.select("l_orderkey")
        .crossJoin(F.broadcast(bloom))
        .filter(F.expr(_bloom_probe_sql("l_orderkey")))
        .count()
    )
    true_matches = li.join(build, li.l_orderkey == build.o_orderkey, "left_semi").count()
    assert true_matches <= survivors  # no false negatives
    # false-positive rate of the survivors beyond true matches is small:
    # with m=2^17 bits, k=3 and ~2% build keys the FP rate is << 1%.
    assert survivors < 0.25 * total, (survivors, total)


def test_bloom_probe_filter_sits_below_join(spark, sf_dir):
    """Plan audit: the bitmask membership test must appear as a Filter
    below the order-key join, i.e. fact rows are pruned pre-shuffle."""
    plan = (
        join_bloom_prefilter(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "md5" in plan and "shiftleft" in plan
    assert "CartesianProduct" not in plan
    # the probe crossJoin is against the single-row broadcast bloom map
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ---- round-4 scale-op properties the oracle can't express ---------------


def test_systematic_weighted_sample_properties(spark):
    """k-proportionality properties: the sample hits ~k rows, every
    heavy row (weight >= step) is deterministically kept, and pick
    indices are strictly increasing along the permutation (each step
    boundary selects exactly one row)."""
    from insurance_claim_data_pipeline_spark.operators.sampling import (
        _SYS_K,
        sample_systematic_weighted,
    )

    sf = SF_DRIVER
    got = sample_systematic_weighted(spark, sf).collect()
    assert _SYS_K - 1 <= len(got) <= _SYS_K + 1
    orders = load_table(spark, sf, "orders")
    total = orders.agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")).alias("t")
    ).collect()[0]["t"]
    step = total // _SYS_K
    kept = {r["o_orderkey"] for r in got}
    heavy = {
        r["o_orderkey"]
        for r in orders.filter(
            F.expr(f"CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) >= {step}")
        ).collect()
    }
    assert heavy <= kept
    picks = sorted(r["pick_idx"] for r in got)
    assert len(picks) == len(set(picks))  # one row per crossed boundary


def test_shard_manifest_contiguous_ranges(spark, sf_dir):
    """Shards partition the doc_id line into contiguous, non-overlapping
    ranges in shard order, and payload bytes account for every doc."""
    from insurance_claim_data_pipeline_spark.operators.packing import (
        sink_shard_manifest,
    )

    rows = sorted(
        sink_shard_manifest(spark, sf_dir).collect(), key=lambda r: r["shard_id"]
    )
    assert rows[0]["shard_id"] == 0
    for prev, cur in zip(rows, rows[1:]):
        assert prev["last_doc_id"] < cur["first_doc_id"]
    doc = load_table(spark, sf_dir, "documents")
    total = doc.agg(F.sum("n_chars").alias("t")).collect()[0]["t"]
    assert sum(r["shard_bytes"] for r in rows) == total
    assert sum(r["n_docs"] for r in rows) == doc.count()


def test_interval_coverage_matches_bruteforce(spark, sf_dir):
    """Independent per-user recomputation (pure Python interval merge)
    of total covered seconds — catches a window-frame off-by-one that a
    symmetric Spark/DuckDB bug could hide from the oracle."""
    from insurance_claim_data_pipeline_spark.operators.analytics import (
        _IC_TTL,
        events_interval_coverage,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    by_user = {}
    for r in ev:
        s = int(r["ts"].timestamp())
        by_user.setdefault(r["user_id"], []).append((s, s + _IC_TTL))
    expected = {}
    for u, iv in by_user.items():
        iv.sort()
        merged = []
        for s, e in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        expected[u] = (len(merged), sum(e - s for s, e in merged))
    got = {
        r["user_id"]: (r["n_sessions"], r["covered_sec"])
        for r in events_interval_coverage(spark, sf_dir).collect()
    }
    assert got == expected


def _int_power_iterate(X, iters, scale=1_000_000):
    """Numpy replay of the exact integer pipeline (trunc-division)."""
    import numpy as np

    Xe = np.round(X * scale).astype(np.int64)
    col_sum = Xe.sum(axis=0)
    # Spark/DuckDB integer division truncates toward zero (numpy floors)
    m = np.where(col_sum >= 0, col_sum // len(Xe), -((-col_sum) // len(Xe)))
    C = Xe - m
    w = np.full(X.shape[1], scale, dtype=np.int64)
    for _ in range(iters):
        s = C @ w
        d = max(abs(s).max() // scale, 1)
        s2 = np.sign(s) * (np.abs(s) // d)
        y = C.T @ s2
        dy = max(abs(y).max() // scale, 1)
        w = np.sign(y) * (np.abs(y) // dy)
    return w


def test_pca_quantization_faithful_to_float(spark, sf_dir):
    """On the real (near-isotropic) embeddings, the Spark fixed-point
    direction must match an independent numpy integer replay exactly
    and stay within a hair of the float power-iterate with the same
    start and iteration count — i.e. quantization does not distort the
    iteration, whatever the spectrum."""
    import numpy as np

    from insurance_claim_data_pipeline_spark.operators.similarity import (
        PCA_ITERS,
        emb_pca_power_iteration,
    )

    X = np.array(
        [
            r["embedding"]
            for r in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    got = emb_pca_power_iteration(spark, sf_dir).collect()
    w = np.zeros(X.shape[1], dtype=np.int64)
    for r in got:
        w[r["dim"]] = r["w_e6"]
    expected = _int_power_iterate(X, PCA_ITERS)
    assert np.array_equal(w, expected)
    # float replay with identical L-inf rescaling
    Xc = X - X.mean(axis=0)
    wf = np.ones(X.shape[1])
    for _ in range(PCA_ITERS):
        s = Xc @ wf
        wf = Xc.T @ (s / max(abs(s).max() / 1e6, 1e-30))
        wf = wf / np.abs(wf).max() * 1e6
    cos = abs(w @ wf) / (np.linalg.norm(w.astype(float)) * np.linalg.norm(wf))
    assert cos > 0.999, cos


def test_pca_converges_on_anisotropic_data(spark):
    """With a genuinely dominant direction (lambda1/lambda2 = 25), three
    power iterations must recover it — |cosine| > 0.99 vs the numpy
    eigenvector. (The shipped embeddings table is near-isotropic, so
    this drives the factored core with synthetic data.)"""
    import numpy as np

    from insurance_claim_data_pipeline_spark.operators.similarity import pca_direction

    rng = np.random.default_rng(7)
    d, n = 16, 400
    direction = rng.standard_normal(d)
    direction /= np.linalg.norm(direction)
    X = rng.standard_normal((n, d)) * 0.2 + np.outer(
        rng.standard_normal(n) * 5.0, direction
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    got = pca_direction(df).collect()
    w = np.zeros(d)
    for r in got:
        w[r["dim"]] = r["w_e6"]
    evals, evecs = np.linalg.eigh((X - X.mean(0)).T @ (X - X.mean(0)))
    cos = abs(w @ evecs[:, -1]) / np.linalg.norm(w)
    assert cos > 0.99, cos


def test_ndv_profile_accuracy(spark):
    """HLL NDV estimates within the m=256 error envelope of the exact
    per-column distinct counts at the driver gate scale."""
    from insurance_claim_data_pipeline_spark.operators.sketches import (
        _NDV_COLS,
        profile_ndv_hll,
    )

    sf = SF_DRIVER
    orders = load_table(spark, sf, "orders")
    got = {r["col"]: r for r in profile_ndv_hll(spark, sf).collect()}
    assert set(got) == set(_NDV_COLS)
    for c in _NDV_COLS:
        exact = orders.agg(F.countDistinct(c).alias("n")).collect()[0]["n"]
        est = got[c]["est_ndv"]
        assert abs(est - exact) / exact < 0.2, (c, exact, est)
        assert got[c]["n_rows"] == orders.count()


def test_ddsketch_brackets_exact_quantiles(spark):
    """Guarantee check: each exact percentile (lower quantile, cents)
    falls inside its sketch bucket, and every bucket is <= 25% wide
    relative to its lower bound."""
    from insurance_claim_data_pipeline_spark.operators.sketches import (
        agg_ddsketch_quantiles,
    )

    sf = SF_DRIVER
    got = {r["pct"]: r for r in agg_ddsketch_quantiles(spark, sf).collect()}
    li = load_table(spark, sf, "lineitem")
    cents = li.select(
        F.expr(
            "GREATEST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 1)"
        ).alias("c")
    )
    vals = sorted(r["c"] for r in cents.collect())
    n = len(vals)
    for pct in (50, 95, 99):
        row = got[pct]
        # exact lower quantile: smallest v with rank >= ceil(pct*n/100)
        exact = vals[(pct * n + 99) // 100 - 1]
        assert row["lo_cents"] <= exact < row["hi_cents"], (pct, exact, dict(row.asDict()))
        assert (row["hi_cents"] - row["lo_cents"]) * 4 <= row["lo_cents"] or row[
            "lo_cents"
        ] < 4, (pct, dict(row.asDict()))


def test_gram_matrix_matches_numpy_exactly(spark, sf_dir):
    """The distributed Gram sums must equal a numpy int64 recompute
    bit-for-bit (quantize -> outer products -> sums), and the covariance
    identity n*Cov = n*S_xy - S_x*S_y must hold on the returned sums."""
    import numpy as np

    from insurance_claim_data_pipeline_spark.operators.similarity import (
        emb_gram_matrix,
    )

    X = np.array(
        [
            r["embedding"]
            for r in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    Xe = np.round(X * 1_000_000).astype(np.int64)
    got = emb_gram_matrix(spark, sf_dir).collect()
    n, d = Xe.shape
    G = Xe.T @ Xe
    S = Xe.sum(axis=0)
    assert len(got) == d * (d + 1) // 2
    for r in got:
        i, j = r["dim_i"], r["dim_j"]
        assert i <= j and r["n"] == n
        assert r["s_xy_e12"] == G[i, j], (i, j)
        assert r["s_x_e6"] == S[i] and r["s_y_e6"] == S[j]


def test_countmin_never_underestimates(spark):
    """CM guarantee: the min-of-counters estimate is >= the exact count
    for every queried key, and the overestimate stays within the
    expected collision mass (~ d * N/w is a loose multi-sigma bound)."""
    from insurance_claim_data_pipeline_spark.operators.sketches import (
        CM_W,
        _CM_QUERY_USERS,
        agg_countmin_deterministic,
    )

    sf = SF_DRIVER
    ev = load_table(spark, sf, "events")
    exact = {
        r["user_id"]: r["n"]
        for r in ev.filter(F.col("user_id") < _CM_QUERY_USERS)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["user_id"]: r["est_count"] for r in agg_countmin_deterministic(spark, sf).collect()}
    assert set(got) == set(exact)
    n_total = ev.count()
    slack = 4 * n_total // CM_W + 1
    for u, n in exact.items():
        assert n <= got[u] <= n + slack, (u, n, got[u], slack)
