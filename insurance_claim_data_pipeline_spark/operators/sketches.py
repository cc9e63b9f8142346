"""Deterministic distributed sketches: HyperLogLog distinct counting and
Bloom-filter join pre-filtering — built from md5, so Spark and DuckDB
reproduce them bit-for-bit.

Engine-native sketches (Spark HLL++, DuckDB's approx_count_distinct) are
legitimately engine-specific, which is why ``agg_approx`` is a rows-only
check forever (COVERAGE.md). This module takes the other road: implement
the sketch *itself* as a declarative DataFrame plan over a deterministic
hash (md5, available verbatim in both engines). The payoff is a sketch
family that is

* **oracle-checkable** — the DuckDB oracle replays the identical
  register/bitmask construction, so the driver hash proves the whole
  sketch pipeline end to end, not just its plumbing; and
* **mergeable by construction** — HLL registers are a MAX-aggregate and
  Bloom words a BIT_OR-aggregate, both commutative/associative, so
  partial aggregation (map-side combine), shard-wise sketching, and
  cross-day unions all yield the exact same sketch
  (``tests/test_sketches.py`` proves day-merge == global).

At 100 TB this is the point of sketches: one streaming pass, a few KB of
state per group, no distinct-shuffle of raw keys.

The reference (242-line stdlib script, SURVEY.md) has no sketches; this
is §2.2 LLM/scale extension surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.stable import dec_sum, dec_sum_sql
from ..registry import register
from ..session import load_table, pin

# ---------------------------------------------------------------- HLL ----
# Precision p=8 -> m=256 registers; h60 = top 60 bits of md5 (15 hex
# chars); bucket = h60 mod m; the remaining 52-bit value w feeds the
# leading-zero rank rho in [1, 53]. Standard HLL bias constant for m=256,
# computed ONCE here and inlined as the SAME double literal into both
# engines (so constant folding cannot diverge).
HLL_M = 256
HLL_W_BITS = 52
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# E_raw = alpha * m^2 / sum(2^-r) = NUMER / sum(2^(53-r)), one division.
HLL_NUMER = _HLL_ALPHA * float(HLL_M) * float(HLL_M) * float(2 ** (HLL_W_BITS + 1))
_LC_THRESHOLD = 2.5 * HLL_M  # small-range (linear counting) switchover


def _h60(c: Column) -> Column:
    """Uniform 60-bit integer from md5 — same recipe as sampling.py."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def _h60_sql(expr: str) -> str:
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"


HLL_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         {_h60_sql('user_id')} % {HLL_M} AS bucket,
         {_h60_sql('user_id')} // {HLL_M} AS w
  FROM events
), reg AS (
  SELECT event_type, bucket,
         MAX(CASE WHEN w = 0 THEN {HLL_W_BITS + 1}
                  ELSE {HLL_W_BITS} + 1 - length(to_base(w, 2)) END) AS r
  FROM b GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
         CAST(SUM(CAST(1 AS BIGINT) << ({HLL_W_BITS + 1} - r)) AS BIGINT)
           + ({HLL_M} - CAST(COUNT(*) AS BIGINT))
             * (CAST(1 AS BIGINT) << {HLL_W_BITS + 1}) AS zsum
  FROM reg GROUP BY 1
)
SELECT event_type, n_buckets_hit,
       ROUND(CASE WHEN n_buckets_hit < {HLL_M}
                   AND {HLL_NUMER!r} / CAST(zsum AS DOUBLE) <= {_LC_THRESHOLD!r}
             THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST({HLL_M} - n_buckets_hit AS DOUBLE))
             ELSE {HLL_NUMER!r} / CAST(zsum AS DOUBLE) END, 4) AS est_distinct_users
FROM s
"""


@register("agg_hll_deterministic", oracle=HLL_ORACLE, tags=("sketch", "agg", "scale", "bench"))
def agg_hll_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog: estimated distinct users per event type
    from a 256-register md5-based sketch, reproduced bit-for-bit by the
    DuckDB oracle (unlike engine-native HLL++ — see ``agg_approx``).

    Construction: h60 = top 60 md5 bits; register index = h60 mod 256;
    rank rho = leading-zero count of the remaining 52-bit value + 1
    (computed exactly as 53 - bitlength, via base-2 string length — no
    float log2); registers are MAX-aggregated, so the sketch is
    mergeable and map-side combines. The estimator avoids float-sum
    order dependence entirely: sum(2^-r) is scaled by 2^53 into an
    exact BIGINT sum of powers of two, and the bias constant alpha*m^2
    enters as ONE inlined double literal with ONE final division.
    Small-range linear counting (m*ln(m/V), V = empty registers) kicks
    in below 2.5m exactly as in Flajolet et al.; ln() is the only libm
    call and the result is rounded to 4 decimals (a last-ulp libm
    divergence sits ~1e-13 away, far below the rounding grain).

    100 TB: one scan, no distinct-shuffle of raw user ids — the only
    shuffle carries (event_type, bucket, partial-max) rows, bounded by
    groups x 256 regardless of cardinality. Exact twin for the test
    oracle: ``events_user_totals`` / ``agg_stats`` count-distinct paths.
    """
    ev = load_table(spark, sf_dir, "events")
    h = _h60(F.col("user_id"))
    b = ev.select(
        "event_type",
        (h % HLL_M).alias("bucket"),
        # h // 256 must be EXACT integer division (a double `/` would
        # round the 60-bit h at the 53-bit mantissa); h >= 0 so a right
        # shift is floor division.
        F.shiftright(h, 8).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    reg = b.groupBy("event_type", "bucket").agg(F.max(rho).alias("r"))
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_W_BITS + 1} - r AS INT))")
    s = reg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets_hit"),
        (
            F.sum(term)
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << (HLL_W_BITS + 1)).cast("long")
        ).alias("zsum"),
    )
    raw = F.lit(HLL_NUMER) / F.col("zsum").cast("double")
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / (F.lit(HLL_M) - F.col("n_buckets_hit")).cast("double")
    )
    est = F.when((F.col("n_buckets_hit") < HLL_M) & (raw <= _LC_THRESHOLD), lc).otherwise(raw)
    return s.select(
        "event_type", "n_buckets_hit", F.round(est, 4).alias("est_distinct_users")
    )


# -------------------------------------------------------------- Bloom ----
# m = 2^17 bits (16 KiB) packed into 64-bit words; k = 3 probes via
# Kirsch-Mitzenmacher double hashing from one md5 (h2 forced odd so the
# probe sequence never degenerates).
BLOOM_BITS = 1 << 17
BLOOM_K = 3

_BUILD_PRED = "o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '1994-01-01' AND o_orderdate < TIMESTAMP '1995-01-01'"

BLOOM_JOIN_ORACLE = f"""
SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       {dec_sum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE {_BUILD_PRED}
GROUP BY 1
"""


def _bloom_positions(key: Column) -> list[Column]:
    """k probe bit-positions for a key — MUST be identical on the build
    and probe sides (same md5, same double-hashing schedule)."""
    h = _h60(key)
    h1 = h % BLOOM_BITS
    # exact integer h // 2^17 (double division would round 60-bit h)
    h2 = (F.shiftright(h, 17) % BLOOM_BITS).bitwiseOR(F.lit(1))
    return [(h1 + F.lit(i) * h2) % BLOOM_BITS for i in range(BLOOM_K)]


def _bloom_probe_sql(key_sql: str) -> str:
    """SQL-text twin of ``_bloom_positions`` + membership test against
    the broadcast ``__bloom__`` word map (shiftleft's shift amount is a
    column, which the PySpark function API rejects — the SQL form keeps
    it JVM-side)."""
    h = f"CAST(conv(substring(md5(CAST({key_sql} AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    h1 = f"({h} % {BLOOM_BITS})"
    h2 = f"((shiftright({h}, 17) % {BLOOM_BITS}) | 1)"
    tests = []
    for i in range(BLOOM_K):
        p = f"(({h1} + {i} * {h2}) % {BLOOM_BITS})"
        tests.append(
            f"(coalesce(element_at(__bloom__, CAST({p} / 64 AS BIGINT)), CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(pmod({p}, 64) AS INT))) != 0"
        )
    return " AND ".join(tests)


@register("join_bloom_prefilter", oracle=BLOOM_JOIN_ORACLE, tags=("join", "sketch", "scale", "bench"))
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pre-filter: 1994 urgent-order revenue by month,
    with the lineitem (fact) side pruned by a 16 KiB broadcast Bloom
    filter over the qualifying order keys BEFORE it reaches the join
    shuffle. Semantically transparent — Bloom filters have no false
    negatives, and false positives die in the real equi-join — so the
    oracle is the plain join, and ``tests/test_sketches.py`` asserts
    equality with the filter-free twin plus the plan shape (the bitmask
    test sits below the join in the physical plan).

    Build: one aggregation packs the k=3 probe bits of every build key
    into 2048 BIT_OR'd 64-bit words -> a single-row word->bits map,
    broadcast to every probe task (the crossJoin is against this 1-row
    frame — the same broadcast-scalar pattern as the IVF centroids).

    100 TB: this is how you join a selective dimension against a fact
    table too big to shuffle blindly when BOTH sides exceed broadcast
    size: ship the KB-scale sketch of the small side's keys, drop the
    ~99% of fact rows that cannot match while they are still colocated
    with the scan, and pay the join shuffle only for survivors (Spark's
    own runtime row-group filtering does the same trick; here it is
    explicit, deterministic, and oracle-proven). Registers BIT_OR ->
    mergeable, map-side combined, never more than 2048 x 8 B of state.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build = orders.filter(F.expr(_BUILD_PRED)).select(
        "o_orderkey", "o_orderdate"
    )
    # ---- build: explode the k positions, pack into words, one map row.
    pos = F.explode(F.array(*_bloom_positions(F.col("o_orderkey")))).alias("__pos__")
    words = (
        build.select(pos)
        .select(
            (F.col("__pos__") / F.lit(64)).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos__, 64) AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__bloom__")
    )
    # ---- probe: all k bits must be set; coalesce(0) for absent words.
    probe = li.select("l_orderkey", "l_extendedprice", "l_discount").crossJoin(
        F.broadcast(bloom)
    )
    filtered = probe.filter(F.expr(_bloom_probe_sql("l_orderkey"))).drop("__bloom__")
    joined = filtered.join(build, filtered.l_orderkey == build.o_orderkey)
    return joined.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# ------------------------------------------------- per-column NDV stats --
# ANALYZE-TABLE-style column statistics from the same HLL machinery: one
# scan of orders, every profiled column sketched simultaneously (the
# row is unpivoted to (col, val) pairs inside the scan projection).
_NDV_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

_NDV_EST_SQL = f"""ROUND(CASE WHEN n_buckets_hit < {HLL_M}
             AND {HLL_NUMER!r} / CAST(zsum AS DOUBLE) <= {_LC_THRESHOLD!r}
       THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / CAST({HLL_M} - n_buckets_hit AS DOUBLE))
       ELSE {HLL_NUMER!r} / CAST(zsum AS DOUBLE) END, 4)"""

_NDV_PAIRS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val FROM orders" for c in _NDV_COLS
)

NDV_ORACLE = f"""
WITH pairs AS (
  {_NDV_PAIRS_SQL}
), counts AS (
  SELECT col, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls
  FROM pairs GROUP BY 1
), b AS (
  SELECT col,
         {_h60_sql('val')} % {HLL_M} AS bucket,
         {_h60_sql('val')} // {HLL_M} AS w
  FROM pairs WHERE val IS NOT NULL
), reg AS (
  SELECT col, bucket,
         MAX(CASE WHEN w = 0 THEN {HLL_W_BITS + 1}
                  ELSE {HLL_W_BITS} + 1 - length(to_base(w, 2)) END) AS r
  FROM b GROUP BY 1, 2
), s AS (
  SELECT col,
         CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
         CAST(SUM(CAST(1 AS BIGINT) << ({HLL_W_BITS + 1} - r)) AS BIGINT)
           + ({HLL_M} - CAST(COUNT(*) AS BIGINT))
             * (CAST(1 AS BIGINT) << {HLL_W_BITS + 1}) AS zsum
  FROM reg GROUP BY 1
)
SELECT c.col, c.n_rows, c.n_nulls, s.n_buckets_hit, {_NDV_EST_SQL} AS est_ndv
FROM counts c JOIN s ON s.col = c.col
"""


@register("profile_ndv_hll", oracle=NDV_ORACLE, tags=("sketch", "profile", "scale"))
def profile_ndv_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE column statistics in one pass: row count, null
    count, and HLL-estimated NDV for every profiled orders column —
    the stats a cost-based optimizer needs (join-order selectivity,
    broadcast decisions), produced without one COUNT(DISTINCT) shuffle
    per column.

    The row is unpivoted to (column, value-as-string) pairs inside the
    scan projection (``stack`` — a single-scan Expand, the same shape
    as ``unpivot_metrics``), so ALL columns sketch in one pass over the
    table; per-column state is 256 registers regardless of cardinality.
    Same deterministic md5 register construction and exact-integer
    estimator as ``agg_hll_deterministic`` (which carries the estimator
    unit/merge proofs); integer columns stringify identically in both
    engines, which is why the profile casts to string before hashing.

    100 TB: ONE scan + a (4 x 256)-row shuffle vs four distinct
    shuffles of raw keys — this is how wide-table stats collection
    stays linear; sketches also MAX-merge across partitions/days for
    incremental stats maintenance."""
    orders = load_table(spark, sf_dir, "orders")
    stack_args = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in _NDV_COLS)
    pairs = orders.select(
        F.expr(f"stack({len(_NDV_COLS)}, {stack_args}) AS (col, val)")
    )
    counts = pairs.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_nulls"),
    )
    h = _h60(F.col("val"))
    b = pairs.filter(F.col("val").isNotNull()).select(
        "col", (h % HLL_M).alias("bucket"), F.shiftright(h, 8).alias("w")
    )
    rho = F.when(F.col("w") == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    reg = b.groupBy("col", "bucket").agg(F.max(rho).alias("r"))
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_W_BITS + 1} - r AS INT))")
    s = reg.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_buckets_hit"),
        (
            F.sum(term)
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << (HLL_W_BITS + 1)).cast("long")
        ).alias("zsum"),
    )
    raw = F.lit(HLL_NUMER) / F.col("zsum").cast("double")
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / (F.lit(HLL_M) - F.col("n_buckets_hit")).cast("double")
    )
    est = F.when((F.col("n_buckets_hit") < HLL_M) & (raw <= _LC_THRESHOLD), lc).otherwise(raw)
    return counts.join(s, "col").select(
        "col", "n_rows", "n_nulls", "n_buckets_hit", F.round(est, 4).alias("est_ndv")
    )


# ------------------------------------------- deterministic DDSketch ------
# Log-bucketed quantile sketch: octave = bit-length of the integer-cent
# value, refined by the next two mantissa bits -> 4 sub-buckets per
# octave, i.e. bucket width <= 25% of its lower bound (<=12.5% relative
# error at the midpoint). Entirely integer arithmetic, so unlike
# DDSketch's log-gamma bucketing it is bit-reproducible cross-engine.
_DD_QUANTILES = (50, 95, 99)  # percent


def _dd_bucket_sql(v: str) -> str:
    """(octave, sub) encoded as bucket_id = nbits * 4 + sub."""
    nb = f"length(to_base({v}, 2))"
    sub = f"CASE WHEN {nb} >= 3 THEN ({v} >> ({nb} - 3)) & 3 ELSE ({v} & 3) END"
    return f"({nb} * 4 + {sub})"


DDSKETCH_ORACLE = f"""
WITH v AS (
  SELECT GREATEST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 1) AS cents
  FROM lineitem
), b AS (
  SELECT {_dd_bucket_sql('cents')} AS bucket_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM v GROUP BY 1
), c AS (
  SELECT bucket_id, cnt,
         CAST(SUM(cnt) OVER (ORDER BY bucket_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS total
  FROM b
), q AS (SELECT unnest([{", ".join(str(q) for q in _DD_QUANTILES)}]) AS pct),
hit AS (
  SELECT q.pct, c.bucket_id, c.cum, c.total,
         ROW_NUMBER() OVER (PARTITION BY q.pct ORDER BY c.bucket_id) AS rn
  FROM q JOIN c ON c.cum >= (q.pct * c.total + 99) // 100
),
bounds AS (
  SELECT pct, bucket_id, cum, total,
         bucket_id // 4 AS nb, bucket_id % 4 AS sub
  FROM hit WHERE rn = 1
)
SELECT CAST(pct AS BIGINT) AS pct, CAST(bucket_id AS BIGINT) AS bucket_id,
       CASE WHEN nb >= 3 THEN (4 + sub) * (CAST(1 AS BIGINT) << (nb - 3))
            ELSE CAST(sub AS BIGINT) END AS lo_cents,
       CASE WHEN nb >= 3 THEN (5 + sub) * (CAST(1 AS BIGINT) << (nb - 3))
            ELSE CAST(sub + 1 AS BIGINT) END AS hi_cents,
       cum, total
FROM bounds
"""


@register("agg_ddsketch_quantiles", oracle=DDSKETCH_ORACLE, tags=("sketch", "agg", "scale"))
def agg_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log-bucketed quantile sketch (DDSketch-shaped) over
    lineitem prices: p50/p95/p99 bracketed to <=25%-wide buckets with
    guaranteed relative-error bounds — the latency/price-percentile
    monitor that runs in one pass at any scale.

    Buckets are (bit-length, top-2-mantissa-bits) of the integer cent
    value — DDSketch's gamma-log bucketing with gamma ~ 1.19, but
    computed with EXACT integer ops (bit-length via base-2 digit count,
    shift, mask) instead of libm log, so Spark and DuckDB produce
    identical sketches and the driver hash proves the whole pipeline
    (native percentile_approx sketches are engine-specific —
    ``agg_approx``). Counts are SUM-mergeable across shards/days like
    the HLL registers. The sketch is ~160 buckets regardless of
    cardinality: the only shuffle carries (bucket, partial-count) rows;
    the quantile extraction windows run on the tiny bucket frame
    (``tiny_frame_key`` pattern). ``ceil(q * total)`` is the exact
    integer ``(q*total + 99) div 100`` — no float threshold.
    Error bound asserted vs exact percentiles in tests/test_sketches.py.
    """
    from ..session import tiny_frame_key

    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.expr("GREATEST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT), 1)").alias(
            "cents"
        )
    )
    b = v.select(
        F.expr(_dd_bucket_sql("cents").replace("to_base(cents, 2)", "conv(cents, 10, 2)"))
        .cast("long")
        .alias("bucket_id")
    ).groupBy("bucket_id").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = W.partitionBy(tiny_frame_key("bucket_id")).orderBy("bucket_id")
    c = b.select(
        "bucket_id",
        "cnt",
        F.sum("cnt").over(wcum.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(W.partitionBy(tiny_frame_key("bucket_id"))).alias("total"),
    )
    q = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in _DD_QUANTILES])).alias("pct")
    )
    hit = q.join(
        F.broadcast(c), F.col("cum") >= F.expr("CAST((pct * total + 99) div 100 AS BIGINT)")
    )
    wpick = W.partitionBy("pct").orderBy("bucket_id")
    bounds = (
        hit.select("pct", "bucket_id", "cum", "total", F.row_number().over(wpick).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "pct",
            "bucket_id",
            "cum",
            "total",
            F.expr("CAST(bucket_id div 4 AS BIGINT)").alias("nb"),
            (F.col("bucket_id") % 4).alias("sub"),
        )
    )
    lo = F.expr(
        "CASE WHEN nb >= 3 THEN (4 + sub) * shiftleft(CAST(1 AS BIGINT), CAST(nb - 3 AS INT)) "
        "ELSE CAST(sub AS BIGINT) END"
    )
    hi = F.expr(
        "CASE WHEN nb >= 3 THEN (5 + sub) * shiftleft(CAST(1 AS BIGINT), CAST(nb - 3 AS INT)) "
        "ELSE CAST(sub + 1 AS BIGINT) END"
    )
    return bounds.select(
        F.col("pct").cast("long").alias("pct"),
        "bucket_id",
        lo.alias("lo_cents"),
        hi.alias("hi_cents"),
        "cum",
        "total",
    )


# ------------------------------------------------ Count-Min frequency ----
# d=4 hash rows x w=1024 counters; row hashes via Kirsch-Mitzenmacher
# double hashing from one md5 (same schedule family as the Bloom filter).
CM_D = 4
CM_W = 1024
_CM_QUERY_USERS = 8  # user_id < 8 are the demo point-queries


def _cm_pos_sql(key_sql: str, row: int) -> str:
    h = _h60_sql(key_sql)
    h1 = f"({h} % {CM_W})"
    h2 = f"((({h} >> 17) % {CM_W}) | 1)"
    return f"(({h1} + {row} * {h2}) % {CM_W})"


COUNTMIN_ORACLE = f"""
WITH sketch AS (
  {" UNION ALL ".join(
      f"SELECT {r} AS row_i, {_cm_pos_sql('user_id', r)} AS pos, "
      f"CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2"
      for r in range(CM_D)
  )}
), q AS (
  SELECT DISTINCT user_id FROM events WHERE user_id < {_CM_QUERY_USERS}
), est AS (
  SELECT q.user_id, MIN(s.cnt) AS est_count
  FROM q, sketch s
  WHERE s.pos = CASE s.row_i
    {" ".join(f"WHEN {r} THEN {_cm_pos_sql('q.user_id', r)}" for r in range(CM_D))}
    END
  GROUP BY q.user_id
)
SELECT user_id, CAST(est_count AS BIGINT) AS est_count FROM est
"""


@register("agg_countmin_deterministic", oracle=COUNTMIN_ORACLE, tags=("sketch", "agg", "scale"))
def agg_countmin_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Count-Min sketch: per-user event-frequency
    estimates from a 4x1024 counter array — the frequency member of the
    md5 sketch family (HLL = cardinality, Bloom = membership, DDSketch
    = quantiles), and like them fully oracle-checked because the hash
    schedule is md5-derived rather than engine-native.

    Build: each event increments one counter per hash row (the rows are
    Kirsch-Mitzenmacher h1 + i*h2 probes, like the Bloom positions), so
    the sketch is ONE groupBy over (row, bucket) with map-side combine
    — 4096 counters of state total, SUM-mergeable across shards/days.
    Point query: min over the key's d counters (classic CM guarantee:
    never an underestimate, overestimate bounded by collisions ~ N/w
    per row). The demo queries the 8 smallest user_ids; accuracy vs the
    exact group-by is gated in tests/test_sketches.py.

    100 TB: the shuffle carries at most d*w rows whatever the event
    volume or user cardinality — the heavy-hitter/frequency monitor
    that replaces a full user-keyed aggregation when only point/top
    estimates are needed.

    Measured and REJECTED (r07, recorded so it isn't re-tried): fusing
    the d union branches into one scan via
    ``posexplode(array(pos_0..pos_3))`` — 0.79 → 1.14 s best-of-3 at
    sf0.1. The generator leaves whole-stage codegen and the md5 count
    per row is unchanged, while the d union branches are each a cheap
    single-column scan feeding the same map-side-combined groupBy. (At
    a truly I/O-bound scale the branch scans re-read the column d
    times where the explode reads once — if this query ever moves to a
    fat-table/remote-storage context, re-run the A/B there.)"""
    ev = load_table(spark, sf_dir, "events")
    # Spark-side position: same arithmetic as the oracle's _cm_pos_sql,
    # rendered in the Spark SQL dialect (conv-based h60).
    h_sql = "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"

    def pos_expr(r: int, key: str = "user_id") -> str:
        h = h_sql.replace("user_id", key)
        h1 = f"({h} % {CM_W})"
        h2 = f"((shiftright({h}, 17) % {CM_W}) | 1)"
        return f"(({h1} + {r} * {h2}) % {CM_W})"

    sketch = None
    for r in range(CM_D):
        part = ev.select(
            F.lit(r).cast("int").alias("row_i"),
            F.expr(pos_expr(r)).alias("pos"),
        )
        sketch = part if sketch is None else sketch.unionByName(part)
    counters = sketch.groupBy("row_i", "pos").agg(F.count(F.lit(1)).alias("cnt"))
    q = (
        ev.filter(F.col("user_id") < _CM_QUERY_USERS)
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            *[F.expr(pos_expr(r)).alias(f"qp{r}") for r in range(CM_D)],
        )
    )
    probe_cond = F.lit(False)
    for r in range(CM_D):
        probe_cond = probe_cond | (
            (F.col("row_i") == r) & (F.col("pos") == F.col(f"qp{r}"))
        )
    est = (
        q.join(F.broadcast(counters), probe_cond)
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.select("user_id", "est_count")


# ---------------------------------------------------------------- KMV ----
# K-Minimum-Values distinct sketch: keep the K smallest 60-bit hash
# values; the K-th smallest normalized hash t estimates NDV as
# (K-1)/t. Unlike HLL it supports set INTERSECTION estimates (keep the
# K smallest of the union, count survivors in both sketches), which is
# why both live here. Deterministic (md5), so fully oracle-checkable.

KMV_K = 64
_KMV_DOM = float(1 << 60)  # hash domain size as double, both engines

KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT {_h60_sql('user_id')} AS hv
  FROM events
), k AS (
  SELECT hv FROM h ORDER BY hv LIMIT {KMV_K}
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS in_sketch, CAST(MAX(hv) AS BIGINT) AS kth_hash
  FROM k
)
SELECT CAST({KMV_K} AS BIGINT) AS k, in_sketch, kth_hash,
       CASE WHEN in_sketch < {KMV_K} THEN CAST(in_sketch AS DOUBLE)
            ELSE CAST(({KMV_K} - 1) AS DOUBLE)
                 / (CAST(kth_hash AS DOUBLE) / {_KMV_DOM}) END AS est_distinct,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS true_distinct
FROM s
"""


@register("agg_kmv_distinct", oracle=KMV_ORACLE, tags=("sketch", "agg", "approx"))
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values NDV sketch over events.user_id: the K smallest
    distinct md5-60bit hashes; estimate = (K-1) / normalized K-th min.
    The sketch is a bounded TOP-K BY HASH — Catalyst plans
    sort+limit as TakeOrdered (per-partition heap of K, tiny driver
    merge), so the pass is one scan with O(K) state per partition and
    NO global sort; merging shards = merging K-lists, associative like
    the HLL registers. true_distinct is computed alongside so the
    estimate's error is visible in the row itself (~1/sqrt(K) ≈ 12%).

    The distinct-on-hash step dedups BEFORE the heap so repeated keys
    cannot occupy multiple sketch slots (KMV is defined over the SET);
    when the sketch is not full (NDV < K) it holds the whole hash set
    and the estimate is the EXACT count — the standard KMV small-set
    mode."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(_h60(F.col("user_id")).alias("hv")).distinct()
    k_small = h.orderBy("hv").limit(KMV_K)
    true_d = ev.agg(F.countDistinct("user_id").cast("long").alias("true_distinct"))
    in_sketch = F.count(F.lit(1)).cast("long")
    est = F.when(
        F.col("in_sketch") < KMV_K, F.col("in_sketch").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) / (F.col("kth_hash").cast("double") / F.lit(_KMV_DOM))
    )
    return (
        k_small.agg(
            F.lit(KMV_K).cast("long").alias("k"),
            in_sketch.alias("in_sketch"),
            F.max("hv").cast("long").alias("kth_hash"),
        )
        .select("k", "in_sketch", "kth_hash", est.alias("est_distinct"))
        .crossJoin(F.broadcast(true_d))
    )


KMV_INTER_ORACLE = f"""
WITH a AS (
  SELECT DISTINCT {_h60_sql('user_id')} AS hv FROM events WHERE event_type = 'click'
), b AS (
  SELECT DISTINCT {_h60_sql('user_id')} AS hv FROM events WHERE event_type = 'purchase'
), uni AS (
  SELECT hv FROM (SELECT hv FROM a UNION SELECT hv FROM b) ORDER BY hv LIMIT {KMV_K}
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS in_sketch,
         CAST(MAX(hv) AS BIGINT) AS kth_hash,
         CAST(SUM(CASE WHEN u.hv IN (SELECT hv FROM a)
                        AND u.hv IN (SELECT hv FROM b) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_both
  FROM uni u
), est AS (
  SELECT *,
         CASE WHEN in_sketch < {KMV_K} THEN CAST(in_sketch AS DOUBLE)
              ELSE CAST(({KMV_K} - 1) AS DOUBLE)
                   / (CAST(kth_hash AS DOUBLE) / {_KMV_DOM}) END AS est_union
  FROM s
)
SELECT in_sketch, n_both, est_union,
       CAST(n_both AS DOUBLE) / in_sketch * est_union AS est_intersection,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT hv FROM a INTERSECT SELECT hv FROM b)) AS true_intersection
FROM est
"""


@register("agg_kmv_intersection", oracle=KMV_INTER_ORACLE, tags=("sketch", "agg", "approx"))
def agg_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-intersection estimate from KMV sketches — the capability HLL
    lacks and the reason agg_kmv_distinct exists: sketch the K smallest
    hashes of clicking-users ∪ purchasing-users, count how many of
    those union-sketch members belong to BOTH sets (an exact check —
    the sketch members are real hashes, not register residues), and
    scale: est∩ = (n_both / K) · est∪. true_intersection rides along
    so the error is visible in the row.

    Scale: two distinct-hash passes (map-side partial), one K-limit
    TakeOrdered, two broadcast membership joins against the K-row
    sketch — nothing global."""
    ev = load_table(spark, sf_dir, "events")

    def hs(t: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .select(_h60(F.col("user_id")).alias("hv"))
            .distinct()
        )

    # each hash set feeds the union sketch, a membership probe, and the
    # truth join — materialize once per side
    a = hs("click").transform(pin)
    b = hs("purchase").transform(pin)
    uni = a.unionByName(b).distinct().orderBy("hv").limit(KMV_K)
    marked = (
        uni.join(a.withColumnRenamed("hv", "ha"), uni.hv == F.col("ha"), "left")
        .join(b.withColumnRenamed("hv", "hb"), uni.hv == F.col("hb"), "left")
        .select(
            "hv",
            (F.col("ha").isNotNull() & F.col("hb").isNotNull()).cast("int").alias("both"),
        )
    )
    s = marked.agg(
        F.count(F.lit(1)).cast("long").alias("in_sketch"),
        F.max("hv").cast("long").alias("kth_hash"),
        F.sum("both").cast("long").alias("n_both"),
    )
    est_union = F.when(
        F.col("in_sketch") < KMV_K, F.col("in_sketch").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) / (F.col("kth_hash").cast("double") / F.lit(_KMV_DOM))
    )
    true_inter = a.join(b, "hv", "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("true_intersection")
    )
    return (
        s.withColumn("est_union", est_union)
        .select(
            "in_sketch",
            "n_both",
            "est_union",
            (
                F.col("n_both").cast("double") / F.col("in_sketch") * F.col("est_union")
            ).alias("est_intersection"),
        )
        .crossJoin(F.broadcast(true_inter))
    )


# ------------------------------------------------ per-file Bloom index --
# Delta/Iceberg-style FILE-LEVEL Bloom indexes: zone maps (min/max, see
# sink_skipping_stats) prune range predicates but are useless for point
# lookups on a high-cardinality UNSORTED column — every file's
# [min, max] spans the whole key domain. A small per-file Bloom over
# the column's distinct values prunes exactly that workload.
BLMI_FILES = 32
BLMI_BITS = 4096  # 64 words of 64 bits per file (512 B / file)
BLMI_K = 3
BLMI_PROBE_MOD, BLMI_PROBE_REM = 101, 7  # deterministic probe-key subset


def _blmi_pos_sql(key: str, i: int) -> str:
    h = _h60_sql(key)
    return f"(({h} % {BLMI_BITS}) + {i} * ((({h} // 4096) % {BLMI_BITS}) | 1)) % {BLMI_BITS}"


BLOOM_INDEX_ORACLE = f"""
WITH st AS (SELECT MIN(l_orderkey) AS lo, MAX(l_orderkey) AS hi FROM lineitem),
fp AS (
  SELECT DISTINCT
    LEAST((l.l_orderkey - st.lo) * {BLMI_FILES} // GREATEST(st.hi - st.lo + 1, 1),
          {BLMI_FILES - 1}) AS file_id,
    l.l_partkey AS pk
  FROM lineitem l, st
), words AS (
  -- DuckDB raises on 1 << 63 (signed overflow); the sign bit is the
  -- min-BIGINT literal instead. Spark's shiftleft wraps silently to
  -- the same value.
  SELECT file_id, pos // 64 AS word,
         CAST(BIT_OR(CASE WHEN pos % 64 = 63 THEN (-9223372036854775807 - 1)
                          ELSE 1::BIGINT << CAST(pos % 64 AS INT) END)
              AS BIGINT) AS bits
  FROM (
    SELECT file_id, unnest([{', '.join(_blmi_pos_sql('pk', i) for i in range(BLMI_K))}]) AS pos
    FROM fp)
  GROUP BY 1, 2
), probes AS (
  SELECT p_partkey AS qk FROM part WHERE p_partkey % {BLMI_PROBE_MOD} = {BLMI_PROBE_REM}
), grid AS (
  SELECT f.file_id, p.qk, gs.i,
         {_blmi_pos_sql('p.qk', 0)} + gs.i *
           ((({_h60_sql('p.qk')} // 4096) % {BLMI_BITS}) | 1) AS rawpos
  FROM (SELECT DISTINCT file_id FROM fp) f
  CROSS JOIN probes p
  CROSS JOIN (SELECT unnest(generate_series(0, {BLMI_K - 1})) AS i) gs
), tests AS (
  SELECT g.file_id, g.qk,
         CASE WHEN (COALESCE(w.bits, 0)
                    & (CASE WHEN (g.rawpos % {BLMI_BITS}) % 64 = 63
                            THEN (-9223372036854775807 - 1)
                            ELSE 1::BIGINT << CAST((g.rawpos % {BLMI_BITS}) % 64 AS INT)
                       END)) <> 0 THEN 1 ELSE 0 END AS bit_ok
  FROM grid g LEFT JOIN words w
    ON w.file_id = g.file_id AND w.word = (g.rawpos % {BLMI_BITS}) // 64
), verdicts AS (
  SELECT t.file_id, t.qk, MIN(t.bit_ok) = 1 AS bloom_hit,
         MAX(CASE WHEN fp.pk IS NOT NULL THEN 1 ELSE 0 END) = 1 AS exact_hit
  FROM tests t LEFT JOIN fp ON fp.file_id = t.file_id AND fp.pk = t.qk
  GROUP BY 1, 2
)
SELECT CAST(file_id AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_hits,
       CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(CASE WHEN bloom_hit AND NOT exact_hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos
FROM verdicts GROUP BY 1
"""


@register("sink_bloom_index_stats", oracle=BLOOM_INDEX_ORACLE, tags=("sink", "sketch", "scale"))
def sink_bloom_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FILE Bloom index simulator — the Delta/Iceberg bloom-filter
    file-index feature, measured: lineitem is laid out into
    {BLMI_FILES} files by l_orderkey range (natural ingestion order),
    each file gets a 512 B Bloom (m={BLMI_BITS}, k={BLMI_K},
    Kirsch-Mitzenmacher double hashing from one md5 — the
    join_bloom_prefilter schedule at file granularity) over its
    DISTINCT l_partkey values, and a deterministic probe-key workload
    is evaluated against every file: per file, how many probes the
    index says "maybe" to (files you must read), how many are true
    hits, and the false-positive overshoot. Zone maps cannot prune
    this workload at all — l_partkey is uncorrelated with the
    l_orderkey layout, so every file's [min,max] covers every probe;
    the Bloom verdict is the ONLY thing standing between a point
    lookup and a full-table scan.

    Scale shape: one distinct-projection shuffle of (file, key), one
    (file, word) BIT_OR aggregate to {BLMI_FILES}×64 words (the whole
    'index' is {BLMI_FILES} × 512 B — metadata-sized, exactly like the
    real feature), then the probe evaluation runs on a
    files × probes × k grid joined to the index — never touching the
    fact table again. Registers are BIT_OR-mergeable so the build is
    map-side combined."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    st = li.agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
    file_id = F.least(
        (F.col("l_orderkey") - F.col("lo"))
        * BLMI_FILES
        / F.greatest(F.col("hi") - F.col("lo") + 1, F.lit(1)),
        F.lit(BLMI_FILES - 1),
    ).cast("long")
    fp = (
        li.crossJoin(F.broadcast(st))
        .select(file_id.alias("file_id"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    h = _h60(F.col("pk"))
    h1 = h % BLMI_BITS
    h2 = (F.shiftright(h, 12) % BLMI_BITS).bitwiseOR(F.lit(1))
    pos = F.explode(
        F.array(*[(h1 + F.lit(i) * h2) % BLMI_BITS for i in range(BLMI_K)])
    ).alias("pos")
    words = (
        fp.select("file_id", pos)
        .select(
            "file_id",
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("file_id", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    part = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("qk"))
    probes = part.filter(F.col("qk") % BLMI_PROBE_MOD == BLMI_PROBE_REM)
    qh = _h60(F.col("qk"))
    qh1 = qh % BLMI_BITS
    qh2 = (F.shiftright(qh, 12) % BLMI_BITS).bitwiseOR(F.lit(1))
    files = fp.select("file_id").distinct()
    grid = (
        files.crossJoin(F.broadcast(probes))
        .crossJoin(
            F.broadcast(
                spark.range(BLMI_K).select(F.col("id").cast("long").alias("i"))
            )
        )
        .select("file_id", "qk", ((qh1 + F.col("i") * qh2) % BLMI_BITS).alias("pos"))
    )
    tests = grid.join(
        words.withColumnRenamed("file_id", "w_file"),
        (F.col("w_file") == F.col("file_id"))
        & (F.col("word") == (F.col("pos") / 64).cast("long")),
        "left",
    ).select(
        "file_id",
        "qk",
        F.when(
            F.expr(
                "(coalesce(bits, CAST(0 AS BIGINT)) >> CAST(pmod(pos, 64) AS INT)) & 1 = 1"
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("bit_ok"),
    )
    verdicts = (
        tests.join(
            fp.withColumnRenamed("file_id", "f_file"),
            (F.col("f_file") == F.col("file_id")) & (F.col("pk") == F.col("qk")),
            "left",
        )
        .groupBy("file_id", "qk")
        .agg(
            (F.min("bit_ok") == 1).alias("bloom_hit"),
            (F.max(F.when(F.col("pk").isNotNull(), 1).otherwise(0)) == 1).alias("exact_hit"),
        )
    )
    return verdicts.groupBy(F.col("file_id").cast("long").alias("file_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.when(F.col("exact_hit"), 1).otherwise(0)).cast("long").alias("n_exact_hits"),
        F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).cast("long").alias("n_bloom_hits"),
        F.sum(F.when(F.col("bloom_hit") & ~F.col("exact_hit"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )


# ------------------------------------------------ exact bitmap distinct --
# The EXACT counterpart of the HLL family above: when the id space is
# dense integers (user ids, row ids), a roaring-style bitmap gives
# exact COUNT(DISTINCT) with mergeable, bounded state — the
# Druid/ClickHouse groupBitmap technique.


BITMAP_DISTINCT_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT user_id // 64) AS BIGINT) AS n_words
FROM events GROUP BY 1
"""


@register("agg_bitmap_distinct", oracle=BITMAP_DISTINCT_ORACLE, tags=("sketch", "agg", "scale"))
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via BITMAP aggregation: each
    user id sets bit (id mod 64) of word (id div 64); words BIT_OR-
    merge (associative + commutative → map-side combined, mergeable
    across shards exactly like the HLL registers), and the final count
    is Σ bit_count(word) — EXACT, unlike HLL, with state bounded by
    id-space/64 bits instead of the distinct-set size. This is how
    engines do exact distinct at scale on dense integer keys
    (ClickHouse groupBitmap, Druid bitmap indexes).

    The oracle takes the OTHER algorithm — a plain COUNT(DISTINCT) —
    so parity here is a genuine cross-proof of two independent
    distinct-counting strategies, not an arithmetic mirror.

    Scale shape: one (type, word)-keyed partial-aggregated shuffle of
    BIT_OR words (≤ ids/64 rows per type), then a tiny per-type sum.
    No distinct-shuffle of raw ids ever happens."""
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            F.expr("user_id div 64").alias("word"),
            F.expr(
                "CASE WHEN pmod(user_id, 64) = 63 THEN CAST(-9223372036854775808 AS BIGINT)"
                " ELSE shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT)) END"
            ).alias("mask"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
