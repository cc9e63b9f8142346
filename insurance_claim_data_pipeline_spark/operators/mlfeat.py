"""ML feature-engineering operators: the transforms a training-data
pipeline applies between "clean tables" and "model input" — numeric
scaling, categorical encodings, target encoding, the feature-hashing
trick, and exact quantile binning.

Beyond-reference extension surface (the reference pipeline stops at
normalized claims; a 100 TB training pipeline continues into feature
space). Every operator here is a pure DataFrame plan: group statistics
are computed once with order-independent decimal-stable sums
(functions/stable.py), broadcast back to the fact table, and applied
row-wise inside whole-stage codegen — no Python, no second scan of the
fact side, no global shuffle beyond the one tiny stats aggregate.

Cross-engine exactness notes (the properties the DuckDB oracles rely
on):

- Group means/variances derive from exact decimal sums, converted to
  double once; the downstream per-row arithmetic ((x-mu)/sigma etc.)
  is individually-rounded IEEE ops on identical inputs with the SAME
  expression tree on both engines — ``s*mu`` is NOT ``(s*s)/n`` in
  floating point, so Spark code and oracle SQL mirror each other's
  association exactly.
- Frequency / target encodings are ratios of exact integer counts.
- Feature hashing reuses the md5 bucket of operators/sampling.py
  (identical in both engines).
- Quantile bins come from the exact distributed global rank of
  operators/analytics.py (percentile_approx supplies only load-balance
  bucket bounds; ranks are exact), so ``ntile`` semantics match the
  oracle bit-for-bit with no single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.stable import dec_sum, dec_sum_sql
from ..functions.guards import nonzero
from ..registry import register
from ..session import load_table, pin, tiny_frame_key
from .analytics import _ntile_from_rank, _with_global_rank
from .sampling import _bucket_sql, hash_bucket

# Deterministic row thinning for per-row outputs: keep every 20th
# order / 5th doc so driver-side hashing compares thousands, not
# millions, of rows while the transform still runs over ALL rows.
_ROW_MOD = 20

SCALE_ORACLE = f"""
WITH stats AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         {dec_sum_sql('l_extendedprice')} AS s,
         {dec_sum_sql('l_extendedprice * l_extendedprice')} AS ss,
         MIN(l_extendedprice) AS mn,
         MAX(l_extendedprice) AS mx
  FROM lineitem GROUP BY 1
), mu AS (
  SELECT *, s / n AS mean FROM stats
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       l.l_extendedprice AS price,
       -- ROUND(...,6): the ss sum crosses 2^53 in scaled cents at
       -- sf0.1-size groups, where DuckDB's DECIMAL->DOUBLE cast
       -- double-rounds (int128 -> double, then /10^s) while Spark's
       -- BigDecimal->double is correctly rounded — a 1-ulp sigma
       -- divergence (r11 skew-sweep finding). Rounding to 6 absorbs it.
       ROUND((l.l_extendedprice - m.mean)
             / sqrt((m.ss - m.s * m.mean) / (m.n - 1)), 6) AS z_score,
       (l.l_extendedprice - m.mn) / (m.mx - m.mn) AS minmax
FROM lineitem l JOIN mu m ON l.l_returnflag = m.l_returnflag
WHERE l.l_orderkey % {_ROW_MOD} = 0
"""


@register("feat_scale_numeric", oracle=SCALE_ORACLE, tags=("mlfeat", "llm", "agg"))
def feat_scale_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score + min-max scaling of l_extendedprice per l_returnflag.

    One pass computes n/Σx/Σx²/min/max per group (decimal-stable sums
    → order-independent), the 3-row stats frame broadcasts back, and
    the per-row transform is pure codegen arithmetic. At 100 TB this
    is a map-side aggregate plus a broadcast-join map stage — no
    fact-table shuffle at all."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum(x).alias("s"),
        dec_sum(x * x).alias("ss"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
    )
    # mean first, then variance via s*mean — the SAME association the
    # oracle uses ((s*s)/n would round differently).
    stats = stats.withColumn("mean", F.col("s") / F.col("n"))
    sigma = F.sqrt((F.col("ss") - F.col("s") * F.col("mean")) / (F.col("n") - 1))
    return (
        li.filter(F.col("l_orderkey") % _ROW_MOD == 0)
        .join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            x.alias("price"),
            # rounded to 6: see the oracle's 2^53 double-rounding note
            F.round((x - F.col("mean")) / sigma, 6).alias("z_score"),
            ((x - F.col("mn")) / (F.col("mx") - F.col("mn"))).alias("minmax"),
        )
    )


CATEGORICAL_ORACLE = f"""
WITH counts AS (
  SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS n FROM orders
)
SELECT o.o_orderkey, o.o_orderpriority,
       CAST(substr(o.o_orderpriority, 1, 1) AS INT) AS pri_idx,
       CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent,
       CASE WHEN o.o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS is_high,
       CASE WHEN o.o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS is_medium,
       CASE WHEN o.o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END AS is_notspec,
       CASE WHEN o.o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS is_low,
       CAST(c.cnt AS DOUBLE) / CAST(t.n AS DOUBLE) AS freq_enc
FROM orders o JOIN counts c ON o.o_orderpriority = c.o_orderpriority, tot t
WHERE o.o_orderkey % {_ROW_MOD} = 0
"""

_PRIORITIES = (
    ("1-URGENT", "is_urgent"),
    ("2-HIGH", "is_high"),
    ("3-MEDIUM", "is_medium"),
    ("4-NOT SPECIFIED", "is_notspec"),
    ("5-LOW", "is_low"),
)


@register("feat_categorical_encode", oracle=CATEGORICAL_ORACLE, tags=("mlfeat", "llm"))
def feat_categorical_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three categorical encodings of o_orderpriority in one plan:
    ordinal index (parsed from the value itself — no fitted vocabulary
    to ship), fixed-width one-hot columns, and frequency encoding
    (category count / table count, exact integer ratio).

    The count side is a 5-row broadcast; the ordinal/one-hot columns
    are pure per-row CASE expressions, so the whole transform is one
    broadcast-join map stage at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    tot = orders.agg(F.count(F.lit(1)).alias("n"))
    onehot = [
        (F.when(F.col("o_orderpriority") == v, 1).otherwise(0)).alias(a)
        for v, a in _PRIORITIES
    ]
    return (
        orders.filter(F.col("o_orderkey") % _ROW_MOD == 0)
        .join(F.broadcast(counts), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.substring("o_orderpriority", 1, 1).cast("int").alias("pri_idx"),
            *onehot,
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("freq_enc"),
        )
    )


TARGET_ENC_M = 50  # pseudo-count of the global prior

TARGET_ENC_ORACLE = f"""
WITH returned AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
), labeled AS (
  SELECT o.o_orderpriority,
         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
  FROM orders o LEFT JOIN returned r ON o.o_orderkey = r.l_orderkey
), per_cat AS (
  SELECT o_orderpriority, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM labeled GROUP BY 1
), gstats AS (
  SELECT CAST(SUM(pos) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS prior FROM per_cat
)
SELECT p.o_orderpriority, p.n AS n_orders, p.pos AS n_pos, g.prior,
       (CAST(p.pos AS DOUBLE) + {TARGET_ENC_M} * g.prior)
         / CAST(p.n + {TARGET_ENC_M} AS DOUBLE) AS target_enc
FROM per_cat p, gstats g
"""


@register("feat_target_encode", oracle=TARGET_ENC_ORACLE, tags=("mlfeat", "llm", "join"))
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target-mean encoding of o_orderpriority against the
    binary target "order contains a returned lineitem":
    ``enc = (pos + m·prior) / (n + m)`` with pseudo-count m=50.

    The label join (orders ⋈ distinct returned orderkeys) is co-keyed
    on the fact key — a plain shuffle join that AQE handles at scale;
    everything after it is a 5-row aggregate, so the encoding table
    itself broadcasts for the apply step (not materialized here; this
    query returns the fitted encoder state, which is what a training
    pipeline persists)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    labeled = orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left"
    ).select(
        "o_orderpriority",
        F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
    )
    per_cat = labeled.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("y").cast("long").alias("n_pos")
    )
    glob = per_cat.agg(
        (
            F.sum("n_pos").cast("double") / F.sum("n_orders").cast("double")
        ).alias("prior")
    )
    enc = (
        F.col("n_pos").cast("double") + F.lit(TARGET_ENC_M) * F.col("prior")
    ) / (F.col("n_orders") + F.lit(TARGET_ENC_M)).cast("double")
    return (
        per_cat.crossJoin(F.broadcast(glob))
        .select("o_orderpriority", "n_orders", "n_pos", "prior", enc.alias("target_enc"))
    )


HASH_BUCKETS = 64

HASHING_ORACLE = f"""
SELECT doc_id, {_bucket_sql('t', HASH_BUCKETS)} AS bucket,
       COUNT(*) AS tf
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
)
WHERE t <> '' AND doc_id % 5 = 0
GROUP BY 1, 2
"""


@register("feat_hashing_vectorize", oracle=HASHING_ORACLE, tags=("mlfeat", "llm", "text"))
def feat_hashing_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing trick: sparse bag-of-words vectors with a FIXED
    {HASH_BUCKETS}-dim feature space — ``bucket = md5(token) mod 64``
    (operators/sampling.py's cross-engine bucket), term frequency per
    (doc, bucket).

    No vocabulary fit, no dictionary broadcast, no OOV problem: the
    hash IS the feature index, which is why this is the standard
    encoding for web-scale text. One explode + one partial-aggregated
    groupBy; output is bounded by docs × 64."""
    doc = load_table(spark, sf_dir, "documents")
    tok = (
        doc.filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    return (
        tok.select("doc_id", hash_bucket("t", HASH_BUCKETS).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


QUANTILE_BIN_ORACLE = f"""
SELECT o_orderkey, o_totalprice, decile FROM (
  SELECT o_orderkey, o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile
  FROM orders
)
WHERE o_orderkey % {_ROW_MOD} = 0
"""


@register(
    "feat_quantile_bin",
    oracle=QUANTILE_BIN_ORACLE,
    tags=("mlfeat", "llm", "window", "scale"),
)
def feat_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile binning of o_totalprice with NO
    single-partition window: the exact two-level distributed global
    rank (operators/analytics.py — per-bucket row_number + bucket
    prefix counts over percentile_approx load-balance bounds) feeds a
    closed-form ntile. Bit-identical to the ntile(10) oracle at any
    parallelism — the sketch only balances buckets, never moves a
    rank."""
    orders = load_table(spark, sf_dir, "orders")
    df = _with_global_rank(
        orders.select("o_orderkey", "o_totalprice"), "o_totalprice", "o_orderkey", "_rank"
    )
    return (
        df.filter(F.col("o_orderkey") % _ROW_MOD == 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            _ntile_from_rank(F.col("_rank"), F.col("_n_total"), 10).alias("decile"),
        )
    )


WOE_BINS = 10

WOE_IV_ORACLE = f"""
WITH returned AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
), labeled AS (
  SELECT o.o_orderkey, o.o_totalprice,
         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y,
         ntile({WOE_BINS}) OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey) AS bin
  FROM orders o LEFT JOIN returned r ON o.o_orderkey = r.l_orderkey
), per_bin AS (
  SELECT bin,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
  FROM labeled GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_pos) AS BIGINT) AS p_tot, CAST(SUM(n_neg) AS BIGINT) AS n_tot
  FROM per_bin
)
SELECT b.bin, b.n_pos, b.n_neg,
       CAST(ROUND(ln((CAST(b.n_pos AS DOUBLE) / t.p_tot)
                     / (CAST(b.n_neg AS DOUBLE) / t.n_tot)) * 1000000) AS BIGINT)
         AS woe_e6,
       CAST(ROUND((CAST(b.n_pos AS DOUBLE) / t.p_tot
                   - CAST(b.n_neg AS DOUBLE) / t.n_tot)
                  * ln((CAST(b.n_pos AS DOUBLE) / t.p_tot)
                       / (CAST(b.n_neg AS DOUBLE) / t.n_tot)) * 1000000) AS BIGINT)
         AS iv_term_e6
FROM per_bin b, tot t
WHERE b.n_pos > 0 AND b.n_neg > 0
"""


@register(
    "feat_woe_iv", oracle=WOE_IV_ORACLE, tags=("mlfeat", "llm", "window", "scale")
)
def feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value binned-target encoding —
    the scorecard-modeling workhorse: decile-bin o_totalprice (exact
    distributed rank + closed-form ntile, no single-partition window),
    label each order by contains-a-returned-lineitem, and emit per-bin
    WOE = ln(bin-pos-share / bin-neg-share) plus the bin's IV
    contribution, both as ×1e6 integers (ln rounded once per bin — the
    downstream IV total is then an exact integer sum). Degenerate bins
    (all-pos or all-neg) are excluded, the standard WOE convention.

    Scale: the label join is co-keyed on the fact key; ranks come from
    the two-level bucket-prefix scheme; everything after is a 10-row
    frame."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    labeled = (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
        )
        # consumed by the rank's bounds sketch, bucket counts, AND the
        # final pass — cut lineage so the orders⋈lineitem label join
        # runs once (10 parquet scans observed without it).
        .transform(pin)
    )
    ranked = _with_global_rank(labeled, "o_totalprice", "o_orderkey", "_rank")
    binned = ranked.select(
        "y", _ntile_from_rank(F.col("_rank"), F.col("_n_total"), WOE_BINS).alias("bin")
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg"),
    )
    tot = per_bin.agg(
        F.sum("n_pos").cast("long").alias("p_tot"),
        F.sum("n_neg").cast("long").alias("n_tot"),
    )
    dp = F.col("n_pos").cast("double") / F.col("p_tot")
    dn = F.col("n_neg").cast("double") / F.col("n_tot")
    woe = F.round(F.log(dp / dn) * 1_000_000).cast("long")
    iv = F.round((dp - dn) * F.log(dp / dn) * 1_000_000).cast("long")
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select("bin", "n_pos", "n_neg", woe.alias("woe_e6"), iv.alias("iv_term_e6"))
    )


CROSS_BUCKETS = 32


def _cross_oracle() -> str:
    from .sampling import _bucket_sql

    b = _bucket_sql("o_orderpriority || 'x' || o_orderstatus", CROSS_BUCKETS)
    return f"""
SELECT {b} AS cross_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(DISTINCT o_orderpriority || 'x' || o_orderstatus) AS BIGINT)
         AS n_raw_crosses
FROM orders GROUP BY 1
"""


@register("feat_hashed_crosses", oracle=_cross_oracle(), tags=("mlfeat", "llm"))
def feat_hashed_crosses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed feature CROSSES: the priority×status interaction mapped
    into a fixed {CROSS_BUCKETS}-bucket space by the engine's md5
    bucket — the wide-model recipe for interaction features without a
    fitted cross vocabulary (and the n_raw_crosses column per bucket
    makes hash collisions VISIBLE: a bucket holding >1 raw cross is a
    collision the model will conflate — the dial for sizing the cross
    space). Pure projection + one tiny aggregate; the feature id is
    stable across runs, engines, and vocab drift."""
    orders = load_table(spark, sf_dir, "orders")
    raw = F.concat(F.col("o_orderpriority"), F.lit("x"), F.col("o_orderstatus"))
    return (
        orders.select(
            hash_bucket(raw, CROSS_BUCKETS).alias("cross_bucket"), raw.alias("_raw")
        )
        .groupBy("cross_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("_raw").cast("long").alias("n_raw_crosses"),
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe point-in-time features at label timestamps
# ---------------------------------------------------------------------------

PIT_WINDOW_US = 7 * 86_400_000_000  # trailing 7 days

PIT_FEATURES_ORACLE = f"""
WITH views AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS val_c
  FROM events WHERE event_type = 'view'
), labels AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id
  FROM events WHERE event_type = 'purchase'
), stream AS (
  SELECT user_id, ts_us, 1 AS kind, event_id AS uid,
         CAST(NULL AS BIGINT) AS probe_id, CAST(NULL AS VARCHAR) AS side,
         CAST(1 AS BIGINT) AS cnt, val_c
  FROM views
  UNION ALL
  SELECT user_id, ts_us - {PIT_WINDOW_US}, 0, event_id * 2, event_id, 's',
         0, CAST(0 AS BIGINT)
  FROM labels
  UNION ALL
  SELECT user_id, ts_us, 0, event_id * 2 + 1, event_id, 'e',
         0, CAST(0 AS BIGINT)
  FROM labels
), cum AS (
  SELECT *,
         CAST(SUM(cnt) OVER w AS BIGINT) AS cum_cnt,
         CAST(SUM(val_c) OVER w AS BIGINT) AS cum_val
  FROM stream
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, kind, uid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, probe_id AS label_event_id,
       CAST(MAX(CASE WHEN side = 'e' THEN cum_cnt END)
          - MAX(CASE WHEN side = 's' THEN cum_cnt END) AS BIGINT) AS n_views_7d,
       CAST(MAX(CASE WHEN side = 'e' THEN cum_val END)
          - MAX(CASE WHEN side = 's' THEN cum_val END) AS BIGINT) AS view_value_c_7d
FROM cum WHERE kind = 0
GROUP BY 1, 2
"""


@register(
    "events_pit_features", oracle=PIT_FEATURES_ORACLE, tags=("mlfeat", "events", "window", "scale")
)
def events_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe point-in-time feature extraction: for every label
    event (purchase) compute trailing-7-day behavioral features —
    view count and view-value sum over [t−7d, t) — STRICTLY before the
    label instant. This is the feature-store backfill primitive; doing
    it wrong (including the label instant, or joining a feature table
    computed 'as of today') is the classic training-serving leakage.

    The plan is the as-of union+window trick, not a range join: label
    timestamps inject two zero-weight PROBE rows (window start and
    end) into the feature stream, one per-user ordered running sum
    prices every probe, and end−start differences the exact window —
    O((features+2·labels) log) per user with NO per-pair fanout, where
    the naive range join explodes labels × features-in-window. Strict
    '<' comes from the deterministic total sort key (ts, kind, uid):
    probes sort before same-instant feature rows, so a view AT the
    label timestamp is excluded on both engines by construction."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("val_c"),
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    return pit_features_frame(views, labels)


def pit_features_frame(views: DataFrame, labels: DataFrame) -> DataFrame:
    """Core of :func:`events_pit_features` over ``(user_id, ts_us,
    event_id, val_c)`` feature rows and ``(user_id, ts_us, event_id)``
    label rows."""
    views = views.select(
        "user_id",
        "ts_us",
        F.lit(1).alias("kind"),
        F.col("event_id").alias("uid"),
        F.lit(None).cast("long").alias("probe_id"),
        F.lit(None).cast("string").alias("side"),
        F.lit(1).cast("long").alias("cnt"),
        "val_c",
    )
    probe = lambda shift, s, u: labels.select(  # noqa: E731
        "user_id",
        (F.col("ts_us") + shift).alias("ts_us"),
        F.lit(0).alias("kind"),
        u.alias("uid"),
        F.col("event_id").alias("probe_id"),
        F.lit(s).alias("side"),
        F.lit(0).cast("long").alias("cnt"),
        F.lit(0).cast("long").alias("val_c"),
    )
    stream = views.unionByName(
        probe(-PIT_WINDOW_US, "s", F.col("event_id") * 2)
    ).unionByName(probe(0, "e", F.col("event_id") * 2 + 1))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "kind", "uid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = stream.select(
        "*",
        F.sum("cnt").over(w).cast("long").alias("cum_cnt"),
        F.sum("val_c").over(w).cast("long").alias("cum_val"),
    ).filter(F.col("kind") == 0)
    side = lambda s, c: F.max(F.when(F.col("side") == s, F.col(c)))  # noqa: E731
    return cum.groupBy("user_id", F.col("probe_id").alias("label_event_id")).agg(
        (side("e", "cum_cnt") - side("s", "cum_cnt")).cast("long").alias("n_views_7d"),
        (side("e", "cum_val") - side("s", "cum_val"))
        .cast("long")
        .alias("view_value_c_7d"),
    )


# ---------------------------------------------------------------------------
# Feature drift monitor: PSI of the PIT feature between label halves
# ---------------------------------------------------------------------------

FEATURE_DRIFT_ORACLE = f"""
WITH feats AS ({PIT_FEATURES_ORACLE}),
lab AS (
  SELECT event_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), mid AS (SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid_us FROM lab),
fx AS (
  SELECT LEAST(f.n_views_7d, 4) AS bucket,
         CASE WHEN l.ts_us <= m.mid_us THEN 0 ELSE 1 END AS half
  FROM feats f
  JOIN lab l ON f.label_event_id = l.event_id, mid m
), cnt AS (
  SELECT bucket,
         CAST(COUNT(*) FILTER (half = 0) AS BIGINT) AS n0,
         CAST(COUNT(*) FILTER (half = 1) AS BIGINT) AS n1
  FROM fx GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n0) AS BIGINT) AS t0, CAST(SUM(n1) AS BIGINT) AS t1 FROM cnt
), terms AS (
  SELECT c.bucket, c.n0, c.n1,
         CAST(ROUND(((c.n1 + 1) * 1.0 / (t.t1 + 5) - (c.n0 + 1) * 1.0 / (t.t0 + 5))
              * ln(((c.n1 + 1) * 1.0 / (t.t1 + 5)) / ((c.n0 + 1) * 1.0 / (t.t0 + 5)))
              * 1000000) AS BIGINT) AS psi_term_e6
  FROM cnt c, tot t
)
SELECT bucket, n0, n1, psi_term_e6,
       CAST(SUM(psi_term_e6) OVER () AS BIGINT) AS psi_total_e6
FROM terms
"""


@register(
    "feat_drift_psi", oracle=FEATURE_DRIFT_ORACLE, tags=("mlfeat", "drift", "events")
)
def feat_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-serving skew monitor ON A FEATURE, not a raw column:
    the population-stability index of the point-in-time trailing-view
    count (events_pit_features) between the early and late halves of
    the label stream — the check an ML platform runs against every
    feature-store column before trusting a model trained on last
    quarter's backfill. Buckets 0..3 and 4+ views; Laplace-smoothed
    (+1/+5) shares so empty buckets stay finite; per-bucket PSI terms
    are ×1e6-quantized so the total is an exact integer sum and each
    bucket's contribution is attributable (the drift_psi_orders
    reporting shape).

    Scale: the feature side is the PIT plan; the monitor adds one
    5-bucket conditional aggregate and a scalar smoothing tree."""
    from pyspark.sql import Window as WW

    feats = events_pit_features(spark, sf_dir).select("label_event_id", "n_views_7d")
    ev = load_table(spark, sf_dir, "events")
    lab = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.unix_micros("ts").alias("ts_us")
    ).transform(pin)  # feeds midpoint + the half split
    mid = lab.agg(F.expr("(MIN(ts_us) + MAX(ts_us)) div 2").alias("mid_us"))
    fx = (
        feats.join(lab, feats["label_event_id"] == lab["event_id"])
        .crossJoin(F.broadcast(mid))
        .select(
            F.least(F.col("n_views_7d"), F.lit(4)).alias("bucket"),
            F.when(F.col("ts_us") <= F.col("mid_us"), 0).otherwise(1).alias("half"),
        )
    )
    cnt = fx.groupBy("bucket").agg(
        F.count(F.when(F.col("half") == 0, 1)).cast("long").alias("n0"),
        F.count(F.when(F.col("half") == 1, 1)).cast("long").alias("n1"),
    ).transform(pin)
    # ^ cnt (5 rows) feeds tot AND the terms join; unpinned, each
    # consumer re-executed the whole upstream PIT-features plan — the
    # expensive part of this query. r07 A/B at sf0.1: 1.19 → 1.09 s
    # (near-noise locally; ONE PIT pass instead of two is the scale
    # win).
    tot = cnt.agg(
        F.sum("n0").cast("long").alias("t0"), F.sum("n1").cast("long").alias("t1")
    )
    p0 = (F.col("n0") + 1) * 1.0 / (F.col("t0") + 5)
    p1 = (F.col("n1") + 1) * 1.0 / (F.col("t1") + 5)
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n0",
        "n1",
        F.round((p1 - p0) * F.log(p1 / p0) * 1_000_000).cast("long").alias("psi_term_e6"),
    )
    w = WW.partitionBy(F.pmod(F.col("bucket"), F.lit(1))).rowsBetween(
        WW.unboundedPreceding, WW.unboundedFollowing
    )
    return terms.select(
        "*", F.sum("psi_term_e6").over(w).cast("long").alias("psi_total_e6")
    )


# ---------------------------------------------------------------------------
# Leakage-safe K-fold (out-of-fold) target encoding.
# ---------------------------------------------------------------------------

TE_CV_FOLDS = 5

TARGET_ENC_CV_ORACLE = f"""
WITH returned AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
), labeled AS (
  SELECT o.o_orderpriority AS cat,
         (('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 8))::BIGINT
          % {TE_CV_FOLDS}) AS fold,
         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
  FROM orders o LEFT JOIN returned r ON o.o_orderkey = r.l_orderkey
), cf AS (
  SELECT cat, fold, COUNT(*) AS n_cf, CAST(SUM(y) AS BIGINT) AS pos_cf
  FROM labeled GROUP BY 1, 2
), tot AS (
  SELECT cat, fold, n_cf, pos_cf,
         SUM(n_cf)  OVER (PARTITION BY cat)  AS n_c,
         SUM(pos_cf) OVER (PARTITION BY cat) AS pos_c,
         SUM(n_cf)  OVER (PARTITION BY fold) AS n_f,
         SUM(pos_cf) OVER (PARTITION BY fold) AS pos_f,
         SUM(n_cf)  OVER () AS n_all,
         SUM(pos_cf) OVER () AS pos_all
  FROM cf
)
SELECT cat, CAST(fold AS BIGINT) AS fold,
       CAST(n_cf AS BIGINT) AS n_in_fold,
       CAST(n_c - n_cf AS BIGINT) AS oof_n,
       CAST(pos_c - pos_cf AS BIGINT) AS oof_pos,
       CAST(pos_all - pos_f AS DOUBLE) / CAST(n_all - n_f AS DOUBLE) AS prior_oof,
       (CAST(pos_c - pos_cf AS DOUBLE)
         + {{M}} * (CAST(pos_all - pos_f AS DOUBLE) / CAST(n_all - n_f AS DOUBLE)))
         / CAST(n_c - n_cf + {{M}} AS DOUBLE) AS target_enc_cv
FROM tot
""".replace("{M}", str(TARGET_ENC_M))


@register(
    "feat_target_encode_cv",
    oracle=TARGET_ENC_CV_ORACLE,
    tags=("mlfeat", "llm", "window"),
)
def feat_target_encode_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe K-fold target encoding — the fix for the classic
    train-time leak in ``feat_target_encode``: a row's own label (and
    its whole fold's labels) must not contribute to its encoding, or
    the feature memorizes the target. Rows get md5-deterministic folds;
    the encoding applied to fold f uses category stats from the OTHER
    folds only, smoothed toward the out-of-fold global prior with the
    same pseudo-count M.

    Scale shape: ONE aggregate to the |cats|×K frame (map-side
    combined), then every out-of-fold quantity is a window sum over
    that tiny frame (complement = total − own slice; no per-fold
    re-scan, no K-pass loop). Applying the encoding to the fact table
    is a broadcast join on (cat, fold) downstream. Integer counts
    end-to-end; the two emitted ratios are single double divisions.
    """
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    orders = load_table(spark, sf_dir, "orders")
    labeled = (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left"
        )
        .select(
            F.col("o_orderpriority").alias("cat"),
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
                ).cast("long"),
                F.lit(TE_CV_FOLDS),
            ).alias("fold"),
            F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
        )
    )
    cf = labeled.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).alias("n_cf"), F.sum("y").cast("long").alias("pos_cf")
    )
    w_cat = W.partitionBy("cat")
    w_fold = W.partitionBy("fold")
    w_all = W.partitionBy(tiny_frame_key("fold"))
    tot = (
        cf.withColumn("n_c", F.sum("n_cf").over(w_cat))
        .withColumn("pos_c", F.sum("pos_cf").over(w_cat))
        .withColumn("n_f", F.sum("n_cf").over(w_fold))
        .withColumn("pos_f", F.sum("pos_cf").over(w_fold))
        .withColumn("n_all", F.sum("n_cf").over(w_all))
        .withColumn("pos_all", F.sum("pos_cf").over(w_all))
    )
    prior_oof = (F.col("pos_all") - F.col("pos_f")).cast("double") / nonzero(
        (F.col("n_all") - F.col("n_f")).cast("double")
    )
    return tot.select(
        "cat",
        F.col("fold").cast("long").alias("fold"),
        F.col("n_cf").cast("long").alias("n_in_fold"),
        (F.col("n_c") - F.col("n_cf")).cast("long").alias("oof_n"),
        (F.col("pos_c") - F.col("pos_cf")).cast("long").alias("oof_pos"),
        prior_oof.alias("prior_oof"),
        (
            (
                (F.col("pos_c") - F.col("pos_cf")).cast("double")
                + TARGET_ENC_M * prior_oof
            )
            / (F.col("n_c") - F.col("n_cf") + TARGET_ENC_M).cast("double")
        ).alias("target_enc_cv"),
    )


# ---------------------------------------------------------------------------
# Calibration report (reliability diagram + expected calibration error)
# ---------------------------------------------------------------------------

ECE_BINS = 10

CALIBRATION_ORACLE = f"""
WITH returned AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
), labeled AS (
  SELECT o.o_orderpriority AS cat, o.o_orderkey,
         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
  FROM orders o LEFT JOIN returned r ON o.o_orderkey = r.l_orderkey
), per_cat AS (
  SELECT cat, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM labeled GROUP BY 1
), gstats AS (
  SELECT CAST(SUM(pos) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS prior FROM per_cat
), scored AS (
  SELECT l.y,
         CAST(ROUND((CAST(p.pos AS DOUBLE) + {TARGET_ENC_M} * g.prior)
              / CAST(p.n + {TARGET_ENC_M} AS DOUBLE) * 1000000) AS BIGINT) AS score_e6
  FROM labeled l JOIN per_cat p ON l.cat = p.cat, gstats g
), binned AS (
  SELECT LEAST(score_e6 * {ECE_BINS} // 1000000, {ECE_BINS} - 1) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_bin,
         CAST(SUM(y) AS BIGINT) AS pos_bin,
         CAST(SUM(score_e6) AS BIGINT) AS score_sum_e6
  FROM scored GROUP BY 1
), tot AS (
  SELECT *, SUM(n_bin) OVER () AS n_all FROM binned
)
SELECT CAST(bin AS BIGINT) AS bin, n_bin, pos_bin,
       CAST(score_sum_e6 AS DOUBLE) / n_bin / 1e6 AS mean_score,
       CAST(pos_bin AS DOUBLE) / n_bin AS actual_rate,
       abs(CAST(score_sum_e6 AS DOUBLE) / n_bin / 1e6
           - CAST(pos_bin AS DOUBLE) / n_bin) * n_bin / n_all AS ece_term
FROM tot
"""


@register("feat_calibration_ece", oracle=CALIBRATION_ORACLE, tags=("mlfeat", "stats", "dq"))
def feat_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for the
    smoothed target encoding used as a return-risk score: score every
    order with its category's encoding (quantized ×1e6 so binning is
    exact), bucket into {ECE_BINS} equal-width probability bins, and
    emit per-bin mean score vs actual rate plus the weighted |gap|
    terms whose sum IS the ECE — the standard answer to "does 0.7 mean
    70%?" for any scoring feature before it ships.

    Scale: the scoring join is a broadcast of the |cats| frame onto the
    fact table, binning is one map-side-combined aggregate to
    {ECE_BINS} rows, and the report arithmetic runs on that tiny
    frame. Well-calibrated-by-construction here (the score IS the
    in-sample rate, smoothing aside) — the tests assert small ECE plus
    the bookkeeping identities, and that the bin populations cover
    every order exactly once."""
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    orders = load_table(spark, sf_dir, "orders")
    labeled = orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left"
    ).select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
    )
    per_cat = labeled.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").cast("long").alias("pos")
    )
    gstats = per_cat.agg(
        (F.sum("pos").cast("double") / F.sum("n").cast("double")).alias("prior")
    )
    enc = (
        per_cat.crossJoin(F.broadcast(gstats))
        .select(
            "cat",
            F.round(
                (F.col("pos").cast("double") + TARGET_ENC_M * F.col("prior"))
                / (F.col("n") + TARGET_ENC_M).cast("double")
                * 1_000_000
            )
            .cast("long")
            .alias("score_e6"),
        )
    )
    scored = labeled.join(F.broadcast(enc), "cat").select("y", "score_e6")
    bin_ = F.least(
        F.floor(F.col("score_e6") * ECE_BINS / 1_000_000), F.lit(ECE_BINS - 1)
    ).cast("long")
    binned = scored.groupBy(bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n_bin"),
        F.sum("y").cast("long").alias("pos_bin"),
        F.sum("score_e6").cast("long").alias("score_sum_e6"),
    )
    tot = binned.withColumn(
        "n_all", F.sum("n_bin").over(W.partitionBy(tiny_frame_key("n_bin")))
    )
    mean_score = F.col("score_sum_e6").cast("double") / F.col("n_bin") / 1e6
    actual = F.col("pos_bin").cast("double") / F.col("n_bin")
    return tot.select(
        "bin",
        "n_bin",
        "pos_bin",
        mean_score.alias("mean_score"),
        actual.alias("actual_rate"),
        (F.abs(mean_score - actual) * F.col("n_bin") / F.col("n_all")).alias("ece_term"),
    )


# ---------------------------------------------------------------------------
# Exact distributed decision stump (one boosting round)
# ---------------------------------------------------------------------------

STUMP_ORACLE = """
WITH returned AS (
  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
), labeled AS (
  SELECT CAST(ROUND(o.o_totalprice) AS BIGINT) // 10000 AS xbin,
         CASE WHEN r.l_orderkey IS NULL THEN 0 ELSE 1 END AS y
  FROM orders o LEFT JOIN returned r ON o.o_orderkey = r.l_orderkey
), per_bin AS (
  SELECT xbin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM labeled GROUP BY 1
), cum AS (
  SELECT xbin, n, pos,
         CAST(SUM(n) OVER (ORDER BY xbin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
         CAST(SUM(pos) OVER (ORDER BY xbin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
         CAST(SUM(n) OVER () AS BIGINT) AS nt,
         CAST(SUM(pos) OVER () AS BIGINT) AS pt
  FROM per_bin
), gains AS (
  -- gini impurity reduction, exact rational scaled by nt*nl*nr:
  -- gain ∝ (pl*nr - pr*nl)^2 / (nl*nr) with pr = pt-pl, nr = nt-nl
  SELECT xbin AS split_bin, nl, nt - nl AS nr, pl, pt - pl AS pr,
         CAST(CAST((pl * (nt - nl) - (pt - pl) * nl) AS HUGEINT)
           * CAST((pl * (nt - nl) - (pt - pl) * nl) AS HUGEINT)
           // (nl * (nt - nl)) AS BIGINT) AS gain_num
  FROM cum WHERE nl > 0 AND nl < nt
)
SELECT split_bin, nl, nr, pl, pr, gain_num
FROM gains
ORDER BY gain_num DESC, split_bin
LIMIT 1
"""


@register("mlfeat_decision_stump", oracle=STUMP_ORACLE, tags=("mlfeat", "stats", "window"))
def mlfeat_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT best-split search for a depth-1 tree (the primitive a
    distributed GBDT evaluates millions of times): bin the feature
    (total price in 10k bins), aggregate per-bin label counts, prefix-
    sum them left-to-right, and score every threshold by the Gini gain
    — kept as an EXACT integer numerator (pl·nr − pr·nl)² / (nl·nr)
    so the argmax is decided by integer comparison, never float
    rounding (with the bin id as total-order tie-break). Emits the
    winning split with its left/right class counts.

    This is histogram-based split finding exactly as LightGBM/XGBoost
    do it at scale: the fact scan reduces to |bins| rows, the prefix
    scan and argmax run on that tiny frame. Verified against an
    exhaustive pandas split search in tests."""
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    orders = load_table(spark, sf_dir, "orders")
    labeled = orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left"
    ).select(
        F.floor(F.round(F.col("o_totalprice")) / 10000).cast("long").alias("xbin"),
        F.when(F.col("l_orderkey").isNull(), 0).otherwise(1).alias("y"),
    )
    per_bin = labeled.groupBy("xbin").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("y").cast("long").alias("pos")
    )
    w_ord = W.partitionBy(tiny_frame_key("n")).orderBy("xbin")
    w_all = W.partitionBy(tiny_frame_key("n"))
    cum = (
        per_bin.withColumn("nl", F.sum("n").over(w_ord).cast("long"))
        .withColumn("pl", F.sum("pos").over(w_ord).cast("long"))
        .withColumn("nt", F.sum("n").over(w_all).cast("long"))
        .withColumn("pt", F.sum("pos").over(w_all).cast("long"))
    )
    nl, pl, nt, pt = F.col("nl"), F.col("pl"), F.col("nt"), F.col("pt")
    nr, pr = nt - nl, pt - pl
    # margin² outgrows int64 beyond the gate scale — square in
    # DECIMAL(38,0) (HUGEINT on the oracle side); the quotient fits long.
    margin = (pl * nr - pr * nl).cast("decimal(38,0)")
    gains = cum.filter((nl > 0) & (nl < nt)).select(
        F.col("xbin").alias("split_bin"),
        nl.alias("nl"),
        nr.cast("long").alias("nr"),
        pl.alias("pl"),
        pr.cast("long").alias("pr"),
        F.floor(margin * margin / (nl * nr).cast("decimal(38,0)"))
        .cast("long")
        .alias("gain_num"),
    )
    return gains.orderBy(F.desc("gain_num"), "split_bin").limit(1)


# --- multinomial Naive Bayes: distributed train-to-apply --------------------

NB_BUCKETS = 256  # hashed-unigram feature space
NB_TRAIN_PCT = 80  # md5(doc_id) split, same convention as sample_split_hash

NB_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, text, {_bucket_sql('doc_id')} < {NB_TRAIN_PCT} AS is_train
  FROM documents
), tok AS (
  SELECT doc_id, lang, is_train, {_bucket_sql('t', NB_BUCKETS)} AS bucket
  FROM (SELECT doc_id, lang, is_train, unnest(string_split(text, ' ')) AS t FROM d)
  WHERE t <> ''
), train_cnt AS (
  SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok WHERE is_train GROUP BY 1, 2
), grid AS (
  SELECT l.lang, gs.b AS bucket
  FROM (SELECT DISTINCT lang FROM d WHERE is_train) l
  CROSS JOIN (SELECT unnest(generate_series(0, {NB_BUCKETS - 1})) AS b) gs
), model0 AS (
  SELECT g.lang, g.bucket, COALESCE(tc.c, 0) AS c
  FROM grid g LEFT JOIN train_cnt tc ON tc.lang = g.lang AND tc.bucket = g.bucket
), ck AS (SELECT lang, SUM(c) AS ck FROM model0 GROUP BY 1),
model AS (
  SELECT m.lang, m.bucket,
         CAST(ROUND(ln((m.c + 1.0) / (ck.ck + {NB_BUCKETS}.0)) * 1000000) AS BIGINT)
           AS logp_e6
  FROM model0 m JOIN ck USING (lang)
), prior AS (
  SELECT lang,
         CAST(ROUND(ln(CAST(nk AS DOUBLE) / SUM(nk) OVER ()) * 1000000) AS BIGINT)
           AS prior_e6
  FROM (SELECT lang, COUNT(*) AS nk FROM d WHERE is_train GROUP BY 1)
), test_vec AS (
  SELECT doc_id, lang, bucket, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE NOT is_train GROUP BY 1, 2, 3
), scores AS (
  SELECT tv.doc_id, tv.lang, m.lang AS pred_lang, SUM(tv.tf * m.logp_e6) AS s
  FROM test_vec tv JOIN model m ON m.bucket = tv.bucket GROUP BY 1, 2, 3
), ranked AS (
  SELECT s.doc_id, s.lang, s.pred_lang,
         ROW_NUMBER() OVER (PARTITION BY s.doc_id
                            ORDER BY s.s + p.prior_e6 DESC, s.pred_lang) AS rn
  FROM scores s JOIN prior p ON p.lang = s.pred_lang
)
SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ranked WHERE rn = 1 GROUP BY 1, 2
"""


@register("text_naive_bayes", oracle=NB_ORACLE, tags=("mlfeat", "llm", "text"))
def text_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained AND applied
    distributed, hash-oracled end-to-end: add-1-smoothed class-
    conditional log-probs over hashed unigrams (md5 mod 256, no
    vocabulary fit) from an 80% md5 doc split, then argmax scoring of
    the held-out 20% and a (true lang, predicted lang) confusion
    matrix. Per-term ln() is rounded to a ×1e6 BIGINT at the model
    frame, so document scores are exact integer dot products —
    partial-aggregation order cannot perturb the argmax, and ties
    break to the lexicographically smaller class.

    Scale shape: training is one explode + one (lang, bucket) partial-
    aggregated shuffle; the model is a |langs|×256 frame joined back
    BROADCAST to test-doc token vectors (work ∝ test tokens × langs,
    never corpus × vocab); the argmax is a per-doc window. This is the
    lighter sibling of stats_logistic_newton for text labels — the
    standard first classifier in a data-curation stack (quality/domain
    routing)."""
    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        (hash_bucket("doc_id", 100) < NB_TRAIN_PCT).alias("is_train"),
    )
    tok = (
        doc.select(
            "doc_id", "lang", "is_train", F.explode(F.split("text", " ")).alias("t")
        )
        .filter(F.col("t") != "")
        .select("doc_id", "lang", "is_train", hash_bucket("t", NB_BUCKETS).alias("bucket"))
    )
    train_cnt = (
        tok.filter("is_train")
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    langs = doc.filter("is_train").select("lang").distinct()
    grid = langs.crossJoin(
        F.broadcast(spark.range(NB_BUCKETS).select(F.col("id").cast("long").alias("bucket")))
    )
    model0 = grid.join(train_cnt, ["lang", "bucket"], "left").select(
        "lang", "bucket", F.coalesce("c", F.lit(0)).alias("c")
    )
    ck = model0.groupBy("lang").agg(F.sum("c").alias("ck"))
    model = model0.join(ck, "lang").select(
        "lang",
        "bucket",
        F.round(
            F.log((F.col("c") + 1.0) / (F.col("ck") + float(NB_BUCKETS))) * 1_000_000
        )
        .cast("long")
        .alias("logp_e6"),
    )
    nk = doc.filter("is_train").groupBy("lang").agg(F.count(F.lit(1)).alias("nk"))
    prior = nk.withColumn(
        "n_all", F.sum("nk").over(W.partitionBy(tiny_frame_key("nk")))
    ).select(
        F.col("lang").alias("p_lang"),
        F.round(F.log(F.col("nk").cast("double") / F.col("n_all")) * 1_000_000)
        .cast("long")
        .alias("prior_e6"),
    )
    test_vec = (
        tok.filter(~F.col("is_train"))
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    scores = (
        test_vec.join(
            F.broadcast(model.select(F.col("lang").alias("pred_lang"), "bucket", "logp_e6")),
            "bucket",
        )
        .groupBy("doc_id", "lang", "pred_lang")
        .agg(F.sum(F.col("tf") * F.col("logp_e6")).alias("s"))
    )
    # struct-min argmax (posterior desc via exact integer negation,
    # ties to the smaller predicted lang) — map-side combinable, so
    # each doc's per-language score rows collapse before any exchange
    # instead of a row_number window sorting the doc×lang frame.
    picked = (
        scores.join(F.broadcast(prior), scores["pred_lang"] == prior["p_lang"])
        .groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    (-(F.col("s") + F.col("prior_e6"))).alias("ns"),
                    "pred_lang",
                    "lang",
                )
            ).alias("b")
        )
    )
    return (
        picked.groupBy(
            F.col("b.lang").alias("lang"), F.col("b.pred_lang").alias("pred_lang")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# --- two boosting rounds over regression stumps (GBDT training loop) --------

GBM_E4 = 10_000  # residual fixed-point scale


def _gbm_scores_sql(src: str, ycol: str, denom_extra: str) -> str:
    """Per-feature histogram split scores for one boosting round.
    gain = (S_L·n_R − S_R·n_L)² / (n_L·n_R·n) — the exact SSE reduction
    of the best constant-leaf split, HUGEINT-squared so the argmax is
    integer-decided."""
    return f"""
  SELECT feature, bin AS split_bin, nl, nt - nl AS nr, sl, st - sl AS sr,
         CAST(CAST(sl * (nt - nl) - (st - sl) * nl AS HUGEINT)
              * CAST(sl * (nt - nl) - (st - sl) * nl AS HUGEINT)
              // (CAST(nl AS HUGEINT) * (nt - nl) * nt * {denom_extra})
           AS BIGINT) AS gain_sse
  FROM (
    SELECT feature, bin,
           CAST(SUM(n) OVER (PARTITION BY feature ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
           CAST(SUM(s) OVER (PARTITION BY feature ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sl,
           CAST(SUM(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
           CAST(SUM(s) OVER (PARTITION BY feature) AS BIGINT) AS st
    FROM (
      SELECT 'month' AS feature, bin_month AS bin,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM({ycol}) AS BIGINT) AS s
      FROM {src} GROUP BY 2
      UNION ALL
      SELECT 'prio', bin_prio, CAST(COUNT(*) AS BIGINT), CAST(SUM({ycol}) AS BIGINT)
      FROM {src} GROUP BY 2
    )
  ) WHERE nl > 0 AND nl < nt
"""


GBM_ORACLE = f"""
WITH base AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS bin_month,
         CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS bin_prio,
         CAST(ROUND(o_totalprice) AS BIGINT) AS y
  FROM orders
), g1 AS ({_gbm_scores_sql('base', 'y', '1')}),
w1 AS (SELECT * FROM g1 ORDER BY gain_sse DESC, feature, split_bin LIMIT 1),
resid AS (
  SELECT b.bin_month, b.bin_prio,
         b.y * {GBM_E4}
         - (CASE WHEN (CASE WHEN w1.feature = 'month' THEN b.bin_month
                            ELSE b.bin_prio END) <= w1.split_bin
                 THEN (w1.sl * {GBM_E4}) // w1.nl
                 ELSE (w1.sr * {GBM_E4}) // w1.nr END) AS r
  FROM base b CROSS JOIN w1
), g2 AS ({_gbm_scores_sql('resid', 'r', str(GBM_E4 * GBM_E4))}),
w2 AS (SELECT * FROM g2 ORDER BY gain_sse DESC, feature, split_bin LIMIT 1)
SELECT CAST(1 AS BIGINT) AS round, feature, CAST(split_bin AS BIGINT) AS split_bin,
       nl AS n_l, nr AS n_r, gain_sse FROM w1
UNION ALL
SELECT CAST(2 AS BIGINT), feature, CAST(split_bin AS BIGINT), nl, nr, gain_sse FROM w2
"""


@register("mlfeat_gbm_rounds", oracle=GBM_ORACLE, tags=("mlfeat", "stats", "window"))
def mlfeat_gbm_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO rounds of gradient boosting over regression stumps — the
    actual GBDT training loop, distributed: round 1 histogram-scans
    both features (order month, priority ordinal), scores every
    threshold by EXACT SSE reduction (S_L·n_R − S_R·n_L)²/(n_L·n_R·n)
    with HUGEINT/DECIMAL(38) squaring, picks the argmax split
    (integer-compared, feature+bin tie-break), predicts the truncated
    ×1e4 leaf means, and round 2 re-runs the same search on the
    RESIDUALS — the sequential-in-rounds, parallel-in-data structure
    every distributed GBDT (LightGBM/XGBoost on Spark) has. Round-2
    gain is rescaled by 1e8 so both rounds report in squared dollars.

    Exactness: residuals are exact integers (truncating division on
    both engines), gains are exact integer ratios; no float enters
    the argmax. Extends mlfeat_decision_stump (one Gini round,
    classification) to the boosted-regression loop. Precision bound:
    (S·n)² stays inside 38 digits through ~SF 1; beyond that the bin
    sums need a coarser fixed point (documented, not silent).

    Scale shape per round: one scan producing (feature, bin) partial
    aggregates (2 features × ≤~100 bins), prefix sums and the argmax
    on that tiny frame, then a broadcast of the 1-row winner back for
    residual computation — the fact table is scanned once per round
    and never shuffled."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("bin_month"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("bin_prio"),
        F.round("o_totalprice").cast("long").alias("y"),
    )

    def best_split(df: DataFrame, ycol: str, denom_extra: int) -> DataFrame:
        per_bin = None
        for feat, col in (("month", "bin_month"), ("prio", "bin_prio")):
            pb = df.groupBy(F.col(col).alias("bin")).agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(ycol).cast("long").alias("s"),
            ).select(F.lit(feat).alias("feature"), "bin", "n", "s")
            per_bin = pb if per_bin is None else per_bin.unionAll(pb)
        wcum = W.partitionBy("feature").orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        wall = W.partitionBy("feature")
        cum = per_bin.select(
            "feature",
            F.col("bin").alias("split_bin"),
            F.sum("n").over(wcum).cast("long").alias("nl"),
            F.sum("s").over(wcum).cast("long").alias("sl"),
            F.sum("n").over(wall).cast("long").alias("nt"),
            F.sum("s").over(wall).cast("long").alias("st"),
        ).filter((F.col("nl") > 0) & (F.col("nl") < F.col("nt")))
        num = (F.col("sl") * (F.col("nt") - F.col("nl")) - (F.col("st") - F.col("sl")) * F.col("nl")).cast(
            "decimal(38,0)"
        )
        denom = (
            F.col("nl").cast("decimal(38,0)")
            * (F.col("nt") - F.col("nl"))
            * F.col("nt")
            * F.lit(denom_extra)
        )
        return cum.select(
            "feature",
            "split_bin",
            "nl",
            (F.col("nt") - F.col("nl")).alias("nr"),
            "sl",
            (F.col("st") - F.col("sl")).alias("sr"),
            F.floor(num * num / denom).cast("long").alias("gain_sse"),
        ).orderBy(F.desc("gain_sse"), "feature", "split_bin").limit(1)

    w1 = best_split(base, "y", 1)
    xbin = F.when(F.col("feature") == "month", F.col("bin_month")).otherwise(
        F.col("bin_prio")
    )
    pred = F.when(
        xbin <= F.col("split_bin"),
        F.expr(f"(sl * {GBM_E4}) div nl"),
    ).otherwise(F.expr(f"(sr * {GBM_E4}) div nr"))
    resid = base.crossJoin(F.broadcast(w1)).select(
        "bin_month", "bin_prio", (F.col("y") * GBM_E4 - pred).alias("r")
    )
    w2 = best_split(resid, "r", GBM_E4 * GBM_E4)
    one = w1.select(
        F.lit(1).cast("long").alias("round"),
        "feature",
        F.col("split_bin").cast("long").alias("split_bin"),
        F.col("nl").alias("n_l"),
        F.col("nr").alias("n_r"),
        "gain_sse",
    )
    two = w2.select(
        F.lit(2).cast("long").alias("round"),
        "feature",
        F.col("split_bin").cast("long").alias("split_bin"),
        F.col("nl").alias("n_l"),
        F.col("nr").alias("n_r"),
        "gain_sse",
    )
    return one.unionAll(two)
