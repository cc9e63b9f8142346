"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew transparently; this module is the explicit, planner-independent
tool for the pathological case it can't fix — a shuffle join where ONE
key holds a double-digit percentage of the big side, so even a split
partition hammers the same reducer set.

``salted_join``: salt the big side's key with a random-ish shard id in
[0, n_salt), replicate the small side once per shard, and join on
(key, shard). The hot key's rows now spread over n_salt reducers; the
small side grows n_salt× (fine — it's the small side). Result is
row-identical to the plain join (asserted in tests/test_skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import dec_sum, dec_sum_sql
from ..registry import register
from ..session import load_table


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` with the shuffle salted ``n_salt`` ways.

    The salt is derived from the big side's whole row hash (xxhash64 of
    all columns) — deterministic, uniform, and independent of the key,
    which is exactly what spreads a hot key. Supports inner and left
    joins (the replicated-small-side trick preserves those semantics;
    right/full would need the mirror construction).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    )
    shards = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt_r")
    salted_small = small.select("*", shards)
    cond = (salted_big[big_key] == salted_small[small_key]) & (
        salted_big["_salt"] == salted_small["_salt_r"]
    )
    return salted_big.join(salted_small, cond, how).drop("_salt", "_salt_r")


SKEW_JOIN_ORACLE = f"""
SELECT c.c_mktsegment AS mktsegment, e.event_type,
       COUNT(*) AS n_events,
       {dec_sum_sql('e.value', 2)} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


@register("join_skew_salted", oracle=SKEW_JOIN_ORACLE, tags=("join", "skew", "scale"))
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join of the events fact stream to the customer
    dimension, aggregated per (segment, event type) — the explicit
    answer to the one skew case AQE cannot fix: a dimension too big to
    broadcast joined on a key where a handful of hot values (celebrity
    users, null-ish defaults) dominate the fact side. ``salted_join``
    spreads each hot key over 16 reducers by salting the fact side with
    a whole-row hash and replicating the dimension side 16×; the result
    is row-identical to the plain join (the oracle IS the plain join).

    The dimension side carries a ``shuffle_hash`` hint so the physical
    plan demonstrates the pattern under test (without it Catalyst would
    broadcast the 1 500-row dim and no salt would ever matter — at the
    scale this operator exists for, broadcast is off the table).

    Scale: one fact-side shuffle on (key, salt) — uniform by
    construction — plus a 16× replicated dim shuffle; the aggregate is
    map-side combined on the already-co-located output."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .hint("shuffle_hash")
    )
    joined = salted_join(ev, cust, "user_id", "c_custkey", n_salt=16)
    return joined.groupBy(
        F.col("c_mktsegment").alias("mktsegment"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value", 2).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Join-skew planner (ANALYZE-style key diagnosis → strategy pick)
# ---------------------------------------------------------------------------

BROADCAST_KEYS = 1_000  # distinct-key ceiling for a broadcastable dim
SALT_RATIO_E6 = 20_000_000  # top-key/avg ≥ 20× → explicit salting
AQE_RATIO_E6 = 5_000_000  # ≥ 5× → trust AQE skew-split


def _skew_col_sql(table: str, col: str) -> str:
    return f"""
SELECT '{table}.{col}' AS table_col,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX_BY(k, cnt * 100000000 - k) AS BIGINT) AS top_key,
       CAST(MAX(cnt) AS BIGINT) AS top_cnt,
       CAST((MAX(cnt) * 1000000 * COUNT(*)) // SUM(cnt) AS BIGINT) AS skew_ratio_e6
FROM (SELECT {col} AS k, COUNT(*) AS cnt FROM {table} GROUP BY 1)
"""


def _skew_oracle() -> str:
    parts = " UNION ALL ".join(
        f"({_skew_col_sql(t, c)})"
        for t, c in (
            ("lineitem", "l_orderkey"),
            ("lineitem", "l_partkey"),
            ("lineitem", "l_suppkey"),
            ("events", "user_id"),
        )
    )
    return f"""
WITH stats AS ({parts})
SELECT *,
       CASE WHEN n_distinct <= {BROADCAST_KEYS} THEN 'broadcast_dim'
            WHEN skew_ratio_e6 >= {SALT_RATIO_E6} THEN 'salt_hot_keys'
            WHEN skew_ratio_e6 >= {AQE_RATIO_E6} THEN 'aqe_skew_join'
            ELSE 'plain_shuffle' END AS strategy
FROM stats
"""


@register("profile_join_skew_planner", oracle=_skew_oracle(), tags=("profile", "skew", "scale"))
def profile_join_skew_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style join-key skew diagnosis: for each candidate join
    key, one count-per-key aggregate reduced to (rows, distinct keys,
    hottest key + its count, top/avg ratio), then the strategy CASE a
    planner applies — dim small enough to broadcast; ratio ≥ 20× →
    explicit salting (AQE splits partitions but still hammers one
    reducer set per hot KEY); ≥ 5× → AQE skew-join suffices; else
    plain shuffle. The exact decision procedure this package's own
    salted_join / broadcast patterns implement, emitted as data.

    The ratio is integer fixed-point: top_cnt·1e6·n_distinct // Σcnt
    (top/mean without a double division). The hottest key carries an exact
    composite-integer MAX_BY tie-break (cnt·1e8 − key; keys here are
    < 1e8 — the agg_argminmax idiom) so ties resolve to the smallest
    key deterministically. Each
    column's stats is one map-side-combined aggregate — at 100 TB this
    is the ANALYZE pass whose output feeds the optimizer, not a query
    on the hot path."""
    frames = []
    for table, col in (
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("events", "user_id"),
    ):
        per_key = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(col).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        frames.append(
            per_key.agg(
                F.lit(f"{table}.{col}").alias("table_col"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.max_by("k", F.col("cnt") * F.lit(100_000_000) - F.col("k"))
                .cast("long")
                .alias("top_key"),
                F.max("cnt").cast("long").alias("top_cnt"),
            ).withColumn(
                "skew_ratio_e6",
                F.floor(
                    F.col("top_cnt") * F.lit(1_000_000) * F.col("n_distinct")
                    / F.col("n_rows")
                ).cast("long"),
            )
        )
    from functools import reduce

    stats = reduce(DataFrame.unionByName, frames)
    strategy = (
        F.when(F.col("n_distinct") <= BROADCAST_KEYS, "broadcast_dim")
        .when(F.col("skew_ratio_e6") >= SALT_RATIO_E6, "salt_hot_keys")
        .when(F.col("skew_ratio_e6") >= AQE_RATIO_E6, "aqe_skew_join")
        .otherwise("plain_shuffle")
    )
    return stats.withColumn("strategy", strategy)
