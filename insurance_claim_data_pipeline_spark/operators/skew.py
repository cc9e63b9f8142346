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
