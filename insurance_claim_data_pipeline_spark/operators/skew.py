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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
