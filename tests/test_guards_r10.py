"""Regression pins for the ADVICE r09 findings (round 10).

Three guards, each verified against this Spark's actual semantics
before fixing (ANSI mode — the session default — throws DIVIDE_BY_ZERO
even on double division; ``isnan(NULL)`` is *false*, so ``~isnan``
alone passes NULLs; a NULL struct field sorts FIRST and therefore WINS
``min(struct(...))``):

1. ``graph_link_prediction`` computed ``1e6 / ln(deg)`` over the FULL
   degree table — a degree-1 node (ln 1 = 0) crashed the query under
   ANSI even though such a node can never be a shared neighbor. Fixed
   by filtering ``deg > 1`` before the term (results unchanged:
   a wedge needs two distinct edges at its center).
2. ``_ivf_topk``'s cell assignment filtered ``~isnan(ccos)`` only:
   a NULL-embedding candidate survived and then WON the min-struct
   argmax; a zero-norm vector crashed at the division before the
   filter could run. Fixed with a when()-guarded division + an
   explicit ``isNotNull`` filter; queries and centroids got the same
   sit-out treatment (the probe/re-rank divisions crash identically).
3. ``train_ivf_centroids`` had the same assignment pattern — same fix.
"""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F

from insurance_claim_data_pipeline_spark.operators import similarity
from insurance_claim_data_pipeline_spark.operators.graph import graph_link_prediction


def test_link_prediction_survives_degree_one_nodes(spark, tmp_path):
    # O1 = {1,2}: parts 1 and 2 have co-purchase degree 1 — the exact
    # shape whose ln(1)=0 crashed the pre-fix plan under ANSI.
    # O2 = {3,4}, O3 = {4,5}: parts 3 and 5 share neighbor 4 and are
    # not adjacent, so (3,5) is the one predicted link.
    rows = [(10, 1), (10, 2), (20, 3), (20, 4), (30, 4), (30, 5)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    li.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "lineitem.parquet"))
    out = graph_link_prediction(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["u"], r["v"], r["common_neighbors"]) == (3, 5, 1)
    assert r["adamic_adar_e6"] == round(1_000_000 / math.log(2))


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_ivf_topk_zero_norm_and_null_vectors_sit_out(spark):
    # queries are vec_id < N_QUERIES (8); query 1 is the zero vector,
    # query 2 is NULL — both must sit out, not crash the probe
    # division. Corpus vectors 10/11 are fine; 12 is zero-norm and 13
    # is NULL — neither may be assigned a cell or returned as a
    # neighbor (pre-fix, the NULL candidate WON the min-struct argmax).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, None),
        (10, [0.9, 0.1, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0, 0.0]),
        (12, [0.0, 0.0, 0.0, 0.0]),
        (13, None),
    ]
    cent = [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0]),
            (102, [0.0, 0.0, 0.0, 0.0])]  # zero-norm centroid sits out too
    out = similarity._ivf_topk(
        _emb_df(spark, rows),
        spark.createDataFrame(cent, "c_id long, c_emb array<double>"),
    ).collect()
    assert out, "finite queries must still get results"
    assert {r["query_id"] for r in out} == {0}
    assert not {r["neighbor_id"] for r in out} & {12, 13}


def test_train_ivf_centroids_zero_norm_sits_out(spark):
    dim = 64
    v1 = [1.0] + [0.0] * (dim - 1)
    v2 = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = [
        (8, v1), (9, [x * 0.5 for x in v1]),
        (10, v2), (11, [0.0] * dim), (12, None),
    ]
    cent = similarity.train_ivf_centroids(_emb_df(spark, rows), iters=1).collect()
    # NULL seed 12 sits out of init; zero-norm seed 11 stays as an
    # inert empty cell; the zero/NULL corpus rows sit out of
    # assignment instead of winning the argmax or crashing ANSI.
    assert sorted(r["c_id"] for r in cent) == [8, 9, 10, 11]
    by_id = {r["c_id"]: r["c_emb"] for r in cent}
    assert by_id[11] == [0.0] * dim  # carried forward, not NULL-poisoned
    assert by_id[8][0] == 0.75  # mean of vecs 8 and 9 only


def test_isnan_null_semantics_still_hold(spark):
    # The guards above are correct ONLY under these engine semantics;
    # if a Spark upgrade changes them, this canary points at the spots
    # to re-audit (similarity._ivf_topk / train_ivf_centroids).
    row = spark.range(1).select(
        F.isnan(F.lit(None).cast("double")).alias("isnan_null"),
    ).first()
    assert row["isnan_null"] is False
