"""Interleaved A/B (VERDICT r12 item 4): pre-repartition the embedding
frame by vec_id inside banded_signatures, so the per-vector sign folds
spread off the single parquet-scan task and the signature groupBy
reuses the vec_id partitioning (HashPartitioning(vec_id) satisfies
ClusteredDistribution(vec_id, band) — no bits-frame exchange).

Variant is applied by monkeypatching dedup.banded_signatures in one
session; the flagship (wall mode) is timed end-to-end per variant,
alternated per round. Usage: python scripts/sigrep_ab.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from insurance_claim_data_pipeline_spark.operators import dedup  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

base_sig = dedup.banded_signatures


def sig_prerep(aug, planes):
    n_part = aug.sparkSession.sparkContext.defaultParallelism
    return base_sig(aug.repartition(n_part, "vec_id"), planes)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("sigrep_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # value parity first
    a = dedup.dedup_semantic_components_lsh(spark, SF_DIR)
    ra = sorted(map(tuple, a.collect()))
    dedup.banded_signatures = sig_prerep
    b = dedup.dedup_semantic_components_lsh(spark, SF_DIR)
    rb = sorted(map(tuple, b.collect()))
    dedup.banded_signatures = base_sig
    print(f"parity: {'OK' if ra == rb else 'MISMATCH'} ({len(ra)} rows)")

    times = {"base": [], "prerep": []}
    for _ in range(rounds):
        for label, fn in (("base", base_sig), ("prerep", sig_prerep)):
            dedup.banded_signatures = fn
            t0 = time.perf_counter()
            df = dedup.dedup_semantic_components_lsh(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            times[label].append(time.perf_counter() - t0)
            dedup.banded_signatures = base_sig
    for label, ts in times.items():
        print(
            f"{label:8s} best={min(ts):.3f} median={sorted(ts)[len(ts)//2]:.3f} "
            f"runs=[{', '.join(f'{t:.3f}' for t in ts)}]"
        )
    # isolated candidate stage too (plan construction only, noop save)
    for label, fn in (("base", base_sig), ("prerep", sig_prerep)):
        dedup.banded_signatures = fn
        ts = []
        for _ in range(rounds):
            df = dedup.semantic_lsh_candidate_pairs(spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
        dedup.banded_signatures = base_sig
        print(f"cand:{label:8s} best={min(ts):.3f} runs=[{', '.join(f'{t:.3f}' for t in ts)}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
