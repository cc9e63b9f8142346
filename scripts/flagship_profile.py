"""Stage-level profile of the bench flagship
(dedup_semantic_components_lsh) at $SPARK_GRAFT_SF_DIR — guide §1:
isolate each expensive phase with the noop sink so the optimization
work targets the phase that actually costs, not the one that looks
expensive in the code.

Phases timed separately (each best-of-N noop executions after a warm-up):
  probe    — the sizing count() on embeddings
  sigs     — banded signatures (fold to (vec_id, band, code))
  cand     — signature self-join + distinct candidate pairs
  refine   — exact-cosine refinement to near-dup pairs
  comps    — star_contraction_components on the refined pairs (wall,
             includes the driver loop; run on a pinned pair frame so
             upstream is not re-timed)
  full     — the whole registered query, wall (fn() + noop), the bench
             quantity

Run: python scripts/flagship_profile.py [runs]
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
from insurance_claim_data_pipeline_spark.session import (  # noqa: E402
    get_spark,
    load_table,
    pin,
)


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def best_of(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("flagship_profile")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    from insurance_claim_data_pipeline_spark.functions.vectors import as_double

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", as_double("embedding").alias("v"))
    )

    results: dict[str, float] = {}

    sc.setJobDescription("flagship: probe count")
    results["probe"] = best_of(
        lambda: dedup._sem_lsh_rows_for(
            load_table(spark, sf_dir, "embeddings").count()
        ),
        runs,
    )
    n_rows = dedup._sem_lsh_rows_for(load_table(spark, sf_dir, "embeddings").count())
    planes = dedup._sem_lsh_planes(spark, dedup._SEM_LSH_BANDS, n_rows)

    sc.setJobDescription("flagship: sigs")
    sigs = dedup.banded_signatures(emb, planes)
    results["sigs"] = best_of(lambda: noop(sigs), runs)

    sc.setJobDescription("flagship: cand")
    cand = dedup.signature_candidates(sigs)
    results["cand"] = best_of(lambda: noop(cand), runs)

    sc.setJobDescription("flagship: refine")
    pairs = dedup.semantic_lsh_candidate_pairs(spark, sf_dir)
    results["refine"] = best_of(lambda: noop(pairs), runs)

    sc.setJobDescription("flagship: comps")
    pinned_pairs = pin(pairs, eager=True)

    def comps_run() -> None:
        noop(dedup.star_contraction_components(pinned_pairs))

    results["comps"] = best_of(comps_run, runs)

    sc.setJobDescription("flagship: full")

    def full_run() -> None:
        noop(dedup.dedup_semantic_components_lsh(spark, sf_dir))

    results["full"] = best_of(full_run, runs)
    sc.setJobDescription(None)

    for k, v in results.items():
        print(f"{k:8s} {v:7.3f} s")
    print(
        f"(cand includes sigs; refine includes cand; full includes everything; "
        f"runs={runs}, sf_dir={sf_dir}, rows_per_band={n_rows})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
