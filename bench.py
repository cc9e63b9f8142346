"""Benchmark harness.

Runs the headline queries (registry specs tagged "bench") at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is fully materialized through the `noop` sink (executes the
whole plan, writes nothing, no driver collect bottleneck). Every query
runs three times and the best time is reported: run 1 pays one-time
whole-stage-codegen compilation and JIT warm-up, later runs measure
steady-state throughput — the quantity that scales to a long-lived
cluster. All runs execute the full plan against the full input.
(Raised from best-of-2 in round 5: single-run noise on this box is
±30% per query — documented in BASELINE.md — and the third run
stabilizes the reported best without changing what is measured.)

Two timing modes, selected per query by registry tag:

- ``bench`` — time the final noop write only (fn() is pure plan
  construction; nothing executes before the save).
- ``bench_wall`` — time ``fn() + save`` together, wall-clock. For
  iterative operators (star-contraction components, Lloyd steps) the
  driver-side loop inside fn() executes jobs eagerly via
  localCheckpoint; timing only the final save would skip the bulk of
  the work and report a fiction. Added in round 6 so the semantic-dedup
  flagship (the heaviest registered query, ~10 s at sf0.1) has a
  tracked regression row (VERDICT r05 item 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark("bench")
    specs = registry.all_specs()
    bench_specs = {
        n: s
        for n, s in sorted(specs.items())
        if "bench" in s.tags or "bench_wall" in s.tags
    }

    # warm up the JVM / parquet footer caches with a trivial action
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        wall = "bench_wall" in spec.tags
        best = float("inf")
        for _ in range(3):
            if wall:
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
            else:
                df = spec.fn(spark, sf_dir)
                t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # The headline total is dominated by the wall-mode flagship
    # (dedup_semantic_components_lsh, ~8 s of iterative driver-loop
    # work); report the plain-noop common subset separately so a
    # regression in the other queries can't hide under the flagship's
    # noise band (VERDICT r06 item 7) — this is the figure comparable
    # to the pre-r06 bench history and BASELINE.md's common-subset row.
    wall_names = sorted(n for n in timings if "bench_wall" in bench_specs[n].tags)
    common_total = round(
        sum(t for n, t in timings.items() if n not in wall_names), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "common_subset_total_sec": common_total,
                "wall_mode_queries": wall_names,
                "runs_per_query": 3,
                "timing": "best_of_runs_steady_state",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
