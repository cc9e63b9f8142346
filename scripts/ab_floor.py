"""Interleaved A/B of spark.sql.adaptive.coalescePartitions.minPartitionSize
values over the bench query set — one session, variants alternated
per-run so host steal-time bursts (this box is a shared-host VM with
heavy steal under load) hit every variant roughly equally; report
best-of-N per (query, floor).

Run: python scripts/ab_floor.py [floors ...] (default: 1m 64k 16k)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark  # noqa: E402

FLOOR_CONF = "spark.sql.adaptive.coalescePartitions.minPartitionSize"


def main() -> int:
    floors = sys.argv[1:] or ["1m", "64k", "16k"]
    runs = int(os.environ.get("AB_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_floor")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    specs = registry.all_specs()
    bench = {
        n: s
        for n, s in sorted(specs.items())
        if "bench" in s.tags or "bench_wall" in s.tags
    }
    best: dict[tuple[str, str], float] = {}
    for name, spec in bench.items():
        wall = "bench_wall" in spec.tags
        for r in range(runs):
            for fl in floors:
                spark.conf.set(FLOOR_CONF, fl)
                if wall:
                    t0 = time.perf_counter()
                    df = spec.fn(spark, sf_dir)
                else:
                    df = spec.fn(spark, sf_dir)
                    t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                key = (name, fl)
                best[key] = min(best.get(key, float("inf")), dt)
        row = "  ".join(f"{fl}={best[(name, fl)]:7.3f}" for fl in floors)
        print(f"{name:32s} {row}", flush=True)
    totals = {fl: sum(v for (n, f), v in best.items() if f == fl) for fl in floors}
    print("TOTAL(best) " + "  ".join(f"{fl}={t:7.3f}" for fl, t in totals.items()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
