"""Best-of-N wall timing of named registered queries through the noop
sink (fn()+save together — these are driver-loop queries where fn()
itself runs jobs). Usage:

    python scripts/time_queries.py <n_runs> <name> [name ...]
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


def main() -> int:
    n = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs = registry.all_specs()
    for name in names:
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name:32s} best={min(runs):.3f} runs=["
            + ", ".join(f"{t:.3f}" for t in runs)
            + "]",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
