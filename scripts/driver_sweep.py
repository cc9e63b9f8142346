"""Driver-style full-registry sweep.

Runs every ``queries()`` entry the way the EXTERNAL driver does: fresh
plain SparkSession, launched from a cwd that is NOT the repo, package
importable only via an explicit sys.path entry. This catches the class
of failure pytest cannot: Spark's Python workers inherit the JVM's cwd
and env, so a module-level function shipped to ``applyInPandas``/
``mapInPandas`` unpickles fine under pytest (cwd = repo root) and
explodes under the driver (ModuleNotFoundError) — UDFs must therefore
be closures (pickled by value). Run from anywhere:

    python /root/repo/scripts/driver_sweep.py [sf_dir]

Prints per-query wall time and row count; exits non-zero on any error.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    os.chdir("/tmp")  # deliberately NOT the repo
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sys.path.insert(0, REPO)
    import importlib

    entry = importlib.import_module("__spark_entry__")
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    failures = []
    t_all = time.time()
    for name, fn in entry.queries().items():
        t0 = time.time()
        try:
            n = len(fn(spark, sf).collect())
            print(f"{time.time() - t0:6.2f}s {name:42s} rows={n}", flush=True)
        except Exception as ex:  # noqa: BLE001 — report-and-continue sweep
            failures.append(name)
            print(f"{time.time() - t0:6.2f}s {name:42s} FAIL {str(ex)[:120]}", flush=True)
    print(f"TOTAL {time.time() - t_all:.1f}s  failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
