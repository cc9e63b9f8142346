"""Degenerate-input robustness sweep: run EVERY registry query against a
zero-row AND a one-row copy of the star schema and report any
Spark-side crash.

An empty or single-row partition/date-slice is routine at 100 TB; an
operator that throws there (unguarded division — Spark 4 runs ANSI mode
so /0 is a hard error — ``collect()[0]``, schema inference over zero
files, a sample variance of one point) is the bug class ADVICE r04
found in er_blocking_budget. The r05 sweeps found and fixed 8 empty-
input and 17 single-row, 1 constant-input, and 12 NULL-payload crashes (tests/test_empty_inputs.py pins them;
functions/guards.py::nonzero is the standard fix).

Run from anywhere:

    python /root/repo/scripts/empty_probe.py            # full registry, ~25 min
    python /root/repo/scripts/empty_probe.py <name> ... # targeted re-probe

Exits non-zero on any failure. claims_* queries are skipped (they read
the checked-in fixture files, not the sf dir).
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark, load_table  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def write_fixture(spark, base: str, n_rows: int) -> None:
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(n_rows).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, f"{t}.parquet"))


def main() -> int:
    spark = get_spark("empty-probe")
    failures = []
    from pyspark.sql import functions as F

    def write_constant(base: str) -> None:
        for t in TABLES:
            one = load_table(spark, "/root/testdata/sf0.001", t).limit(1)
            rep = one.crossJoin(spark.range(5).select(F.lit(1).alias("_d"))).drop("_d")
            rep.write.mode("overwrite").parquet(os.path.join(base, f"{t}.parquet"))

    def write_nullpayload(base: str) -> None:
        keys = {"documents": ("text", "doc_id"), "events": ("value", "event_id"),
                "embeddings": ("embedding", "vec_id")}
        for t in TABLES:
            df = load_table(spark, "/root/testdata/sf0.001", t)
            if t in keys:
                c, k = keys[t]
                df = df.withColumn(
                    c, F.when(F.col(k) % 3 == 0, F.lit(None)).otherwise(F.col(c))
                )
            df.write.mode("overwrite").parquet(os.path.join(base, f"{t}.parquet"))

    for label, n_rows in (("empty", 0), ("one-row", 1), ("constant", 5), ("nulls", 3)):
        base = os.path.join(tempfile.gettempdir(), f"icdp_{label.replace('-', '_')}_fixture")
        if label == "constant":
            # one row duplicated: n>1 with zero variance everywhere
            write_constant(base)
        elif label == "nulls":
            # NULL payloads in text / value / embedding, every 3rd row
            write_nullpayload(base)
        else:
            write_fixture(spark, base, n_rows)
        only = set(sys.argv[1:])
        for name, spec in registry.all_specs().items():
            if name.startswith("claims_") or (only and name not in only):
                continue
            try:
                spec.fn(spark, base).limit(5).collect()
            except Exception as e:  # noqa: BLE001 — report-and-continue sweep
                failures.append((label, name))
                print(
                    f"FAIL [{label}] {name}: {type(e).__name__}: {str(e)[:140]}",
                    flush=True,
                )
        print(f"{label}: swept", flush=True)
    print(f"done: {len(failures)} degenerate-input failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
