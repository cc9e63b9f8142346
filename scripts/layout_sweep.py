"""Layout-portability sweep (VERDICT r09 #5).

The r09 scale lab caught a silent-correctness class no driver round can
see: the events file stream's ``pathGlobFilter`` matched nothing on
DIRECTORY-layout parquet, so every events streaming twin read zero rows
on the layout every real writer produces — invisible for eight rounds
because the generated testdata is single-file. This sweep proves no
other reader narrows a listing the same way: it splits every sf0.01
table into a multi-file parquet DIRECTORY with pyarrow (row-group
slices of the same file — physical schema preserved byte-for-byte, so
any divergence is the READER's, not a type drift), then runs the ENTIRE
registry on both layouts and compares row counts plus a sorted value
fingerprint.

Run from anywhere (driver-style: /tmp cwd, plain session):

    python /root/repo/scripts/layout_sweep.py [sf_dir] [name ...]

Exits non-zero on any query whose result differs between layouts.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

N_SPLITS = 3  # files per table directory — enough to break "the file" reads

# Partition-merge-order-dependent sketches: percentile_approx's KLL-style
# summary depends on which rows share a partition, and the file split IS
# the initial partitioning — so a layout change legitimately moves the
# approximate value (measured: agg_approx rows 3/3, hashes differ). For
# these, layout-invariance is row-count only; the value envelope is
# bracketed in pytest (the same reason they are rows-only at the driver).
ROWS_ONLY = {"agg_approx"}


def build_dir_layout(src_sf: str, dst_sf: str) -> None:
    """Split each single-file table into a directory of N_SPLITS files
    holding the same rows (arrow slices — physical types untouched)."""
    import pyarrow.parquet as pq

    os.makedirs(dst_sf, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(os.path.join(src_sf, f"{t}.parquet"))
        out_dir = os.path.join(dst_sf, f"{t}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        n = tab.num_rows
        step = max(1, (n + N_SPLITS - 1) // N_SPLITS)
        wrote = 0
        for i in range(N_SPLITS):
            lo = min(i * step, n)
            hi = min(lo + step, n)
            # always write the file (possibly zero-row) — a directory of
            # several files incl. small/empty parts is exactly the messy
            # real-writer layout the readers must survive.
            pq.write_table(tab.slice(lo, hi - lo), os.path.join(out_dir, f"part-{i:05d}.parquet"))
            wrote += hi - lo
        assert wrote == n, (t, wrote, n)


def fingerprint(rows) -> tuple[int, str]:
    """(row count, order-independent value hash)."""
    canon = sorted(repr(sorted(r.asDict().items())) for r in rows)
    h = hashlib.md5("\n".join(canon).encode()).hexdigest()[:16]
    return len(canon), h


def main() -> int:
    os.chdir("/tmp")
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    src_sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import importlib

    entry = importlib.import_module("__spark_entry__")
    dst_sf = tempfile.mkdtemp(prefix="sf_dirlayout_")
    build_dir_layout(src_sf, dst_sf)
    print(f"directory-layout copy at {dst_sf} ({N_SPLITS} files/table)", flush=True)

    failures = []
    t_all = time.time()
    try:
        for name, fn in entry.queries().items():
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                n1, h1 = fingerprint(fn(spark, src_sf).collect())
                n2, h2 = fingerprint(fn(spark, dst_sf).collect())
            except Exception as ex:  # noqa: BLE001 — report-and-continue sweep
                failures.append(name)
                print(f"{time.time()-t0:6.2f}s {name:42s} FAIL {str(ex)[:120]}", flush=True)
                continue
            ok = (n1 == n2) if name in ROWS_ONLY else (n1, h1) == (n2, h2)
            if not ok:
                failures.append(name)
            label = "ok(rows-only)" if ok and name in ROWS_ONLY else (
                "ok" if ok else "LAYOUT-DIVERGENT"
            )
            print(
                f"{time.time()-t0:6.2f}s {name:42s} "
                f"{label} rows={n1}/{n2} hash={h1}/{h2}",
                flush=True,
            )
    finally:
        shutil.rmtree(dst_sf, ignore_errors=True)
    print(f"TOTAL {time.time()-t_all:.1f}s  failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
