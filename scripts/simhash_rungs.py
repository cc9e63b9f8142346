"""Measure the upper simhash rungs at corpus scale (VERDICT r11 #4).

The sized-bank law for dedup_simhash rests on arithmetic for m=6/m=10:
config-invariance is pinned on the fixture and m=5 was measured at
x100, but the upper rungs' candidate-volume claim (candidates ≈ true
pairs + C(m,3)·2⁻ᵂ·N²/2) had never been measured on corpus-sized
data. This lab runs every rung m ∈ {4, 5, 6, 10} against the SAME
500k-doc fingerprint frame (the x100 shard — built by scale_lab) via
the ``m_bands`` override and reports, per rung:

- candidate-stage wall + candidate volume (post-distinct),
- expected random-collision volume C(m,3)·2⁻ᵂ·N²/2 for comparison,
- final output rows + an order-free checksum (bit_xor of
  xxhash64(doc_a, doc_b, hamming)) — config-invariance at corpus
  scale, not just on the fixture.

Fingerprints are computed once and parqueted into the lab dir (they
are rung-independent), so each rung's wall isolates the banded
candidate stage + exact Hamming tail.

Run:  python scripts/simhash_rungs.py [m ...]   (default: 4 5 6 10)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from insurance_claim_data_pipeline_spark.operators.dedup import (  # noqa: E402
    HAMMING_MAX,
    SIMHASH_BITS,
    simhash_banded_candidates,
    simhash_fingerprints,
)
from insurance_claim_data_pipeline_spark.session import get_spark, load_table  # noqa: E402

LAB = os.path.join(REPO, ".scale_lab")
FP_DIR = os.path.join(LAB, "simhash_fp_x100.parquet")


def main() -> int:
    ms = [int(a) for a in sys.argv[1:]] or [4, 5, 6, 10]
    spark = get_spark("simhash-rungs")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    import scale_lab

    x100 = scale_lab.materialize(spark, 100)
    if not os.path.exists(os.path.join(FP_DIR, "_SUCCESS")):
        doc = load_table(spark, x100, "documents")
        t0 = time.perf_counter()
        simhash_fingerprints(doc).write.mode("overwrite").parquet(FP_DIR)
        print(f"fingerprints materialized in {time.perf_counter() - t0:.1f}s", flush=True)
    sim = spark.read.parquet(FP_DIR)
    n = sim.count()
    print(f"corpus: {n} fingerprints ({x100})", flush=True)

    rows = []
    for m in ms:
        width = SIMHASH_BITS // m
        w_key = (m - HAMMING_MAX) * width
        combos = math.comb(m, HAMMING_MAX)
        expected_random = combos * (2.0**-w_key) * n * (n - 1) / 2
        t0 = time.perf_counter()
        cand = simhash_banded_candidates(sim, m)
        n_cand = cand.count()
        t_cand = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = cand.filter(F.expr("bit_count(ha ^ hb)") <= HAMMING_MAX).select(
            "doc_a", "doc_b", F.expr("bit_count(ha ^ hb)").cast("long").alias("hamming")
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(doc_a, doc_b, hamming))").alias("chk"),
        ).first()
        t_out = time.perf_counter() - t0
        rows.append(
            {
                "m": m,
                "w_key_bits": w_key,
                "combos": combos,
                "candidates": n_cand,
                "expected_random": round(expected_random, 1),
                "cand_sec": round(t_cand, 2),
                "out_rows": agg["n"],
                "out_checksum": agg["chk"],
                "out_sec": round(t_out, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print(f"\n{'m':>3s} {'W':>3s} {'combos':>6s} {'candidates':>12s} {'expect-rand':>12s}"
          f" {'cand s':>7s} {'out rows':>9s} {'out s':>6s}")
    for r in rows:
        print(
            f"{r['m']:>3d} {r['w_key_bits']:>3d} {r['combos']:>6d} {r['candidates']:>12d}"
            f" {r['expected_random']:>12.0f} {r['cand_sec']:>7.2f} {r['out_rows']:>9d}"
            f" {r['out_sec']:>6.2f}"
        )
    checks = {r["out_checksum"] for r in rows}
    n_out = {r["out_rows"] for r in rows}
    invariant = len({(r["out_rows"], r["out_checksum"]) for r in rows}) == 1
    print(f"\nconfig-invariance at {n} docs: "
          f"{'PASS' if invariant else 'FAIL'} (rows={sorted(n_out)}, checksums={sorted(checks)})")
    return 0 if invariant else 1


if __name__ == "__main__":
    raise SystemExit(main())
