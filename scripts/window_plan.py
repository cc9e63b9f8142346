"""Compute the next round's driver-window plan (staleness rotation).

Codifies the COVERAGE.md window rule used since r10: the driver checks
the FIRST 50 ``queries()`` entries each round, so the window is

  tier 0 — the 5 claims re-anchors (always: the driver regenerates
           testdata every round, the reference port stays hash-fresh),
  tier 1 — changed-plan re-rides (names passed on the CLI: queries
           whose live plan or oracle changed since their latest
           CORRECTNESS record),
  tier 2 — staleness fill: registered queries ordered by their latest
           CORRECTNESS_r*.json round (oldest first, never-checked
           first of all), ties broken by REGISTRATION order; the
           current ``registry._FRONT`` is simulated as landed in the
           upcoming round.

Run:  python scripts/window_plan.py [--landed N] [reride ...]
Prints the 50-entry plan plus the python-tuple body to paste into
COVERAGE.md / registry._FRONT next round.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insurance_claim_data_pipeline_spark import registry  # noqa: E402

CLAIMS = [
    "claims_normalized",
    "claims_candidates",
    "claims_exclusion_counts",
    "claims_by_source",
    "claims_classify_denial",
]


def latest_records() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    args = sys.argv[1:]
    landed = None
    if "--landed" in args:
        at = args.index("--landed")
        landed = int(args[at + 1])
        args = args[:at] + args[at + 2 :]
    rerides = args

    registry._load_modules()
    reg_order = list(registry._REGISTRY)  # registration order
    latest = latest_records()
    if landed is None:
        landed = max(latest.values(), default=0) + 1
    # simulate the CURRENT _FRONT as landing in round `landed`
    for name in registry._FRONT:
        latest[name] = landed

    unknown = [n for n in rerides if n not in reg_order]
    if unknown:
        print(f"unknown re-ride names: {unknown}")
        return 1

    head = CLAIMS + [n for n in rerides if n not in CLAIMS]
    fill_n = 50 - len(head)
    pool = [n for n in reg_order if n not in head]
    pool.sort(key=lambda n: (latest.get(n, -1), reg_order.index(n)))
    fill = pool[:fill_n]
    plan = head + fill
    assert len(plan) == 50 and len(set(plan)) == 50

    print(f"# window plan for round {landed + 1} "
          f"(current _FRONT simulated as landing r{landed})")
    print(f"# tier 0: {len(CLAIMS)} claims, tier 1: {len(head) - len(CLAIMS)} re-rides,"
          f" tier 2: {fill_n} staleness fill")
    for n in plan:
        rec = latest.get(n, None)
        tag = "never" if n not in latest else f"r{rec:02d}"
        print(f'    "{n}",  # {tag}')
    # next-25 preview so COVERAGE can pre-stage beyond the cut
    print("# next 25 (displaced if re-rides grow):")
    for n in pool[fill_n : fill_n + 25]:
        print(f'#   "{n}",  # r{latest.get(n, -1):02d}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
