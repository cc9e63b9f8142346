"""Exchange audit: count shuffle and broadcast exchanges in every
registered query's physical plan and rank by shuffle count.

Why: at 100 TB the unit of cost is the shuffle — a repeated scan
(plan_scan_audit) re-reads a table, but a redundant Exchange rewrites
the whole intermediate frame over the network. Catalyst removes
provably-redundant exchanges (EnsureRequirements reuses a child's
hash partitioning when the keys match EXACTLY), which means the
residual defect class is subtle: a join followed by a groupBy on a
reordered/re-expressed key, a repartition() the downstream shuffle
repeats, a unionAll whose arms were each pre-shuffled. Counting per
query and triaging the top is the same discipline as the scan audits:
the count is a PROMPT to read the plan, never an automatic fix.

Method: build each query's frame, take the ADAPTIVE physical plan's
initial form (`executedPlan` before any job runs — AQE may later
convert sort-merge joins to broadcast at runtime, so these counts are
the static worst case), walk the plan TREE, and count canonically
DISTINCT exchange nodes — the same `canonicalized` identity Spark's
exchange-reuse rule dedupes on, so a pinned frame consumed by five
unrolled loop steps counts its shuffle once, not five times (a raw
plan-string count overstates shared subtrees by the whole fan-out:
sim_topk_mmr prints 481 Exchange lines for 9 actual shuffles).
Iterative loop queries report only the FINAL frame's plan — their
per-round shuffles execute during fn() and are invisible here (the
driver-loop collect audit's class).

r09 triage of the first full sweep (369 plans, 957 distinct shuffles;
top: dq_fk_discovery 46, sim_topk_mmr 23, feature_prep_pipeline 11,
spearman/quintile_migration/LPA 9) — every top-25 entry lands in a
known exchange-heavy-BY-DESIGN class; do not re-flag:
- cross-table key-profile probes (dq_fk_discovery: a distinct + an
  anti-join per FK relationship × 7 relationships IS the query);
- unrolled greedy/iterative steps over pinned loop frames
  (sim_topk_mmr, pagerank, LPA): each step's join/agg re-shuffles the
  pool-grain pins. For MMR the one-reused-exchange rewrite was
  measured NEGATIVE at sf0.1 (4.9-5.8 → 5.8-7.6 s warm; recorded at
  the pool pin in similarity.py) — the step frames are re-rank-grain,
  never corpus-grain;
- two-level distributed global ranks (bounds sketch + per-bucket rank
  + prefix join: ~3 shuffles per ranked measure — rfm_dist carries
  three measures), the no-single-partition-window trade;
- multi-arm evals/sweeps (nprobe/rerank-depth/recall/pruning, RRF,
  ndcg): one pipeline per arm is the comparison being measured;
- model-build-then-score compositions (naive_bayes, prep pipelines,
  perm-test replicates) whose stages aggregate DIFFERENT keys —
  distinct clusterings genuinely need distinct exchanges;
- grouping-set / rollup / cube expansions (Expand-based, one shuffle);
- sketch families unioning d hash-row branches (cheap single-column
  scans, the measured-negative fusion in sketches.py).

Run: python scripts/exchange_audit.py [sf_dir] [top_n]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark  # noqa: E402


def exchange_counts(df) -> tuple[int, int]:
    plan = df._jdf.queryExecution().executedPlan()
    shuffles: set[int] = set()
    bcasts: set[int] = set()

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            # AQE wraps the real plan as a FIELD, not a child — walk the
            # pre-execution (initial) plan, the static worst case.
            walk(node.initialPlan())
            return
        if cls == "ShuffleExchangeExec":
            shuffles.add(node.canonicalized().hashCode())
        elif cls == "BroadcastExchangeExec":
            bcasts.add(node.canonicalized().hashCode())
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))
        subs = node.subqueriesAll()
        for i in range(subs.size()):
            walk(subs.apply(i))

    walk(plan)
    return len(shuffles), len(bcasts)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark("exchange-audit")
    rows: list[tuple[int, int, str]] = []
    for name, spec in registry.all_specs().items():
        if name.startswith("claims_") or "streaming" in name:
            continue
        try:
            s, b = exchange_counts(spec.fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"ERROR  {name}: {type(e).__name__}: {str(e)[:100]}")
            continue
        rows.append((s, b, name))
    rows.sort(reverse=True)
    print(f"{'shuffles':>8s} {'bcasts':>6s}  query  (top {top_n} of {len(rows)})")
    for s, b, name in rows[:top_n]:
        print(f"{s:8d} {b:6d}  {name}")
    total = sum(s for s, _, _ in rows)
    print(f"done: {len(rows)} plans, {total} total shuffle exchanges")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
