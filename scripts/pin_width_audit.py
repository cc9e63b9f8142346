"""Pin-width audit: find columns materialized by a pin() that no
downstream consumer ever reads.

Why: every ``session.pin`` site (82 at r08) is a deliberate lineage
barrier — and therefore a COLUMN-PRUNING barrier. Catalyst prunes
columns by pushing Projects toward the leaves, but it cannot push a
Project through a materialized RDD boundary: whatever columns the
pinned frame carries are computed by the full lineage below the pin,
serialized into executor block storage (or written to the reliable
checkpoint store under SPARK_GRAFT_PIN_MODE=reliable), and only THEN
dropped by a Project sitting directly above the LogicalRDD leaf. At
sf0.1 a wasted column is microseconds; at 100 TB it is a full-corpus
column materialization plus checkpoint-store write traffic for data nobody
reads.

Mechanism: monkeypatch ``session.pin`` to record each pinned frame's
column list while building every registered query, then walk the final
OPTIMIZED logical plan (children recursion + subqueriesAll, same
leaf-walk discipline as plan_scan_audit after ADVICE r07): a
``Project`` whose single child is a ``LogicalRDD`` and whose output is
narrower than the child's output is Catalyst telling us exactly which
pinned columns are dead. Pins that never surface in the final plan
(consumed only inside an iterative loop's earlier rounds) are reported
separately as UNSEEN — those need manual reading of the loop body, not
a plan walk.

A flag is a PROMPT for a .select() before the pin plus an A/B, never an
automatic fix: a column can be dead in the final plan but alive in a
mid-loop consumer of the same pinned frame, and the recorded plan-audit
history (three measured negatives in r07 alone) says barriers and
projections interact with scheduler overlap in ways only a measurement
settles.

r08 triage of the first full sweep (16 raw flags):
- doc_a/doc_b pairs on the edge pins: FALSE POSITIVES of the
  pre-union version of this script — the same pinned RDD appears at
  several plan positions, each consuming one half; unioning per RDD
  identity (rdd().id()) cleared them.
- `_changed` / sig-probe columns (7 flags): REAL but the column was
  consumed by a separate per-round convergence-probe JOB the final
  plan can't show. Fixed properly via session.pin_eager_observed —
  the probe now rides the pin's own materialization job (observe) and
  the probe column is never stored; measured −20% on
  graph_pointer_jump_rollup and −9% on dedup_components at sf0.1,
  neutral elsewhere (interleaved best-of-3 A/Bs).
- KNOWN-JUSTIFIED residue (the 2 remaining flags): loop-carried join
  keys (`t` in graph_pointer_jump_rollup, `doc_id` in the labels pin
  under dedup_cluster_sizes) — every round's pin needs the column as
  the NEXT round's join key; only the final round's copy goes unread,
  and dropping it would need knowing convergence in advance.

Run: python scripts/pin_width_audit.py [sf_dir]   (default sf0.001 —
pin bodies execute eagerly in loop-driven queries, keep it small)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark import session as session_mod  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark  # noqa: E402


def rdd_projections(df) -> dict[tuple[int, tuple[str, ...]], set[str]]:
    """{(rdd_id, logical_rdd_output_names): union of consumed column
    names} over every LogicalRDD occurrence in the optimized plan. The
    SAME pinned RDD can appear at several places in the plan (an edges
    pin probed once through doc_a and once through doc_b), so consumed
    columns must be unioned per RDD identity before anything is called
    dead. A bare LogicalRDD (no Project directly above) consumes every
    column — Catalyst's ColumnPruning would otherwise have inserted a
    Project; references() on the Project catches a+b AS c reads that
    output() alone would miss.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    used: dict[tuple[int, tuple[str, ...]], set[str]] = {}

    def names(attrs) -> tuple[str, ...]:
        return tuple(attrs.apply(i).name() for i in range(attrs.size()))

    def record(leaf, consumed: set[str]) -> None:
        key = (leaf.rdd().id(), names(leaf.output()))
        used.setdefault(key, set()).update(consumed)

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        kids = node.children()
        if cls == "LogicalRDD":
            record(node, set(names(node.output())))
            return
        if cls == "Project" and kids.size() == 1:
            child = kids.apply(0)
            if child.getClass().getSimpleName() == "LogicalRDD":
                record(child, set(names(node.references().toSeq())))
                return
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(plan)
    subs = plan.subqueriesAll()
    for i in range(subs.size()):
        walk(subs.apply(i))
    return used


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pin-width-audit")
    real_pin = session_mod.pin
    flagged = unseen_total = 0

    for name, spec in registry.all_specs().items():
        if name.startswith("claims_") or "streaming" in name:
            continue  # fixture-file / streaming surfaces
        pinned: list[tuple[str, ...]] = []

        def spy(df, eager: bool = False, _rec=pinned):
            _rec.append(tuple(df.columns))
            return real_pin(df, eager)

        session_mod.pin = spy
        try:
            df = spec.fn(spark, sf_dir)
            used = rdd_projections(df) if pinned else {}
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"ERROR  {name}: {type(e).__name__}: {str(e)[:100]}")
            continue
        finally:
            session_mod.pin = real_pin
        if not pinned:
            continue
        seen: set[tuple[str, ...]] = set()
        for (rdd_id, avail), consumed in used.items():
            seen.add(avail)
            dead = [c for c in avail if c not in consumed]
            if dead:
                flagged += 1
                print(f"{name}: pin cols={len(avail)} dead={dead}")
        unseen = [cols for cols in pinned if cols not in seen]
        if unseen:
            unseen_total += len(unseen)
            print(f"{name}: {len(unseen)} pin(s) not in final plan "
                  f"(loop-internal): {[len(c) for c in unseen]} col(s) each")
    print(f"done: {flagged} pin(s) with dead columns; "
          f"{unseen_total} loop-internal pin(s) need manual reading")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
