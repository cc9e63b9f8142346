"""Scan-width audit: find parquet scans that read more columns than the
query can use.

Why: parquet is columnar — a scan's cost at 100 TB is proportional to
the columns it DESERIALIZES, not the table width, but only if column
pruning actually reached the scan. Catalyst prunes declaratively
expressed plans for free; the places pruning dies are the same barrier
classes the pin-width audit covers plus the Python boundaries:
``mapInPandas``/``applyInPandas`` consume whatever frame they are
applied to (Spark cannot see which pandas columns the UDF touches), and
a ``load_table`` that feeds a UDF without an explicit ``.select`` first
ships every column through Arrow.

Mechanism: for every registered query, walk the PRE-AQE physical plan
(``queryExecution().sparkPlan()`` — FileSourceScanExec leaves exist
there regardless of adaptive re-planning) and report each file scan's
required-schema width vs the relation's full data-schema width. A scan
reading >= the full width of a wide table is a PROMPT to check whether
an early projection is missing — not an automatic fix: some queries
genuinely consume every column (profilers, fingerprints, sinks).

r08 triage of the first full sweep: 3 flags out of the full audited
registry, every one whole-row-by-contract — `profile_documents` /
`profile_documents_approx` (a profiler's job is every column) and
`events_cdc_upsert_stream` (the upsert's payload is the full row).
Zero missing-projection defects: no TPC-H query reads lineitem (16
cols) or orders (9) full-width, and every Python-boundary call site
projects before the UDF. The audit stays as a tripwire for new
registrations.

Run: python scripts/scan_width_audit.py [sf_dir] [min_width]
(defaults: sf0.001, flag only tables with > 4 columns)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark  # noqa: E402


def scan_widths(df) -> list[tuple[str, int, int, tuple[str, ...]]]:
    """(table, read_cols, full_cols, read_names) per FileSourceScanExec
    in the pre-AQE physical plan, subqueries included."""
    qe = df._jdf.queryExecution()
    out: list[tuple[str, int, int, tuple[str, ...]]] = []

    def walk(node) -> None:
        if node.getClass().getSimpleName() == "FileSourceScanExec":
            req = node.requiredSchema()
            full = node.relation().dataSchema()
            paths = node.relation().location().rootPaths()
            table = os.path.basename(paths.apply(0).toString()).removesuffix(
                ".parquet"
            )
            names = tuple(
                req.fields()[i].name() for i in range(req.fields().__len__())
            )
            out.append((table, req.size(), full.size(), names))
            return
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))
        subs = node.subqueriesAll()
        for i in range(subs.size()):
            walk(subs.apply(i))

    walk(qe.sparkPlan())
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    min_width = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("scan-width-audit")
    flagged = 0
    for name, spec in registry.all_specs().items():
        if name.startswith("claims_") or "streaming" in name:
            continue  # fixture-file / streaming surfaces
        try:
            scans = scan_widths(spec.fn(spark, sf_dir))
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"ERROR  {name}: {type(e).__name__}: {str(e)[:100]}")
            continue
        wide = [
            (t, r, f, names)
            for t, r, f, names in scans
            if r >= f and f > min_width
        ]
        if wide:
            flagged += 1
            desc = "; ".join(f"{t} {r}/{f}" for t, r, f, _ in wide[:4])
            print(f"{name}: full-width scan(s): {desc}")
    print(f"done: {flagged} quer(ies) with a full-width scan of a "
          f">{min_width}-column table")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
