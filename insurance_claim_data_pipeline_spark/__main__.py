"""CLI entry (reference: claim_pipeline.py:235-242 — argv files, usage
error when none given):

    python -m insurance_claim_data_pipeline_spark emr_alpha.csv emr_beta.json

Extension dispatch (.csv → alpha, .json → beta, else warn+skip) happens
in sources.claims.load_claims, same as the reference's pipeline loop.
"""

from __future__ import annotations

import argparse
import sys

from .plans.claim_pipeline import run_pipeline
from .session import get_spark


def _query_main(argv: list[str]) -> int:
    """``query``/``list-queries`` subcommands over the full registry —
    run any catalog operator from the shell:

        python -m insurance_claim_data_pipeline_spark list-queries
        python -m insurance_claim_data_pipeline_spark query q1_pricing_summary \
            --sf-dir /root/testdata/sf0.001 --limit 20
    """
    from . import registry

    parser = argparse.ArgumentParser(
        prog="insurance_claim_data_pipeline_spark query",
        description="Run a registry query against a testdata directory.",
    )
    parser.add_argument("name", nargs="?", help="query name (see list-queries)")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    parser.add_argument("--limit", type=int, default=20, help="rows to show")
    parser.add_argument("--tag", default=None, help="filter list-queries by tag")
    mode, rest = argv[0], argv[1:]
    args = parser.parse_args(rest)
    specs = registry.all_specs()
    if mode == "list-queries":
        for name, spec in specs.items():
            if args.tag and args.tag not in spec.tags:
                continue
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:45s} [{kind}] {' '.join(spec.tags)}")
        return 0
    if not args.name or args.name not in specs:
        print(f"error: unknown query {args.name!r} (try list-queries)", file=sys.stderr)
        return 2
    spark = get_spark("query_cli")
    specs[args.name].fn(spark, args.sf_dir).show(args.limit, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("query", "list-queries"):
        return _query_main(argv)
    parser = argparse.ArgumentParser(
        prog="insurance_claim_data_pipeline_spark",
        description="Insurance-claim resubmission pipeline (PySpark).",
    )
    parser.add_argument("files", nargs="*", help="input claim files (.csv alpha / .json beta)")
    parser.add_argument("-o", "--output-dir", default=".", help="directory for the two sinks")
    args = parser.parse_args(argv)

    if not args.files:
        # reference behavior: usage message + non-zero exit when no inputs
        parser.print_usage(sys.stderr)
        print("error: at least one input file is required", file=sys.stderr)
        return 2

    spark = get_spark("claim_pipeline_cli")
    result = run_pipeline(spark, args.files, output_dir=args.output_dir)
    print(f"Wrote {len(result.candidates)} candidates to {result.output_path}")
    print(f"Wrote metrics to {result.metrics_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
