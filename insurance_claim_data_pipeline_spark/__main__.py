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


def main(argv: list[str] | None = None) -> int:
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
