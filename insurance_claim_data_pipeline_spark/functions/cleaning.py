"""Scalar cleanup expressions (reference: claim_pipeline.py utility
functions, re-expressed as Catalyst Column expressions — no UDFs, so the
whole normalization stays inside whole-stage codegen).

Reference parity notes:
- F1 trim+empty→null  (remove_whitespaces, claim_pipeline.py:60-65)
- F2 null-safe lower  (to_lower, claim_pipeline.py:67-69)
- F3 two-format date parse → null on failure
  (to_iso_date, claim_pipeline.py:48-58); the reference parses the RAW
  string (no trim first) — preserved here.
- F4 'None'-literal → null, alpha denial_reason only
  (claim_pipeline.py:86-89); beta has no such handling (:110) — the
  asymmetry is preserved by only applying none_to_null in the alpha
  loader.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


_WS = r"[ \t\n\x0B\f\r]"  # Python str.strip()'s ASCII whitespace set


def trim_null(col: Column | str) -> Column:
    """F1: strip whitespace; empty-after-trim and null both → null.

    regexp-based, not F.trim: the reference uses str.strip()
    (claim_pipeline.py:63) which strips tabs/newlines too, while SQL
    trim() strips only spaces. The explicit class keeps Spark (Java
    regex) and the DuckDB oracle (RE2) identical; unicode whitespace
    (which Python also strips) is a documented non-goal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.regexp_replace(c, f"^{_WS}+|{_WS}+$", ""), F.lit(""))


def lower_norm(col: Column | str) -> Column:
    """F2: trim+lower with empty→null (the reference composes
    to_lower(remove_whitespaces(x)))."""
    return F.lower(trim_null(col))


def none_to_null(col: Column | str) -> Column:
    """F4: post-trim value equal to 'none' (any case) becomes null."""
    t = trim_null(col)
    return F.when(F.lower(t) == "none", F.lit(None).cast("string")).otherwise(t)


def parse_claim_date(col: Column | str) -> Column:
    """F3: try '%Y-%m-%d', then '%Y-%m-%dT%H:%M:%S', else null.

    try_to_timestamp (not to_date) because Spark 4 runs ANSI mode by
    default, where a failed to_date raises instead of returning null —
    try_* restores the reference's try/except→None semantics. Pattern
    widths mirror CPython strptime exactly (property-tested in
    tests/test_properties.py): %Y is exactly-4-digits → 'yyyy';
    %m/%d/%H/%M/%S accept 1-2 digits ('2025-1-5') → single-letter
    'M'/'d'/'H'/'m'/'s' ('MM' would reject unpadded fields).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-M-d")),
        F.try_to_timestamp(c, F.lit("yyyy-M-d'T'H:m:s")),
    ).cast("date")
