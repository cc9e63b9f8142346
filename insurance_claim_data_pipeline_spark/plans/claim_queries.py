"""Registry entries for the claim pipeline, oracle-checked end to end.

The oracle SQL re-derives the whole normalize+eligibility pipeline in
DuckDB directly from the fixture files (read_csv all_varchar to mimic
csv.DictReader; read_json format='array' to mimic json.load), so the
check covers S1-S3, P1-P4, F1-F4, E1-E7, L1 and A2-A3 — not just the
final numbers.

These queries ignore ``sf_dir``: the claim fixtures are the reference's
own sample inputs (shipped under fixtures/), not part of the synthetic
star schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.claims import classify_denial, exclusion_reason, is_eligible
from ..plans.claim_pipeline import candidates_frame
from ..registry import register
from ..sources.claims import load_claims

_FIXTURES = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "fixtures"))
ALPHA_PATH = os.path.join(_FIXTURES, "emr_alpha.csv")
BETA_PATH = os.path.join(_FIXTURES, "emr_beta.json")

# DuckDB trim() only strips spaces; the oracle mirrors
# cleaning.trim_null's regexp strip (str.strip() ASCII semantics) with
# inline regexp_replace(..., '^[ \t\n\x0B\f\r]+|...$', '', 'g').
# Shared DuckDB CTE: fixture files → canonical claim rows, mirroring
# load_alpha/load_beta exactly (including the alpha-only 'None' rule and
# the raw-string date parse).
_CLAIMS_CTE = f"""
WITH alpha_raw AS (
  SELECT * FROM read_csv('{ALPHA_PATH}', header=true, all_varchar=true)
),
alpha AS (
  SELECT
    nullif(regexp_replace(claim_id, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '') AS claim_id,
    nullif(regexp_replace(patient_id, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '') AS patient_id,
    nullif(regexp_replace(procedure_code, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '') AS procedure_code,
    CASE WHEN lower(nullif(regexp_replace(denial_reason, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '')) = 'none' THEN NULL
         ELSE nullif(regexp_replace(denial_reason, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '') END AS denial_reason,
    lower(nullif(regexp_replace(status, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '')) AS status,
    COALESCE(try_strptime(submitted_at, '%Y-%m-%d'),
             try_strptime(submitted_at, '%Y-%m-%dT%H:%M:%S')) AS submitted_ts,
    'alpha' AS source_system
  FROM alpha_raw
),
beta_raw AS (
  SELECT * FROM read_json('{BETA_PATH}', format='array')
),
beta AS (
  SELECT
    nullif(regexp_replace(CAST("id" AS VARCHAR), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '') AS claim_id,
    nullif(regexp_replace(CAST("member" AS VARCHAR), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '') AS patient_id,
    nullif(regexp_replace(CAST("code" AS VARCHAR), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '') AS procedure_code,
    nullif(regexp_replace(CAST("error_msg" AS VARCHAR), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '') AS denial_reason,
    lower(nullif(regexp_replace(CAST("status" AS VARCHAR), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '')) AS status,
    COALESCE(try_strptime(CAST("date" AS VARCHAR), '%Y-%m-%d'),
             try_strptime(CAST("date" AS VARCHAR), '%Y-%m-%dT%H:%M:%S')) AS submitted_ts,
    'beta' AS source_system
  FROM beta_raw
),
claims AS (
  SELECT claim_id, patient_id, procedure_code, denial_reason, status,
         strftime(submitted_ts, '%Y-%m-%d') AS submitted_at,
         CAST(submitted_ts AS DATE) AS submitted_date,
         source_system
  FROM alpha
  UNION ALL
  SELECT claim_id, patient_id, procedure_code, denial_reason, status,
         strftime(submitted_ts, '%Y-%m-%d') AS submitted_at,
         CAST(submitted_ts AS DATE) AS submitted_date,
         source_system
  FROM beta
),
classified AS (
  SELECT *,
    CASE WHEN denial_reason IS NULL THEN 'ambiguous'
         WHEN lower(denial_reason) IN ('missing modifier','incorrect npi','prior auth required')
           THEN 'retryable'
         WHEN lower(denial_reason) IN ('authorization expired','incorrect provider type')
           THEN 'non-retryable'
         WHEN lower(denial_reason) LIKE '%incorrect procedure%'
           OR lower(denial_reason) LIKE '%form incomplete%'
           OR lower(denial_reason) LIKE '%not billable%'
           THEN 'retryable'
         ELSE 'ambiguous' END AS denial_class,
    (COALESCE(status, '') = 'denied'
     AND patient_id IS NOT NULL
     AND submitted_date IS NOT NULL
     AND date_diff('day', submitted_date, DATE '2025-07-30') > 7) AS passes_gate
  FROM claims
),
flagged AS (
  SELECT *, (passes_gate AND denial_class = 'retryable') AS eligible
  FROM classified
)
"""


def _claims_df(spark: SparkSession) -> DataFrame:
    return load_claims(spark, [ALPHA_PATH, BETA_PATH]).claims


NORMALIZED_ORACLE = (
    _CLAIMS_CTE
    + """
SELECT claim_id, patient_id, procedure_code, denial_reason, status,
       submitted_at, source_system
FROM claims
"""
)


@register("claims_normalized", oracle=NORMALIZED_ORACLE, tags=("claims",))
def claims_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S3 + P1-P3 + F1-F4: both sources normalized to the canonical
    7-column claim schema (submitted_at rendered ISO, as the reference
    keeps it)."""
    df = _claims_df(spark)
    return df.select(
        "claim_id",
        "patient_id",
        "procedure_code",
        "denial_reason",
        "status",
        F.date_format("submitted_at", "yyyy-MM-dd").alias("submitted_at"),
        "source_system",
    )


CANDIDATES_ORACLE = (
    _CLAIMS_CTE
    + """
SELECT claim_id,
       denial_reason AS resubmission_reason,
       source_system,
       CASE lower(denial_reason)
         WHEN 'missing modifier' THEN 'Add correct CPT modifier, resubmit'
         WHEN 'incorrect npi' THEN 'Review provider NPI, correct and resubmit'
         WHEN 'prior auth required' THEN 'Obtain/attach prior authorization and resubmit'
         WHEN 'incorrect procedure' THEN 'Verify CPT/HCPCS code mapping, correct if needed and resubmit'
         WHEN 'form incomplete' THEN 'Fill missing fields and resubmit'
         WHEN 'not billable' THEN 'Confirm coverage/payer policy; update claim or appeal'
         ELSE 'Review claim details, supply missing info and resubmit'
       END AS recommended_changes
FROM flagged
WHERE eligible
"""
)


@register("claims_candidates", oracle=CANDIDATES_ORACLE, tags=("claims",))
def claims_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-E7 + L1 + P4: resubmission candidates with recommendations."""
    return candidates_frame(_claims_df(spark)).drop("_file_idx", "_block_start", "_row_idx")


EXCLUSION_ORACLE = (
    _CLAIMS_CTE
    + """
SELECT CASE WHEN COALESCE(status, '') != 'denied' THEN 'not_denied'
            WHEN patient_id IS NULL THEN 'patient_missing'
            WHEN submitted_date IS NULL
              OR date_diff('day', submitted_date, DATE '2025-07-30') <= 7 THEN 'too_recent'
            ELSE 'non_retryable_or_ambiguous' END AS exclusion_reason,
       COUNT(*) AS n_claims
FROM flagged
WHERE NOT eligible
GROUP BY 1
"""
)


@register("claims_exclusion_counts", oracle=EXCLUSION_ORACLE, tags=("claims",))
def claims_exclusion_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (intended semantics): each ineligible claim attributed to
    exactly one exclusion bucket in the reference's rule order."""
    df = _claims_df(spark)
    return (
        df.filter(~is_eligible())
        .select(exclusion_reason().alias("exclusion_reason"))
        .groupBy("exclusion_reason")
        .agg(F.count(F.lit(1)).alias("n_claims"))
    )


BY_SOURCE_ORACLE = (
    _CLAIMS_CTE
    + """
SELECT source_system, COUNT(*) AS n_claims FROM claims GROUP BY source_system
"""
)


@register("claims_by_source", oracle=BY_SOURCE_ORACLE, tags=("claims",))
def claims_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: processed-claim counts per source system."""
    return _claims_df(spark).groupBy("source_system").agg(F.count(F.lit(1)).alias("n_claims"))


CLASSIFY_ORACLE = (
    _CLAIMS_CTE
    + """
SELECT claim_id, denial_reason, denial_class FROM classified
"""
)


@register("claims_classify_denial", oracle=CLASSIFY_ORACLE, tags=("claims",))
def claims_classify_denial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4-E6: the CASE classifier over every claim (exact-set checks
    before substring containment, in reference order)."""
    df = _claims_df(spark)
    return df.select("claim_id", "denial_reason", classify_denial("denial_reason").alias("denial_class"))


DQ_CLAIMS_ORACLE = (
    _CLAIMS_CTE
    + """,
checks AS (
  SELECT 'claim_id_not_null' AS check_name,
         CAST(COUNT(*) FILTER (claim_id IS NULL) AS BIGINT) AS n_violations
  FROM claims
  UNION ALL
  SELECT 'claim_id_unique',
         CAST(COUNT(claim_id) - COUNT(DISTINCT claim_id) AS BIGINT)
  FROM claims
  UNION ALL
  SELECT 'patient_id_not_null',
         CAST(COUNT(*) FILTER (patient_id IS NULL) AS BIGINT)
  FROM claims
  UNION ALL
  SELECT 'status_in_domain',
         CAST(COUNT(*) FILTER (status IS NOT NULL
              AND status NOT IN ('denied', 'approved', 'pending')) AS BIGINT)
  FROM claims
  UNION ALL
  SELECT 'submitted_not_future',
         CAST(COUNT(*) FILTER (submitted_date > DATE '2025-07-30') AS BIGINT)
  FROM claims
  UNION ALL
  SELECT 'denied_has_reason',
         CAST(COUNT(*) FILTER (status = 'denied' AND denial_reason IS NULL)
              AS BIGINT)
  FROM claims
)
SELECT c.check_name, c.n_violations,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM claims) AS n_rows
FROM checks c
"""
)


@register("claims_dq_report", oracle=DQ_CLAIMS_ORACLE, tags=("claims", "quality"))
def claims_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite applied to the REFERENCE domain:
    six checks over the normalized claim stream (key completeness and
    uniqueness, patient presence, status domain, no future submissions
    relative to the pipeline's frozen TODAY, and the denied-without-
    reason business smell that feeds the 'ambiguous' classifier
    bucket). This is the dq_violations machinery pointed at the claims
    port — the report a payer integration runs per EMR drop before
    letting a file into the resubmission pipeline. The fixtures
    genuinely violate the patient-presence check (two claims with null
    patient_id — the same rows rule E2 excludes), so the report is
    non-vacuous by construction.

    One pass per check family over the tiny normalized frame; at real
    claim volumes the six counts fuse into one conditional-aggregate
    scan exactly like dq_violations."""
    df = _claims_df(spark)
    n_rows = df.count()
    checks = [
        ("claim_id_not_null", F.count(F.when(F.col("claim_id").isNull(), 1))),
        (
            "claim_id_unique",
            F.count("claim_id") - F.count_distinct("claim_id"),
        ),
        ("patient_id_not_null", F.count(F.when(F.col("patient_id").isNull(), 1))),
        (
            "status_in_domain",
            F.count(
                F.when(
                    F.col("status").isNotNull()
                    & ~F.col("status").isin("denied", "approved", "pending"),
                    1,
                )
            ),
        ),
        (
            "submitted_not_future",
            F.count(F.when(F.col("submitted_at") > F.lit("2025-07-30").cast("date"), 1)),
        ),
        (
            "denied_has_reason",
            F.count(
                F.when(
                    (F.col("status") == "denied") & F.col("denial_reason").isNull(), 1
                )
            ),
        ),
    ]
    agg = df.agg(*[expr.cast("long").alias(name) for name, expr in checks])
    rows = None
    for name, _ in checks:
        row = agg.select(
            F.lit(name).alias("check_name"),
            F.col(name).alias("n_violations"),
            F.lit(n_rows).cast("long").alias("n_rows"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


# TEST-FIXTURE salt, not a secret: the committed literal exists only so
# the static DuckDB oracle and the Spark plan hash the same tokens in
# the correctness gate. A real deployment MUST inject the salt (below)
# or tokens are dictionary-reversible by anyone with repo access
# (ADVICE r04). Rotating the injected salt re-keys every token.
_PSEUDO_FIXTURE_SALT = "spark-graft-claims-r04"

PSEUDO_SECRET = os.environ.get("SPARK_GRAFT_PSEUDO_SALT", _PSEUDO_FIXTURE_SALT)

PSEUDONYMIZE_ORACLE = (
    _CLAIMS_CTE
    + f"""
SELECT claim_id,
       CASE WHEN patient_id IS NULL THEN NULL
            ELSE 'P-' || substr(md5('{PSEUDO_SECRET}:' || patient_id), 1, 12) END
         AS patient_token,
       procedure_code, status, source_system
FROM claims
"""
)


@register("claims_pseudonymize", oracle=PSEUDONYMIZE_ORACLE, tags=("claims", "privacy"))
def claims_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent pseudonymization of the claims export — the privacy
    gate a payer applies before handing claims to an analytics vendor:
    patient_id is replaced by a salted-hash token ('P-' + 12 hex of
    md5(salt:id)), so joins and per-patient aggregates still work
    (same patient → same token, referential integrity preserved —
    asserted in tests) while the raw identifier never leaves the
    boundary. The salt is injected via ``SPARK_GRAFT_PSEUDO_SALT`` in a
    real deployment (an HMAC with a managed key is the stronger
    construction); rotating it re-keys every token (unlinkable across
    exports). The default baked into the repo is a TEST FIXTURE so the
    static oracle can replay the tokens — it provides no secrecy, and a
    release built on it is dictionary-reversible (ADVICE r04). NULL
    patient stays NULL (the eligibility rules already excluded such
    claims).

    Narrow stateless projection — no shuffle, pushes through any scan;
    the companion k-anonymity/l-diversity audits (operators/privacy.py)
    decide whether the quasi-identifier columns that REMAIN are safe."""
    df = _claims_df(spark)
    token = F.when(
        F.col("patient_id").isNotNull(),
        F.concat(
            F.lit("P-"),
            F.substring(
                F.md5(F.concat(F.lit(f"{PSEUDO_SECRET}:"), F.col("patient_id"))), 1, 12
            ),
        ),
    )
    return df.select(
        "claim_id",
        token.alias("patient_token"),
        "procedure_code",
        "status",
        "source_system",
    )
