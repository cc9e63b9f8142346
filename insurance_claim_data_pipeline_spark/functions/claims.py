"""Claim-domain business logic as Column expressions.

Reference parity (claim_pipeline.py):
- config sets/map          :33-43
- classify_denial (E4-E6)  :120-131 — evaluation ORDER matters: null →
  exact retryable set → exact non-retryable set → substring containment
  → ambiguous.
- is_eligible (E1-E3,E7)   :134-145 — conjunction order defines
  exclusion attribution (A3, :203-210).
- recommended_changes (L1) :147-150 — lowercased lookup with default.

Metrics divergence (documented, SURVEY.md §2.1): the reference's
exclusion counters raise KeyError on 3 of 4 buckets (dict keys :164-168
vs increment keys :204-210) so nearly all exclusions land in
'malformed'. This engine implements the INTENDED semantics — each
ineligible claim attributed to exactly one bucket in rule order.
"""

from __future__ import annotations

import datetime
from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

# claim_pipeline.py:33 — fixed "today" from the case study
TODAY = datetime.date(2025, 7, 30)
ELIGIBLE_AGE_DAYS = 7

# claim_pipeline.py:34-35
RETRYABLE = ("missing modifier", "incorrect npi", "prior auth required")
NON_RETRYABLE = ("authorization expired", "incorrect provider type")
# claim_pipeline.py:129 — substring containment, not equality
RETRYABLE_CONTAINS = ("incorrect procedure", "form incomplete", "not billable")

# claim_pipeline.py:36-43
RECOMMENDATIONS = {
    "missing modifier": "Add correct CPT modifier, resubmit",
    "incorrect npi": "Review provider NPI, correct and resubmit",
    "prior auth required": "Obtain/attach prior authorization and resubmit",
    "incorrect procedure": "Verify CPT/HCPCS code mapping, correct if needed and resubmit",
    "form incomplete": "Fill missing fields and resubmit",
    "not billable": "Confirm coverage/payer policy; update claim or appeal",
}
# claim_pipeline.py:149-150
DEFAULT_RECOMMENDATION = "Review claim details, supply missing info and resubmit"


def classify_denial(reason: Column | str) -> Column:
    """E6 CASE classifier, same branch order as claim_pipeline.py:120-131."""
    r = F.col(reason) if isinstance(reason, str) else reason
    rl = F.lower(r)
    contains_any = F.lit(False)
    for kw in RETRYABLE_CONTAINS:
        contains_any = contains_any | rl.contains(kw)
    return (
        F.when(r.isNull(), "ambiguous")
        .when(rl.isin(*RETRYABLE), "retryable")
        .when(rl.isin(*NON_RETRYABLE), "non-retryable")
        .when(contains_any, "retryable")
        .otherwise("ambiguous")
    )


def is_denied(status: Column | str = "status") -> Column:
    """E1 — exact match post-lowercase; null status is not 'denied'."""
    c = F.col(status) if isinstance(status, str) else status
    return c.isNotNull() & (c == "denied")


def has_patient(patient_id: Column | str = "patient_id") -> Column:
    """E2 — truthy patient_id (empty strings became null at load)."""
    c = F.col(patient_id) if isinstance(patient_id, str) else patient_id
    return c.isNotNull()


def older_than_cutoff(submitted_at: Column | str = "submitted_at") -> Column:
    """E3 — strictly older than 7 days before the fixed TODAY; null date
    → false (claim_pipeline.py:71-76: None → False, strict `>` at :76)."""
    c = F.col(submitted_at) if isinstance(submitted_at, str) else submitted_at
    return c.isNotNull() & (F.datediff(F.lit(TODAY), c) > ELIGIBLE_AGE_DAYS)


def is_eligible(
    status: Column | str = "status",
    patient_id: Column | str = "patient_id",
    submitted_at: Column | str = "submitted_at",
    denial_reason: Column | str = "denial_reason",
) -> Column:
    """E7 — conjunction of E1 ∧ E2 ∧ E3 ∧ (classify == 'retryable')."""
    return (
        is_denied(status)
        & has_patient(patient_id)
        & older_than_cutoff(submitted_at)
        & (classify_denial(denial_reason) == "retryable")
    )


def exclusion_reason(
    status: Column | str = "status",
    patient_id: Column | str = "patient_id",
    submitted_at: Column | str = "submitted_at",
) -> Column:
    """A3 — first-match exclusion bucket for ineligible claims, in the
    reference's if/elif order (claim_pipeline.py:203-210). Null status
    counts as not-denied (None != 'denied' is True in Python); null
    date counts as too_recent (older_than(None) → False → not False)."""
    return (
        F.when(~is_denied(status), "not_denied")
        .when(~has_patient(patient_id), "patient_missing")
        .when(~older_than_cutoff(submitted_at), "too_recent")
        .otherwise("non_retryable_or_ambiguous")
    )


def recommended_changes(denial_reason: Column | str = "denial_reason") -> Column:
    """L1 — lowercased map lookup with default. A 6-entry literal map is
    the degenerate broadcast join; create_map keeps it in codegen."""
    c = F.col(denial_reason) if isinstance(denial_reason, str) else denial_reason
    mapping = F.create_map(*[F.lit(x) for x in chain.from_iterable(RECOMMENDATIONS.items())])
    return F.coalesce(mapping[F.lower(c)], F.lit(DEFAULT_RECOMMENDATION))
