"""Registry emission-order contract.

The external driver consumes ``queries()`` in dict order and, round 1,
checked only a prefix of it (cut at 50 entries).  The registry therefore
guarantees a deterministic priority order: unproven queries first
(claims port on top), prior-round-green queries re-listed afterwards.
These tests keep the ordering lists honest as operators are added.
"""

from insurance_claim_data_pipeline_spark import registry


def test_order_lists_have_no_stale_or_duplicate_names():
    specs = registry.all_specs()
    for lst in (registry._FRONT, registry._TAIL):
        assert len(lst) == len(set(lst)), "duplicate name in ordering list"
        stale = set(lst) - set(specs)
        assert not stale, f"ordering list names not in registry: {stale}"
    assert not set(registry._FRONT) & set(registry._TAIL)


def test_emission_covers_every_registered_query_exactly_once():
    specs = registry.all_specs()
    names = list(specs)
    assert len(names) == len(set(names))
    assert set(names) == set(registry.queries())
    # oracle_sql is a subset with the same relative order
    osql = list(registry.oracle_sql())
    assert [n for n in names if n in set(osql)] == osql


def test_driver_window_policy():
    # Rotation policy, enforced from the artifacts rather than a
    # hard-coded round: the claims-port re-anchor leads every window
    # (the driver regenerates testdata per round), _FRONT is exactly
    # the 50-entry driver window, every _FRONT entry precedes every
    # _TAIL entry, and the window spends most of its budget on
    # first-ever driver rows (VERDICT r04 item 1: ≥43/50 while the
    # never-checked backlog exists).
    import glob
    import json
    import os

    specs = registry.all_specs()
    names = list(specs)
    assert names[:5] == [
        "claims_normalized",
        "claims_candidates",
        "claims_exclusion_counts",
        "claims_by_source",
        "claims_classify_denial",
    ]
    assert len(registry._FRONT) == 50
    assert list(names[:50]) == list(registry._FRONT)
    first_tail = min(names.index(n) for n in registry._TAIL if n in names)
    last_front = max(names.index(n) for n in registry._FRONT if n in names)
    assert last_front < first_tail, "a prior-green query precedes an unproven one"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        checked |= set(json.load(open(f)))
    backlog = [n for n in names if n not in checked]
    first_ever_in_window = [n for n in names[:50] if n not in checked]
    if len(backlog) > len(first_ever_in_window):
        assert len(first_ever_in_window) >= 43, (
            f"window spends only {len(first_ever_in_window)}/50 on the "
            f"{len(backlog)}-entry never-checked backlog"
        )


def test_new_queries_slot_before_prior_green_tail():
    # A name in neither list must land after _FRONT and before _TAIL.
    order = registry._emission_order(["zz_new_query", *registry._FRONT, *registry._TAIL])
    idx = order.index("zz_new_query")
    assert idx == len(registry._FRONT)


def test_doc_tallies_current():
    # ADVICE r04 / VERDICT r04 item 4: documented registry tallies were
    # hand-counted and drifted twice in one round. The canonical tally
    # lines in README.md / COVERAGE.md carry a marker and are rewritten
    # by scripts/refresh_tallies.py; this test fails the moment a
    # registration lands without re-running the script.
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import refresh_tallies

    total, oracled, rows_only = refresh_tallies.tally()
    expected = refresh_tallies.tally_line(total, oracled, rows_only)
    never_checked, rounds = refresh_tallies.backlog()
    expected_backlog = refresh_tallies.backlog_line(never_checked, rounds)
    for doc in ("README.md", "COVERAGE.md"):
        with open(os.path.join(repo, doc)) as f:
            text = f.read().splitlines()
        lines = [ln for ln in text if refresh_tallies.MARKER in ln]
        assert lines, f"{doc} lost its registry-tally marker line"
        for ln in lines:
            assert ln == expected, (
                f"{doc} tally is stale: run scripts/refresh_tallies.py "
                f"(doc: {ln!r}, live: {expected!r})"
            )
        # VERDICT r05 item 5: the backlog figure is generated too (the
        # marker is required in COVERAGE.md; optional elsewhere).
        backlog_lines = [ln for ln in text if refresh_tallies.BACKLOG_MARKER in ln]
        if doc == "COVERAGE.md":
            assert backlog_lines, "COVERAGE.md lost its backlog-tally marker line"
        for ln in backlog_lines:
            assert ln == expected_backlog, (
                f"{doc} backlog figure is stale: run scripts/refresh_tallies.py "
                f"(doc: {ln!r}, live: {expected_backlog!r})"
            )
