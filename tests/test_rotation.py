"""The committed rotation must equal a fresh computation from the
committed CORRECTNESS history (r15 verdict #1: hand-maintained rotation
narratives drifted from the artifacts; now the artifact IS the
narrative)."""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fresh():
    import importlib.util

    from vector_db_service_spark import entrypoints, rotationlib

    spec = importlib.util.spec_from_file_location(
        "gen_status", os.path.join(_REPO, "scripts", "gen_status.py")
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    hist, latest = rotationlib.correctness_history(_REPO)
    pri = rotationlib.priority_order(
        list(entrypoints.QUERIES), hist,
        changed=gen.CHANGED_THIS_ROUND, head=50,
    )
    return pri, hist, latest


def test_committed_rotation_matches_fresh_computation():
    from vector_db_service_spark.rotation_generated import PRIORITY_50

    pri, _, _ = _fresh()
    assert PRIORITY_50 == pri, (
        "rotation_generated.py is stale — run scripts/gen_status.py"
    )


def test_rotation_head_shape():
    from vector_db_service_spark import entrypoints
    from vector_db_service_spark.rotation_generated import PRIORITY_50

    assert len(PRIORITY_50) == 50
    assert len(set(PRIORITY_50)) == 50
    missing = [n for n in PRIORITY_50 if n not in entrypoints.QUERIES]
    assert not missing, f"priority names not registered: {missing}"
    # the registry order actually starts with the head (the driver
    # samples the FIRST 50 registered queries)
    assert list(entrypoints.QUERIES)[:50] == PRIORITY_50


def test_staleness_ceiling_honored_when_it_fits():
    """Every query that would hit the staleness ceiling at the NEXT
    round must be in the computed head (unless the over-ceiling cohort
    plus the mandatory never/changed tiers genuinely exceed 50 — then
    the overflow is the documented debt, not a silent omission)."""
    from vector_db_service_spark import rotationlib
    from vector_db_service_spark.rotation_generated import PRIORITY_50

    pri, hist, latest = _fresh()
    next_round = latest + 1
    over = {
        n
        for n in hist
        if next_round - hist[n] >= rotationlib.STALENESS_CEILING
    }
    over &= set(
        __import__(
            "vector_db_service_spark.entrypoints", fromlist=["QUERIES"]
        ).QUERIES
    )
    missed = over - set(PRIORITY_50)
    if missed:
        never = [n for n in PRIORITY_50 if n not in hist]
        assert len(never) + len(over) > 50, (
            f"ceiling cohort fits but is not fully sampled: {sorted(missed)}"
        )
