"""Parameter-VARIED oracle parity for the round-16 operators.

The registered queries pin one knob setting each, so a code path the
default never takes (the autotune's no-qualifier max-fallback, the
token budget's availability cap, a different list count / walk shape)
could drift from its oracle without any gate noticing — parity at a
single point can be data luck (the r15 beam-search visited-set lesson).
Each test here runs engine and oracle at a NON-default setting chosen
to force the uncovered branch, through the same driver-identical
compare as test_oracle_parity."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMALL as SF  # noqa: E402
from tests.oracle_harness import compare, duckdb_con  # noqa: E402


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF)
    yield c
    c.close()


def _parity(spark_df, con, sql: str) -> None:
    problems = compare(spark_df, con.sql(sql).df())
    assert not problems, "; ".join(problems[:6])


def test_autotune_max_fallback_parity(spark, con):
    """target above 1.0 recall: NOTHING qualifies, so the loud
    max-fallback branch (coalesce -> max(nprobe)) is what both engines
    must agree on — the registered target (0.8) never exercises it."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import nprobe_autotune_sql

    target = 1_000_001  # recall_micro <= 1_000_000 by construction
    df = ann.ivf_nprobe_autotune(
        spark, SF, k=10, n_lists=7, target_recall_micro=target
    )
    _parity(df, con, nprobe_autotune_sql(
        k=10, n_lists=7, target_recall_micro=target
    ))
    rows = df.collect()
    assert not any(r["meets_target"] for r in rows)
    assert [r["nprobe"] for r in rows if r["chosen"]] == [
        max(r["nprobe"] for r in rows)
    ]


def test_token_budget_capped_branch_parity(spark, con):
    """A budget larger than the whole corpus caps EVERY domain: alloc ==
    n_tokens, capped true, fill_ppm == 1e6 — the least()/capped branch
    the default 500k budget never reaches at the gate corpora."""
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.sources.tables import load

    budget = 50_000_000
    df = textops.token_budget_fill(
        load(spark, SF, "documents"), budget_tokens=budget
    )
    _parity(df, con, textops.token_budget_fill_sql(budget_tokens=budget))
    rows = df.collect()
    assert rows and all(r["capped"] for r in rows)
    assert all(r["alloc_tokens"] == r["n_tokens"] for r in rows)
    assert all(r["fill_ppm"] == 1_000_000 for r in rows)


def test_token_budget_tiny_budget_parity(spark, con):
    """budget << |domains| * weights: every base is 0 and the whole
    allocation is decided by the largest-remainder ranks — the
    tie-break-order branch."""
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.sources.tables import load

    df = textops.token_budget_fill(
        load(spark, SF, "documents"), budget_tokens=7
    )
    _parity(df, con, textops.token_budget_fill_sql(budget_tokens=7))
    rows = df.collect()
    assert sum(r["alloc_tokens"] for r in rows) == 7  # nothing caps at 7
    assert all(r["alloc_tokens"] in (0, 1) for r in rows)


def test_list_split_other_n_lists_parity(spark, con):
    """n_lists=5: a different coarse fit, a different argmax list, and
    sub-center 1 lands on list 5 — the split algebra is generic, not
    tuned to the registered 7."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import ivf_list_split_sql

    _parity(
        ann.ivf_list_split(spark, SF, n_lists=5), con,
        ivf_list_split_sql(n_lists=5),
    )


def test_balance_audit_other_n_lists_parity(spark, con):
    """n_lists=13 on the small corpus: more lists than the quantizer can
    fill evenly — the kept-empty-lists contract under a setting where
    empties are plausible, not just theoretical."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import ivf_balance_audit_sql

    df = ann.ivf_balance_audit(spark, SF, n_lists=13)
    _parity(df, con, ivf_balance_audit_sql(n_lists=13))
    assert df.count() == 13  # every list id present, populated or not


def test_kmv_merge_other_key_parity(spark, con):
    """key=event_type (tiny cardinality at any SF): both slices stay in
    the n < K exact branch end-to-end — the opposite branch from the
    sf0.01 saturated pin in test_round16_ops."""
    from vector_db_service_spark.operators import sketches

    df = sketches.kmv_merge(spark, SF, key="event_type")
    _parity(df, con, sketches.kmv_merge_sql(key="event_type"))
    row = df.collect()[0]
    assert row["exact_distinct"] < sketches.KMV_K
    assert row["est_whole"] == float(row["exact_distinct"])


def test_degree_audit_other_m_parity(spark, con):
    """m=5: denser graph, different reciprocity — the audit algebra is
    parameter-generic."""
    from vector_db_service_spark.entrypoints import _graph_degree_audit_sql
    from vector_db_service_spark.operators import ann

    _parity(
        ann.graph_degree_audit(spark, SF, m=5), con,
        _graph_degree_audit_sql(m=5),
    )


def test_pca_project2d_short_chain_parity(spark, con):
    """rounds=8/rounds2=12 (vs the registered 64/96): the projection is
    exact for ANY chain length — the oracle unrolls exactly as many
    rounds as the engine iterates, so a mismatch here would mean the
    chains are coupled to the registered constants."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.sources.tables import embedding_dim

    dim = embedding_dim(SF)
    _parity(
        ann.pca_project2d(spark, SF, rounds=8, rounds2=12), con,
        ann.pca_project2d_sql(dim, rounds=8, rounds2=12),
    )


def test_beam_search_served_other_walk_parity(spark, con):
    """beam=4, rounds=3, k=6: a different trajectory through the SAME
    maintained graph — the served walk's parity is not specific to the
    registered (8, 2, 10) shape."""
    from vector_db_service_spark.entrypoints import _graph_beam_sql
    from vector_db_service_spark.streaming import pipeline as sp

    _parity(
        sp.beam_search_served(spark, SF, query_id=0, k=6, beam=4, rounds=3),
        con,
        _graph_beam_sql(query_id=0, k=6, beam=4, rounds=3, served=True),
    )


def test_refit_lifecycle_other_knobs_parity(spark, con):
    """k=5, nprobe=2: the chained lifecycle op serves from the refit
    store under a different serving contract and still hash-matches the
    zero-pinned-state oracle chain."""
    from vector_db_service_spark.oracles_quant import refit_recall_gain_sql
    from vector_db_service_spark.streaming import pipeline as sp

    _parity(
        sp.ivf_refit_lifecycle_recall(spark, SF, k=5, nprobe=2), con,
        refit_recall_gain_sql(k=5, n_lists=7, nprobe=2),
    )
