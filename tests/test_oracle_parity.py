"""Run every queries() entry against its oracle_sql() via DuckDB —
the same check the driver performs at sf0.01 (exact value equality)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: F811  (re-import keeps the module self-contained)

import __spark_entry__ as entry_mod  # noqa: E402
from tests.oracle_harness import compare, duckdb_con  # noqa: E402

# the all-registry parity compare IS the smoke tier's core (r17): the
# driver-identical exact-equality check over every registered query
pytestmark = pytest.mark.smoke

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")

# Oracles whose pinned fitted-state literals are scoped to a specific
# corpus (the driver's sf0.01 gate) — parity for these must run at that
# scale regardless of SPARK_GRAFT_SF_ORACLE (see mllib_index
# .IVF_KMEANS_CENTERS_SF001; the pin itself is tested in
# tests/test_mllib_oracles.py).
_PINNED_SF = {
    "mllib_ivf_kmeans_topk": "/root/testdata/sf0.01",
    # same pinned-centers precondition (r14)
    "stream_ivf_maintenance": "/root/testdata/sf0.01",
    # pinned OLD centers feed the pre-refit leg (r15)
    "stream_ivf_refit": "/root/testdata/sf0.01",
}

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF)
    yield c
    c.close()


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    sf = _PINNED_SF.get(name, SF)
    if sf != SF:
        # FAIL, not skip: the pinned oracle stays registered whether or
        # not its corpus is present, so a silent skip would leave it
        # unverified with no signal — any consumer running the registry
        # at another SF would then hit an unexplained mismatch.
        assert os.path.isdir(sf), (
            f"{name}: pinned corpus {sf} is ABSENT but its corpus-scoped "
            "oracle is still registered; restore the corpus or unregister "
            "the pinned oracle (mllib_index.IVF_KMEANS_CENTERS_SF001)"
        )
        pinned_con = duckdb_con(sf)
        try:
            sdf = QUERIES[name](spark, sf)
            odf = pinned_con.sql(ORACLES[name]).df()
            problems = compare(sdf, odf)
        finally:
            pinned_con.close()
    else:
        sdf = QUERIES[name](spark, SF)
        odf = con.sql(ORACLES[name]).df()
        problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems[:6])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_smoke(spark, name):
    """Queries without a SQL-expressible oracle (MLlib seeded hashes) get
    the driver's weaker rows-only check: they must run and be stable."""
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_blocked_pair_recall_cap_engages_identically(spark, con):
    """The default sample_cap never triggers at test scales (pct stays at
    sample_pct), so plain parity doesn't prove the cap arithmetic. Force
    it with a tiny cap: the effective pct must shrink BELOW sample_pct on
    both sides via the same integer-ceil formula, and the two sides must
    still select the exact same sample (value parity on the report)."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark import oracles_pipeline as opl
    from vector_db_service_spark.sources.tables import load

    n = load(spark, SF, "embeddings").count()
    cap = max(1, n // 10)  # guaranteed < 50% of the corpus
    expect_pct = min(50, max(1, (100 * cap + n - 1) // n))
    assert expect_pct < 50, "cap too large to engage at this scale"

    dim = load(spark, SF, "embeddings").select("embedding").head()[0]
    sdf = ann.blocked_pair_recall(spark, SF, threshold=0.3, sample_cap=cap)
    odf = con.sql(
        opl.blocked_pair_recall_sql(threshold=0.3, dim=len(dim), sample_cap=cap)
    ).df()
    problems = compare(sdf, odf)
    assert not problems, "; ".join(problems[:6])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0
