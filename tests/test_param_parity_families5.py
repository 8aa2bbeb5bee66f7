"""Parameter-varied oracle parity, batch 5: the last builders with
never-varied knobs — canonical-survivor dedup at another radius, the
triangle census on a denser graph, and link prediction at a different
neighborhood degree."""

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


def test_keep_canonical_tighter_radius_parity(spark, con):
    """max_hamming=2: smaller components, more survivors — the
    canonical-survivor rule is radius-generic. Labels computed fresh at
    the varied radius (the memoized labeling is radius-3)."""
    from vector_db_service_spark.operators import dedup
    from vector_db_service_spark.oracles_pipeline import (
        near_dup_keep_canonical_sql,
    )
    from vector_db_service_spark.sources.tables import load

    _parity(
        dedup.near_dup_keep_canonical(
            load(spark, SF, "documents"), max_hamming=2
        ),
        con,
        near_dup_keep_canonical_sql(max_hamming=2),
    )


def test_triangles_denser_graph_parity(spark, con):
    """m=4: more mutual edges, different wedge/triangle counts — the
    oriented two-hop census is degree-generic."""
    from vector_db_service_spark.entrypoints import _mutual_triangles_sql
    from vector_db_service_spark.operators import ann

    _parity(
        ann.mutual_knn_triangles(spark, SF, m=4), con,
        _mutual_triangles_sql(m=4),
    )


def test_link_prediction_denser_graph_parity(spark, con):
    """m=4 with a tighter cut: common-neighbor and Adamic-Adar scores
    over a different mutual graph."""
    from vector_db_service_spark.entrypoints import _knn_link_prediction_sql
    from vector_db_service_spark.operators import ann

    _parity(
        ann.knn_link_prediction(spark, SF, m=4, top=30), con,
        _knn_link_prediction_sql(m=4, top=30),
    )
