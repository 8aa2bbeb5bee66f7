"""Parameter-varied oracle parity, batch 4: recall audits, hygiene
filters with custom policies, and a streaming query workload at another
serving shape."""

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


def _docs(spark):
    from vector_db_service_spark.sources.tables import load

    return load(spark, SF, "documents")


def test_brute_force_other_metric_batch_parity(spark, con):
    """A different query batch at k=3 under euclidean — the exact
    multi-query path's metric dispatch."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_pipeline import (
        brute_force_topk_sql,
    )

    _parity(
        ann.brute_force_topk(
            spark, SF, query_ids=[5, 6, 7, 8, 9], k=3, metric="euclidean"
        ),
        con,
        brute_force_topk_sql(query_ids=[5, 6, 7, 8, 9], k=3,
                             metric="euclidean"),
    )


def test_index_recall_report_other_probe_parity(spark, con):
    """nprobe=3 / k=5: a different IVF leg and a different overlap cut
    in the three-way recall audit."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_pipeline import (
        index_recall_report_sql,
    )
    from vector_db_service_spark.sources.tables import embedding_dim

    _parity(
        ann.index_recall_report(spark, SF, k=5, nprobe=3), con,
        index_recall_report_sql(k=5, nprobe=3, dim=embedding_dim(SF)),
    )


def test_blocked_pair_recall_other_threshold_parity(spark, con):
    """threshold=0.45: a different exact-pair truth set over the same
    deterministic sample."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_pipeline import (
        blocked_pair_recall_sql,
    )
    from vector_db_service_spark.sources.tables import embedding_dim

    _parity(
        ann.blocked_pair_recall(spark, SF, threshold=0.45), con,
        blocked_pair_recall_sql(threshold=0.45, dim=embedding_dim(SF)),
    )


def test_blocklist_custom_policy_parity(spark, con):
    """A different term list and a stricter permille cut — the filter
    is policy-generic (the redaction rewrite must track the terms)."""
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.oracles_pipeline import blocklist_filter_sql

    terms = ("order", "pending", "fast")
    _parity(
        textops.blocklist_filter(_docs(spark), terms=terms,
                                 max_permille=50),
        con,
        blocklist_filter_sql(terms=terms, max_permille=50),
    )


def test_quality_resample_custom_rates_parity(spark, con):
    """Custom acceptance ppms: middle kept at 1/4, tail at 1/20 — the
    deterministic-draw gate under another resampling policy."""
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.oracles_pipeline import quality_resample_sql

    rates = {"head": 1_000_000, "middle": 250_000, "tail": 50_000}
    _parity(
        textops.quality_resample(_docs(spark), accept_ppm=rates), con,
        quality_resample_sql(accept_ppm=rates),
    )


def test_knn_query_stream_other_workload_parity(spark, con):
    """The streaming search endpoint serving a different request log at
    k=3 — the stream-static join result must equal the brute-force
    oracle for exactly those queries."""
    from vector_db_service_spark.oracles_pipeline import (
        brute_force_topk_sql,
    )
    from vector_db_service_spark.streaming import pipeline as sp

    _parity(
        sp.knn_query_stream(spark, SF, query_ids=[2, 4, 6], k=3), con,
        brute_force_topk_sql(query_ids=[2, 4, 6], k=3),
    )


def test_session_windows_other_gap_parity(spark, con):
    """gap='15 minutes': every session boundary moves — the engine's
    gap parameter must generalize. The oracle is the registered SQL
    with its 30-minute microsecond constant (1800000000) rewritten to
    15 minutes; the session algebra itself is unchanged."""
    import __spark_entry__ as entry_mod
    from vector_db_service_spark.streaming import pipeline as sp

    sql = entry_mod.oracle_sql()["stream_session_windows"]
    assert sql.count("1800000000") == 3  # gap appears as split/close/wm
    _parity(
        sp.session_window_counts(spark, SF, gap="15 minutes"), con,
        sql.replace("1800000000", "900000000"),
    )
