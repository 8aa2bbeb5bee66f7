"""§2.13 observability surface: service status composition and the
SearchResponse/search_time_ms analog (reference main.py:121-144,
schemas/search_schema.py:36). Oracle parity for the deterministic
queries is covered by test_oracle_parity; these tests pin the
nondeterministic pieces and the response contract."""

from __future__ import annotations

from vector_db_service_spark.operators import observability

from conftest import SF_SMALL


def test_timed_search_contract(spark):
    out = observability.timed_search(spark, SF_SMALL, query_id=0, k=10)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.total_found == 10
    assert r.search_time_ms > 0.0
    assert r.similarity_function == "cosine"
    assert r.best_score is not None and -1.0 <= r.best_score <= 1.0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "library_id", "k", "similarity_function",
        "total_found", "best_score", "search_time_ms",
    ]


def test_timed_search_library_scoped(spark):
    out = observability.timed_search(spark, SF_SMALL, query_id=0, k=5, library=2).collect()[0]
    assert out.library_id == 2
    assert out.total_found == 5


def test_service_status_sections(spark):
    df = observability.service_status(spark, SF_SMALL)
    rows = df.collect()
    sections = {r.section for r in rows}
    assert sections == {"status", "storage_stats", "memory_usage", "indexes_info"}
    by_metric = {(r.section, r.label, r.metric): r.value for r in rows}
    n_libs = by_metric[("status", -1, "libraries_indexed")]
    # per-library rows: one (n_vectors, dim) pair per indexed library
    lib_rows = [r for r in rows if r.section == "indexes_info"]
    assert len(lib_rows) == 2 * n_libs
    total = by_metric[("storage_stats", -1, "total_vectors")]
    assert sum(r.value for r in lib_rows if r.metric == "n_vectors") == total
