"""Resilience semantics of the embedding source (round-2 VERDICT next
#6, reference embedding_service.py:103-229): retried batches converge,
exhausted batches quarantine without killing the pass, quarantined rows
surface in the validation report, and the query/document input_type
asymmetry is real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_service_spark.operators import embed_source
from vector_db_service_spark.operators.embed_source import default_encoder
from vector_db_service_spark.sources.tables import load


# NOTE: encoders are defined INSIDE tests — local defs are cloudpickled
# by value, so Spark workers don't need tests/ on their module path.


def make_flaky_encoder(fails: int):
    """Fails the first `fails` calls per sub-batch, then succeeds —
    models transient rate-limit/5xx errors. Per-task closure state means
    the counter survives retries of the same batch."""
    calls: dict = {}

    def _enc(texts):
        key = texts[0] if texts else ""
        n = calls.get(key, 0)
        calls[key] = n + 1
        if n < fails:
            raise RuntimeError("transient model error")
        return default_encoder(texts)

    return _enc


def make_poison_encoder():
    """Permanently fails any batch containing a poison marker."""

    def _enc(texts):
        if any("POISON" in t for t in texts):
            raise RuntimeError("permanent model error")
        return default_encoder(texts)

    return _enc


def test_retried_batches_converge(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(20)
    out = embed_source.embed_resilient(
        docs, encoder=make_flaky_encoder(2), max_retries=3, backoff_base_s=0.0
    ).collect()
    assert len(out) == 20
    assert all(r["status"] == "ok" for r in out)
    # every batch needed exactly 3 attempts (2 transient failures)
    assert all(r["attempts"] == 3 for r in out)
    # and the retried result equals the default-encoder result
    clean = embed_source.embed_resilient(docs).collect()
    assert {(r["doc_id"], r["e0"]) for r in out} == {(r["doc_id"], r["e0"]) for r in clean}


def test_batch_failure_isolation(spark):
    docs = spark.createDataFrame(
        [(i, "POISON text" if i < 4 else f"clean document number {i}")
         for i in range(12)],
        "doc_id long, text string",
    ).coalesce(1).sortWithinPartitions("doc_id")
    out = embed_source.embed_resilient(
        docs, encoder=make_poison_encoder(), max_retries=2, batch_size=4
    ).collect()
    by_status = {r["doc_id"]: r["status"] for r in out}
    # the poisoned sub-batch quarantines; the clean batches proceed
    assert [by_status[i] for i in range(4)] == ["failed"] * 4
    assert [by_status[i] for i in range(4, 12)] == ["ok"] * 8
    failed = [r for r in out if r["status"] == "failed"]
    assert all(r["e0"] is None and r["attempts"] == 2 for r in failed)


def test_quarantine_surfaces_in_validation_report(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "POISON text" if i == 0 else f"clean document number {i}", 10)
         for i in range(8)],
        "doc_id long, text string, n_chars int",
    )
    docs.withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    row = embed_source.validation_report(
        spark, str(tmp_path), encoder=make_poison_encoder()
    ).head()
    assert row["total_docs"] == 8
    assert row["n_embed_failed"] > 0
    # default encoder: nothing quarantined, single attempt
    clean = embed_source.validation_report(spark, str(tmp_path)).head()
    assert clean["n_embed_failed"] == 0
    assert clean["max_embed_attempts"] == 1


def test_input_type_asymmetry(spark, sf_dir):
    rows = embed_source.embed_asymmetry(spark, sf_dir).collect()
    assert len(rows) > 0
    # the two encoders must actually differ: most documents' encodings
    # are not identical (cos < 1)
    n_diff = sum(1 for r in rows if r["cos_dq"] < 0.999999)
    assert n_diff > len(rows) * 0.9, f"{n_diff}/{len(rows)}"
    # and the pandas-side query encoder agrees with the JVM expression
    some = {r["doc_id"]: r["q0"] for r in rows}
    docs = load(spark, sf_dir, "documents").limit(50)
    pandas_side = embed_source.embed_resilient(
        docs, input_type="search_query"
    ).collect()
    for r in pandas_side:
        assert some[r["doc_id"]] == pytest.approx(r["e0"], abs=1e-9), r["doc_id"]
