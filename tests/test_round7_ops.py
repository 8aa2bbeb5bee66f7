"""Semantics + plan-shape checks for the round-7 late additions
(dedup_substring_spans / dedup_semantic_keep / text_bpe_merge_pairs /
pipeline_quality_resample). Oracle parity runs in test_oracle_parity;
these pin the properties parity can't see: plan shape (no Python UDFs,
broadcast representative table, distinct-word reduction before pair
expansion) and the invariants the semantics guarantee (count bounds,
representative self-keep, deterministic draws).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_service_spark import entrypoints as E  # noqa: E402
from vector_db_service_spark.operators import ann, dedup, textops  # noqa: E402
from vector_db_service_spark.plans.inspect import explain_str as _plan  # noqa: E402
from vector_db_service_spark.sources.tables import load  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")


def test_substring_spans_bounds_and_no_python(spark):
    df = E.QUERIES["dedup_substring_spans"](spark, SF)
    assert "BatchEvalPython" not in _plan(df)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert 0.0 <= r.dup_span_frac <= 1.0
        assert r.is_flagged == (r.dup_span_frac >= 0.2)


def test_substring_spans_dup_is_symmetric(spark):
    # a duplicated span must appear in >= 2 docs, so the total count of
    # duplicated-span occurrences can never be 1
    docs = load(spark, SF, "documents")
    total = dedup.substring_span_stats(docs).agg(
        F.sum("n_dup_spans").alias("s")
    ).collect()[0].s
    assert total != 1


def test_semantic_keep_reps_keep_themselves(spark):
    rows = E.QUERIES["dedup_semantic_keep"](spark, SF).collect()
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.list_id, []).append(r)
        if r.vec_id == r.rep_id:
            assert r.keep, "representative must keep itself"
            assert abs(r.cos_to_rep - 1.0) < 1e-6 or r.cos_to_rep == 0.0
    for lid, members in by_cluster.items():
        reps = {m.rep_id for m in members}
        assert len(reps) == 1, f"cluster {lid} has {len(reps)} representatives"


def test_semantic_keep_broadcasts_reps(spark):
    plan = _plan(E.QUERIES["dedup_semantic_keep"](spark, SF))
    assert "BroadcastHashJoin" in plan, "representative table must broadcast"
    assert "BatchEvalPython" not in plan


def test_bpe_merge_pairs_are_two_chars_and_ordered(spark):
    rows = E.QUERIES["text_bpe_merge_pairs"](spark, SF).collect()
    assert len(rows) == 25
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r.pair) == 2
        assert r.n > 0


def test_quality_resample_rates_and_head_kept(spark):
    rows = E.QUERIES["pipeline_quality_resample"](spark, SF).collect()
    buckets = {r.ppl_bucket: r for r in rows}
    assert set(buckets) <= {"head", "middle", "tail"}
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert 0 <= r.kept_tokens <= r.n_tokens
    if "head" in buckets:
        h = buckets["head"]
        assert h.n_kept == h.n_docs, "ppm=1e6 must keep every head doc"
        assert h.target_rate == 1.0


def test_quality_resample_draw_is_stable(spark):
    a = {(r.ppl_bucket, r.n_kept) for r in
         E.QUERIES["pipeline_quality_resample"](spark, SF).collect()}
    b = {(r.ppl_bucket, r.n_kept) for r in
         textops.quality_resample(
             load(spark, SF, "documents").repartition(7)).collect()}
    assert a == b, "verdicts must not depend on partitioning"


def test_dsir_target_slice_scores_higher(spark):
    rows = E.QUERIES["text_dsir_importance"](spark, SF).collect()
    assert rows
    en = [r for r in rows if r.lang == "en"]
    other = [r for r in rows if r.lang != "en"]
    assert en and other
    rate = lambda rs: sum(1 for r in rs if r.is_target_like) / len(rs)
    assert rate(en) > rate(other), "target-slice docs must look more target-like"
    for r in rows:
        assert r.is_target_like == (r.log_ratio_mln >= 0)


def test_stream_resample_matches_batch_verdicts(spark):
    from vector_db_service_spark.operators.textops import resample_verdicts

    stream_rows = {
        (r.doc_id, r.ppl_bucket, r.keep)
        for r in E.QUERIES["stream_quality_resample"](spark, SF).collect()
    }
    batch_rows = {
        (r.doc_id, r.ppl_bucket, r.keep)
        for r in resample_verdicts(load(spark, SF, "documents")).collect()
    }
    assert stream_rows == batch_rows, "stream gate must equal batch verdicts"


def test_dataset_manifest_sig_is_order_independent(spark):
    from vector_db_service_spark.operators.textops import dataset_manifest

    a = {(r.source, r.lang): r.content_sig for r in
         E.QUERIES["pipeline_dataset_manifest"](spark, SF).collect()}
    b = {(r.source, r.lang): r.content_sig for r in
         dataset_manifest(
             load(spark, SF, "documents").repartition(13)).collect()}
    assert a == b, "content signature must not depend on partitioning"
