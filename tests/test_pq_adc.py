"""PQ-ADC serving path (round-2 VERDICT next #2): the ADC top-k over
seeded PQ codes must agree with the exact euclidean top-k to a pinned
recall, and the training guards must survive degenerate corpora.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_db_service_spark.operators import ann, knn
from vector_db_service_spark.sources.tables import load

SF_001 = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_001), reason="sf0.01 testdata absent")
def test_pq_adc_recall_vs_exact(spark):
    exact = knn.knn_distance(spark, SF_001, query_id=0, k=10, metric="euclidean")
    e = {r["vec_id"] for r in exact.collect()}
    # canonical codebooks => deterministic; measured overlap on the
    # structureless synthetic corpus: 8/10 at rerank=200 (the registered
    # operating point), 10/10 at rerank=300 — the rerank knob is the
    # recall dial, so pin both points
    a200 = {r["vec_id"] for r in
            ann.pq_topk(spark, SF_001, query_id=0, k=10, n_subvectors=8).collect()}
    assert len(a200 & e) >= 8, (sorted(a200), sorted(e))
    a300 = {r["vec_id"] for r in
            ann.pq_topk(spark, SF_001, query_id=0, k=10, n_subvectors=8,
                        rerank=300).collect()}
    assert len(a300 & e) >= 9, (sorted(a300), sorted(e))


def test_pq_adc_orders_by_exact_distance(spark, sf_dir):
    rows = ann.pq_topk(spark, sf_dir, query_id=0, k=5, n_subvectors=4).collect()
    assert len(rows) == 5
    assert rows[0]["vec_id"] == 0 and rows[0]["dist_us"] == 0  # self-match first
    dists = [r["dist_us"] for r in rows]
    assert dists == sorted(dists)


def test_ivfpq_recall_vs_exact(spark):
    """The composed IVF-PQ serving path: with nprobe=4 of n_lists=7 the
    probed lists cover ~4/7 of the structureless corpus, and the exact
    re-rank keeps ordering honest — the self-match must survive routing
    and the result must order by exact distance."""
    approx = ann.ivfpq_topk(spark, SF_001, query_id=0, k=10)
    exact = knn.knn_distance(spark, SF_001, query_id=0, k=10, metric="euclidean")
    rows = approx.collect()
    assert len(rows) == 10
    a = {r["vec_id"] for r in rows}
    e = {r["vec_id"] for r in exact.collect()}
    assert 0 in a, "self-match pruned by IVF routing"
    assert rows[0]["vec_id"] == 0 and rows[0]["dist_us"] == 0
    dists = [r["dist_us"] for r in rows]
    assert dists == sorted(dists)
    # deterministic seeded pipeline => stable measured overlap; on the
    # structureless synthetic corpus routing keeps ~nprobe/n_lists of
    # the true top-k, so require at least half
    assert len(a & e) >= 5, (sorted(a), sorted(e))


def test_pq_train_guards(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    # clamp: asking for more centroids than sample rows must not raise
    few = emb.limit(5)
    codebooks, sub_dim = ann._pq_train(few, n_subvectors=4, codebook_k=16, train_pct=100)
    assert all(len(cb) == 5 for cb in codebooks)
    # empty corpus raises a clear error
    with pytest.raises(ValueError, match="empty"):
        ann._pq_train(emb.limit(0), n_subvectors=4, codebook_k=16, train_pct=100)
    # empty hash bucket falls back to the whole corpus
    codebooks, _ = ann._pq_train(few, n_subvectors=4, codebook_k=4, train_pct=0)
    assert all(len(cb) == 4 for cb in codebooks)


def test_pq_train_cap_deterministic(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    a, _ = ann._pq_train(emb, n_subvectors=4, codebook_k=8, train_pct=50, train_cap=40)
    b, _ = ann._pq_train(
        emb.repartition(7), n_subvectors=4, codebook_k=8, train_pct=50, train_cap=40
    )
    import numpy as np

    for ca, cb in zip(a, b):
        assert np.allclose(ca, cb)
