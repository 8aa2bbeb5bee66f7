"""Retrieval-family semantics: MMR actually diversifies, RRF actually
fuses, BM25 behaves like BM25 (more occurrences => higher score at equal
length; absent terms contribute zero).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_service_spark.operators import retrieval  # noqa: E402
from vector_db_service_spark.sources.tables import load  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")


def test_mmr_first_pick_is_top_relevance_and_no_repeats(spark):
    out = retrieval.mmr_rerank(spark, SF, query_id=0, pool=20, k=5).collect()
    assert len(out) == 5
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == 5
    # first selection is the pure-relevance argmax (self hit: vec 0)
    by_order = sorted(out, key=lambda r: r["sel_order"])
    assert by_order[0]["rel"] == max(r["rel"] for r in out)
    # diversification: MMR scores are non-increasing in selection order
    scores = [r["mmr_score"] for r in by_order]
    assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_mmr_diversifies_vs_plain_topk(spark):
    """The MMR selection's average pairwise similarity must not exceed
    the plain top-k's — that's the entire point of the operator."""
    out = retrieval.mmr_rerank(spark, SF, query_id=0, pool=20, k=5).collect()
    sel = [r["vec_id"] for r in out]
    emb = {
        r["vec_id"]: list(r["embedding"])
        for r in load(spark, SF, "embeddings").collect()
    }
    from vector_db_service_spark.operators.knn import knn

    topk = [r["vec_id"] for r in knn(spark, SF, query_id=0, k=5).collect()]

    def avg_pair_sim(ids):
        sims = [
            retrieval._cos_seq(emb[a], emb[b])
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
        ]
        return sum(sims) / len(sims)

    assert avg_pair_sim(sel) <= avg_pair_sim(topk) + 1e-9


def test_rrf_rewards_presence_in_both_lists(spark):
    out = retrieval.hybrid_rrf_search(spark, SF, query_id=0, list_k=20, k=10).collect()
    both = [r for r in out if r["vec_rank"] is not None and r["kw_rank"] is not None]
    only = [r for r in out if r["vec_rank"] is None or r["kw_rank"] is None]
    if both and only:
        assert min(r["rrf_score"] for r in both) > 0
        # a doc in both lists always beats a doc present in one list at
        # an equal-or-worse rank position
        worst_both = min(both, key=lambda r: r["rrf_score"])
        assert worst_both["rrf_score"] >= 1.0 / (retrieval.RRF_C + 20)


def test_bm25_monotone_in_term_frequency(spark):
    docs = spark.createDataFrame(
        [
            (1, "vector vector vector pad pad pad"),
            (2, "vector pad pad pad pad pad"),
            (3, "pad pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bm25"] for r in retrieval.bm25_scores(docs).collect()}
    assert rows[1] > rows[2] > rows[3] == 0.0


def test_prefiltered_knn_empty_filter_returns_zero_rows(spark):
    from vector_db_service_spark.operators.knn import knn_prefiltered

    out = knn_prefiltered(spark, SF, query_id=0, k=10, lang="zz")
    assert out.count() == 0  # empty candidate set short-circuits, no error


def test_prefiltered_knn_validates_k(spark):
    import pytest

    from vector_db_service_spark.operators.knn import knn_prefiltered

    with pytest.raises(ValueError):
        knn_prefiltered(spark, SF, query_id=0, k=0)


def test_mmr_pool_smaller_than_k(spark):
    out = retrieval.mmr_rerank(spark, SF, query_id=0, pool=3, k=5).collect()
    assert len(out) == 3  # degrades to the pool size, never errors
