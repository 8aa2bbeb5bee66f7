"""Parameter-VARIED oracle parity across the OLDER operator families.

tests/test_round16_param_parity.py applies the varied-knob discipline to
the round-16 ops; the same parity-by-luck exposure exists for every
older branch-y operator whose registered query pins one knob setting
(the r15 beam-search visited-set bug hid behind exactly this). Each
test here re-runs an engine/oracle pair at a NON-default setting that
changes which code path carries the result — metric dispatch, radius /
threshold choices, greedy-selection extremes, chain lengths, key and
group columns — through the driver-identical compare."""

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


# --- index probes: other query / k / metric ------------------------------

def test_lsh_search_other_metric_parity(spark, con):
    """dot_product re-rank over the SAME signature probe — the metric
    dispatch inside the LSH path, not just cosine."""
    from vector_db_service_spark import oracles
    from vector_db_service_spark.entrypoints import _PLANES
    from vector_db_service_spark.operators import lsh as lsh_ops

    _parity(
        lsh_ops.search(spark, SF, query_id=7, k=5, metric="dot_product"),
        con,
        oracles.lsh_search_sql(_PLANES, query_id=7, k=5,
                               metric="dot_product"),
    )


def test_grid_search_other_metric_parity(spark, con):
    """manhattan re-rank + a different query's cell/radius trajectory."""
    from vector_db_service_spark import oracles
    from vector_db_service_spark.operators import grid as grid_ops

    _parity(
        grid_ops.search(spark, SF, query_id=3, k=15, metric="manhattan"),
        con,
        oracles.grid_search_sql(query_id=3, k=15, metric="manhattan"),
    )


def test_recall_sweep_other_shape_parity(spark, con):
    """n_lists=5, nprobes=(1,3,5), k=7: a different fit, different probe
    prefixes, different truth cut."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import recall_sweep_sql

    _parity(
        ann.ivf_kmeans_recall_sweep(
            spark, SF, k=7, n_lists=5, nprobes=(1, 3, 5)
        ),
        con,
        recall_sweep_sql(k=7, n_lists=5, nprobes=(1, 3, 5)),
    )


# --- dedup: other thresholds / radii / k ----------------------------------

def test_minhash_stricter_threshold_parity(spark, con):
    """threshold=0.5: the verify filter keeps a different pair set than
    the registered 0.2 — the band-candidate algebra is threshold-free,
    so only the exact-jaccard verdict moves."""
    from vector_db_service_spark.operators import dedup
    from vector_db_service_spark.oracles_pipeline import (
        minhash_near_dups_sql,
    )

    _parity(
        dedup.minhash_near_dups(_docs(spark), threshold=0.5), con,
        minhash_near_dups_sql(threshold=0.5),
    )


def test_simhash_tighter_radius_parity(spark, con):
    """max_hamming=1: the pigeonhole block join is lossless at EVERY
    radius <= 3, not only the registered 3."""
    from vector_db_service_spark.operators import dedup
    from vector_db_service_spark.oracles_pipeline import (
        simhash_near_dups_sql,
    )

    _parity(
        dedup.simhash_near_dups(_docs(spark), max_hamming=1), con,
        simhash_near_dups_sql(max_hamming=1),
    )


def test_ngram_jaccard_other_k_parity(spark, con):
    from vector_db_service_spark.operators import dedup
    from vector_db_service_spark.oracles_pipeline import (
        ngram_jaccard_topk_sql,
    )

    _parity(
        dedup.ngram_jaccard_topk(_docs(spark), k=7), con,
        ngram_jaccard_topk_sql(k=7),
    )


# --- retrieval: fusion shapes and the MMR extremes -------------------------

def test_rrf_other_pool_parity(spark, con):
    """list_k=10/k=5 on another query: both rank lists cut differently,
    the fusion constant unchanged."""
    from vector_db_service_spark.operators import retrieval

    _parity(
        retrieval.hybrid_rrf_search(spark, SF, query_id=3, list_k=10, k=5),
        con,
        retrieval.hybrid_rrf_sql(query_id=3, list_k=10, k=5),
    )


def test_mmr_pure_relevance_parity(spark, con):
    """lam=1.0 degenerates MMR to relevance top-k — the greedy chain
    must still replay exactly (every max_sim term multiplied by 0)."""
    from vector_db_service_spark.operators import retrieval

    df = retrieval.mmr_rerank(spark, SF, query_id=0, pool=10, k=4, lam=1.0)
    _parity(df, con, retrieval.mmr_sql(query_id=0, pool=10, k=4, lam=1.0))
    rows = sorted(df.collect(), key=lambda r: r["sel_order"])
    rels = [r["rel"] for r in rows]
    assert rels == sorted(rels, reverse=True)  # pure-relevance order


def test_mmr_pure_diversity_parity(spark, con):
    """lam=0.0: selection driven ONLY by -max_sim_to_selected — the
    opposite extreme, where the pairwise-similarity table decides
    everything after the first (tie-broken) pick."""
    from vector_db_service_spark.operators import retrieval

    _parity(
        retrieval.mmr_rerank(spark, SF, query_id=0, pool=10, k=4, lam=0.0),
        con,
        retrieval.mmr_sql(query_id=0, pool=10, k=4, lam=0.0),
    )


# --- text / sketch: other chain lengths, keys, groups ----------------------

def test_bpe_longer_chain_parity(spark, con):
    """n_merges=8: three more unrolled merge rounds than the registered
    5 — the train chain is length-generic on both engines."""
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.oracles_pipeline import (
        bpe_train_merges_sql,
    )

    _parity(
        textops.bpe_train_merges(_docs(spark), n_merges=8), con,
        bpe_train_merges_sql(n_merges=8),
    )


def test_chunking_other_window_parity(spark, con):
    """chunk_tokens=8 / overlap=2: a different stride (6 vs 12) and
    boundary arithmetic."""
    from vector_db_service_spark.operators import textops

    _parity(
        textops.chunk_documents(_docs(spark), chunk_tokens=8, overlap=2),
        con,
        textops.chunk_documents_sql(chunk_tokens=8, overlap=2),
    )


def test_bloom_other_nation_parity(spark, con):
    from vector_db_service_spark.operators import sketches

    _parity(
        sketches.bloom_join_prune(spark, SF, nation=3), con,
        sketches.bloom_join_prune_sql(nation=3),
    )


def test_hll_other_key_parity(spark, con):
    """key=event_type: far fewer distincts — the register table is
    mostly empty, a different estimate regime than user_id."""
    from vector_db_service_spark.operators import sketches

    _parity(
        sketches.hll_distinct(spark, SF, key="event_type"), con,
        sketches.hll_distinct_sql(key="event_type"),
    )


def test_quantile_hist_other_group_parity(spark, con):
    """group=user_id: many more groups, each with a sparser sketch."""
    from vector_db_service_spark.operators import sketches

    _parity(
        sketches.quantile_histogram(spark, SF, group="user_id"), con,
        sketches.quantile_histogram_sql(group="user_id"),
    )
