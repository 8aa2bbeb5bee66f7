"""Parameter-varied oracle parity, batch 2: the kNN / quantization /
graph families. Same rationale as test_param_parity_families.py — every
registered query pins one knob setting, so the settings the registry
never takes (other metrics, subvector splits, probe counts, graph
degrees, walk lengths, filter values) get their own driver-identical
compare here."""

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


def test_knn_flat_other_metric_k_parity(spark, con):
    """manhattan at k=25 on another query — the flat path's metric
    dispatch and a deeper top-k cut."""
    from vector_db_service_spark import oracles
    from vector_db_service_spark.operators import knn as knn_ops

    _parity(
        knn_ops.knn(spark, SF, query_id=11, k=25, metric="manhattan"),
        con,
        oracles.knn_sql(query_id=11, k=25, metric="manhattan"),
    )


def test_knn_hydrated_other_k_parity(spark, con):
    """hydration join at k=3 on another query — the J1 inner join under
    a different neighbor set."""
    from vector_db_service_spark import oracles
    from vector_db_service_spark.operators import knn as knn_ops

    _parity(
        knn_ops.knn(spark, SF, query_id=5, k=3, metric="cosine",
                    hydrate=True),
        con,
        oracles.knn_sql(query_id=5, k=3, metric="cosine", hydrate=True),
    )


def test_product_quantize_coarser_split_parity(spark, con):
    """n_subvectors=2 (sub_dim=32): half the codebooks over wider
    sub-spaces — the split arithmetic is shape-generic."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import product_quantize_sql
    from vector_db_service_spark.sources.tables import embedding_dim

    dim = embedding_dim(SF)
    _parity(
        ann.product_quantize(spark, SF, n_subvectors=2, codebook_k=16),
        con,
        product_quantize_sql(n_subvectors=2, sub_dim=dim // 2),
    )


def test_pq_topk_other_shape_parity(spark, con):
    """ADC serving with n_subvectors=4 and a tighter re-rank budget."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import pq_topk_sql
    from vector_db_service_spark.sources.tables import embedding_dim

    dim = embedding_dim(SF)
    _parity(
        ann.pq_topk(spark, SF, query_id=3, k=5, n_subvectors=4, rerank=50),
        con,
        pq_topk_sql(query_id=3, k=5, n_subvectors=4, sub_dim=dim // 4,
                    rerank=50),
    )


def test_ivfpq_topk_other_probe_parity(spark, con):
    """The composed path at nprobe=2 / rerank=100: different routing
    fraction, different ADC survivor pool."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import ivfpq_topk_sql

    _parity(
        ann.ivfpq_topk(spark, SF, query_id=2, k=8, nprobe=2, rerank=100),
        con,
        ivfpq_topk_sql(query_id=2, k=8, nprobe=2, rerank=100),
    )


def test_cluster_silhouette_other_k_parity(spark, con):
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import cluster_silhouette_sql

    _parity(
        ann.cluster_silhouette(spark, SF, n_lists=5), con,
        cluster_silhouette_sql(n_lists=5),
    )


def test_mutual_pairs_denser_graph_parity(spark, con):
    from vector_db_service_spark.entrypoints import _mutual_knn_sql
    from vector_db_service_spark.operators import ann

    _parity(
        ann.mutual_knn_pairs(spark, SF, m=4), con, _mutual_knn_sql(m=4)
    )


def test_mutual_components_denser_graph_parity(spark, con):
    """m=4: more mutual edges, different component structure — the
    pointer-jumping contraction is degree-generic."""
    from vector_db_service_spark.entrypoints import _mutual_components_sql
    from vector_db_service_spark.operators import ann

    _parity(
        ann.mutual_knn_components(spark, SF, m=4), con,
        _mutual_components_sql(m=4),
    )


def test_pagerank_other_walk_parity(spark, con):
    """rounds=2, top=15: a shorter power iteration and a different cut —
    the unrolled rank chain is length-generic on both engines."""
    from vector_db_service_spark.entrypoints import _mutual_pagerank_sql
    from vector_db_service_spark.operators import ann

    _parity(
        ann.mutual_knn_pagerank(spark, SF, m=3, rounds=2, top=15), con,
        _mutual_pagerank_sql(m=3, rounds=2, top=15),
    )


def test_link_prediction_other_cut_parity(spark, con):
    from vector_db_service_spark.entrypoints import _knn_link_prediction_sql
    from vector_db_service_spark.operators import ann

    _parity(
        ann.knn_link_prediction(spark, SF, m=3, top=20), con,
        _knn_link_prediction_sql(m=3, top=20),
    )


def test_ivf_multi_query_other_serving_parity(spark, con):
    """A 5-query batch at k=5 / nprobe=2 — different probe maps and a
    different per-query cut than the registered 10-query serving."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import ivf_multi_query_sql

    _parity(
        ann.ivf_multi_query_topk(
            spark, SF, query_ids=[0, 1, 2, 3, 4], k=5, nprobe=2
        ),
        con,
        ivf_multi_query_sql(query_ids=(0, 1, 2, 3, 4), k=5, nprobe=2),
    )


def test_ivf_filtered_other_lang_parity(spark, con):
    """lang=de at nprobe=2: a different selectivity composed with a
    different probe fraction."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import ivf_filtered_sql

    _parity(
        ann.ivf_filtered_topk(spark, SF, k=10, nprobe=2, lang="de"), con,
        ivf_filtered_sql(k=10, nprobe=2, lang="de"),
    )


def test_knn_classify_other_k_parity(spark, con):
    """k=3 votes: different majorities, same tie-break contract."""
    from vector_db_service_spark.entrypoints import _knn_classify_sql
    from vector_db_service_spark.operators import ann

    _parity(
        ann.knn_classify(spark, SF, k=3), con,
        _knn_classify_sql(n_queries=25, k=3),
    )


def test_pca_power_iteration_short_chain_parity(spark, con):
    """rounds=16 (vs the registered 64): the unrolled chain length is a
    free parameter on both engines."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.sources.tables import embedding_dim

    dim = embedding_dim(SF)
    _parity(
        ann.pca_power_iteration(spark, SF, rounds=16), con,
        ann.pca_power_iteration_sql(dim=dim, rounds=16),
    )


def test_dsir_other_target_parity(spark, con):
    """target_lang=de: the importance model retrained toward another
    domain — the LM ratio algebra is target-generic."""
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.oracles_pipeline import dsir_importance_sql
    from vector_db_service_spark.sources.tables import load

    _parity(
        textops.dsir_importance(load(spark, SF, "documents"),
                                target_lang="de"),
        con,
        dsir_importance_sql(target_lang="de"),
    )
