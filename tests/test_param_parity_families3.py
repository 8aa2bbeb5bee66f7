"""Parameter-varied oracle parity, batch 3: hygiene / split / sketch /
streaming-ingest families. Same discipline as batches 1-2 — settings
the registry never pins get their own driver-identical compare."""

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


def test_decontamination_other_ngram_parity(spark, con):
    """n=3 / holdout_mod=11 / threshold=0.10: shorter grams, a bigger
    holdout slice, a stricter flag line."""
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.oracles_pipeline import decontamination_sql

    _parity(
        textops.decontamination(
            _docs(spark), n=3, holdout_mod=11, threshold=0.10
        ),
        con,
        decontamination_sql(n=3, holdout_mod=11, threshold=0.10),
    )


def test_winnowing_wider_window_parity(spark, con):
    """window=6: sparser fingerprints under the same minimum-selection
    guarantee."""
    from vector_db_service_spark.operators import dedup
    from vector_db_service_spark.oracles_pipeline import (
        winnowing_fingerprints_sql,
    )

    _parity(
        dedup.winnowing_fingerprints(_docs(spark), window=6), con,
        winnowing_fingerprints_sql(window=6),
    )


def test_leakage_split_other_pct_parity(spark, con):
    """val_pct=20: a different component-bucket boundary."""
    from vector_db_service_spark.operators import dedup
    from vector_db_service_spark.oracles_pipeline import (
        leakage_safe_split_sql,
    )

    _parity(
        dedup.leakage_safe_split(
            _docs(spark), val_pct=20,
            labels=dedup.near_dup_labels_cached(spark, SF),
        ),
        con,
        leakage_safe_split_sql(val_pct=20),
    )


def test_train_val_split_other_pcts_parity(spark, con):
    """val=15/test=10: different bucket boundaries, same frozen key."""
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.oracles_pipeline import train_val_split_sql

    _parity(
        textops.train_val_split(_docs(spark), val_pct=15, test_pct=10),
        con,
        train_val_split_sql(val_pct=15, test_pct=10),
    )


def test_sequence_packing_small_cap_parity(spark, con):
    """cap=64: four times as many sequences, more straddlers — the
    boundary arithmetic is cap-generic."""
    from vector_db_service_spark.operators import textops

    _parity(
        textops.sequence_packing(_docs(spark), cap=64), con,
        textops.sequence_packing_sql(cap=64),
    )


def test_substring_spans_other_shape_parity(spark, con):
    """n=7 / flag_threshold=0.1: longer spans, a stricter dup-share
    flag."""
    from vector_db_service_spark.operators import dedup
    from vector_db_service_spark.oracles_pipeline import (
        substring_span_stats_sql,
    )

    _parity(
        dedup.substring_span_stats(_docs(spark), n=7, flag_threshold=0.1),
        con,
        substring_span_stats_sql(n=7, flag_threshold=0.1),
    )


def test_repetition_scores_more_sizes_parity(spark, con):
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.oracles_pipeline import (
        repetition_scores_sql,
    )

    _parity(
        textops.repetition_scores(_docs(spark), sizes=(2, 3, 4)), con,
        repetition_scores_sql(sizes=(2, 3, 4)),
    )


def test_bpe_merge_pairs_other_k_parity(spark, con):
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.oracles_pipeline import bpe_merge_pairs_sql

    _parity(
        textops.bpe_merge_pairs(_docs(spark), k=10), con,
        bpe_merge_pairs_sql(k=10),
    )


def test_embedding_near_dups_other_threshold_parity(spark, con):
    """threshold=0.45 (vs the registered 0.3): a stricter cosine verify
    over the same blocked candidates."""
    from vector_db_service_spark.operators import dedup
    from vector_db_service_spark.oracles_pipeline import (
        embedding_near_dups_sql,
    )
    from vector_db_service_spark.sources.tables import (
        embedding_dim,
        load,
        row_count,
    )

    dim = embedding_dim(SF)
    _parity(
        dedup.embedding_near_dups(
            load(spark, SF, "embeddings"), threshold=0.45,
            n_rows=row_count(SF, "embeddings"), dim=dim,
        ),
        con,
        embedding_near_dups_sql(threshold=0.45, dim=dim),
    )


def test_near_dup_components_tighter_radius_parity(spark, con):
    """max_hamming=2: fewer edges, more components — the contraction
    replay is radius-generic."""
    from vector_db_service_spark.operators import dedup
    from vector_db_service_spark.oracles_pipeline import (
        near_dup_components_sql,
    )

    _parity(
        dedup.near_dup_components(_docs(spark), max_hamming=2), con,
        near_dup_components_sql(max_hamming=2),
    )


def test_ivf_label_cell_other_probe_parity(spark, con):
    """The label-cell IVF at nprobe=3 on another query."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_pipeline import ivf_topk_sql

    _parity(
        ann.ivf_topk(spark, SF, query_id=4, k=10, nprobe=3), con,
        ivf_topk_sql(query_id=4, k=10, nprobe=3),
    )


def test_matryoshka_other_truncations_parity(spark, con):
    """trunc_dims=(8, 48): other prefix lengths of the same embeddings."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_pipeline import (
        matryoshka_recall_sql,
    )

    _parity(
        ann.matryoshka_recall(spark, SF, trunc_dims=(8, 48)), con,
        matryoshka_recall_sql(trunc_dims=(8, 48)),
    )


def test_countmin_high_cardinality_key_parity(spark, con):
    """key=user_id: many keys per counter cell — the collision-heavy
    regime, opposite the registered event_type."""
    from vector_db_service_spark.operators import sketches

    _parity(
        sketches.countmin_merge(spark, SF, key="user_id"), con,
        sketches.countmin_merge_sql(key="user_id"),
    )


def test_hll_merge_other_key_parity(spark, con):
    from vector_db_service_spark.operators import sketches

    _parity(
        sketches.hll_merge(spark, SF, key="event_type"), con,
        sketches.hll_merge_sql(key="event_type"),
    )


def test_ingestion_dedup_stricter_threshold_parity(spark, con):
    """threshold=0.5: fewer verified dups at the door; novel docs'
    fingerprints still append batch-to-batch."""
    from vector_db_service_spark.oracles_pipeline import ingestion_dedup_sql
    from vector_db_service_spark.streaming import pipeline as sp

    _parity(
        sp.ingestion_dedup_stream(spark, SF, threshold=0.5), con,
        ingestion_dedup_sql(threshold=0.5),
    )
