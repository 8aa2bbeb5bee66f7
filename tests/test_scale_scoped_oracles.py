"""Width-matched sf0.1 parity for the banded ops whose REGISTERED
oracles pin band_bits=2.

auto_band_bits keeps expected bucket size constant as the corpus grows,
so the engine's banding widens with scale while a registered oracle is
one static SQL string. At both driver-gate scales (sf0.001/sf0.01,
500 embeddings) every auto width resolves to 2 and the registered
oracles are exact BY CONSTRUCTION; at sf0.1 (2000 embeddings) the
GLOBAL (n_labels=1) banding of hard-negative mining resolves to 4 and
the registered string no longer describes the engine's plan — the
whole-registry scale-parity sweep (SCALE_PARITY_r16.json) caught
exactly this. These tests rebuild each banded oracle at the width the
engine actually computes for the sf0.1 corpus and require EXACT parity
— proving the banding algebra is scale-independent even though the
registered strings are gate-scoped."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_harness import compare, duckdb_con  # noqa: E402

SF01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF01)
    yield c
    c.close()


def _widths():
    from vector_db_service_spark.operators.lsh import auto_band_bits
    from vector_db_service_spark.sources.tables import (
        embedding_dim,
        row_count,
    )

    n = row_count(SF01, "embeddings")
    return (
        embedding_dim(SF01),
        auto_band_bits(n, None),              # label-scoped ops
        auto_band_bits(n, None, n_labels=1),  # global banding
    )


def test_hard_negatives_width_matched_sf01(spark, con):
    """The row the scale sweep flagged: global banding auto-sizes past
    the registered width at sf0.1; the width-matched oracle must be
    exact."""
    from vector_db_service_spark.entrypoints import _hard_negatives_sql
    from vector_db_service_spark.operators import ann

    dim, _bb_label, bb_global = _widths()
    problems = compare(
        ann.hard_negative_mining(spark, SF01),
        con.sql(_hard_negatives_sql(dim=dim, band_bits=bb_global)).df(),
    )
    assert not problems, "; ".join(problems[:6])


def test_knn_join_width_matched_sf01(spark, con):
    """Label-scoped banding still resolves to 2 at sf0.1 (buckets are
    per-label), but pin it THROUGH the width computation so a future
    corpus bump cannot silently desynchronize engine and oracle."""
    from vector_db_service_spark.entrypoints import _knn_join_sql
    from vector_db_service_spark.operators import ann

    dim, bb_label, _bb_global = _widths()
    problems = compare(
        ann.knn_join(spark, SF01, m=3),
        con.sql(_knn_join_sql(m=3, dim=dim, band_bits=bb_label)).df(),
    )
    assert not problems, "; ".join(problems[:6])
