"""Empty-SELECTION parity: operators whose filter/target predicate
matches nothing.

A target language absent from the corpus (DSIR retargeting), a
metadata filter with zero survivors (filtered IVF), and a dimension
key that does not exist (bloom pruning) all drive the
empty-aggregate / empty-join paths — log(0)-style guards, empty LM
models, zero-candidate scans — where one engine's convention could
silently differ from the other's. Each pair runs the driver-identical
compare under a predicate that selects NOTHING."""

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


def test_dsir_absent_target_lang_parity(spark, con):
    """target_lang with ZERO documents: the target LM is empty, every
    score falls back to the OOV convention — both engines must agree."""
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.oracles_pipeline import dsir_importance_sql
    from vector_db_service_spark.sources.tables import load

    _parity(
        textops.dsir_importance(load(spark, SF, "documents"),
                                target_lang="zz"),
        con,
        dsir_importance_sql(target_lang="zz"),
    )


def test_ivf_filtered_absent_lang_parity(spark, con):
    """A metadata predicate with zero survivors: the scored volume is
    empty and the serving path must return 0 rows, not error."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.oracles_quant import ivf_filtered_sql

    _parity(
        ann.ivf_filtered_topk(spark, SF, k=10, nprobe=2, lang="zz"), con,
        ivf_filtered_sql(k=10, nprobe=2, lang="zz"),
    )


def test_bloom_absent_key_parity(spark, con):
    from vector_db_service_spark.operators import sketches

    _parity(
        sketches.bloom_join_prune(spark, SF, nation=999), con,
        sketches.bloom_join_prune_sql(nation=999),
    )
