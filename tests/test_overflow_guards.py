"""Exactness-domain guards must fail LOUDLY, never drop rows.

Round-9 advisory: decimal(38,0) triple products in allpairs_cosine (and
the trace accumulation in spectrum_audit) can exceed 38 digits on
heavy-tailed corpora; in non-ANSI Spark an overflowed decimal multiply
returns NULL, a NULL comparison filters false, and the pair silently
disappears — breaking the advertised lossless guarantee exactly in the
at-scale regime. The fix computes the magnitudes exactly in decimal and
raise_error()s past the provably-exact domain. These tests shrink the
domain via the injectable bounds and prove the loud path end-to-end;
the default-domain behavior (unchanged results) is covered by the
oracle-parity suite."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMALL
from vector_db_service_spark.operators import ann, dedup
from vector_db_service_spark.sources.tables import load


def _docs(spark):
    return load(spark, SF_SMALL, "documents").limit(50)


def test_allpairs_norm_guard_raises_loudly(spark):
    df = dedup.allpairs_cosine(_docs(spark), _norm_safe=10)
    with pytest.raises(Exception, match="exact-verdict domain"):
        df.count()


def test_allpairs_weight_guard_raises_loudly(spark):
    df = dedup.allpairs_cosine(_docs(spark), _w_safe=1)
    with pytest.raises(Exception, match="exact-verdict domain"):
        df.count()


def test_allpairs_default_domain_spans_realistic_corpora(spark):
    """The default bound must comfortably cover realistic magnitudes:
    a doc with 1e6 distinct shingles at w = 1e9 each (norm2 = 1e24)
    stays inside the domain, so the guard never fires on real data."""
    p2, q2 = 16, 25
    norm_safe = math.isqrt((10**38 - 1) // max(p2, q2))
    assert norm_safe >= 10**18
    # and the guarded products provably fit decimal(38,0)
    assert q2 * norm_safe * norm_safe < 10**38
    assert p2 * norm_safe * norm_safe < 10**38


def test_allpairs_results_unchanged_inside_domain(spark):
    """Shrinking the bound to just above the corpus' true max norm must
    not change a single pair — the guard is a guard, not a filter."""
    base = dedup.allpairs_cosine(_docs(spark)).collect()
    guarded = dedup.allpairs_cosine(_docs(spark), _norm_safe=10**17).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, guarded))


def test_spectrum_trace_guard_raises_loudly(spark):
    df = ann.spectrum_audit(spark, SF_SMALL, _m2_safe=10)
    with pytest.raises(Exception, match="exact-trace domain"):
        df.collect()


def test_spectrum_trace_guard_survives_column_pruning(spark):
    """Round-10 advisory: the guard is anchored in a filter, so even a
    consumer that reads NO guarded column (count() prunes every
    projection) still trips it."""
    df = ann.spectrum_audit(spark, SF_SMALL, _m2_safe=10)
    with pytest.raises(Exception, match="exact-trace domain"):
        df.count()


def test_norm_outliers_guard_raises_loudly(spark):
    """Round-10 advisory: norm_outliers gets the same loud guard as
    spectrum_audit — NULL/overflowed decimal sums raise instead of
    silently NULLing the verdict thresholds; filter-anchored, so
    count() trips it too."""
    df = ann.norm_outliers(spark, SF_SMALL, _sum_safe=10)
    with pytest.raises(Exception, match="exact decimal"):
        df.count()


def test_norm_outliers_results_unchanged_inside_domain(spark):
    base = ann.norm_outliers(spark, SF_SMALL).collect()
    guarded = ann.norm_outliers(spark, SF_SMALL, _sum_safe=10**30).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, guarded))


def test_norm_outliers_empty_corpus_is_empty_not_overflow(spark, tmp_path):
    """An empty embeddings table legitimately NULLs the decimal sums
    (n == 0): that is an empty result, not an overflow — the guard
    must not misdiagnose it as 'shard the corpus'."""
    from vector_db_service_spark.sources.tables import load

    load(spark, SF_SMALL, "embeddings").limit(0).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    assert ann.norm_outliers(spark, str(tmp_path)).collect() == []
