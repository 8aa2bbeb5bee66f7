"""Skew-salting equivalence: the salted banded pair join must produce
EXACTLY the rows of the unsalted join — salting redistributes work, never
changes the pair set. Run with an aggressively low hot threshold so
virtually every bucket takes the salted path."""

from __future__ import annotations

from vector_db_service_spark.operators import ann

from conftest import SF_SMALL


def _key(rows):
    return sorted((r.label, r.src, r.dst, r.score, r.rnk) for r in rows)


def test_salted_knn_join_identical(spark):
    plain = ann.knn_join(spark, SF_SMALL, m=3).collect()
    salted = ann.knn_join(spark, SF_SMALL, m=3, salt=4, hot_bucket_min=2).collect()
    assert _key(plain) == _key(salted)
    assert len(plain) > 0


def test_salt_one_is_noop(spark):
    # salt <= 1 must take the plain path entirely
    plain = ann.knn_join(spark, SF_SMALL, m=2).collect()
    s1 = ann.knn_join(spark, SF_SMALL, m=2, salt=1).collect()
    assert _key(plain) == _key(s1)


def test_auto_band_bits_contract():
    from vector_db_service_spark.operators.lsh import auto_band_bits

    # test scales resolve to the historical 2 bits (oracle compatibility)
    assert auto_band_bits(500) == 2
    assert auto_band_bits(5_000) == 2
    assert auto_band_bits(0) == 2
    # large corpora get finer buckets; growth is logarithmic
    assert auto_band_bits(500_000) == 9
    assert auto_band_bits(5_000_000) > auto_band_bits(500_000)
    # clamped, and an explicit request always wins
    assert auto_band_bits(10**15) == 16
    assert auto_band_bits(500_000, requested=2) == 2
