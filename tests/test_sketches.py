"""Sketch-operator properties beyond oracle parity: HLL's estimate is in
a sane error band for the register count, CMS never under-counts (its
one-sided error guarantee), and both keep constant-size state."""

from __future__ import annotations

from vector_db_service_spark.operators import sketches

from conftest import SF_SMALL


def test_hll_estimate_in_error_band(spark):
    row = sketches.hll_distinct(spark, SF_SMALL, key="user_id").collect()[0]
    assert row.m == 64
    assert 1 <= row.n_registers <= 64
    # standard error for m=64 is ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert row.rel_error < 0.40, row
    assert row.exact_distinct > 0


def test_cms_never_undercounts(spark):
    rows = sketches.countmin_heavy_hitters(spark, SF_SMALL, key="event_type").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.cms_estimate >= r.exact_n
        assert r.overestimate == r.cms_estimate - r.exact_n


def test_cms_state_is_constant_size(spark):
    # the sketch state (the cells frame) is at most depth x width rows
    from pyspark.sql import functions as F

    from vector_db_service_spark.sources.tables import load

    ev = load(spark, SF_SMALL, "events").select(F.col("event_type").alias("k"))
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (sketches._hash52(F.col("k"), f"cm{i}:") % sketches.CMS_WIDTH).alias("bucket"),
            )
            for i in range(sketches.CMS_DEPTH)
        ]
    )
    cells = (
        ev.select(F.explode(rows).alias("s")).select("s.i", "s.bucket")
        .groupBy("i", "bucket").count()
    )
    assert cells.count() <= sketches.CMS_DEPTH * sketches.CMS_WIDTH


def test_bloom_no_false_negatives_and_probe_shape(spark):
    """A Bloom filter can never report a present key absent; the probe
    frame covers both present and absent ids so the verdict column is
    exercised in both directions."""
    out = sketches.bloom_membership(spark, SF_SMALL, key="user_id").collect()
    assert len(out) == 24
    for r in out:
        if r["actually_present"]:
            assert r["bloom_hit"], f"false negative for {r['probe_key']}"
    assert any(r["actually_present"] for r in out)
    assert any(not r["actually_present"] for r in out)


def test_kmv_overlap_estimates_bounded(spark):
    """KMV estimates stay in-range: jaccard in [0,1], union estimate
    positive, and the sketch carries exact counts for error inspection."""
    row = sketches.kmv_overlap(spark, SF_SMALL).collect()[0]
    assert 0.0 <= row["est_jaccard"] <= 1.0
    assert row["est_union"] > 0
    assert row["exact_union"] >= row["exact_intersection"] >= 0
