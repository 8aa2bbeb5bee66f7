"""Round-16 operator pins: the maintained-graph served walk, the chained
refit->serving lifecycle, the multi-query rerank sweep, and the
CM empty-cell estimate fix."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL as SF
from vector_db_service_spark.streaming import pipeline as sp


def test_beam_search_served_equals_inline_post_walk(spark):
    """Serving from the MAINTAINED store must return exactly what an
    inline from-scratch walk over the post-mutation world returns —
    the chain (maintenance -> store -> walk) loses nothing. Builds the
    post corpus + its banded graph directly and compares."""
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.operators.lsh import auto_band_bits
    from vector_db_service_spark.sources.tables import (
        embedding_dim,
        load,
        row_count,
        spread_for_compute,
    )

    base = load(spark, SF, "embeddings")
    mut = sp._index_maintenance_mutations(base)
    post = (
        base.join(mut.select("vec_id"), "vec_id", "left_anti")
        .select("vec_id", "label", "embedding")
        .unionByName(mut.select("vec_id", "label", "embedding"))
    )
    kj = ann.knn_join_frame(
        spread_for_compute(post), embedding_dim(SF), m=3,
        band_bits=auto_band_bits(row_count(SF, "embeddings"), None),
    ).select("src", "dst")
    und = kj.unionByName(
        kj.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    inline = ann.graph_beam_search(
        spark, SF, query_id=0, k=10, prebuilt_edges=und, corpus=post
    ).collect()
    served = sp.beam_search_served(spark, SF, query_id=0, k=10).collect()
    assert served == inline
    assert len(served) == 10


def test_beam_search_served_missing_query_raises(spark):
    import pytest

    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.sources.tables import load

    post = load(spark, SF, "embeddings")
    with pytest.raises(KeyError):
        ann.graph_beam_search(
            spark, SF, query_id=10**9, k=10, corpus=post
        )


def test_refit_lifecycle_recall_matches_rederived(spark):
    """Serving from the refit STORE must reproduce the independently
    re-derived recall numbers — the bytes the refit wrote ARE the
    quantizer the measurement claims to evaluate."""
    from vector_db_service_spark.operators import ann

    served = sorted(
        tuple(r) for r in sp.ivf_refit_lifecycle_recall(spark, SF).collect()
    )
    rederived = sorted(
        tuple(r) for r in ann.refit_recall_gain(spark, SF).collect()
    )
    assert served == rederived
    gain = {
        m: sum(r[2] for r in served if r[0] == m) for m in
        ("pre_refit", "post_refit")
    }
    # the lifecycle's point survives the chain: refit >= stale
    assert gain["post_refit"] >= gain["pre_refit"]


def test_rerank_sweep_mean_curve_monotone(spark):
    """The averaged recall-vs-budget curve is monotone in the budget
    (prefix property) and bounded by k * n_queries hits."""
    from vector_db_service_spark.operators import ann

    rows = sorted(
        ann.ivfpq_rerank_sweep(
            spark, SF, query_ids=list(range(10)), k=10
        ).collect(),
        key=lambda r: r["budget"],
    )
    assert [r["budget"] for r in rows] == [25, 50, 100, 200]
    hits = [r["hits"] for r in rows]
    assert hits == sorted(hits)  # larger budget can only add hits
    assert all(0 <= h <= 10 * 10 for h in hits)
    assert all(
        r["recall_micro"] == r["hits"] * 1_000_000 // (10 * 10)
        for r in rows
    )


def test_rerank_sweep_missing_query_raises(spark):
    import pytest

    from vector_db_service_spark.operators import ann

    with pytest.raises(ValueError, match="not in the corpus"):
        ann.ivfpq_rerank_sweep(spark, SF, query_ids=[0, 10**9])


def test_countmin_slice_missing_key_estimates_zero(spark, tmp_path):
    """A key present in only ONE slice must still appear with a 0
    estimate from the other slice (empty counters = 0, CM semantics) —
    the inner join dropped it entirely (r15 advisor)."""
    from vector_db_service_spark.operators import sketches

    sf = str(tmp_path)
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(2 * i, t0, 7, "only_even", 1.0, "{}") for i in range(5)]
        + [(2 * i + 1, t0, 7, "both", 1.0, "{}") for i in range(3)]
        + [(2 * i, t0, 7, "both", 1.0, "{}") for i in range(3)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    rows = {r["event_type"]: r for r in
            sketches.countmin_merge(spark, sf).collect()}
    assert "only_even" in rows  # would vanish under the inner join
    r = rows["only_even"]
    # all its slice-1 counters may still collide with 'both'; what is
    # guaranteed: the merged/whole estimates are >= exact and equal
    assert r["est_merged"] == r["est_whole"]
    assert r["est_merged"] >= r["exact_n"] == 5
    # and a slice the key never touched can only report collisions,
    # never the key's own mass
    assert r["est_slice1"] <= r["est_merged"]


def test_ivf_list_split_reduces_max_share(spark):
    """The split's point: the argmax list's share drops, every other
    list's population is untouched, and the corpus is conserved."""
    from vector_db_service_spark.operators import ann

    rows = ann.ivf_list_split(spark, SF).collect()
    pre = {r["list_id"]: r["n_vectors"] for r in rows
           if r["stage"] == "pre_split"}
    post = {r["list_id"]: r["n_vectors"] for r in rows
            if r["stage"] == "post_split"}
    assert sum(pre.values()) == sum(post.values())  # conservation
    target = min(pre, key=lambda lid: (-pre[lid], lid))
    n_lists = len(pre)
    # untouched lists byte-identical in population
    for lid in pre:
        if lid != target:
            assert post[lid] == pre[lid]
    # the split halves land on (target, n_lists) and together conserve
    assert post[target] + post.get(n_lists, 0) == pre[target]
    assert max(post.values()) <= max(pre.values())


def test_token_budget_fill_sums_and_caps(spark):
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.sources.tables import load

    budget = 500_000
    rows = textops.token_budget_fill(
        load(spark, SF, "documents"), budget_tokens=budget
    ).collect()
    # uncapped allocations sum EXACTLY to the budget (largest-remainder
    # contract); capped rows only ever shrink the total
    uncapped_total = sum(
        r["alloc_tokens"] if not r["capped"] else 0 for r in rows
    )
    assert sum(
        r["alloc_tokens"] for r in rows
    ) <= budget or any(r["capped"] for r in rows) is False
    # per-row invariants
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= max(r["n_tokens"], 0) or (
            r["n_tokens"] == 0 and r["alloc_tokens"] == 0
        )
        assert r["capped"] == (r["alloc_tokens"] == r["n_tokens"]) or (
            not r["capped"]
        )
        assert 0 <= r["fill_ppm"] <= 1_000_000
    # with no capping the sum is exact
    if not any(r["capped"] for r in rows):
        assert uncapped_total == budget
