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


def test_degree_audit_consistent_with_mutual_pairs(spark):
    """Cross-op consistency: the audit's n_mutual counts DIRECTED edges
    whose reverse exists, so per label it must equal exactly 2x the
    unordered mutual-kNN pair count (same m, same banded graph)."""
    from vector_db_service_spark.operators import ann

    audit = {r["label"]: r for r in
             ann.graph_degree_audit(spark, SF, m=3).collect()}
    pairs = ann.mutual_knn_pairs(spark, SF, m=3).groupBy("label").count()
    mutual = {r["label"]: r["count"] for r in pairs.collect()}
    for label, row in audit.items():
        assert row["n_mutual"] % 2 == 0
        assert row["n_mutual"] == 2 * mutual.get(label, 0)
        assert 0 <= row["reciprocity_micro"] <= 1_000_000
        assert row["max_in_degree"] >= 1


def test_kmv_merge_saturated_branch_exercised(spark):
    """At the DRIVER GATE scale (sf0.01: 150 distinct users per slice,
    K=32) the (K-1)/h_(K) estimate branch — not just the n<K exact
    fallback — is what the driver hash actually pins. (sf0.001 has only
    15 distinct users, which exercises the fallback branch instead.)"""
    import os

    from vector_db_service_spark.operators import sketches

    sf = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")
    row = sketches.kmv_merge(spark, sf).collect()[0]
    assert row["merge_matches_whole"] is True
    assert row["exact_distinct"] > sketches.KMV_K  # saturated
    # a saturated KMV estimate is an extrapolation, not the exact count
    for c in ("est_slice0", "est_slice1", "est_merged", "est_whole"):
        assert row[c] > 0
    assert row["est_merged"] == row["est_whole"]


def test_nprobe_autotune_choice_matches_curve(spark):
    """The chosen flag must mark exactly the smallest probe point whose
    mean recall meets the target (recomputed from the sweep curve)."""
    from vector_db_service_spark.operators import ann

    target = 800_000
    rows = sorted(
        ann.ivf_nprobe_autotune(
            spark, SF, k=10, n_lists=7, target_recall_micro=target
        ).collect(),
        key=lambda r: r["nprobe"],
    )
    qualifying = [r["nprobe"] for r in rows if r["recall_micro"] >= target]
    expect = min(qualifying) if qualifying else max(r["nprobe"] for r in rows)
    chosen = [r["nprobe"] for r in rows if r["chosen"]]
    assert chosen == [expect]
    for r in rows:
        assert r["meets_target"] == (r["recall_micro"] >= target)
    # monotone: more probes can only add hits
    hits = [r["hits"] for r in rows]
    assert hits == sorted(hits)
