"""Semantics + plan-shape checks for the round-8 additions
(dedup_paragraphs / dedup_winnowing_fingerprints /
ann_cluster_silhouette / emb_norm_outliers). Oracle parity runs in
test_oracle_parity; these pin the properties parity can't see: the
winnowing guarantee (any shared run of window+2 words shares a
fingerprint), paragraph keep-first semantics on constructed corpora,
silhouette bounds, the 3-sigma verdict arithmetic, and the zero-Python
plan contracts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_service_spark import entrypoints as E  # noqa: E402
from vector_db_service_spark.operators import dedup  # noqa: E402
from vector_db_service_spark.plans.inspect import explain_str as _plan  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


# --- paragraph dedup -------------------------------------------------------


def test_paragraph_dedup_keep_first_across_docs(spark):
    # doc 1 and doc 2 are byte-identical 1-paragraph texts: the second
    # occurrence is removed, the first survives; doc 3 is unique.
    txt = " ".join(f"w{i}" for i in range(20))
    out = {
        r["source"]: r
        for r in dedup.paragraph_dedup(
            _docs(
                spark,
                [(1, "a", txt), (2, "b", txt), (3, "b", "solo text here")],
            )
        ).collect()
    }
    assert out["a"].n_paras == 1 and out["a"].n_removed == 0
    assert out["b"].n_paras == 2 and out["b"].n_removed == 1
    assert out["b"].removal_frac == 0.5


def test_paragraph_dedup_within_doc_and_signature(spark):
    # one doc of two IDENTICAL 20-word paragraphs: the second window is
    # removed, and the survivor signature equals the single-paragraph
    # doc's signature (order-independent content identity).
    para = " ".join(f"p{i}" for i in range(20))
    twice = dedup.paragraph_dedup(_docs(spark, [(1, "s", para + " " + para)]))
    once = dedup.paragraph_dedup(_docs(spark, [(9, "s", para)]))
    (r2,), (r1,) = twice.collect(), once.collect()
    assert r2.n_paras == 2 and r2.n_removed == 1
    assert r1.n_paras == 1 and r1.n_removed == 0
    assert r2.survivor_sig == r1.survivor_sig


def test_paragraph_dedup_total_removals_conserve(spark):
    # corpus-wide: survivors = distinct paragraph hashes, so
    # sum(n_paras) - sum(n_removed) == number of distinct paragraphs.
    df = E.QUERIES["dedup_paragraphs"](spark, SF)
    tot = df.agg(
        F.sum("n_paras").alias("p"), F.sum("n_removed").alias("r")
    ).collect()[0]
    assert tot.p > 0 and 0 <= tot.r < tot.p
    assert "BatchEvalPython" not in _plan(df)


# --- winnowing -------------------------------------------------------------


def test_winnowing_guarantee_shared_run(spark):
    # Schleimer et al. guarantee: two documents sharing a run of
    # window+2 = 6 words (=> 4 shared 3-grams = one full window) must
    # share at least one fingerprint -> both report n_shared >= 1.
    shared = "alpha beta gamma delta epsilon zeta"
    rows = dedup.winnowing_fingerprints(
        _docs(
            spark,
            [
                (1, "a", "xx yy " + shared + " qq rr"),
                (2, "b", "mm nn oo " + shared + " pp"),
            ],
        )
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_shared >= 1, "winnowing guarantee violated"
        assert 0 < r.n_fingerprints <= r.n_grams


def test_winnowing_disjoint_docs_share_nothing(spark):
    rows = dedup.winnowing_fingerprints(
        _docs(
            spark,
            [
                (1, "a", "aa bb cc dd ee ff gg hh"),
                (2, "b", "q1 q2 q3 q4 q5 q6 q7 q8"),
            ],
        )
    ).collect()
    for r in rows:
        assert r.n_shared == 0 and r.shared_frac == 0.0


def test_winnowing_short_doc_degenerate(spark):
    # fewer grams than the window: the global-min hash is the single
    # fingerprint (the spec's degenerate case).
    (r,) = dedup.winnowing_fingerprints(
        _docs(spark, [(1, "a", "one two three four")])  # 2 grams < window 4
    ).collect()
    assert r.n_grams == 2 and r.n_fingerprints == 1


def test_winnowing_density_bound(spark):
    # selection density can never exceed the gram count and for long
    # docs sits near 2/(w+1); assert the loose upper bound holds
    # corpus-wide and the plan has no Python stage.
    df = E.QUERIES["dedup_winnowing_fingerprints"](spark, SF)
    assert "BatchEvalPython" not in _plan(df)
    bad = df.filter(
        (F.col("n_fingerprints") > F.col("n_grams"))
        | (F.col("n_shared") > F.col("n_fingerprints"))
    ).count()
    assert bad == 0


# --- cluster silhouette ----------------------------------------------------


def test_silhouette_bounds_and_population(spark):
    rows = E.QUERIES["ann_cluster_silhouette"](spark, SF).collect()
    assert rows
    from vector_db_service_spark.sources.tables import load

    total = load(spark, SF, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == total
    for r in rows:
        # centroid silhouette s = 1 - a/b with a = min distance:
        # micro-units in [0, 1e6]
        assert 0 <= r.avg_sil_us <= 1_000_000


def test_silhouette_single_scan_no_python(spark):
    import re

    plan = _plan(E.QUERIES["ann_cluster_silhouette"](spark, SF))
    assert "BatchEvalPython" not in plan
    # formatted explain lists each node in the tree AND a detail
    # section; count the detail headers -> corpus read exactly once
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1


# --- norm outliers ---------------------------------------------------------


def test_norm_outliers_verdict_consistency(spark):
    rows = E.QUERIES["emb_norm_outliers"](spark, SF).collect()
    assert rows
    lo = {r.lo_us for r in rows}
    hi = {r.hi_us for r in rows}
    # global bounds are constant columns, auditable from the result
    assert len(lo) == 1 and len(hi) == 1
    # unit-norm corpora collapse to lo == hi == 1e6 (sd = 0)
    assert min(lo) <= max(hi)
    for r in rows:
        assert r.n_low + r.n_high <= r.n_vectors


def test_norm_outliers_no_window_no_python(spark):
    plan = _plan(E.QUERIES["emb_norm_outliers"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan


# --- allpairs cosine -------------------------------------------------------


def test_allpairs_prefix_is_proper_subset(spark):
    # the Bayardo filter must index strictly fewer (doc, shingle) rows
    # than the full posting table, and the result must carry only pairs
    # at or above tau = 0.8 in micro units
    rows = E.QUERIES["dedup_allpairs_cosine"](spark, SF).collect()
    for r in rows:
        assert r.doc_id_1 < r.doc_id_2
        assert 799_999 <= r.cos_us <= 1_000_000


def test_allpairs_self_duplicate_found(spark):
    # two identical documents have cosine exactly 1; a disjoint third
    # must not pair with them
    txt = "alpha beta gamma delta epsilon zeta eta theta"
    out = dedup.allpairs_cosine(
        _docs(
            spark,
            [(1, "a", txt), (2, "a", txt), (3, "b", "q1 q2 q3 q4 q5 q6 q7")],
        )
    ).collect()
    assert len(out) == 1
    (r,) = out
    assert (r.doc_id_1, r.doc_id_2) == (1, 2)
    assert r.cos_us == 1_000_000


def test_allpairs_no_python_no_crossjoin(spark):
    plan = _plan(E.QUERIES["dedup_allpairs_cosine"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --- lsh tuning curve ------------------------------------------------------


def test_tuning_curve_monotone_in_similarity(spark):
    rows = E.QUERIES["dedup_lsh_tuning_curve"](spark, SF).collect()
    assert len(rows) == 5 * 19
    by_split = {}
    for r in rows:
        by_split.setdefault((r.bands, r.rows), []).append((r.s_pct, r.p_collide_us))
    for (b, rr), pts in by_split.items():
        assert b * rr == 16
        pts.sort()
        probs = [p for _, p in pts]
        # S-curve: collision probability is nondecreasing in similarity
        assert probs == sorted(probs)
        assert 0 <= probs[0] and probs[-1] <= 1_000_000


def test_tuning_curve_threshold_orders_with_rows(spark):
    # more rows per band -> higher 50%-collision threshold (stricter)
    rows = E.QUERIES["dedup_lsh_tuning_curve"](spark, SF).collect()
    s50 = sorted({(r.rows, r.s50_us) for r in rows})
    thresholds = [t for _, t in s50]
    assert thresholds == sorted(thresholds)


# --- zipf audit ------------------------------------------------------------


def test_zipf_audit_ranks_and_constants(spark):
    rows = E.QUERIES["text_zipf_audit"](spark, SF).collect()
    assert rows
    ranks = sorted(r.rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    freqs = [r.freq for r in sorted(rows, key=lambda r: r.rank)]
    assert freqs == sorted(freqs, reverse=True)
    assert len({(r.vocab_size, r.total_tokens, r.n_hapax) for r in rows}) == 1
    for r in rows:
        assert r.zipf_product == r.freq * r.rank
        assert 0 < r.share_ppm <= 1_000_000


# --- minhash vs exact recall ----------------------------------------------


def test_recall_eval_count_invariants(spark):
    (r,) = E.QUERIES["dedup_minhash_recall_vs_exact"](spark, SF).collect()
    assert r.n_hits <= min(r.n_truth, r.n_candidates)
    assert 0 <= r.precision_us <= 1_000_000
    assert 0 <= r.recall_us <= 1_000_000
    if r.n_candidates == 0:
        assert r.precision_us == 0
    if r.n_truth == 0:
        assert r.recall_us == 0


# --- heaps curve -----------------------------------------------------------


def test_heaps_curve_monotone_and_conserved(spark):
    rows = sorted(
        E.QUERIES["text_heaps_curve"](spark, SF).collect(), key=lambda r: r.bucket
    )
    assert rows
    cum_v = [r.cum_vocab for r in rows]
    cum_t = [r.cum_tokens for r in rows]
    assert cum_v == sorted(cum_v) and cum_t == sorted(cum_t)
    # marginal new_tokens sums to the final cumulative vocabulary
    assert sum(r.new_tokens for r in rows) == cum_v[-1]
    # vocabulary can never exceed tokens seen
    for r in rows:
        assert 0 < r.cum_vocab <= r.cum_tokens


def test_heaps_curve_stability_under_repartition(spark):
    from vector_db_service_spark.operators import textops
    from vector_db_service_spark.sources.tables import load

    docs = load(spark, SF, "documents")
    a = sorted(map(tuple, textops.heaps_curve(docs).collect()))
    b = sorted(map(tuple, textops.heaps_curve(docs.repartition(17)).collect()))
    assert a == b


# --- spectrum audit --------------------------------------------------------


def test_spectrum_audit_bounds(spark):
    (r,) = E.QUERIES["emb_spectrum_audit"](spark, SF).collect()
    from vector_db_service_spark.sources.tables import load

    d = len(load(spark, SF, "embeddings").select("embedding").first()[0])
    # participation ratio lives in [1, d]
    assert 1_000_000 <= r.eff_rank_ppm <= d * 1_000_000
    assert 0 <= r.top_dim < d
    # heaviest diagonal holds at least 1/d of the trace
    assert r.top_dim_share_ppm * d >= 1_000_000
    assert r.tr_m > 0 and r.n_vectors > 0


def test_spectrum_audit_exchange_is_dim_bounded(spark):
    # the corpus flows through ONE Arrow-batched Gram stage
    # (MapInPandas — vectorized numpy matmul, not per-row Python), and
    # the only wide exchange carries the (a, b) partials it emits,
    # folded map-side by a partial HashAggregate
    plan = _plan(E.QUERIES["emb_spectrum_audit"](spark, SF))
    assert "BatchEvalPython" not in plan  # no per-row Python UDFs
    assert "MapInPandas" in plan
    assert "HashAggregate" in plan
