"""Semantics + plan-shape checks for the corpus-hygiene text operators
(text_decontamination / text_repetition_scores / text_gopher_filter /
text_mixture_weights). Oracle parity runs in test_oracle_parity; these
pin the properties parity can't see: plan shape (broadcast holdout, no
Python UDFs, single corpus scan) and the invariants the semantics
guarantee (holdout exclusion, fraction bounds, weight normalization).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_service_spark import entrypoints as E  # noqa: E402
from vector_db_service_spark.operators import textops  # noqa: E402
from vector_db_service_spark.plans.inspect import explain_str as _plan  # noqa: E402
from vector_db_service_spark.sources.tables import load  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")


def test_decontamination_broadcasts_holdout_no_python(spark):
    plan = _plan(E.QUERIES["text_decontamination"](spark, SF))
    assert "BroadcastHashJoin" in plan, "holdout gram set must broadcast"
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_decontamination_excludes_holdout_and_bounds(spark):
    docs = load(spark, SF, "documents")
    out = textops.decontamination(docs, holdout_mod=23).collect()
    assert out, "empty decontamination output"
    for r in out:
        assert r.doc_id % 23 != 0, "holdout doc leaked into training output"
        assert 0 <= r.n_contaminated <= r.n_grams
        assert 0.0 <= r.contamination_frac <= 1.0
        assert r.is_contaminated == (r.contamination_frac > 0.05)
    n_docs = docs.count()
    n_hold = docs.filter(F.col("doc_id") % 23 == 0).count()
    assert len(out) == n_docs - n_hold


def test_repetition_scores_invariants(spark):
    docs = load(spark, SF, "documents")
    out = textops.repetition_scores(docs).collect()
    by_doc: dict[int, set[int]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.gram_n)
        assert r.n_distinct <= r.n_grams
        assert 1 <= r.top_gram_n <= r.n_grams
        assert 0.0 < r.top_gram_frac <= 1.0
        assert 0.0 <= r.dup_gram_frac < 1.0
    assert all(v == {2, 3} for v in by_doc.values()), "every doc needs both sizes"
    assert len(by_doc) == docs.count()


def test_gopher_filter_is_single_pass_no_shuffle(spark):
    plan = _plan(E.QUERIES["text_gopher_filter"](spark, SF))
    assert "Exchange" not in plan, "pure projection must not shuffle"
    assert "BatchEvalPython" not in plan


def test_gopher_filter_conjunction(spark):
    docs = load(spark, SF, "documents")
    for r in textops.gopher_filter(docs).collect():
        assert r.passes == (
            r.rule_word_count and r.rule_mean_len and r.rule_alpha and r.rule_stopwords
        )


def test_mixture_weights_normalize(spark):
    docs = load(spark, SF, "documents")
    rows = textops.mixture_weights(docs).collect()
    assert rows
    # rounded per-group weights sum to ~1 (rounding error only)
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
    for r in rows:
        # sqrt temperature flattens: rare domains sampled up, big ones down
        assert r.sample_mult > 0
    up = [r for r in rows if r.sample_mult > 1.0]
    down = [r for r in rows if r.sample_mult < 1.0]
    assert up and down, "sqrt reweighting should move both directions"


def test_mixture_weights_single_corpus_scan(spark):
    plan = _plan(E.QUERIES["text_mixture_weights"](spark, SF))
    # formatted explain prints each node twice (tree line + detail
    # section), so ONE physical scan == exactly 2 occurrences
    assert plan.count("Scan parquet") <= 2
    assert "BatchEvalPython" not in plan


def test_sequence_packing_invariants(spark):
    docs = load(spark, SF, "documents")
    rows = textops.sequence_packing(docs).collect()
    assert rows
    from pyspark.sql import Row
    per_source = {
        r.source: r.n_docs
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n_docs").collect()
    }
    for r in rows:
        assert r.n_docs == per_source[r.source]
        assert r.n_sequences >= 1
        # straddlers can't exceed the interior boundaries
        assert 0 <= r.n_straddlers <= r.n_sequences
        assert 0.0 < r.fill_rate <= 1.0
        # concat-chunk invariant: total tokens land inside the sequences
        assert (r.n_sequences - 1) * 256 < r.n_tokens <= r.n_sequences * 256


def test_sequence_packing_windows_per_shard_not_global(spark):
    plan = _plan(E.QUERIES["pipeline_sequence_packing"](spark, SF))
    # running offset must partition by source, never a global
    # single-partition prefix sum
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan


def test_quantile_histogram_monotone_and_bounded(spark):
    rows = E.QUERIES["sketch_quantile_histogram"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_bins_used <= 64
        assert r.est_p50 <= r.est_p90 <= r.est_p99
        # estimates are upper bin edges: multiples of the bin width
        for v in (r.est_p50, r.est_p90, r.est_p99):
            assert v % 8.0 == 0.0 and 0 < v <= 64 * 8.0


def test_quantile_histogram_matches_order_statistic(spark):
    import math

    ev = load(spark, SF, "events")
    by_type: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    for r in E.QUERIES["sketch_quantile_histogram"](spark, SF).collect():
        vals = sorted(by_type[r.event_type])
        for q, est in ((50, r.est_p50), (90, r.est_p90), (99, r.est_p99)):
            # the sketch's quantile definition: the ceil(q% * n)-th order
            # statistic; the estimate must be the upper edge of ITS bin
            v = vals[math.ceil(len(vals) * q / 100) - 1]
            expected = (min(63, math.floor(v / 8.0)) + 1) * 8.0
            assert est == expected, (r.event_type, q, v, est, expected)


def test_index_advisor_crosses_reference_thresholds(spark, tmp_path):
    # synthesize libraries on each side of the reference's
    # choose_search_strategy thresholds (similarity.py:397-436)
    from pyspark.sql import functions as FF

    emb = (
        spark.range(72_000)
        .select(
            FF.when(FF.col("id") < 5_000, 0)       # small (<10K) -> batch
            .when(FF.col("id") < 17_000, 1)        # medium (<50K, <100MB) -> batch
            .otherwise(2)                          # 55K (>=50K) -> heap
            .alias("label"),
            FF.col("id").alias("vec_id"),
            FF.array(FF.lit(1.0)).alias("embedding"),
        )
    )
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from vector_db_service_spark.operators import observability

    rows = {r.library_id: r.strategy
            for r in observability.index_advisor(spark, str(tmp_path)).collect()}
    assert rows == {0: "batch", 1: "batch", 2: "heap"}


def test_hll_merge_property_holds(spark):
    row = E.QUERIES["sketch_hll_merge"](spark, SF).collect()[0]
    assert row.merge_matches_whole is True
    assert row.est_merged == row.est_whole
    assert row.exact_distinct > 0


def test_blocklist_filter_single_pass_and_mask(spark):
    plan = _plan(E.QUERIES["text_blocklist_filter"](spark, SF))
    assert "Exchange" not in plan, "blocklist filter must be a pure projection"
    assert "BatchEvalPython" not in plan
    docs = load(spark, SF, "documents")
    raw = {r.doc_id: r.md5 for r in docs.select("doc_id", F.md5("text").alias("md5")).collect()}
    out = textops.blocklist_filter(docs).collect()
    assert len(out) == docs.count()
    kept = sum(r.keep for r in out)
    assert 0 < kept < len(out), "keep threshold must split the corpus"
    for r in out:
        assert 0 <= r.n_blocked <= r.n_tokens
        assert r.keep == (r.n_blocked * 1000 <= 130 * r.n_tokens)
        if r.n_blocked == 0:
            assert r.masked_md5 == raw[r.doc_id], "unblocked doc must be unchanged"
        else:
            assert r.masked_md5 != raw[r.doc_id], "blocked doc must be redacted"


def test_unigram_logprob_broadcasts_vocab_and_buckets_exactly(spark):
    plan = _plan(E.QUERIES["text_unigram_logprob"](spark, SF))
    assert "BroadcastHashJoin" in plan, "vocab model must broadcast"
    assert "BatchEvalPython" not in plan
    docs = load(spark, SF, "documents")
    out = textops.unigram_logprob(docs).collect()
    assert len(out) == docs.count()
    buckets = {r.ppl_bucket for r in out}
    assert buckets <= {"head", "middle", "tail"}
    assert len(buckets) >= 2, "bucket thresholds must split the corpus"
    for r in out:
        assert r.avg_logprob < 0.0, "log-probabilities are negative"
        # the bucket verdict must agree with the integer-millinat score
        s_mln = round(r.avg_logprob * 1000 * r.n_tokens)
        if r.ppl_bucket == "head":
            assert s_mln >= -3399 * r.n_tokens
        elif r.ppl_bucket == "tail":
            assert s_mln < -3404 * r.n_tokens


def test_matryoshka_recall_bounds_and_shape(spark):
    from vector_db_service_spark.operators import ann

    out = ann.matryoshka_recall(spark, SF).collect()
    dims = {r.trunc_dim for r in out}
    assert dims == {16, 32}
    assert len(out) == 2 * 5, "2 truncations x 5 queries"
    for r in out:
        assert 0 <= r.n_overlap <= r.k
        assert abs(r.recall_at_k - r.n_overlap / r.k) < 1e-9
        # the query vector itself survives any prefix truncation (its
        # truncated self-similarity is still the max, score 1.0), so
        # overlap is never zero
        assert r.n_overlap >= 1


def test_train_val_split_partitions_and_freezes(spark):
    docs = load(spark, SF, "documents")
    out = textops.train_val_split(docs).collect()
    assert {r.split for r in out} == {"train", "val", "test"}
    assert sum(r.n_docs for r in out) == docs.count()
    assert abs(sum(r.doc_share for r in out) - 1.0) < 1e-3
    # frozen property: a doc's split is a function of doc_id alone, so
    # computing on any subset must reproduce the same assignment — the
    # per-(split, lang) counts over even doc_ids agree between the
    # subset run and an even-only re-aggregation of the full run
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = {(r.split, r.lang): r.n_docs
           for r in textops.train_val_split(half).collect()}
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % F.lit(100)
    )
    split = (
        F.when(bucket < 5, F.lit("test"))
        .when(bucket < 10, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    full_even = {
        (r.split, r.lang): r.n
        for r in half.select(split.alias("split"), "lang")
        .groupBy("split", "lang").agg(F.count("*").alias("n")).collect()
    }
    assert sub == full_even
