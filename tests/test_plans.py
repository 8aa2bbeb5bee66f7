"""Physical-plan assertions: the scale properties README claims are
machine-checked here — filter pushdown reaches the parquet scan, column
pruning shrinks ReadSchema, top-k compiles to TakeOrderedAndProject (no
full shuffle), hydration joins broadcast the k-row side, and no scoring
path contains a Python UDF (BatchEvalPython).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_service_spark import entrypoints as E  # noqa: E402
from vector_db_service_spark.operators import knn as knn_ops  # noqa: E402
from vector_db_service_spark.plans.inspect import explain_str as _plan  # noqa: E402
from vector_db_service_spark.sources.tables import load  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")


def test_library_scan_pushes_filter_to_parquet(spark):
    df = load(spark, SF, "embeddings").filter(F.col("label") == 3).select("vec_id")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "EqualTo(label,3)" in plan.replace(" ", "")


def test_projection_prunes_read_schema(spark):
    df = E.QUERIES["p1_projection"](spark, SF)
    plan = _plan(df)
    # only the 3 projected columns are read, not all 11 lineitem columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_shipdate" not in read


def test_knn_topk_is_take_ordered_not_full_sort(spark):
    df = knn_ops.knn(spark, SF, query_id=0, k=10)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    # no global sort-exchange of the scored corpus
    assert "Sort " not in plan


def test_hydration_join_broadcasts_topk_side(spark):
    df = knn_ops.knn(spark, SF, query_id=0, k=10, hydrate=True)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scoring_path_has_no_python_udf(spark):
    for name in ("knn_flat_cosine", "dedup_minhash_pairs", "text_quality_scores",
                 "s15_embed_documents"):
        plan = _plan(E.QUERIES[name](spark, SF))
        assert "BatchEvalPython" not in plan, f"{name} fell back to a Python UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF in a kernel path"


def test_pair_ops_join_on_band_keys_not_label_alone(spark):
    """The pair-generation ops must never self-join on label alone (an
    O(n²)-per-library all-pairs join): the equi-join keys must include
    the sign-band columns so the candidate shuffle is band-bucketed."""
    for name in ("ann_knn_join", "dedup_embedding_pairs"):
        plan = _plan(E.QUERIES[name](spark, SF))
        key_lines = [
            ln.strip() for ln in plan.splitlines()
            if ln.strip().startswith(("Left keys", "Right keys"))
        ]
        assert key_lines, f"{name}: no equi-join in plan:\n{plan[:2000]}"
        for ln in key_lines:
            assert "band_key" in ln, f"{name}: pair join not band-bucketed: {ln}"


def test_pair_ops_dedup_without_shuffle(spark):
    """Multi-band candidate duplicates must die MAP-SIDE on the
    first-collision predicate (lsh.first_collision), not via distinct:
    a distinct would shuffle the entire candidate pair stream — at
    100 TB the largest intermediate of the pair pipeline. The physical
    plan of a pair query must therefore contain NO aggregate at all
    (the only shuffles are the band-key join and, for knn_join, the
    per-src window)."""
    for name in ("ann_knn_join", "dedup_embedding_pairs",
                 "dedup_simhash_pairs", "dedup_minhash_pairs",
                 "dedup_containment_pairs"):
        plan = _plan(E.QUERIES[name](spark, SF))
        assert "HashAggregate" not in plan and "SortAggregate" not in plan, \
            f"{name} still dedups via an aggregate (distinct) shuffle"


def test_partitioned_write_enables_pruning(spark, tmp_path):
    """At scale the embedding table is written partitionBy(label); verify
    a library-scoped read of that layout prunes to one partition
    directory (the reference's reverse index, storage.py:29, for free)."""
    out = str(tmp_path / "emb_by_label")
    load(spark, SF, "embeddings").write.partitionBy("label").parquet(out)
    df = spark.read.parquet(out).filter(F.col("label") == 3)
    plan = _plan(df)
    assert "PartitionFilters" in plan
    n = df.count()
    expected = load(spark, SF, "embeddings").filter(F.col("label") == 3).count()
    assert n == expected


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """At 100 TB the embeddings and documents tables are bucketed on the
    join key so hydration joins are exchange-free. Verify: two tables
    bucketed by the same key join with NO Exchange operator in the plan
    (sort-merge over co-located buckets)."""
    import uuid

    # (warehouse dir is a static conf — tables land in ./spark-warehouse,
    # dropped in the finally; the dir is gitignored)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        suffix = uuid.uuid4().hex[:8]
        emb_t, doc_t = f"emb_b_{suffix}", f"doc_b_{suffix}"
        load(spark, SF, "embeddings").write.bucketBy(8, "vec_id").sortBy("vec_id") \
            .saveAsTable(emb_t)
        load(spark, SF, "documents").withColumnRenamed("doc_id", "vec_id") \
            .write.bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable(doc_t)
        joined = spark.table(emb_t).join(spark.table(doc_t), "vec_id").select(
            "vec_id", "label", "lang"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {emb_t}")
        spark.sql(f"DROP TABLE IF EXISTS {doc_t}")


def test_salted_join_broadcasts_hot_list_no_cartesian(spark):
    """The skew-salted banded join must broadcast the tiny hot-bucket
    list (never shuffle it) and must not degrade to a cartesian
    product."""
    from vector_db_service_spark.operators import ann

    df = ann.knn_join(spark, SF, m=2, salt=4, hot_bucket_min=2)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_service_status_single_scan(spark):
    """The composed status query aggregates once: ONE parquet scan (via
    the checkpointed rollup), not one per section branch."""
    df = E.QUERIES["obs_service_status"](spark, SF)
    plan = _plan(df)
    assert plan.count("Scan parquet") <= 1


def test_chunking_has_no_shuffle_or_udf(spark):
    """Document chunking is a scan-stage projection + generator: no
    Exchange, no Python UDF."""
    df = E.QUERIES["text_chunk_documents"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "Generate" in plan  # the posexplode



def test_bm25_broadcasts_corpus_stats_and_stays_jvm(spark):
    """BM25 corpus stats (N, avgdl, df) join back as a broadcast scalar —
    no shuffle of the document table on the stats join — and the scoring
    expression contains no Python UDF."""
    from vector_db_service_spark.operators import retrieval

    df = retrieval.bm25_scores(load(spark, SF, "documents"))
    plan = _plan(df)
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan


def test_bloom_filter_bits_are_broadcast(spark):
    """The probe join against the <= m-row bit set must broadcast the
    bit frame, never shuffle the probes."""
    from vector_db_service_spark.operators import sketches

    df = sketches.bloom_membership(spark, SF, key="user_id")
    plan = _plan(df)
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan


def test_spread_for_compute_is_noop_when_parallel(spark):
    """spread_for_compute must NOT inject a shuffle when the input is
    already partitioned to core count — at scale the file count provides
    parallelism and a blanket repartition would shuffle the corpus."""
    from vector_db_service_spark.sources.tables import spread_for_compute

    want = spark.sparkContext.defaultParallelism
    wide = load(spark, SF, "documents").repartition(want)
    again = spread_for_compute(wide)
    assert again is wide  # identical frame: no repartition node added

    narrow = load(spark, SF, "documents").coalesce(1)
    spread = spread_for_compute(narrow)
    assert spread.rdd.getNumPartitions() >= want


def test_contrastive_ring_windows_are_sharded(spark):
    """The negative-sampling ring must never be a single global window:
    every Window node in the plan partitions by the md5 shard key, so
    the ring scales out with the corpus instead of serializing on one
    partition."""
    from vector_db_service_spark.operators import dedup

    df = dedup.contrastive_pairs(load(spark, SF, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines, "expected Window nodes in the contrastive plan"
    for ln in win_lines:
        assert "windowspecdefinition(shard" in ln, ln


def test_recall_sweep_probe_axis_costs_columns_not_copies(spark):
    """Round-10 sweep shape: no per-probe replication of the scored
    pairs (no crossJoin with a probe frame -> no BroadcastNestedLoopJoin
    beyond the single 1-row centroid-matrix fold), exactly TWO window
    passes (per-(query,list) top-k + the running-count sweep), and no
    Python UDF anywhere."""
    import re

    from vector_db_service_spark.operators import ann

    df = ann.ivf_kmeans_recall_sweep(spark, SF)
    plan = _plan(df)
    # exactly two Window EXEC nodes (formatted as "(n) Window");
    # WindowGroupLimit pre-prunes their inputs and is asserted below
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2, plan
    assert "WindowGroupLimit" in plan  # rank<=k pushed below the sort
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the only nested-loop joins are the two tiny broadcast folds (the
    # 1-row centroid matrix and the |queries|-row literal frame)
    assert plan.count("BroadcastNestedLoopJoin (") <= 2 or (
        len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 2
    )


def test_allpairs_stays_jvm_side_with_no_cartesian(spark):
    """The allpairs pipeline contains no Python evaluation and no
    cartesian product (the window-vs-join df property is pinned by
    test_allpairs_per_doc_windows_fuse_into_one_pass below, which can
    see past the checkpoint)."""
    from vector_db_service_spark.operators import dedup

    df = dedup.allpairs_cosine(load(spark, SF, "documents").limit(80))
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_allpairs_per_doc_windows_fuse_into_one_pass(spark, monkeypatch):
    """Round-10: norm2, tail2, and the wrap-guard count share one
    (partitionBy doc, orderBy idf desc/tok) spec, so Catalyst plans
    exactly TWO Window operators for the whole pipeline — the tok-idf
    count and ONE fused sorted per-doc pass — not an ordered pass plus
    a second unordered buffering pass over the weight frame. (The
    localCheckpoint is bypassed so the window stages stay visible.)"""
    import re

    # pyspark 4: classic frames are the subclass that OVERRIDES
    # localCheckpoint — patching the pyspark.sql.DataFrame facade is a
    # no-op for them
    from pyspark.sql.classic.dataframe import DataFrame

    from vector_db_service_spark.operators import dedup

    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    df = dedup.allpairs_cosine(load(spark, SF, "documents").limit(80))
    plan = _plan(df)
    # without the checkpoint the weight frame appears once per consumer
    # (prefix left/right + the two vec attaches), so count PER COPY:
    # fused means exactly as many doc-partitioned Window nodes as
    # tok-partitioned ones (1:1); the unfused shape had 2:1
    doc_w = tok_w = 0
    for section in re.split(r"\n\n+", plan):
        if not re.match(r"\(\d+\) Window", section):
            continue
        if "windowspecdefinition(doc_id" in section:
            doc_w += 1
        elif "windowspecdefinition(tok" in section:
            tok_w += 1
    # tok_w > 0 doubles as the round-10 df-as-window pin: document
    # frequency comes from a tok-partitioned window over the tf frame
    # — the former groupBy-then-join shape shows ZERO tok windows
    assert doc_w > 0 and doc_w == tok_w, (doc_w, tok_w)


def test_allpairs_suffix_filter_runs_below_the_pair_aggregation(spark):
    """Round-11: the positional suffix filter is applied PER ROW inside
    the candidate join stage (its monotonicity along the global feature
    order makes that exactly equivalent to testing the first shared
    token after aggregation), so the physical plan must show (a) no
    max_by anywhere — the old shape carried the first-token tails
    through a max_by(struct,struct) — and (b) the tail2-vs-norm2
    compare evaluated STRICTLY UPSTREAM of the (doc_id_1, doc_id_2)
    pair aggregate. In practice Catalyst merges the compare into the
    tok join's own condition (failing collisions never materialize at
    all); formatted-explain operator ids grow downstream (leaf = 1), so
    upstream-ness is id(compare node) < id(pair aggregate)."""
    import re

    from vector_db_service_spark.operators import dedup

    df = dedup.allpairs_cosine(load(spark, SF, "documents").limit(80))
    plan = _plan(df)
    assert "max_by" not in plan
    cmp_ids, agg_ids = [], []
    for sec in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) (\w+)", sec)
        if not m:
            continue
        op_id, op = int(m.group(1)), m.group(2)
        if (
            op in ("Filter", "BroadcastHashJoin", "SortMergeJoin",
                   "ShuffledHashJoin")
            and "tail2_1" in sec and "tail2_2" in sec and "norm2_1" in sec
        ):
            cmp_ids.append(op_id)
        if (
            "Aggregate" in op
            and re.search(r"Keys \[2\]: \[doc_id_1#\d+L, doc_id_2#\d+L\]", sec)
        ):
            agg_ids.append(op_id)
    assert cmp_ids, "row-level suffix compare not found in any join/filter"
    assert agg_ids, "pair aggregate not found"
    assert min(cmp_ids) < min(agg_ids), (cmp_ids, agg_ids)


def test_index_recall_report_has_no_roundrobin_spread(spark):
    """Round-12 kept spread_for_compute OFF the recall report
    deliberately: the A/B measured the extra round-robin exchange + wider
    checkpoints REGRESSING this linear per-vector scan 2.2 -> 4.3 s
    (spread only pays where join output is superlinear in input). Pin
    that decision structurally so a future blanket-spread refactor can't
    silently re-add the exchange: no RoundRobinPartitioning anywhere in
    the plan (verdict r12 #7)."""
    from vector_db_service_spark.operators import ann

    df = ann.index_recall_report(spark, SF, k=10)
    assert "RoundRobinPartitioning" not in _plan(df)


def test_range_search_is_scan_plus_filter_only(spark):
    """Radius search must stay the cheapest shape in the file: one
    codegen'd scan + filter, NO Exchange of any kind (no shuffle, no
    broadcast) — a top-k sort or repartition sneaking in would break
    the zero-shuffle claim the operator is registered under."""
    from vector_db_service_spark.operators import knn as knn_ops

    plan = _plan(knn_ops.range_search(spark, SF, query_id=0, min_score=0.2))
    assert "Exchange" not in plan
    assert "Sort" not in plan


def test_phash_near_dups_no_cartesian(spark):
    """The perceptual-hash pair join must stay a block equi-join —
    never a cartesian/nested-loop pair expansion."""
    from vector_db_service_spark.operators import multimodal as mm

    plan = _plan(mm.phash_near_dups(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pca_project2d_is_shuffle_free(spark):
    """The 2-D PCA transform must be a pure scan+project: directions are
    broadcast literals, so the plan carries NO exchange and no join at
    all — the row-parallel shape that holds at 100 TB."""
    from vector_db_service_spark.operators import ann

    plan = _plan(ann.pca_project2d(spark, SF))
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_refit_lifecycle_recall_has_no_sort_merge_join(spark):
    """The chained lifecycle measurement must keep the r15 broadcast
    discipline: every bounded side (exact top-k, probe maps, hits)
    broadcasts — a SortMergeJoin would mean a full-width exchange per
    branch."""
    from vector_db_service_spark.streaming import pipeline as sp

    plan = _plan(sp.ivf_refit_lifecycle_recall(spark, SF))
    assert "SortMergeJoin" not in plan


def test_rerank_sweep_windows_are_bounded(spark):
    """The multi-query rerank sweep's only window must run over the
    budget-cut frame (<= nq * max(budget) rows), never the corpus: the
    corpus-sized per-query cut rides multi_query_topk's map-side
    partial (ArrowEvalPython/mapInPandas stage), not a Window."""
    from vector_db_service_spark.operators import ann

    plan = _plan(
        ann.ivfpq_rerank_sweep(spark, SF, query_ids=list(range(10)), k=10)
    )
    # exactly one Window OPERATOR (the bounded budget re-rank; its
    # rn <= k predicate also shows up as WindowGroupLimit pushdown)
    assert plan.count("+- Window ") + plan.count(":- Window ") == 1
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_brp_approx_knn_deterministic_cut_plan(spark):
    """The rewritten BRP probe (ties-fixture fix) must keep the serving
    shape it claims: the final cut compiles to TakeOrderedAndProject
    (never a full-corpus sort exchange), the probe side broadcasts, and
    no SortMergeJoin or Python UDF appears anywhere in the plan."""
    from vector_db_service_spark.operators import mllib_index

    plan = _plan(mllib_index.brp_approx_knn(spark, SF, query_id=0, k=10))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # probe + candidate semi-joins
