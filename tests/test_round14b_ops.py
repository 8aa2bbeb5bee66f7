"""Round-14 continuation pins: NN-descent refinement and BPE encode.

* nn_descent_refine — the candidate superset can only IMPROVE the
  per-node top-m (element-wise score dominance over the base graph),
  the output honors the knn_join contract (per-src rank order, within-
  label edges), and the plan keeps the multi_query_topk contract (no
  full-width Window exchange).
* bpe_encode_stats — token conservation (histogram covers every corpus
  token exactly once) and monotone compression (more merges never
  lengthen an encoding).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL as SF
from vector_db_service_spark.operators import ann, textops
from vector_db_service_spark.sources.tables import load


def _by_src(rows):
    out = {}
    for r in rows:
        out.setdefault(r.src, []).append(r)
    for rs in out.values():
        rs.sort(key=lambda r: r.rnk)
    return out


def test_nn_descent_dominates_base_graph(spark):
    m = 3
    base = _by_src(ann.knn_join(spark, SF, m=m).collect())
    refined = _by_src(ann.nn_descent_refine(spark, SF, m=m).collect())
    # every base node survives (candidates are a superset of its base
    # edges), ranks are contiguous, order is (score desc, dst asc)
    assert set(base) <= set(refined)
    improved = 0
    for src, rs in refined.items():
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r.score, r.dst) for r in rs]
        assert keys == sorted(keys)
        if src in base:
            b = base[src]
            # element-wise dominance: the refined rank-i score is >= the
            # base rank-i score (the refined top-m is picked from a
            # candidate superset under the same total order)
            for i in range(min(len(b), len(rs))):
                assert rs[i].score >= b[i].score, (src, i)
            assert len(rs) >= len(b)
            if [r.dst for r in rs] != [r.dst for r in b]:
                improved += 1
    # the banded base graph is not already exact on this corpus — the
    # refinement round must actually move at least one node's list
    assert improved > 0


def test_nn_descent_edges_stay_within_label(spark):
    ref = ann.nn_descent_refine(spark, SF, m=3)
    lab = load(spark, SF, "embeddings").select("vec_id", "label")
    bad = (
        ref.join(
            lab.select(F.col("vec_id").alias("src"),
                       F.col("label").alias("src_label")), "src")
        .join(
            lab.select(F.col("vec_id").alias("dst"),
                       F.col("label").alias("dst_label")), "dst")
        .filter(
            (F.col("label") != F.col("src_label"))
            | (F.col("label") != F.col("dst_label"))
        )
    )
    assert bad.isEmpty()


def test_nn_descent_plan_has_no_window_exchange(spark):
    df = ann.nn_descent_refine(spark, SF, m=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the base knn_join ranks via its own window; the REFINEMENT cut
    # must go through multi_query_topk's map-side partial top-k — the
    # only Window nodes allowed are knn_join's src-partitioned one
    assert "MapInPandas" in plan
    assert plan.count("Window") <= 1


def test_bpe_encode_token_conservation(spark):
    docs = load(spark, SF, "documents")
    hist = textops.bpe_encode_stats(docs, n_merges=5).collect()
    n_words_corpus = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.length("w") >= 1)
    )
    total_occ = n_words_corpus.count()
    vocab = n_words_corpus.distinct().count()
    assert sum(r.n_occurrences for r in hist) == total_occ
    assert sum(r.n_words for r in hist) == vocab
    assert all(r.n_tokens >= 1 for r in hist)


def test_bpe_encode_more_merges_never_lengthen(spark):
    docs = load(spark, SF, "documents")

    def weighted_tokens(n_merges):
        rows = textops.bpe_encode_stats(docs, n_merges=n_merges).collect()
        return sum(r.n_tokens * r.n_occurrences for r in rows)

    t0, t5 = weighted_tokens(0), weighted_tokens(5)
    # 0 merges = char-level; each adopted merge strictly reduces the
    # weighted token count by its occurrence count
    assert t5 < t0


def test_audio_spectral_bins_and_dominance(spark):
    from vector_db_service_spark.operators import multimodal as mm

    rows = mm.audio_spectral(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        assert sorted(r.bin for r in rs) == sorted(mm.SPECTRAL_BINS)
        doms = [r for r in rs if r.is_dominant]
        assert len(doms) == 1, doc_id
        # the dominant row carries the max (energy, -bin) key
        best = max(rs, key=lambda r: (r.energy, -r.bin))
        assert doms[0].bin == best.bin
        for r in rs:
            assert r.energy == abs(r.re_sum) + abs(r.im_sum)


def test_store_compaction_one_file_per_label_and_history_intact(spark, tmp_path):
    import os

    from vector_db_service_spark.operators import store as st

    manifest, out_dir = st.versioned_cdc_merge(spark, SF,
                                               out_dir=str(tmp_path))
    before = max(v for (v, _l) in manifest)
    pre_manifest = dict(manifest)
    pre = st._versioned_read(spark, manifest, before)
    pre_rows = sorted((r.vec_id, r.label, tuple(r.embedding))
                      for r in pre.collect())
    v0_rows = st._versioned_read(spark, manifest, 0).count()

    after = st.compact_latest(spark, manifest, out_dir)

    def data_files(d):
        return [f for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith(("_", "."))]

    # exactly one data file per label dir in the compaction commit
    for (v, _label), d in manifest.items():
        if v == after:
            assert len(data_files(d)) == 1, d
    # at least one pre-compaction label dir was actually fragmented —
    # otherwise the op compacts nothing and the pin is vacuous
    assert any(
        len(data_files(d)) > 1 for (v, _l), d in pre_manifest.items()
    ), "corpus writes produced no multi-file label dir; pin is vacuous"
    # content identical through the manifest, history still readable
    post = st._versioned_read(spark, manifest, after)
    post_rows = sorted((r.vec_id, r.label, tuple(r.embedding))
                       for r in post.collect())
    assert post_rows == pre_rows
    assert st._versioned_read(spark, manifest, 0).count() == v0_rows


def test_late_data_audit_exercises_both_late_paths(spark):
    from vector_db_service_spark.streaming import pipeline as sp

    rows = {r.slot: r for r in sp.late_data_audit_stream(spark, SF).collect()}
    # the never-finalized windows (slot 6 = the final tick, and nothing
    # beyond) must NOT be emitted in append mode
    assert 6 not in rows
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    # stragglers for evicted windows were dropped...
    assert all(rows[s].n_late_dropped > 0 for s in range(5))
    assert all(rows[s].n_late_accepted == 0 for s in range(5))
    # ...and stragglers for the still-open slot-5 window were accepted
    # and emitted once the final tick closed it
    assert rows[5].n_late_accepted > 0
    assert rows[5].n_late_dropped == 0
    # accepted rows are part of the emitted count
    assert rows[5].n_events > rows[5].n_late_accepted


def test_pca_power_iteration_matches_numpy_eigenvector(spark):
    import numpy as np

    rows = ann.pca_power_iteration(spark, SF).collect()
    v = np.array([r.v_scaled for r in sorted(rows, key=lambda r: r.dim_idx)],
                 dtype=np.float64)
    emb = load(spark, SF, "embeddings").select("embedding").collect()
    X = np.array([
        np.round(np.asarray(r.embedding, dtype=np.float64) * 100)
        for r in emb
    ])
    G = X.T @ X
    evals, evecs = np.linalg.eigh(G)
    top = evecs[:, -1]
    cos = abs(float(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top)))
    # 8 integer power-iteration rounds must land on the dominant
    # eigendirection of the same quantized Gram matrix
    assert cos > 0.999, cos


def test_pca_power_iteration_overflow_guard(spark, monkeypatch):
    import pytest as _pytest

    monkeypatch.setattr(ann, "row_count", lambda *a, **k: 2 ** 40)
    with _pytest.raises(ValueError, match="int64 envelope"):
        ann.pca_power_iteration(spark, SF)


def test_knn_triangles_match_bruteforce(spark):
    from itertools import combinations

    pairs = ann.mutual_knn_pairs(spark, SF, m=3).collect()
    adj, nodes = {}, {}
    for r in pairs:
        adj.setdefault(r.label, set()).add((r.vec_id_a, r.vec_id_b))
        nodes.setdefault(r.label, set()).update((r.vec_id_a, r.vec_id_b))
    expected = {}
    for lbl, es in adj.items():
        und = es | {(b, a) for a, b in es}
        tri = sum(
            1
            for a, b, c in combinations(sorted(nodes[lbl]), 3)
            if (a, b) in und and (b, c) in und and (a, c) in und
        )
        deg = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
        wed = sum(d * (d - 1) // 2 for d in deg.values())
        expected[lbl] = (len(es), wed, tri)
    got = {
        r.label: (r.n_edges, r.n_wedges, r.n_triangles)
        for r in ann.mutual_knn_triangles(spark, SF, m=3).collect()
    }
    assert got == expected
    # the corpus must actually close at least one triangle somewhere,
    # or the census is vacuous
    assert any(t for (_e, _w, t) in expected.values())


def test_scd2_intervals_are_contiguous_and_typed(spark):
    from vector_db_service_spark.operators import relational

    rows = relational.scd2_user_history(spark, SF).collect()
    ev = load(spark, SF, "events")
    per_user_events = {
        r.user_id: r.n for r in
        ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: r.version_no)
        assert [v.version_no for v in vs] == list(range(1, len(vs) + 1))
        # exactly one open (current) version, and it is the last
        assert [v.valid_to_us for v in vs].count(-1) == 1
        assert vs[-1].valid_to_us == -1
        for a, b in zip(vs, vs[1:]):
            # contiguous: each interval closes where the next opens
            assert a.valid_to_us == b.valid_from_us
            # a version exists only because the type changed
            assert a.event_type != b.event_type
        assert sum(v.n_events for v in vs) == per_user_events[uid]


def test_scene_cuts_threshold_is_discriminative(spark):
    from vector_db_service_spark.operators import multimodal as mm

    rows = mm.scene_cuts(spark, SF).collect()
    assert all(r.n_pairs == max(0, r.n_frames - 1) for r in rows)
    assert all(0 <= r.n_cuts <= r.n_pairs for r in rows)
    with_pairs = [r for r in rows if r.n_pairs > 0]
    assert with_pairs
    # the pinned threshold must actually split the corpus: some pairs
    # cut, some do not — otherwise the screen is vacuous
    assert any(r.n_cuts > 0 for r in with_pairs)
    assert any(r.n_cuts < r.n_pairs for r in with_pairs)
    for r in rows:
        if r.n_pairs == 0:
            assert r.max_diff == 0 and r.sum_diff == 0 and r.n_cuts == 0
        else:
            assert r.max_diff <= r.sum_diff


def test_nn_descent_improves_recall_vs_true_topm(spark):
    import numpy as np

    m = 3
    emb = load(spark, SF, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(
            (r.vec_id, np.asarray(r.embedding, dtype=np.float64))
        )
    true_top = {}
    for _lbl, rows in by_label.items():
        ids = [i for i, _ in rows]
        X = np.stack([v for _, v in rows])
        nrm = np.linalg.norm(X, axis=1)
        nrm[nrm == 0] = 1.0
        S = (X / nrm[:, None]) @ (X / nrm[:, None]).T
        for a, vid in enumerate(ids):
            order = sorted(
                ((round(S[a, b], 6), ids[b]) for b in range(len(ids))
                 if b != a),
                key=lambda t: (-t[0], t[1]),
            )
            true_top[vid] = {v for _s, v in order[:m]}

    def recall(edges):
        hit = tot = 0
        by_src = {}
        for r in edges:
            by_src.setdefault(r.src, set()).add(r.dst)
        for src, true in true_top.items():
            got = by_src.get(src, set())
            hit += len(got & true)
            tot += len(true)
        return hit / tot

    r_base = recall(ann.knn_join(spark, SF, m=m).collect())
    r_ref = recall(ann.nn_descent_refine(spark, SF, m=m).collect())
    # one NN-descent round must strictly improve banded recall toward
    # the true graph on this corpus (and never regress anywhere)
    assert r_ref > r_base, (r_base, r_ref)


def test_nn_descent_recall_report_shows_strict_gain(spark):
    rows = {r.stage: r for r in ann.nn_descent_recall(spark, SF).collect()}
    assert set(rows) == {"banded_base", "nn_descent_r1", "nn_descent_r2"}
    b, r1, r2 = (rows["banded_base"], rows["nn_descent_r1"],
                 rows["nn_descent_r2"])
    assert b.total == r1.total == r2.total > 0
    assert r1.hits > b.hits  # the first round must buy real recall
    assert r2.hits >= r1.hits  # rounds are monotone toward the truth
    assert r1.recall_micro == (r1.hits * 1_000_000) // r1.total


def test_lsh_multiprobe_expands_the_candidate_set(spark):
    from vector_db_service_spark.operators import lsh as lsh_ops
    from vector_db_service_spark.sources.tables import row_count

    band_bits = lsh_ops.auto_band_bits(row_count(SF, "embeddings"), None)
    qvec, _ = __import__(
        "vector_db_service_spark.operators.knn", fromlist=["query_vector_row"]
    ).query_vector_row(spark, SF, 0)
    planes = lsh_ops.hyperplanes(
        len(qvec), lsh_ops.N_SIGN_BANDS * band_bits, lsh_ops.SEED
    )
    qbits = lsh_ops.query_bits(qvec, planes)
    qkeys = [
        sum(qbits[b * band_bits + i] << i for i in range(band_bits))
        for b in range(lsh_ops.N_SIGN_BANDS)
    ]
    from vector_db_service_spark.sources.tables import load as _load

    emb = _load(spark, SF, "embeddings").withColumn(
        "_bands", lsh_ops.band_keys("embedding", planes, band_bits)
    )
    qk = ", ".join(str(x) for x in qkeys)
    exact = emb.filter(F.expr(
        f"exists(zip_with(_bands, array({qk}), (a, b) -> a = b), x -> x)"
    )).count()
    probe1 = emb.filter(F.expr(
        f"exists(zip_with(_bands, array({qk}), "
        f"(a, b) -> bit_count(a ^ b) <= 1), x -> x)"
    )).count()
    # Hamming-1 expansion must strictly widen the candidate set (that
    # is the recall it buys), and the exact buckets are a subset
    assert probe1 > exact > 0
    res = lsh_ops.multiprobe_search(spark, SF, query_id=0, k=10)
    rows = res.collect()
    keys = [(-r.score, r.vec_id) for r in rows]
    assert keys == sorted(keys) and len(rows) == 10


def test_ivm_replay_is_idempotent(spark, tmp_path):
    import os

    from vector_db_service_spark.streaming import pipeline as sp

    paths = sp.ivm_init(spark, SF, out_dir=str(tmp_path))
    log = spark.read.parquet(paths["log"]).localCheckpoint(eager=True)
    sp.ivm_apply_batch(spark, paths, log, 0)
    snap = os.path.join(paths["stats"], "batch=0")
    first = sorted(map(tuple, spark.read.parquet(snap).collect()))
    # crash-replay: the same batch applied again must reproduce the
    # identical snapshot (it recomputes from batch=-1 + the same delta)
    sp.ivm_apply_batch(spark, paths, log, 0)
    second = sorted(map(tuple, spark.read.parquet(snap).collect()))
    assert first == second
    # and the maintained view equals a from-scratch recompute over the
    # CDC-merged corpus (deletes dropped, updates reversed)
    base = load(spark, SF, "embeddings")
    is_del = F.col("vec_id") % 13 == 7
    is_upd = F.col("vec_id") % 11 == 5
    post = base.filter(~is_del).select(
        "label",
        F.when(is_upd, F.reverse("embedding")).otherwise(
            F.col("embedding")
        ).alias("embedding"),
    )
    expected = sorted(
        map(tuple, post.groupBy("label").agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.sum(F.expr(sp._E0_US)).cast("long").alias("sum_e0_us"),
        ).collect())
    )
    assert first == expected


def test_graph_beam_search_walk_properties(spark):
    r1 = ann.graph_beam_search(spark, SF, query_id=0, k=10, rounds=1).collect()
    r2 = ann.graph_beam_search(spark, SF, query_id=0, k=10, rounds=2).collect()
    for rows in (r1, r2):
        keys = [(-r.score, r.vec_id) for r in rows]
        assert keys == sorted(keys) and len(rows) == 10
    # query_id 0 sits in the entry layer (0 % sample_mod == 0), so the
    # walk's best hit is the query itself at cosine 1.0
    assert r2[0].vec_id == 0 and r2[0].score == 1.0
    # more rounds only grow the visited set: the rank-i score can never
    # get worse
    for a, b in zip(r1, r2):
        assert b.score >= a.score


def test_store_clone_is_zero_copy_and_source_untouched(spark, tmp_path):
    import os

    from vector_db_service_spark.operators import store as st

    manifest, out_dir = st.versioned_cdc_merge(spark, SF,
                                               out_dir=str(tmp_path))
    latest = max(v for (v, _l) in manifest)

    def tree_state(root):
        out = {}
        for r, _d, files in os.walk(root):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(r, f)
                stt = os.stat(p)
                out[os.path.relpath(p, root)] = (stt.st_size, stt.st_mtime_ns)
        return out

    before = tree_state(out_dir)
    # shallow clone + clone-side COW mutation, exactly as the operator
    pick = {}
    for (v, label), d in manifest.items():
        if label not in pick or pick[label][0] < v:
            pick[label] = (v, d)
    clone_manifest = {(0, label): d for label, (_v, d) in pick.items()}
    clone_dir = str(tmp_path) + "_clone_tree"  # OUTSIDE the source tree
    cur = st._versioned_read(spark, clone_manifest, 0)
    is_mut = F.col("vec_id") % 19 == 3
    affected = sorted(
        r["label"] for r in
        cur.filter(is_mut).select("label").distinct().collect()
    )
    post = cur.filter(F.col("label").isin(affected)).select(
        "vec_id",
        F.when(is_mut, F.transform("embedding", lambda x: -x))
        .otherwise(F.col("embedding")).alias("embedding"),
        "label",
    )
    v1 = os.path.join(clone_dir, "v1")
    post.write.mode("overwrite").partitionBy("label").parquet(v1)
    for label in affected:
        clone_manifest[(1, label)] = os.path.join(v1, f"label={label}")
    # ZERO-COPY: the source tree is byte-for-byte untouched (same
    # files, sizes, mtimes) — cloning plus clone-side writes moved no
    # source data
    assert tree_state(out_dir) == before
    # and the clone's head actually diverged from the source's
    src = st._versioned_read(spark, manifest, latest)
    cl = st._versioned_read(spark, clone_manifest, 1)
    try:
        assert src.count() == cl.count()
        assert cl.exceptAll(src).count() > 0
    finally:
        import shutil

        shutil.rmtree(clone_dir, ignore_errors=True)


def test_rake_phrases_never_contain_stopwords(spark):
    from vector_db_service_spark.functions.text import STOPWORDS

    rows = textops.rake_keyphrases(load(spark, SF, "documents"), k=3).collect()
    assert rows
    stops = set(STOPWORDS["en"])
    for r in rows:
        ws = r.phrase.split(" ")
        assert ws and all(w and w not in stops for w in ws), r.phrase
        assert 1 <= r.rnk <= 3 and r.score_us >= 1_000_000  # deg/freq >= 1
    # multi-word phrases must exist — RAKE's point over unigram keywords
    assert any(" " in r.phrase for r in rows)


def test_epoch_shuffle_orders_decorrelate(spark):
    rows = textops.epoch_shuffle(load(spark, SF, "documents"),
                                 epochs=2, n=20).collect()
    e1 = [r.doc_id for r in sorted(
        (r for r in rows if r.epoch == 1), key=lambda r: r.position)]
    e2 = [r.doc_id for r in sorted(
        (r for r in rows if r.epoch == 2), key=lambda r: r.position)]
    assert len(e1) == len(e2) == 20
    assert len(set(e1)) == len(set(e2)) == 20
    # different epochs must produce genuinely different orders
    assert e1 != e2
    # reproducibility: the same epoch re-run is identical
    again = textops.epoch_shuffle(load(spark, SF, "documents"),
                                  epochs=1, n=20).collect()
    assert [r.doc_id for r in sorted(again, key=lambda r: r.position)] == e1


def test_graph_maintenance_untouched_partitions_byte_identical(spark, tmp_path):
    import os

    from vector_db_service_spark.streaming import pipeline as sp

    paths = sp.knn_graph_maintenance_init(spark, SF, out_dir=str(tmp_path))

    def snap(root, labels):
        out = {}
        for lbl in labels:
            d = os.path.join(root, f"label={lbl}")
            for f in sorted(os.listdir(d)):
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(d, f)
                stt = os.stat(p)
                out[(lbl, f)] = (stt.st_size, stt.st_mtime_ns)
        return out

    all_labels = {
        int(d.split("=")[1]) for d in os.listdir(paths["store"])
        if d.startswith("label=")
    }
    untouched = sorted(all_labels - set(sp._MUT_LABELS))
    assert untouched, "need at least one unmutated label"
    before = snap(paths["store"], untouched)

    sp.knn_graph_maintenance_run(spark, SF, paths)

    # labels the mutation feed never touches keep byte-identical
    # partition directories — the rebuild is genuinely partition-scoped
    assert snap(paths["store"], untouched) == before
    # and the incremental post-state equals a from-scratch rebuild over
    # the mutated corpus
    from pyspark.sql import functions as SF_
    from vector_db_service_spark.operators import ann
    from vector_db_service_spark.sources.tables import (
        embedding_dim, load as _load, spread_for_compute,
    )

    base = _load(spark, SF, "embeddings")
    post = base.select(
        "vec_id", "label",
        SF_.when(
            SF_.col("label").isin(*sp._MUT_LABELS)
            & (SF_.col("vec_id") % sp._MUT_MOD == sp._MUT_REM),
            SF_.transform("embedding", lambda x: -x),
        ).otherwise(SF_.col("embedding")).alias("embedding"),
    )
    scratch = ann.knn_join_frame(
        spread_for_compute(post), embedding_dim(SF), m=3,
        band_bits=paths["band_bits"],
    )
    maintained = spark.read.parquet(paths["store"]).select(
        "label", "src", "dst", "score", "rnk"
    )
    assert maintained.exceptAll(scratch).isEmpty()
    assert scratch.exceptAll(maintained).isEmpty()


def test_ood_zscore_tracks_float_zscore(spark):
    import numpy as np

    rows = ann.ood_zscore(spark, SF, top=25).collect()
    got = [r.vec_id for r in rows]
    emb = load(spark, SF, "embeddings").collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(
            (r.vec_id, np.asarray(r.embedding, dtype=np.float64))
        )
    scores = {}
    for _lbl, rs in by_label.items():
        X = np.stack([v for _, v in rs])
        mu = X.mean(axis=0)
        var = X.var(axis=0)
        var[var == 0] = 1.0
        z = (((X - mu) ** 2) / var).sum(axis=1)
        for (vid, _), s in zip(rs, z):
            scores[vid] = s
    float_top = {v for v, _ in sorted(
        scores.items(), key=lambda t: (-t[1], t[0]))[:25]}
    # the integer micro-unit screen must substantially agree with the
    # float z-score it approximates (floor rounding can reorder close
    # calls, never the bulk)
    assert len(set(got) & float_top) >= 18, (sorted(got), sorted(float_top))


def test_phash_components_match_union_find(spark):
    from vector_db_service_spark.operators import multimodal as mm

    pairs = mm.phash_near_dups(spark, SF, max_hamming=3).collect()
    docs = [r.doc_id for r in
            load(spark, SF, "documents").select("doc_id").collect()]
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r.doc_id_1), find(r.doc_id_2)
        if a != b:
            parent[max(a, b)] = min(a, b)
    expected = {}
    for d in docs:
        expected[find(d)] = expected.get(find(d), 0) + 1
    got = {r.comp: r.n_docs for r in
           mm.phash_components(spark, SF, max_hamming=3).collect()}
    assert got == expected
    assert any(n > 1 for n in expected.values())  # real clusters exist


def test_bloom_join_prune_never_loses_a_match(spark):
    from vector_db_service_spark.operators import sketches as sk

    row = sk.bloom_join_prune(spark, SF, nation=1).collect()[0]
    # no false negatives: every true match passes the filter
    assert row.n_bloom_pass >= row.n_true_match > 0
    assert row.n_false_positive == row.n_bloom_pass - row.n_true_match
    # the filter must actually prune (the audit is vacuous otherwise)
    assert row.pruned_ppm > 500_000


def test_min_contract_components_random_graphs(spark):
    # property check beyond the fixed chain pin: on arbitrary random
    # graphs (seeded, deterministic), the pointer-jumped contraction
    # must match a union-find ground truth within the log2 round bound
    import random

    for seed in (7, 41, 1337):
        rng = random.Random(seed)
        n = 120
        edges = set()
        for _ in range(150):
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        for v in range(n):
            if any(v in e for e in edges):
                expected[v] = find(v)
        sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
        df = spark.createDataFrame(sym, "src long, dst long").coalesce(4)
        rep = ann._min_contract_components(
            df.localCheckpoint(eager=False), iter_parts=4, max_rounds=8
        )
        got = {r.cnode: r.rep for r in rep.collect()}
        assert got == expected, seed
