"""Text-analysis queries over the documents table (training-data
pipeline surface): token stats, quality scoring, language-ID,
fingerprinting. All pure column expressions — one codegen'd projection
per document, embarrassingly parallel at any scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def token_stats(docs: DataFrame) -> DataFrame:
    toks = T.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        T.word_count(F.col("text")).alias("n_words"),
        T.alpha_chars(F.col("text")).alias("n_alpha"),
        F.length("text").alias("n_chars_actual"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: mean token length, stopword ratio,
    alpha density — the standard cheap pre-filters for corpus curation."""
    toks = T.tokens(F.col("text"))
    n_tokens = F.size(toks).cast("double")
    mean_tok_len = F.round(
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double"))
        / n_tokens,
        6,
    )
    stop_ratio = F.round(T.stopword_hits(F.col("text"), "en").cast("double") / n_tokens, 6)
    # try_divide: an EMPTY document has length 0 and Spark 4 ANSI raises
    # on double/0 where DuckDB yields NULL — the dup-text fixture
    # (tests/test_duptext_parity.py) crashed here. NULL is the honest
    # value for "alpha density of nothing" and matches the oracle.
    alpha_density = F.round(
        F.try_divide(
            T.alpha_chars(F.col("text")).cast("double"),
            F.length("text").cast("double"),
        ),
        6,
    )
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        alpha_density.alias("alpha_density"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-hit language heuristic with per-language hit counts and
    the arg-max prediction (alphabetical tie-break)."""
    cols = [F.col("doc_id"), F.col("lang").alias("actual_lang")]
    for lang in T.LANGS:
        cols.append(T.stopword_hits(F.col("text"), lang).alias(f"hits_{lang}"))
    cols.append(T.predicted_lang(F.col("text")).alias("pred_lang"))
    return docs.select(*cols)


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 + rolling token-polynomial hash."""
    from ..sources.tables import spread_for_compute

    return spread_for_compute(docs).select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        T.rolling_fingerprint(F.col("text")).alias("roll_hash"),
    )


def corpus_language_summary(docs: DataFrame) -> DataFrame:
    """Predicted-vs-actual language confusion counts — grouped agg over
    the language-ID projection."""
    pred = T.predicted_lang(F.col("text"))
    return (
        docs.select(F.col("lang").alias("actual_lang"), pred.alias("pred_lang"))
        .groupBy("actual_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def bpe_token_estimate(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting: whitespace tokens plus a subword estimate
    (ceil(len/4) pieces per word — the ~4-chars-per-token heuristic of
    byte-pair vocabularies) and a punctuation count. The cheap
    token-budget estimator a corpus pipeline runs before expensive real
    tokenization."""
    toks = T.tokens(F.col("text"))
    subword = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    punct = F.regexp_count(F.lower(F.col("text")), F.lit("[^a-z0-9 ]"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        subword.alias("n_bpe_est"),
        punct.alias("n_punct"),
        (subword + punct.cast("long")).alias("n_total_est"),
    )


def curation_funnel(docs: DataFrame) -> DataFrame:
    """The corpus-curation funnel as one query: quality-score every doc
    (token count, stopword ratio, alpha density), apply the standard
    keep thresholds, and report per-language survivor counts + rates.
    This is the composite the other text ops exist to feed."""
    toks = T.tokens(F.col("text"))
    n_tokens = F.size(toks)
    # try_divide: empty text -> NULL (not an ANSI divide-by-zero raise);
    # NULL >= 0.6 is NULL, so empty docs drop out of `keep` exactly as
    # the DuckDB oracle's NULL-yielding division does
    alpha_density = F.try_divide(
        T.alpha_chars(F.col("text")).cast("double"),
        F.length("text").cast("double"),
    )
    keep = (n_tokens >= 10) & (alpha_density >= 0.6)
    return (
        docs.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.round(
                F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("keep_rate"),
        )
    )


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 16, overlap: int = 4
) -> DataFrame:
    """Document -> chunk splitting, the ingest step the reference expects
    its callers to have done before `create_document_with_chunks`
    (reference services/document_service.py:21-60 assigns each incoming
    chunk a `sentence_number`; schemas/chunk_schema.py carries it).
    Pipeline form: a sliding token window of `chunk_tokens` with
    `overlap` tokens carried between consecutive chunks — the standard
    LLM-corpus chunking. One projection + one posexplode, no shuffle, no
    UDF; at 100 TB this runs entirely inside the scan stage.

    Chunk numbering is deterministic: chunk i covers tokens
    [i*stride, i*stride + chunk_tokens) with stride = chunk_tokens -
    overlap; every document yields >= 1 chunk."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    # a NULL-text document has nothing to chunk: no chunk rows (the SQL
    # mirror filters identically; empty text still yields one chunk)
    docs = docs.filter(F.col("text").isNotNull())
    toks = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        F.ceil(F.size("toks") / F.lit(stride)).cast("int"), F.lit(1)
    )
    start = F.col("sentence_number") * stride + 1
    piece = F.slice(F.col("toks"), start, chunk_tokens)
    return (
        docs.select("doc_id", "lang", toks.alias("toks"))
        .select(
            "doc_id",
            "lang",
            "toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("sentence_number"),
        )
        .select(
            "doc_id",
            "lang",
            F.col("sentence_number").cast("int").alias("sentence_number"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).alias("n_tokens"),
        )
    )


def chunk_documents_sql(chunk_tokens: int = 16, overlap: int = 4) -> str:
    """DuckDB mirror of chunk_documents (identical window arithmetic)."""
    stride = chunk_tokens - overlap
    return f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
  WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, lang, toks,
         unnest(range(0, GREATEST(CAST(ceil(len(toks) / {stride}.0) AS BIGINT), 1)))
           AS sn
  FROM t
)
SELECT doc_id, lang, CAST(sn AS INT) AS sentence_number,
       array_to_string(toks[sn*{stride}+1 : sn*{stride}+{chunk_tokens}], ' ')
         AS chunk_text,
       len(toks[sn*{stride}+1 : sn*{stride}+{chunk_tokens}]) AS n_tokens
FROM c
"""


def stratified_sample(docs: DataFrame, rate_pct: int = 20) -> DataFrame:
    """Deterministic stratified sampling for reproducible corpus subsets:
    keep a doc iff md5-hash(doc_id) mod 100 < rate_pct, reported per
    language stratum. Unlike rand()-based sampling this is stable across
    runs, engines, partitionings, and retries — the property a
    training-data pipeline needs for auditable subsets. (Spark's
    df.sample() is seed-stable only for a fixed partitioning.)"""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % F.lit(100)
    )
    return (
        docs.withColumn("keep", bucket < rate_pct)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_sampled"),
        )
    )


def curation_pipeline(docs: DataFrame) -> DataFrame:
    """END-TO-END curation composition — the pipeline the individual
    text/dedup ops exist to feed, fused into ONE declarative plan:
      1. quality gate  (>=10 tokens, >=0.6 alpha density)
      2. exact dedup   (keep min doc_id per distinct text)
      3. deterministic 20% stratified sample (md5 hash bucket)
      4. per-language survivor accounting + token totals
    Catalyst pipelines all four stages into a scan + one semi-join + one
    aggregation; nothing materializes between stages — the shape bulk
    curation keeps at 100 TB."""
    toks = T.tokens(F.col("text"))
    n_tokens = F.size(toks)
    # try_divide: empty text -> NULL (not an ANSI divide-by-zero raise);
    # NULL >= 0.6 is NULL, so empty docs drop out of `keep` exactly as
    # the DuckDB oracle's NULL-yielding division does
    alpha_density = F.try_divide(
        T.alpha_chars(F.col("text")).cast("double"),
        F.length("text").cast("double"),
    )
    kept = docs.filter((n_tokens >= 10) & (alpha_density >= 0.6))
    canonical = kept.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    surv = kept.join(canonical.select("doc_id"), "doc_id", "left_semi")
    sampled = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
                     ).cast("long") % 100 < 20
    return (
        surv.select("lang", F.size(T.tokens(F.col("text"))).alias("n_toks"),
                    sampled.alias("in_sample"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_curated"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).cast("long")
            .alias("n_sampled"),
        )
    )


def char_entropy(docs: DataFrame) -> DataFrame:
    """Shannon entropy of the per-document character distribution — the
    cheap perplexity proxy corpus filters use (gibberish and boilerplate
    sit at the entropy extremes). One explode + two aggregations, all
    exact double math: H = ln(n) - sum(c*ln(c))/n over character counts,
    which avoids forming p=c/n per row and keeps the fold order
    engine-independent."""
    chars = F.explode(F.split(F.col("text"), "")).alias("ch")
    counts = (
        docs.select("doc_id", chars)
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.count("*").alias("n_distinct_chars"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            .alias("clogc"),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_chars"),
            F.col("n_distinct_chars").cast("long").alias("n_distinct_chars"),
            F.round(
                F.log(F.col("n").cast("double"))
                - F.col("clogc") / F.col("n").cast("double"),
                6,
            ).alias("char_entropy"),
        )
    )


def char_entropy_sql() -> str:
    return """
WITH counts AS (
  SELECT doc_id, ch, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
  WHERE ch != ''
  GROUP BY doc_id, ch
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_chars,
       count(*) AS n_distinct_chars,
       round(ln(CAST(sum(c) AS DOUBLE))
             - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
               / CAST(sum(c) AS DOUBLE), 6) AS char_entropy
FROM counts GROUP BY doc_id
"""


def decontamination(
    docs: DataFrame, n: int = 5, holdout_mod: int = 23, threshold: float = 0.05,
    holdout_grams: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination check — the training-data hygiene pass
    every LLM corpus pipeline runs before training: flag documents whose
    word n-grams overlap a held-out evaluation set (here the
    deterministic `doc_id % holdout_mod == 0` slice stands in for the
    benchmark corpus; in production it is the actual eval suites).

    Per surviving (non-holdout) document: distinct n-gram count, how
    many of those grams appear ANYWHERE in the holdout set, the
    contamination fraction, and the above-threshold verdict.

    100 TB shape: the holdout side is tiny by nature (benchmarks are
    MBs, corpora are TBs), so its distinct gram-hash set is broadcast —
    the corpus side is one map-side explode + broadcast-hash lookup and
    one groupBy(doc_id); the full text never shuffles, only int64 gram
    hashes keyed by doc_id. `holdout_grams` lets a caller pass the
    precomputed gram set (one `gh` column) — the streaming analog builds
    it ONCE from the static table and reuses it per micro-batch."""
    from ..functions import hashing as H

    # content population: a NULL text has no n-grams (its [NULL]
    # fallback shingle would otherwise surface as a phantom 1-gram
    # "clean" row that the oracle's per-gram stream never produces)
    docs = docs.filter(F.col("text").isNotNull())
    grams = F.array_distinct(F.expr(H.shingle_hashes_sql("text", n)))
    g = docs.select("doc_id", F.explode(grams).alias("gh"))
    hold = (
        holdout_grams
        if holdout_grams is not None
        else g.filter(F.col("doc_id") % holdout_mod == 0).select("gh").distinct()
    ).withColumn("_hit", F.lit(1).cast("long"))
    train = g.filter(F.col("doc_id") % holdout_mod != 0)
    frac = F.round(
        F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double"), 6
    )
    return (
        train.join(F.broadcast(hold), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            frac.alias("contamination_frac"),
            (frac > F.lit(threshold)).alias("is_contaminated"),
        )
    )


def repetition_scores(docs: DataFrame, sizes: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Gopher-style within-document repetition signals: for each n-gram
    size, the fraction of gram occurrences that are repeats of an
    earlier gram (dup_gram_frac) and the share claimed by the single
    most frequent gram (top_gram_frac). Boilerplate and spam sit high on
    both; output is long-format (doc_id, gram_n) so any n-gram size list
    rides one plan.

    One explode + two keyed aggregations per size; gram strings shuffle
    once keyed by (doc_id, gram_n, gram) — at corpus scale that is the
    document itself re-keyed, the same cost class as tokenization."""
    from ..functions import hashing as H

    parts = [
        docs.select(
            "doc_id",
            F.lit(n).alias("gram_n"),
            F.explode(F.expr(H.shingles_sql("text", n))).alias("gram"),
        )
        for n in sizes
    ]
    ex = parts[0]
    for p in parts[1:]:
        ex = ex.unionByName(p)
    per = ex.groupBy("doc_id", "gram_n", "gram").agg(F.count("*").alias("c"))
    n_grams = F.sum("c").cast("long")
    n_distinct = F.count("*")
    top = F.max("c").cast("long")
    return (
        per.groupBy("doc_id", "gram_n")
        .agg(
            n_grams.alias("n_grams"),
            n_distinct.alias("n_distinct"),
            top.alias("top_gram_n"),
        )
        .select(
            "doc_id",
            "gram_n",
            "n_grams",
            "n_distinct",
            "top_gram_n",
            F.round(
                F.col("top_gram_n").cast("double") / F.col("n_grams").cast("double"), 6
            ).alias("top_gram_frac"),
            F.round(
                (F.col("n_grams") - F.col("n_distinct")).cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("dup_gram_frac"),
        )
    )


def gopher_filter(docs: DataFrame) -> DataFrame:
    """Composite Gopher-rule quality verdict — the standard stacked
    heuristic filter (Rae et al. 2021 table A1 shape, thresholds tuned
    to this corpus's ranges so both populations are non-empty): word
    count, mean token length, alphabetic density, stopword evidence,
    each as its own flag plus the conjunction. Pure single-pass
    projection — embarrassingly parallel, no shuffle at any scale."""
    toks = T.tokens(F.col("text"))
    n_words = T.word_count(F.col("text"))
    # empty-input guards: without them Spark yields NaN (0.0/0) where
    # DuckDB yields NULL, and NaN > threshold is TRUE in Spark — a
    # latent cross-engine divergence on empty docs/token lists
    mean_tok_len = F.when(
        F.size(toks) > 0,
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
            )
            / F.size(toks).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    alpha_density = F.when(
        F.length("text") > 0,
        F.round(
            T.alpha_chars(F.col("text")).cast("double")
            / F.length("text").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    stop_hits = T.stopword_hits(F.col("text"), "en")
    r_len = (n_words >= 30) & (n_words <= 1000)
    r_mwl = (mean_tok_len >= 3.0) & (mean_tok_len <= 5.0)
    r_alpha = alpha_density >= 0.81
    r_stop = stop_hits >= 2
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_tok_len.alias("mean_token_len"),
        alpha_density.alias("alpha_density"),
        stop_hits.cast("int").alias("stop_hits"),
        r_len.alias("rule_word_count"),
        r_mwl.alias("rule_mean_len"),
        r_alpha.alias("rule_alpha"),
        r_stop.alias("rule_stopwords"),
        (r_len & r_mwl & r_alpha & r_stop).alias("passes"),
    )


def mixture_weights(docs: DataFrame) -> DataFrame:
    """Domain-mixture sampling weights — sqrt-temperature reweighting of
    (lang, source) domains, the standard recipe for flattening a corpus'
    domain skew when drawing a training mix. All cross-group math is
    integer-exact (token counts and integer-floored sqrt weights sum
    exactly in any order), so the derived double ratios are
    bit-deterministic across engines and partitionings.

    Plan: one groupBy over ~|domains| groups (map-side partial agg),
    then the global totals as an unpartitioned window over the AGGREGATED
    frame — |domains| rows (languages x sources is thousands at any
    corpus size), so the single-partition window exchange is trivially
    bounded and the corpus scans exactly ONCE (a crossJoin against a
    separate totals aggregate re-scans it)."""
    from pyspark.sql import Window

    toks = T.tokens(F.col("text"))
    per = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
    )
    per = per.withColumn(
        "w_raw", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    )
    w = Window.partitionBy()
    joined = per.withColumn(
        "total_tokens", F.sum("n_tokens").over(w).cast("long")
    ).withColumn("total_w", F.sum("w_raw").over(w).cast("long"))
    return joined.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("total_tokens").cast("double"), 6
        ).alias("token_share"),
        F.round(F.col("w_raw").cast("double") / F.col("total_w").cast("double"), 6).alias(
            "weight"
        ),
        F.round(
            (F.col("w_raw") * F.col("total_tokens")).cast("double")
            / (F.col("total_w") * F.col("n_tokens")).cast("double"),
            6,
        ).alias("sample_mult"),
    )


def token_budget_fill(
    docs: DataFrame, budget_tokens: int = 500_000
) -> DataFrame:
    """The mixture weights APPLIED (r16): allocate an epoch's token
    budget across (lang, source) domains by the sqrt-temperature
    weights, with largest-remainder integer rounding (so the uncapped
    allocations sum EXACTLY to the budget) and an availability cap per
    domain — the planning step a training run executes between
    text_mixture_weights and pipeline_epoch_shuffle. A capped domain is
    reported, not silently re-waterfilled: redistribution is a policy
    decision (repeat epochs vs re-weight), and the honest artifact is
    the shortfall.

    All integer end-to-end (budget * w DIV total_w, remainders ranked
    (rem desc, lang, source)), so the oracle replays it exactly. One
    corpus scan into a ~|domains|-row aggregate; both windows run over
    that aggregate, never data."""
    toks = T.tokens(F.col("text"))
    per = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
    )
    per = per.withColumn(
        "w_raw", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    )
    w = Window.partitionBy()
    b = F.lit(int(budget_tokens))
    per = per.withColumn("total_w", F.sum("w_raw").over(w).cast("long"))
    ideal = (b * F.col("w_raw")).cast("long")
    per = per.withColumn(
        "rem", (ideal % F.col("total_w")).cast("long")
    ).withColumn(
        "base", F.expr(f"{int(budget_tokens)} * w_raw DIV total_w")
        .cast("long")
    )
    per = per.withColumn(
        "leftover", (b - F.sum("base").over(w)).cast("long")
    ).withColumn(
        "rrank",
        F.row_number().over(
            Window.orderBy(F.desc("rem"), F.asc("lang"), F.asc("source"))
        ),
    )
    alloc_uncapped = F.col("base") + F.when(
        F.col("rrank") <= F.col("leftover"), F.lit(1)
    ).otherwise(F.lit(0))
    return per.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.col("w_raw").alias("weight_raw"),
        F.least(alloc_uncapped, F.col("n_tokens"))
        .cast("long")
        .alias("alloc_tokens"),
        (alloc_uncapped > F.col("n_tokens")).alias("capped"),
        F.expr(
            "CAST(least(base + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END,"
            " n_tokens) * 1000000 DIV greatest(n_tokens, 1) AS BIGINT)"
        ).alias("fill_ppm"),
    )


def token_budget_fill_sql(budget_tokens: int = 500_000) -> str:
    """DuckDB mirror of token_budget_fill: same aggregate, same
    largest-remainder ranking, same availability cap."""
    from ..oracles_pipeline import TOKS

    return f"""
WITH per AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len({TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source
),
w AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_raw
  FROM per
),
tot AS (SELECT CAST(sum(w_raw) AS BIGINT) AS total_w FROM w),
alloc AS (
  SELECT w.*, t.total_w,
         ({budget_tokens} * w_raw) // t.total_w AS base,
         ({budget_tokens} * w_raw) % t.total_w AS rem
  FROM w, tot t
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, lang, source) AS rrank,
         {budget_tokens} - sum(base) OVER () AS leftover
  FROM alloc
)
SELECT lang, source, n_docs, n_tokens, w_raw AS weight_raw,
       CAST(least(base + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END,
                  n_tokens) AS BIGINT) AS alloc_tokens,
       base + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END > n_tokens
         AS capped,
       CAST(least(base + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END,
                  n_tokens) * 1000000 // greatest(n_tokens, 1) AS BIGINT)
         AS fill_ppm
FROM ranked
"""


PACK_CAP = 256  # tokens per packed training sequence


def sequence_packing(docs: DataFrame, cap: int = PACK_CAP) -> DataFrame:
    """GPT-style sequence packing accounting: documents are concatenated
    in a deterministic order and chunked into fixed `cap`-token training
    sequences (documents straddle boundaries; the attention mask handles
    the joins) — the standard pretraining packing step. Packing runs PER
    SOURCE SHARD, which is both how real pipelines do it (shards pack
    independently, so packing parallelism = shard count at any corpus
    size) and what keeps the plan scalable: the running token offset is
    a window over each source partition, never a global single-partition
    prefix sum.

    Order within a shard is (md5(text), doc_id) — the same reproducible
    no-RNG shuffle the contrastive-pair ring uses. Output is the
    per-shard packing summary: sequence count, straddler count, mean
    docs per sequence, and fill rate of the last (ragged) sequence."""
    from pyspark.sql import Window

    toks = T.tokens(F.col("text"))
    w = Window.partitionBy("source").orderBy("ord", "doc_id")
    placed = docs.select(
        "source", "doc_id", F.md5("text").alias("ord"),
        F.size(toks).cast("long").alias("n_tok"),
    ).withColumn("cum", F.sum("n_tok").over(w))
    placed = placed.select(
        "source", "doc_id", "n_tok",
        F.floor((F.col("cum") - F.col("n_tok")) / F.lit(cap)).alias("start_bin"),
        F.floor((F.col("cum") - 1) / F.lit(cap)).alias("end_bin"),
        F.col("cum"),
    )
    return (
        placed.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            (F.max("end_bin") + 1).cast("long").alias("n_sequences"),
            F.sum(
                (F.col("end_bin") > F.col("start_bin")).cast("long")
            ).alias("n_straddlers"),
        )
        .select(
            "source", "n_docs", "n_tokens", "n_sequences", "n_straddlers",
            F.round(
                F.col("n_docs").cast("double") / F.col("n_sequences").cast("double"),
                6,
            ).alias("docs_per_sequence"),
            F.round(
                F.col("n_tokens").cast("double")
                / (F.col("n_sequences") * F.lit(cap)).cast("double"),
                6,
            ).alias("fill_rate"),
        )
    )


def sequence_packing_sql(cap: int = PACK_CAP) -> str:
    return f"""
WITH placed AS (
  SELECT source, doc_id,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok,
         sum(CAST(len(string_split(lower(text), ' ')) AS BIGINT))
           OVER (PARTITION BY source ORDER BY md5(text), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
),
bins AS (
  SELECT source, n_tok,
         CAST(floor((cum - n_tok) / {cap}.0) AS BIGINT) AS start_bin,
         CAST(floor((cum - 1) / {cap}.0) AS BIGINT) AS end_bin
  FROM placed
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(max(end_bin) + 1 AS BIGINT) AS n_sequences,
       CAST(sum(CASE WHEN end_bin > start_bin THEN 1 ELSE 0 END) AS BIGINT)
         AS n_straddlers,
       round(CAST(count(*) AS DOUBLE) / CAST(max(end_bin) + 1 AS DOUBLE), 6)
         AS docs_per_sequence,
       round(CAST(sum(n_tok) AS DOUBLE)
             / CAST((max(end_bin) + 1) * {cap} AS DOUBLE), 6) AS fill_rate
FROM bins GROUP BY source
"""


BLOCK_TERMS = ("customer", "spark", "merge", "slow")


def blocklist_filter(
    docs: DataFrame,
    terms: tuple[str, ...] = BLOCK_TERMS,
    max_permille: int = 130,
) -> DataFrame:
    """C4-style termlist filter (the LDNOOBW / banned-words hygiene
    pass): count blocked tokens per document, redact them in place, and
    keep only documents whose blocked fraction stays under the
    threshold. The termlist is a compile-time literal (real pipelines
    broadcast a few-KB list), so the whole operator is ONE codegen'd
    projection per document — no shuffle, no UDF, embarrassingly
    parallel at any corpus size.

    The keep verdict compares integers (n_blocked * 1000 <=
    max_permille * n_tokens) so the threshold decision is exact — no
    float boundary can disagree across engines or partitionings. The
    redacted text is proven by md5 (the full masked text never leaves
    the executor)."""
    toks = T.tokens(F.col("text"))
    blocked = F.filter(toks, lambda t: t.isin(*terms))
    masked = F.array_join(
        F.transform(
            toks,
            lambda t: F.when(t.isin(*terms), F.lit("[MASK]")).otherwise(t),
        ),
        " ",
    )
    n = F.size(toks).cast("long")
    nb = F.size(blocked).cast("long")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        nb.alias("n_blocked"),
        F.round(nb.cast("double") / n.cast("double"), 6).alias("blocked_frac"),
        (nb * F.lit(1000) <= F.lit(max_permille) * n).alias("keep"),
        F.md5(masked).alias("masked_md5"),
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """CCNet-style unigram LM quality score: fit a unigram language
    model on the corpus itself (token -> count / total), score every
    document by its mean token log-probability, and bucket into
    head / middle / tail — the perplexity-tertile routing CCNet uses to
    stratify CommonCrawl by fluency.

    Determinism at any partitioning: each token's log-prob is quantized
    ONCE to integer millinats (round(ln(p) * 1000)), so the per-doc
    score is an integer sum (order-independent, overflow-safe: |mln| <=
    ~25k, docs < 2^40 tokens) and the bucket verdict compares integers
    (s_mln vs threshold * n_tokens) — no float-boundary flake.

    Plan: two cheap projection scans, TINY shuffles. The vocabulary fit
    is a groupBy(token) of the exploded corpus — map-side partial
    aggregation shrinks each task's contribution to |vocab| rows before
    the (tiny) shuffle; the global total is a window over that
    aggregated frame. Scoring joins the exploded stream directly
    against the BROADCAST vocab and aggregates by doc_id — again
    map-side partial first, so the only scoring shuffle carries ~|docs|
    partial rows, never the token stream. (An earlier form materialized
    the (doc_id, token, count) pair table; at 100x docs that shuffled
    ~26M pair rows twice — this form shuffles |docs| + |vocab|.)"""
    per = unigram_doc_scores(docs, unigram_lp(docs))
    # avg_logprob via EXACT integer half-away-from-zero rounding to
    # micros, then one double division by 1e6 — round(double, 6) of the
    # raw quotient sat on a half boundary where Spark's BigDecimal
    # HALF_UP and DuckDB's C-library rounding disagreed by 1 ulp (caught
    # by the round-9 UTF-8 fixture). Identical integer + identical IEEE
    # division = bit-identical doubles on every engine.
    us = F.expr(
        "CASE WHEN s_mln >= 0"
        " THEN (2 * s_mln * 1000 + n_tokens) DIV (2 * n_tokens)"
        " ELSE -((2 * (-s_mln) * 1000 + n_tokens) DIV (2 * n_tokens)) END"
    )
    return per.select(
        "doc_id",
        "n_tokens",
        (us.cast("double") / F.lit(1e6)).alias("avg_logprob"),
        _ppl_bucket().alias("ppl_bucket"),
    )


def unigram_lp(docs: DataFrame) -> DataFrame:
    """The corpus-fit unigram LM as a (tok, mln) frame — factored out so
    a STREAM can fit once on the static corpus and score every
    micro-batch against the same frozen model (resample_verdicts)."""
    from pyspark.sql import Window

    g = docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    vocab = g.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    w = Window.partitionBy()
    return vocab.withColumn("t", F.sum("c").over(w)).select(
        "tok",
        F.round(
            F.log(F.col("c").cast("double") / F.col("t").cast("double")) * 1000, 0
        )
        .cast("long")
        .alias("mln"),
    )


def unigram_doc_scores(docs: DataFrame, lp: DataFrame) -> DataFrame:
    """Per-doc (n_tokens, s_mln) against a BROADCAST (tok, mln) model —
    the scoring half of unigram_logprob's plan."""
    g = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    return (
        g.join(F.broadcast(lp), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("mln").cast("long").alias("s_mln"),
        )
    )


def _ppl_bucket():
    return (
        F.when(F.col("s_mln") >= F.lit(-3399) * F.col("n_tokens"), F.lit("head"))
        .when(F.col("s_mln") < F.lit(-3404) * F.col("n_tokens"), F.lit("tail"))
        .otherwise(F.lit("middle"))
    )


def train_val_split(
    docs: DataFrame, val_pct: int = 5, test_pct: int = 5
) -> DataFrame:
    """Deterministic train/val/test split assignment — the partition a
    corpus pipeline freezes before training so examples NEVER migrate
    between splits across runs, engines, retries, or corpus growth
    (appending docs cannot move an existing doc's bucket). The split key
    is the same md5(doc_id) bucket the stratified sampler uses: bucket
    < test_pct -> test, < test_pct+val_pct -> val, else train.

    Output: per (split, lang) doc/token counts plus each split's
    integer-exact share of the corpus (counts sum exactly in any order;
    the share divides two integers once). One groupBy over
    |splits x langs| groups, global totals as an unpartitioned window
    over that tiny aggregated frame — the corpus scans ONCE."""
    from pyspark.sql import Window

    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % F.lit(100)
    )
    split = (
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    toks = T.tokens(F.col("text"))
    per = (
        docs.select(split.alias("split"), "lang", F.size(toks).alias("n_tok"))
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    return (
        per.withColumn("total_docs", F.sum("n_docs").over(w).cast("long"))
        .select(
            "split",
            "lang",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_docs").cast("double") / F.col("total_docs").cast("double"), 6
            ).alias("doc_share"),
        )
    )


def bpe_merge_pairs(docs: DataFrame, k: int = 25) -> DataFrame:
    """First BPE merge iteration (Sennrich et al. 2016): corpus-wide
    counts of adjacent character pairs, the statistic a byte-pair
    tokenizer trainer maximizes when picking its next merge. Complements
    bpe_token_estimate (applying a tokenizer) with the TRAINING-side
    primitive (inducing one).

    100 TB shape: pair extraction rides the DISTINCT-WORD table, not the
    corpus — explode + groupBy(word) gets map-side partial counts, so
    the shuffle carries one row per distinct word per partition (Zipf:
    orders of magnitude below corpus size), and the char-pair explode
    multiplies only that reduced table by word frequency. Top-k is
    TakeOrderedAndProject with the repo-wide (count DESC, pair ASC)
    total order.
    """
    words = docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
    wc = words.groupBy("w").agg(F.count("*").alias("wn"))
    pairs = (
        wc.filter(F.length("w") >= 2)
        .select(
            "wn",
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def quality_resample(
    docs: DataFrame,
    accept_ppm: dict[str, int] | None = None,
) -> DataFrame:
    """CCNet-style perplexity-bucket resampling: keep head-bucket
    documents outright, downsample middle and tail by fixed acceptance
    probabilities — the corpus-rebalancing step between quality scoring
    and training. Acceptance is DETERMINISTIC importance sampling, not
    RNG: a doc keeps iff md5('resample:' || doc_id) mod 1e6 falls under
    its bucket's parts-per-million rate, so the kept set is frozen
    across runs, engines, retries, and partitionings (same argument as
    train_val_split). The DRAW is per-doc frozen; the bucket is
    corpus-fit (unigram_logprob), so re-scoring a grown corpus can
    re-bucket a doc — freeze the scored snapshot alongside the split
    when that matters.

    Output: per-bucket accounting (docs, kept docs, tokens, kept
    tokens, integer-exact measured accept rate vs the target rate).

    100 TB shape: rides unigram_logprob's two-scan plan (tiny vocab
    shuffle + |docs| partial rows); the verdict and the md5 draw are
    map-side column expressions; the final aggregate has 3 groups."""
    accept_ppm = accept_ppm or {"head": 1_000_000, "middle": 500_000, "tail": 100_000}
    scored = unigram_logprob(docs)
    u = _resample_draw()
    target = _resample_target(accept_ppm)
    keep = u < target
    return (
        scored.select(
            "ppl_bucket", "n_tokens", target.alias("ppm"), keep.alias("keep")
        )
        .groupBy("ppl_bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
            F.max("ppm").alias("ppm"),
        )
        .select(
            "ppl_bucket",
            "n_docs",
            "n_kept",
            "n_tokens",
            "kept_tokens",
            F.round(
                F.col("n_kept").cast("double") / F.col("n_docs").cast("double"), 6
            ).alias("accept_rate"),
            F.round(F.col("ppm").cast("double") / 1_000_000.0, 6).alias("target_rate"),
        )
    )


def _resample_draw():
    """Deterministic per-doc uniform in [0, 1e6): md5 of a purpose-tagged
    doc_id — frozen across runs/engines/partitionings."""
    return (
        F.expr(
            "CAST(conv(substring(md5(concat('resample:', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        )
        % F.lit(1_000_000)
    )


def _resample_target(accept_ppm: dict[str, int]):
    return (
        F.when(F.col("ppl_bucket") == "head", F.lit(accept_ppm["head"]))
        .when(F.col("ppl_bucket") == "middle", F.lit(accept_ppm["middle"]))
        .otherwise(F.lit(accept_ppm["tail"]))
    )


def resample_verdicts(
    docs: DataFrame,
    lp: DataFrame | None = None,
    accept_ppm: dict[str, int] | None = None,
) -> DataFrame:
    """Per-document resample verdict (doc_id, n_tokens, ppl_bucket,
    keep) — quality_resample's row-level form. `lp` lets a caller score
    against a model fit elsewhere: the streaming gate fits ONCE on the
    static corpus and scores every micro-batch against that frozen
    model, so a doc's verdict is identical whether it arrives in batch
    or on the stream."""
    accept_ppm = accept_ppm or {"head": 1_000_000, "middle": 500_000, "tail": 100_000}
    per = unigram_doc_scores(docs, unigram_lp(docs) if lp is None else lp)
    scored = per.select("doc_id", "n_tokens", _ppl_bucket().alias("ppl_bucket"))
    return scored.select(
        "doc_id",
        "n_tokens",
        "ppl_bucket",
        (_resample_draw() < _resample_target(accept_ppm)).alias("keep"),
    )


DSIR_OOV_MLN = -15_000  # millinat log-prob for tokens unseen in the target slice


def dsir_importance(docs: DataFrame, target_lang: str = "en") -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the log importance ratio between a TARGET-domain unigram model (here
    the `target_lang` slice stands in for the target distribution) and
    the general corpus model. High-ratio docs look like the target
    domain and get selected for domain-adapted training mixes.

    Same integer-millinat determinism as unigram_logprob: both models
    quantize each token's log-prob once, the per-doc ratio is an
    integer sum difference (order-independent at any partitioning), and
    the verdict compares integers. Tokens unseen in the target slice get
    a fixed DSIR_OOV_MLN penalty (deterministic smoothing — a real DSIR
    run uses hashed n-gram buckets, which never miss; the penalty plays
    that role for the word-unigram stand-in).

    100 TB shape: two vocab fits (map-side partial -> |vocab| rows
    each), one broadcast joined model table, one per-doc partial
    aggregation — the corpus text itself never shuffles."""
    lp_c = unigram_lp(docs)
    lp_t = unigram_lp(docs.filter(F.col("lang") == target_lang))
    model = (
        lp_c.withColumnRenamed("mln", "mln_c")
        .join(lp_t.withColumnRenamed("mln", "mln_t"), "tok", "left")
        .select(
            "tok",
            "mln_c",
            F.coalesce(F.col("mln_t"), F.lit(DSIR_OOV_MLN)).alias("mln_t"),
        )
    )
    g = docs.select("doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("tok"))
    per = (
        g.join(F.broadcast(model), "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("mln_t").cast("long").alias("s_t"),
            F.sum("mln_c").cast("long").alias("s_c"),
        )
    )
    # the ratio stays an INTEGER millinat sum (a rounded per-token mean
    # hits round-half boundaries that Spark and DuckDB resolve
    # differently — the integer form is exact; consumers divide)
    return per.select(
        "doc_id",
        "lang",
        "n_tokens",
        (F.col("s_t") - F.col("s_c")).cast("long").alias("log_ratio_mln"),
        (F.col("s_t") >= F.col("s_c")).alias("is_target_like"),
    )


def dataset_manifest(docs: DataFrame) -> DataFrame:
    """Content-addressed dataset manifest — the per-shard "dataset card"
    a corpus release freezes next to the data: per (source, lang) doc /
    token / byte counts plus an ORDER-INDEPENDENT content signature
    (bit_xor of each doc's md5-prefix int64), so two pipelines can
    verify they materialized the identical shard without comparing rows
    in any particular order. Any added, dropped, or edited doc flips the
    signature; xor makes the fold commutative so the signature is
    identical at any partitioning, engine, or row order.

    One scan, one map-side-combinable groupBy over |sources x langs|
    groups — nothing but the per-group partials ever shuffles."""
    sig = F.expr(
        "bit_xor(CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT))"
    )
    return (
        docs.select(
            "source", "lang", "text",
            F.size(T.tokens(F.col("text"))).cast("long").alias("n_toks"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
            F.sum(F.octet_length("text")).cast("long").alias("n_bytes"),
            sig.alias("content_sig"),
        )
    )


def zipf_audit(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """Zipf rank-frequency audit of the corpus vocabulary — the
    corpus-health check a pipeline runs before trusting token-level
    heuristics (a corpus whose head departs from freq x rank ~ const is
    usually templated/synthetic/boilerplate-heavy): top-k terms by
    frequency with the integer-exact Zipf product freq * rank and its
    parts-per-million share of the token mass, plus constant audit
    columns (vocab size, total tokens, hapax count — Heaps'-law inputs).
    All ratios derive from exact integer sums, so the verdict surface is
    engine-proof.

    Plan: one explode scan -> map-side-combined groupBy(token) (the
    shuffle carries |vocab| rows, never the token stream); top-k via
    TakeOrderedAndProject (per-partition heaps, no global sort); rank is
    a row_number over the k-row result; the corpus-level constants are a
    second aggregate of the SAME vocab frame, broadcast back as
    one-row scalars."""
    from pyspark.sql import Window

    g = docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    vocab = g.groupBy("tok").agg(F.count("*").cast("long").alias("freq"))
    summary = vocab.agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.sum("freq").cast("long").alias("total_tokens"),
        F.sum((F.col("freq") == 1).cast("long")).alias("n_hapax"),
    )
    top = vocab.orderBy(F.col("freq").desc(), F.col("tok").asc()).limit(top_k)
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    ranked = top.withColumn("rank", F.row_number().over(w).cast("long"))
    return (
        ranked.crossJoin(F.broadcast(summary))
        .select(
            "rank",
            "tok",
            "freq",
            (F.col("freq") * F.col("rank")).alias("zipf_product"),
            F.round(
                F.col("freq").cast("double")
                * F.lit(1e6)
                / F.col("total_tokens").cast("double"),
                0,
            )
            .cast("bigint")
            .alias("share_ppm"),
            "vocab_size",
            "total_tokens",
            "n_hapax",
        )
    )


def heaps_curve(docs: DataFrame, buckets: int = 10) -> DataFrame:
    """Heaps'-law vocabulary-growth curve in ONE corpus scan: how many
    NEW distinct tokens each additional tenth of the corpus contributes
    (corpus order = frozen md5 buckets of doc_id, the train_val_split
    draw, so the curve is stable under any physical partitioning). A
    healthy natural corpus grows vocabulary ~ n^beta with beta in
    [0.4, 0.6]; a flat curve means a closed vocabulary (templated or
    synthetic text), an ever-linear curve means noise/IDs — either way
    the audit changes how much dedup/filtering the corpus needs BEFORE
    a 100 TB run pays for it.

    The naive form scans the corpus once per prefix (10 scans,
    distinct-counting each); this form inverts it: each token's FIRST
    bucket of appearance is a map-side-combinable min, the per-bucket
    counts of first appearances are the marginal vocabulary, and the
    cumulative curve is a running sum over the 10-row aggregate. One
    explode scan, one |vocab|-row shuffle, a 10-row window."""
    from pyspark.sql import Window

    bucket = (
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT)"
        )
        % F.lit(buckets)
    )
    toks = docs.select(
        bucket.alias("bucket"), F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    first_seen = toks.groupBy("tok").agg(
        F.min("bucket").cast("long").alias("first_bucket")
    )
    marginal = first_seen.groupBy("first_bucket").agg(
        F.count("*").cast("long").alias("new_tokens")
    )
    per_bucket_tokens = toks.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_tokens")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket_tokens.join(
            marginal.withColumnRenamed("first_bucket", "bucket"), "bucket", "left"
        )
        .select(
            "bucket",
            "n_tokens",
            F.coalesce("new_tokens", F.lit(0)).alias("new_tokens"),
        )
        .select(
            "bucket",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum("new_tokens").over(w).cast("long").alias("cum_vocab"),
            "new_tokens",
        )
    )


# Unicode script classes as (java-regex, re2-regex) range pairs — the
# Java side feeds the Spark projection, the RE2 side the DuckDB oracle
# (oracles_pipeline.script_profile_sql). Ranges are disjoint by
# construction so n_other = n_chars - sum(classes) never double-counts.
# Cross-engine agreement for every class (incl. astral planes and
# combining marks) is proven by the UTF-8 fixture parity suite.
SCRIPT_CLASSES: tuple[tuple[str, str, str], ...] = (
    ("latin", "[A-Za-z\\u00C0-\\u024F]", "[A-Za-z\\x{00C0}-\\x{024F}]"),
    ("cyrillic", "[\\u0400-\\u04FF]", "[\\x{0400}-\\x{04FF}]"),
    ("greek", "[\\u0370-\\u03FF]", "[\\x{0370}-\\x{03FF}]"),
    (
        "cjk",
        "[\\u3040-\\u30FF\\u4E00-\\u9FFF\\uFF00-\\uFFEF]",
        "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}\\x{FF00}-\\x{FFEF}]",
    ),
    (
        "astral",
        "[\\x{1D400}-\\x{1D7FF}\\x{1F000}-\\x{1FAFF}]",
        "[\\x{1D400}-\\x{1D7FF}\\x{1F000}-\\x{1FAFF}]",
    ),
    ("mark", "[\\u0300-\\u036F]", "[\\x{0300}-\\x{036F}]"),
    ("digit", "[0-9]", "[0-9]"),
    (
        "space",
        "[ \\t\\n\\r\\u00A0\\u2028\\u2029]",
        "[ \\t\\n\\r\\x{00A0}\\x{2028}\\x{2029}]",
    ),
)


def script_profile(docs: DataFrame) -> DataFrame:
    """Per-document Unicode SCRIPT profile: code-point counts per script
    class (Latin, Cyrillic, Greek, CJK, astral/emoji, combining marks,
    digits, whitespace, other) plus the dominant script — the standard
    corpus-hygiene signal for routing documents to per-script pipelines
    and catching mojibake (a 'latin' doc with a high `n_other` or
    `n_mark` count is a decode bug upstream).

    Counts are code points, the convention all engines share
    (Spark numChars == DuckDB length == Python len); each class count
    is `length(text) - length(regexp_replace(text, class+, ''))`, so
    the whole profile is ONE codegen'd JVM projection per document —
    no tokenizer, no Python, no shuffle, embarrassingly parallel at
    100 TB. `main_script` breaks max ties by the fixed class order
    above (empty text -> 'none'), identically on both engines.

    Beyond the reference (its documents router stores text verbatim,
    routers.py documents endpoints); this is LLM-pipeline surface.
    """
    n = F.length("text")
    counts = {
        name: (n - F.length(F.regexp_replace("text", jre + "+", ""))).cast("long")
        for name, jre, _ in SCRIPT_CLASSES
    }
    cols = [F.col("doc_id"), n.cast("long").alias("n_chars")]
    cols += [counts[name].alias(f"n_{name}") for name, _, _ in SCRIPT_CLASSES]
    known = None
    for name, _, _ in SCRIPT_CLASSES:
        known = counts[name] if known is None else known + counts[name]
    cols.append((n.cast("long") - known).alias("n_other"))
    # dominant SCRIPT class (not whitespace/digits/marks): fixed-order
    # tie-break, first listed class wins ties
    script_names = ("latin", "cyrillic", "greek", "cjk", "astral")
    m = F.greatest(*[counts[s] for s in script_names])
    main = F.when(n == 0, F.lit("none")).when(m == 0, F.lit("other"))
    for s in script_names:
        main = main.when(counts[s] == m, F.lit(s))
    cols.append(main.alias("main_script"))
    return docs.select(*cols)


EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+1-555-[0-9]{4}"
CARD_RE = "[0-9]{16}"

# deterministic PII injection (SQL fragment, identical in Spark and the
# DuckDB oracle): the corpus text is synthetic TPC-H prose with no real
# PII, so the scrubber is exercised on per-doc generated email / phone /
# 16-digit card candidates. Even doc_ids get a Luhn-VALID card (check
# digit computed by the same Luhn sum both engines run), odd doc_ids a
# corrupted one ((valid+5)%10), so the validator sees both classes.
_CC15 = "lpad(CAST((doc_id * 982451653) % 1000000000000000 AS STRING), 15, '0')"
_LUHN15 = (
    "aggregate(sequence(0, 14), 0, (acc, i) -> acc + ("
    "  CASE WHEN i % 2 = 0"
    "       THEN IF(2 * (ascii(substr({c}, 15 - i, 1)) - 48) > 9,"
    "               2 * (ascii(substr({c}, 15 - i, 1)) - 48) - 9,"
    "               2 * (ascii(substr({c}, 15 - i, 1)) - 48))"
    "       ELSE ascii(substr({c}, 15 - i, 1)) - 48 END))"
)


def _pii_text_expr() -> str:
    """pii_text = text with one email, one phone, one card appended."""
    check = f"(10 - ({_LUHN15.format(c=_CC15)}) % 10) % 10"
    digit = f"CASE WHEN doc_id % 2 = 0 THEN {check} ELSE ({check} + 5) % 10 END"
    return (
        "concat(text, ' contact user', CAST(doc_id AS STRING),"
        " '@example.com tel +1-555-',"
        " lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),"
        f" ' card ', {_CC15}, CAST({digit} AS STRING))"
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII detection + redaction over the documents table: count email /
    phone / 16-digit card-number candidates, validate card candidates
    with the Luhn checksum (the industry pre-filter that cuts ~90% of
    16-digit false positives), and redact every candidate class to a
    typed placeholder. Emitted: per-class counts, the Luhn-valid card
    count, and md5 + length-delta of the redacted text (the scrubbed
    text itself never leaves the executor).

    All detection is JVM regex (`regexp_extract_all` /
    `regexp_replace`) and the Luhn sum is a 16-step `aggregate` over
    `sequence` — one codegen'd projection per document, no Python, no
    shuffle; linear at 100 TB. Regex patterns are passed as column
    literals (NOT through F.expr) so Spark SQL string-escape parsing
    never touches the backslashes. The corpus is synthetic, so
    deterministic PII is injected per doc_id first (same fragment in
    the oracle) — on real data `pii_text` IS the raw text column.

    Beyond the reference (no scrubbing surface); standard training-data
    hygiene (cf. C4/Gopher/RefinedWeb pipeline stages).
    """
    # content population: no text, nothing to scrub (and DuckDB's
    # null-skipping concat would otherwise fabricate a synthetic
    # PII-only document where Spark's concat propagates NULL)
    docs = docs.filter(F.col("text").isNotNull())

    def luhn16(c):
        # Luhn sum of a 16-digit string: i counts 0..15 from the RIGHT,
        # odd i doubled (9-wrap) — check digit itself (i=0) undoubled
        def step(acc, i):
            d = F.ascii(F.substring(c, (F.lit(16) - i).cast("int"), F.lit(1))) - F.lit(48)
            doubled = F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
            return acc + F.when(i % 2 == 1, doubled).otherwise(d)

        return F.aggregate(F.sequence(F.lit(0), F.lit(15)), F.lit(0), step)

    base = docs.select("doc_id", F.expr(_pii_text_expr()).alias("pii_text"))
    pii = F.col("pii_text")
    emails = F.regexp_extract_all(pii, F.lit(EMAIL_RE), F.lit(0))
    phones = F.regexp_extract_all(pii, F.lit(PHONE_RE), F.lit(0))
    cards = F.regexp_extract_all(pii, F.lit(CARD_RE), F.lit(0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(pii, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        CARD_RE,
        "<CARD>",
    )
    return base.select(
        "doc_id",
        F.size(emails).cast("long").alias("n_emails"),
        F.size(phones).cast("long").alias("n_phones"),
        F.size(cards).cast("long").alias("n_cards"),
        F.size(F.filter(cards, lambda c: luhn16(c) % 10 == 0))
        .cast("long")
        .alias("n_cards_valid"),
        F.md5(redacted).alias("redacted_md5"),
        (F.length(pii) - F.length(redacted)).cast("long").alias("n_chars_removed"),
    )


def weighted_sample(docs: DataFrame, k: int = 25) -> DataFrame:
    """PRIORITY SAMPLING (Duffield/Lund/Thorup, JACM 2007): a weighted
    sample of exactly k documents WITHOUT replacement, inclusion odds
    proportional to token count — the "sample big documents more"
    subset step rate-based stratified_sample and bucket-based
    quality_resample can't express (both draw per-doc coin flips, so
    their sample SIZE is random and weight enters only through buckets).

    Each doc gets priority w / u with u uniform in (0, 1]; the sample
    is the top k priorities. The draw is the house deterministic md5
    hash, NOT RNG, so the sample is frozen across runs, engines,
    retries, and partitionings. Everything is IEEE-exact cross-engine
    BY CONSTRUCTION: u's numerator h+1 is an integer hash, the weight
    is an integer, and priority = (w * 2^32) / (h+1) is one exact
    double multiply (w*2^32 <= 2^52, below the mantissa) and one
    correctly-rounded divide — no ln/pow/exp whose libm rounding could
    differ between JVM and DuckDB, which is why the priority column
    ships UNROUNDED and still hash-matches.

    100 TB shape: one codegen'd projection and a TakeOrderedAndProject
    — every partition ships exactly k candidate rows to the driver, no
    shuffle, no sort of the corpus. The total order (priority DESC,
    doc_id ASC) makes ties deterministic."""
    w = F.size(F.split(F.col("text"), " ")).cast("long")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wsample:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    )
    prio = (w.cast("double") * F.lit(4294967296.0)) / (h + F.lit(1)).cast(
        "double"
    )
    return (
        docs.select(
            "doc_id",
            w.alias("weight_tokens"),
            prio.alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(k)
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Bigram LM fluency score — the next step up from the CCNet-style
    unigram bucketing (unigram_logprob): fit conditional bigram
    probabilities p(w2|w1) = c(w1,w2) / c(w1·) on the corpus itself,
    score each document by its mean bigram log-probability. A document
    of common words in an UNUSUAL ORDER scores well under the unigram
    model but poorly here — exactly the gibberish the unigram gate
    can't see. Scored in-corpus, every document bigram exists in the
    model (c12 >= 1), so no smoothing branch is needed and p ∈ (0, 1].

    Same determinism mechanism as unigram_logprob: each bigram's
    log-prob is quantized ONCE to integer millinats, per-doc sums are
    integer (order-independent at any partitioning), and the final
    average is exact integer half-away-from-zero micro-division.

    Plan: one explode pass aggregated to the (doc_id, w1, w2, c_d)
    pair table (map-side partials; this is also the oracle's exact
    CTE), the model folded FROM that table (two tiny grouped sums —
    the corpus text is read once), then a pair-key join + per-doc sum.
    Shuffles carry |doc-bigram pairs| + |bigrams| + |docs| rows, never
    the raw token stream twice. Documents with fewer than two tokens
    have no bigram and are absent from the output (mirrored by the
    oracle)."""
    toks = T.tokens(F.col("text"))
    # let-bind the token array: element_at inside the transform lambda
    # must not re-split the string per element (shingles_sql discipline)
    bg = F.expr(
        "transform(sequence(1, size(t) - 1), "
        "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"
    )
    dc = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select("doc_id", F.explode(bg).alias("b"))
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("c_d"))
        # the pair table feeds THREE lineage paths (c12 model, c1
        # histogram, per-doc scoring join) and their differing pruned
        # columns defeat exchange reuse — without this checkpoint the
        # tokenize+explode+aggregate subtree executes 3x (plan-audited
        # r16). One lazy checkpoint = one pass over the token stream;
        # at 100 TB this is "materialize the pair table once".
        .localCheckpoint(eager=False)
    )
    pair = dc.groupBy("w1", "w2").agg(F.sum("c_d").cast("long").alias("c12"))
    hist = pair.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    model = pair.join(hist, "w1").select(
        "w1",
        "w2",
        F.round(
            F.log(F.col("c12").cast("double") / F.col("c1").cast("double")) * 1000,
            0,
        )
        .cast("long")
        .alias("mln"),
    )
    per = (
        dc.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("c_d").cast("long").alias("n_bigrams"),
            F.sum(F.col("c_d") * F.col("mln")).cast("long").alias("s_mln"),
        )
    )
    us = F.expr(
        "CASE WHEN s_mln >= 0"
        " THEN (2 * s_mln * 1000 + n_bigrams) DIV (2 * n_bigrams)"
        " ELSE -((2 * (-s_mln) * 1000 + n_bigrams) DIV (2 * n_bigrams)) END"
    )
    return per.select(
        "doc_id",
        "n_bigrams",
        (us.cast("double") / F.lit(1e6)).alias("avg_logprob"),
    )


def tfidf_keywords(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document TF-IDF keyword extraction — the metadata-enrichment
    pass a curation pipeline runs to tag every document with its top-k
    characteristic terms (retrieval.bm25_scores ranks DOCUMENTS for a
    fixed query; this ranks TERMS within each document). Exact integer
    scoring: idf is quantized once to millinats (the unigram_logprob
    discipline), the score is the integer tf * idf_mln, and the per-doc
    top-k uses the total order (score desc, token asc) — no float
    boundary anywhere, so the DuckDB oracle is value-hash exact.

    Plan: one explode pass aggregated to (doc_id, tok, tf) map-side,
    the document-frequency model folded FROM that table (one grouped
    sum — the corpus text is read once), N as a broadcast scalar, then
    a broadcast model join + per-doc window. Shuffles carry
    |doc-term pairs| + |vocab| + |docs * k| rows."""
    from pyspark.sql import Window

    dc = (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    n_docs = docs.agg(F.count("*").cast("double").alias("n"))
    idf = (
        dc.groupBy("tok")
        # dc is already unique per (doc_id, tok), so a plain count IS the
        # document frequency — no distinct aggregation needed
        .agg(F.count("*").cast("double").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok",
            F.round(F.log(F.col("n") / F.col("df")) * 1000, 0)
            .cast("long")
            .alias("idf_mln"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_mln"), F.asc("tok")
    )
    return (
        dc.join(idf, "tok")
        .withColumn("score_mln", F.col("tf") * F.col("idf_mln"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "rnk", F.col("tok").alias("token"), "tf", "score_mln")
    )


def bpe_train_merges(docs: DataFrame, n_merges: int = 5) -> DataFrame:
    """Iterative BPE trainer (Sennrich et al. 2016), n_merges rounds:
    the actual tokenizer-induction loop, not just the first pair count
    (bpe_merge_pairs). Each round counts adjacent SYMBOL pairs over the
    distinct-word table weighted by word frequency, adopts the
    (count desc, pair asc) argmax as the next merge, and rewrites every
    word's symbol sequence (space-delimited symbols; the padded
    ' left right ' -> ' leftright ' replace is leftmost-non-overlapping
    in both engines, the standard BPE application order). Returns one
    row per adopted merge: (rank, left_sym, right_sym, merged, n).

    100 TB shape: the loop rides the distinct-word table (Zipf: orders
    of magnitude below corpus size) — each round is one explode +
    groupBy over that reduced table plus a 1-row argmax; the corpus is
    scanned once, ever. The merge itself is a driver-side literal pair
    (bounded: n_merges rows), exactly the train-once lifecycle of the
    quantizer fits. Exact oracle: oracles_pipeline.bpe_train_merges_sql
    unrolls the same rounds as CTE stages."""
    rows, _ = _bpe_train(docs, n_merges)
    spark = docs.sparkSession
    return spark.createDataFrame(
        rows, "rank int, left_sym string, right_sym string, "
              "merged string, n long"
    )


def bpe_encode_stats(docs: DataFrame, n_merges: int = 5) -> DataFrame:
    """ENCODE with the trained tokenizer: apply the n_merges adopted
    merges (rank order, leftmost-non-overlapping — the standard BPE
    application) to the distinct-word table and report the resulting
    tokens-per-word distribution: (n_tokens, n_words,
    n_occurrences) — n_words distinct vocabulary entries encode to
    n_tokens BPE symbols, covering n_occurrences corpus tokens. This is
    the measurement a tokenizer-budget decision reads (how much of the
    corpus compresses under the learned merges, and how long the
    residual char-level tail is).

    Same 100-TB shape as the trainer: encoding runs on the DISTINCT
    word table (Zipf-reduced), never the corpus stream — a corpus-side
    encode is then one broadcast join word -> n_tokens. Exact oracle:
    the trainer oracle's CTE chain aggregated over the final symbol
    table."""
    _, seqs = _bpe_train(docs, n_merges)
    return (
        seqs.select(F.size(F.split("s", " ")).alias("n_tokens"), "wn")
        .groupBy("n_tokens")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("wn").cast("long").alias("n_occurrences"),
        )
    )


def _bpe_train(docs: DataFrame, n_merges: int):
    """Shared trainer loop: returns (merge rows, final symbol table).
    See bpe_train_merges for semantics and the scale argument."""
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") >= 1)
    wc = words.groupBy("w").agg(F.count("*").cast("long").alias("wn"))
    # `w` rides along untouched so bpe_encode_corpus can broadcast-join
    # word -> final token count; the train loop itself never reads it
    seqs = wc.select(
        "w",
        F.expr(
            "concat_ws(' ', transform(sequence(1, length(w)), "
            "i -> substring(w, i, 1)))"
        ).alias("s"),
        "wn",
    ).localCheckpoint(eager=False)
    rows = []
    for r in range(n_merges):
        syms = seqs.select("wn", F.split("s", " ").alias("a")).filter(
            F.size("a") >= 2  # sequence(1, 0) DESCENDS in Spark — guard
        )
        pairs = syms.select(
            "wn",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1), "
                    "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("wn").cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        p, n = top[0]["p"], int(top[0]["n"])
        left, right = p.split(" ")
        rows.append((r + 1, left, right, left + right, n))
        # literal-column replace (never an f-string into SQL — symbols
        # come from corpus text and may contain quote characters)
        seqs = seqs.select(
            "w",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                    F.lit(f" {p} "),
                    F.lit(f" {left + right} "),
                )
            ).alias("s"),
            "wn",
        ).localCheckpoint(eager=False)
    return rows, seqs


def bpe_fertility_by_lang(docs: DataFrame, n_merges: int = 5) -> DataFrame:
    """Tokenizer FERTILITY per language — tokens-per-word under the
    trained merges, the standard multilingual-tokenizer equity metric:
    a language whose fertility is high pays more of the context budget
    per word (and more per-token inference cost), which is exactly the
    number a mixture/pricing decision needs BY LANGUAGE rather than as
    bpe_encode_stats' corpus-wide histogram. Same broadcast-join shape
    as bpe_encode_corpus; fertility is exact integer ppm
    (tokens * 1e6 DIV words)."""
    _, seqs = _bpe_train(docs, n_merges)
    wmap = seqs.select(
        "w", F.size(F.split("s", " ")).cast("long").alias("n_tokens")
    )
    dw = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") >= 1)
    return (
        dw.join(F.broadcast(wmap), "w")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_bpe_tokens",
            F.expr("n_bpe_tokens * 1000000 DIV n_words")
            .cast("long")
            .alias("fertility_ppm"),
        )
    )


def bpe_encode_corpus(docs: DataFrame, n_merges: int = 5) -> DataFrame:
    """The CORPUS-SIDE encode the histogram op documents but did not
    register (r14 verdict "missing #4"): tokens-per-DOCUMENT under the
    trained tokenizer. The trained word -> n_tokens map (the final
    symbol table, Zipf-reduced) is broadcast-joined against the
    tokenized corpus ONCE — the corpus stream itself is never re-merged
    symbol-by-symbol, which is exactly why training on the distinct-word
    table is the 100-TB shape. Output per document: how many whitespace
    words it has and how many BPE tokens they encode to — the
    token-budget column a packing/pricing pass consumes."""
    _, seqs = _bpe_train(docs, n_merges)
    wmap = seqs.select(
        "w", F.size(F.split("s", " ")).cast("long").alias("n_tokens")
    )
    dw = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") >= 1)
    return (
        dw.join(F.broadcast(wmap), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )


def rake_keyphrases(docs: DataFrame, k: int = 3) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal runs of content words between stopword/punctuation
    boundaries (gaps-and-islands over the token stream); each content
    word scores degree/frequency (degree = total length of the phrases
    it appears in), and a phrase scores the sum of its words' scores.
    The per-word ratio is kept EXACT as floor((degree * 1e6) / freq)
    micro-units (the unigram-logprob integer discipline), so ranking is
    integer arithmetic cross-engine — a float RAKE would flake on the
    driver's value hash. Returns each doc's top-k phrases on the
    (score desc, phrase asc) total order.

    Scale shape: one token explode, two windows partitioned by doc, one
    per-doc word aggregate — everything is doc-local, one hash exchange
    of skinny token rows; no corpus-wide state."""
    from ..functions.text import STOPWORDS

    stops = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "raw"),
    ).select(
        "doc_id", "pos",
        F.regexp_replace("raw", "[^a-z]", "").alias("w"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    flagged = toks.withColumn(
        "stop",
        (F.col("w") == "") | F.array_contains(stops, F.col("w")),
    ).withColumn("island", F.sum(F.col("stop").cast("int")).over(w_doc))
    words = flagged.filter(~F.col("stop")).select(
        "doc_id", "island", "pos", "w"
        # tokenize + posexplode + island window feeds two consumers
        # (phrase lengths and occurrences) and the occurrence join feeds
        # two more (word stats and phrase scoring) — differing pruned
        # columns defeat exchange reuse, so the token subtree executed
        # 4x (14 Exchanges in the r16 before-plan). Two lazy
        # checkpoints = one token pass + one join pass.
    ).localCheckpoint(eager=False)
    plen = words.groupBy("doc_id", "island").agg(
        F.count("*").alias("phrase_len")
    )
    occurrences = words.join(plen, ["doc_id", "island"]).localCheckpoint(
        eager=False
    )
    wstats = occurrences.groupBy("doc_id", "w").agg(
        F.count("*").alias("freq"),
        F.sum("phrase_len").alias("degree"),
    ).withColumn(
        "wscore_us", F.expr("(degree * 1000000) DIV freq")
    )
    scored = occurrences.join(wstats.select("doc_id", "w", "wscore_us"),
                              ["doc_id", "w"])
    phrases = scored.groupBy("doc_id", "island").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, w))),"
            " s -> s.w), ' ')"
        ).alias("phrase"),
        F.sum("wscore_us").cast("long").alias("score_us"),
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.desc("score_us"), F.asc("phrase"), F.asc("island")
    )
    return (
        phrases.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= k)
        # identical phrases can recur in one doc (same text, different
        # islands): rank ties break on island id so the cut is total,
        # then the island column is dropped — output rows for twin
        # phrases are identical, multiset-stable for the hash compare
        .select("doc_id", "phrase", "score_us", "rnk")
    )


def epoch_shuffle(docs: DataFrame, epochs: int = 2, n: int = 20) -> DataFrame:
    """Deterministic EPOCH-WISE shuffling — the training data-loader
    contract: each epoch visits the same corpus in a different but
    fully reproducible order, without ever materializing a permuted
    copy. The permutation key is md5(epoch || ':' || doc_id) (the
    weighted-sample draw discipline), so 'shuffle' is just a sort key:
    at scale an epoch's read order is orderBy(key) — a total-order sort
    Spark executes as range-partitioned sort with no data rewrite, and
    a resume-from-position is a key-range predicate. Emits the first
    `n` positions of each epoch; cross-epoch order decorrelation is
    pinned in tests, exact identity of the multiset is by
    construction."""
    spark = docs.sparkSession
    outs = []
    for e in range(1, epochs + 1):
        key = F.md5(F.concat(F.lit(f"{e}:"), F.col("doc_id").cast("string")))
        head = (
            docs.select("doc_id", key.alias("k"))
            .orderBy("k", "doc_id")
            .limit(n)
        )
        w = Window.orderBy("k", "doc_id")  # n rows only — tiny window
        outs.append(
            head.withColumn("position", F.row_number().over(w))
            .select(
                F.lit(e).cast("int").alias("epoch"),
                F.col("position").cast("int"),
                "doc_id",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
