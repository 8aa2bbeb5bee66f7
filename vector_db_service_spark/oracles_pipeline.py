"""DuckDB oracle SQL for the training-data pipeline operators
(dedup / ANN / text analysis / multimodal plumbing).

Mirrors functions/text.py, functions/hashing.py, operators/dedup.py,
operators/ann.py, operators/multimodal.py fragment-for-fragment. The
blocked/banded Spark implementations are checked against NAIVE
quadratic SQL here — equality proves the pruning is lossless.
"""

from __future__ import annotations

from .functions.hashing import (
    MINHASH_BANDS,
    NUM_MINHASH,
    SIMHASH_BITS,
    SIMHASH_BLOCKS,
    minhash_params,
)
from .functions.text import MOD_P, STOPWORDS, LANGS
from .oracles import METRIC_SQL

TOKS = "string_split(lower(text), ' ')"


def _token_hash(t: str) -> str:
    return f"CAST(('0x' || substr(md5({t}), 1, 8)) AS BIGINT) % {MOD_P}"


SHINGLES = f"""
CASE WHEN len({TOKS}) >= 3
     THEN list_transform(generate_series(1, len({TOKS}) - 2),
          i -> {TOKS}[i] || ' ' || {TOKS}[i+1] || ' ' || {TOKS}[i+2])
     ELSE [lower(text)] END
"""

SHINGLE_HASHES = f"list_transform({SHINGLES}, s -> {_token_hash('s')})"
TOKEN_HASHES = f"list_transform({TOKS}, t -> {_token_hash('t')})"


def _stop_list(lang: str) -> str:
    return "[" + ", ".join(f"'{s}'" for s in STOPWORDS[lang]) + "]"


def _hits(lang: str) -> str:
    return f"len(list_intersect({TOKS}, {_stop_list(lang)}))"


def _pred_lang(prefix: str = "h_") -> str:
    # same cascade as functions/text.py::predicted_lang (alphabetical
    # tie-break: de > en > es evaluation order)
    h = {lang: f"{prefix}{lang}" for lang in LANGS}
    return (
        f"CASE WHEN {h['de']} >= {h['en']} AND {h['de']} >= {h['es']} THEN 'de' "
        f"WHEN {h['en']} >= {h['es']} THEN 'en' ELSE 'es' END"
    )


def _minhash_cols() -> list[str]:
    return [
        f"list_min(list_transform(base, h -> ({a} * h + {b}) % {MOD_P}))"
        for a, b in minhash_params()
    ]


def _band_exprs() -> list[str]:
    rows = NUM_MINHASH // MINHASH_BANDS
    return [
        "concat_ws('-', " + ", ".join(f"mh{b * rows + r}::VARCHAR" for r in range(rows)) + ")"
        for b in range(MINHASH_BANDS)
    ]


def _sig_cte(source: str = "documents") -> str:
    """`source` is the relation the signatures scan — "documents" by
    default, or a parenthesized subquery when a composed oracle needs a
    sharded view (threaded as a PARAMETER, never post-hoc string
    replacement of the generated SQL, which silently broke the moment
    any alias/comment/CTE contained the substring)."""
    mh = ", ".join(f"{e} AS mh{i}" for i, e in enumerate(_minhash_cols()))
    bands = ", ".join(f"{e} AS band{b}" for b, e in enumerate(_band_exprs()))
    return f"""
base_t AS (SELECT doc_id, {SHINGLE_HASHES} AS base,
                  list_distinct({SHINGLES}) AS sh FROM {source}),
sigs AS (SELECT doc_id, sh, {mh} FROM base_t),
banded AS (SELECT doc_id, sh, {bands} FROM sigs)
"""


def minhash_signatures_sql() -> str:
    mh4 = ", ".join(f"{e} AS mh{i}" for i, e in enumerate(_minhash_cols()[:4]))
    return f"""
WITH base_t AS (SELECT doc_id, {SHINGLE_HASHES} AS base FROM documents)
SELECT doc_id, {mh4} FROM base_t
"""


def minhash_near_dups_sql(threshold: float = 0.2,
                          source: str = "documents") -> str:
    band_match = " OR ".join(f"a.band{b} = b.band{b}" for b in range(MINHASH_BANDS))
    return f"""
WITH {_sig_cte(source)},
pairs AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
  FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ({band_match})
)
SELECT doc_id_1, doc_id_2, jaccard FROM pairs WHERE jaccard >= {threshold!r}
"""


def ngram_jaccard_topk_sql(k: int = 20) -> str:
    band_match = " OR ".join(f"a.band{b} = b.band{b}" for b in range(MINHASH_BANDS))
    return f"""
WITH {_sig_cte()},
pairs AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
  FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ({band_match})
)
SELECT doc_id_1, doc_id_2, jaccard FROM pairs
QUALIFY row_number() OVER (ORDER BY jaccard DESC, doc_id_1, doc_id_2) <= {k}
"""


_ZEROS = "[" + ", ".join(["CAST(0 AS BIGINT)"] * SIMHASH_BITS) + "]"

SIMHASH = f"""
CAST(list_sum(list_transform(generate_series(1, {SIMHASH_BITS}), i ->
  CASE WHEN list_reduce(
         list_prepend({_ZEROS},
           list_transform({TOKEN_HASHES}, h ->
             list_transform(generate_series(0, {SIMHASH_BITS - 1}), b ->
               (CAST(floor(h / pow(2, b)) AS BIGINT) % 2) * 2 - 1))),
         (acc, x) -> list_transform(generate_series(1, {SIMHASH_BITS}), j -> acc[j] + x[j])
       )[i] >= 0
  THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END)) AS BIGINT)
"""


def simhash_fingerprints_sql() -> str:
    return f"SELECT doc_id, {SIMHASH} AS simhash FROM documents"


def simhash_near_dups_sql(max_hamming: int = 3) -> str:
    """NAIVE all-pairs hamming scan — the Spark side uses the lossless
    4-block LSH join; identical results prove losslessness."""
    return f"""
WITH fp AS (SELECT doc_id, {SIMHASH} AS sh FROM documents
            WHERE text IS NOT NULL)
SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       bit_count(xor(a.sh, b.sh)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
"""


def _components_with_clause(max_hamming: int, rounds: int) -> str:
    """Shared WITH clause for the component-labeling oracles: bounded
    min-label propagation over the simhash near-dup graph, unrolled as
    `rounds` chained CTE stages; l{rounds} holds (node, comp) for every
    document."""
    # every CTE is MATERIALIZED: DuckDB otherwise inlines CTEs per
    # reference, and each stage references the previous one twice ->
    # 2^rounds recomputation of the whole pair pipeline
    stages = []
    for r in range(rounds):
        prev, cur = f"l{r}", f"l{r + 1}"
        stages.append(f"""
{cur} AS MATERIALIZED (
  SELECT node, min(comp) AS comp FROM (
    SELECT node, comp FROM {prev}
    UNION ALL
    SELECT e.src AS node, l.comp FROM edges e JOIN {prev} l ON l.node = e.dst
  ) GROUP BY node
)""")
    chain = ",".join(stages)
    return f"""
WITH fp AS MATERIALIZED (SELECT doc_id, {SIMHASH} AS sh FROM documents
                         WHERE text IS NOT NULL),
pairs AS MATERIALIZED (
  SELECT a.doc_id AS d1, b.doc_id AS d2
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
),
edges AS MATERIALIZED (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION ALL SELECT d2, d1 FROM pairs
),
l0 AS MATERIALIZED (SELECT doc_id AS node, doc_id AS comp FROM documents
                    WHERE text IS NOT NULL),{chain}
"""


def near_dup_components_sql(max_hamming: int = 3, rounds: int = 10) -> str:
    """Oracle for dedup.near_dup_components: the SAME bounded min-label
    propagation, unrolled as `rounds` chained CTE stages."""
    return (
        _components_with_clause(max_hamming, rounds)
        + f"SELECT comp, count(*) AS n_docs FROM l{rounds} GROUP BY comp"
    )


def near_dup_keep_canonical_sql(max_hamming: int = 3, rounds: int = 10) -> str:
    """Oracle for dedup.near_dup_keep_canonical: survivor = the doc
    whose id equals its component label (the component minimum)."""
    return (
        _components_with_clause(max_hamming, rounds)
        + f"""
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN l.comp = d.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_survivors,
       CAST(count(*) - sum(CASE WHEN l.comp = d.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       round(CAST(count(*) - sum(CASE WHEN l.comp = d.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS removal_frac
FROM l{rounds} l JOIN documents d ON d.doc_id = l.node
GROUP BY d.source
"""
    )


def exact_dedup_summary_sql() -> str:
    return """
SELECT count(*) AS total_docs,
       count(DISTINCT md5(text)) AS distinct_texts,
       count(DISTINCT md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS distinct_normalized
FROM documents
"""


def exact_dedup_keep_first_sql() -> str:
    return """
WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents
              WHERE text IS NOT NULL GROUP BY md5(text))
SELECT source, count(*) AS n_docs FROM documents
WHERE text IS NULL OR doc_id IN (SELECT doc_id FROM keep)
GROUP BY source
"""


def embedding_near_dups_sql(threshold: float = 0.8, dim: int = 64,
                            band_bits: int = 2) -> str:
    """Mirror of the BANDED operators/dedup.py::embedding_near_dups —
    identical seed-42 sign-band candidate join + exact cosine verify
    (the blocking is part of the operator contract; recall of the band
    knob is measured separately by ann_blocked_pair_recall). `dim` must
    equal the corpus dimension (the operator infers it; this static SQL
    mirrors the driver data's _DIM)."""
    from .operators.lsh import NUM_HASHES, SEED, hyperplanes
    from .oracles import banded_cte_sql

    planes = hyperplanes(dim, NUM_HASHES, SEED)
    cos = METRIC_SQL["cosine"]("a.embedding", "b.embedding")
    return f"""
WITH banded AS MATERIALIZED (
{banded_cte_sql(planes, band_bits)}
),
pairs AS (
  SELECT DISTINCT a.label, a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         round({cos}, 6) AS cos
  FROM banded a JOIN banded b
    ON a.label = b.label AND a.band_idx = b.band_idx
   AND a.band_key = b.band_key AND a.vec_id < b.vec_id
)
SELECT label, vec_id_1, vec_id_2, cos FROM pairs WHERE cos >= {threshold!r}
"""


def blocked_pair_recall_sql(threshold: float = 0.5, dim: int = 64,
                            band_bits: int = 2, sample_pct: int = 50,
                            sample_cap: int = 10_000) -> str:
    """Mirror of operators/ann.py::blocked_pair_recall — deterministic
    md5 vector sample (pct shrunk so the sample stays <= sample_cap rows,
    identical integer-ceil arithmetic to the operator), quadratic exact
    pairs on the sample as ground truth, banded pairs on the same sample,
    recall = blocked/exact. `dim` must equal the corpus dimension (the
    operator infers it; this static SQL mirrors the driver data's _DIM)."""
    from .operators.lsh import NUM_HASHES, SEED, hyperplanes
    from .oracles import banded_cte_sql

    planes = hyperplanes(dim, NUM_HASHES, SEED)
    cos = METRIC_SQL["cosine"]("a.embedding", "b.embedding")
    eff_pct = (
        f"(SELECT LEAST({sample_pct}, GREATEST(1, "
        f"(100 * {sample_cap} + GREATEST(count(*), 1) - 1) "
        f"// GREATEST(count(*), 1))) FROM embeddings)"
    )
    return f"""
WITH s AS MATERIALIZED (
  SELECT label, vec_id, embedding FROM embeddings
  WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % 100 < {eff_pct}
),
banded AS MATERIALIZED (
{banded_cte_sql(planes, band_bits, source='s')}
),
exact AS (
  SELECT a.label, a.vec_id AS vec_id_1, b.vec_id AS vec_id_2
  FROM s a JOIN s b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round({cos}, 6) >= {threshold!r}
),
blocked AS (
  SELECT DISTINCT a.label, a.vec_id AS vec_id_1, b.vec_id AS vec_id_2
  FROM banded a JOIN banded b
    ON a.label = b.label AND a.band_idx = b.band_idx
   AND a.band_key = b.band_key AND a.vec_id < b.vec_id
  WHERE round({cos}, 6) >= {threshold!r}
)
SELECT n_exact, n_blocked,
       CASE WHEN n_exact = 0 THEN 1.0
            ELSE round(CAST(n_blocked AS DOUBLE) / CAST(n_exact AS DOUBLE), 4)
       END AS recall
FROM (SELECT (SELECT count(*) FROM exact) AS n_exact,
             (SELECT count(*) FROM blocked) AS n_blocked)
"""


def brute_force_topk_sql(query_ids: list[int] | None = None, k: int = 5,
                         metric: str = "cosine") -> str:
    query_ids = query_ids or [0, 1, 2, 3, 4]
    ids = ", ".join(str(i) for i in query_ids)
    score = METRIC_SQL[metric]("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN ({ids}))
SELECT q.query_id, e.vec_id, e.label, round({score}, 6) AS score,
       row_number() OVER (PARTITION BY q.query_id
                          ORDER BY round({score}, 6) DESC, e.vec_id) AS rnk
FROM embeddings e, q
QUALIFY rnk <= {k}
"""


def ivf_topk_sql(query_id: int = 0, k: int = 10, nprobe: int = 1,
                 metric: str = "cosine") -> str:
    cscore = METRIC_SQL[metric]("c.centroid", "q.qv")
    score = METRIC_SQL[metric]("e.embedding", "q.qv")
    return f"""
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
cent AS (
  SELECT label, list(m ORDER BY i) AS centroid
  FROM (SELECT label, i, avg(x) AS m FROM ex GROUP BY label, i)
  GROUP BY label
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id}),
probed AS (
  SELECT c.label FROM cent c, q
  QUALIFY row_number() OVER (ORDER BY {cscore} DESC, c.label) <= {nprobe}
)
SELECT e.vec_id, e.label, round({score}, 6) AS score
FROM embeddings e JOIN probed USING (label), q
QUALIFY row_number() OVER (ORDER BY score DESC, e.vec_id) <= {k}
"""


def token_stats_sql() -> str:
    return f"""
SELECT doc_id,
       len({TOKS}) AS n_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
       length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
       length(text) AS n_chars_actual
FROM documents
"""


def quality_scores_sql() -> str:
    return f"""
SELECT doc_id,
       len({TOKS}) AS n_tokens,
       round(list_sum(list_transform({TOKS}, t -> CAST(length(t) AS DOUBLE)))
             / CAST(len({TOKS}) AS DOUBLE), 6) AS mean_token_len,
       round(CAST({_hits('en')} AS DOUBLE) / CAST(len({TOKS}) AS DOUBLE), 6) AS stopword_ratio,
       round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE), 6) AS alpha_density
FROM documents
"""


def language_id_sql() -> str:
    hit_cols = ", ".join(f"{_hits(lang)} AS hits_{lang}" for lang in LANGS)
    return f"""
WITH scored AS (SELECT doc_id, lang AS actual_lang, {hit_cols} FROM documents)
SELECT doc_id, actual_lang, hits_de, hits_en, hits_es,
       {_pred_lang('hits_')} AS pred_lang
FROM scored
"""


def corpus_language_summary_sql() -> str:
    hit_cols = ", ".join(f"{_hits(lang)} AS h_{lang}" for lang in LANGS)
    return f"""
WITH scored AS (SELECT lang AS actual_lang, {hit_cols} FROM documents)
SELECT actual_lang, {_pred_lang()} AS pred_lang, count(*) AS n_docs
FROM scored GROUP BY actual_lang, pred_lang
"""


def fingerprints_sql() -> str:
    return f"""
SELECT doc_id, md5(text) AS md5_hex,
       list_reduce(list_prepend(CAST(0 AS BIGINT), {TOKEN_HASHES}),
                   (acc, h) -> (acc * 31 + h) % {MOD_P}) AS roll_hash
FROM documents
"""


def blob_features_sql() -> str:
    """Scalar checks for the mapInPandas featurizer: byte length, frame
    count, mean byte over the UTF-8 ENCODING of the text. The former
    form summed ascii(c) per character — code points, not bytes — which
    silently agreed with the Spark byte math only because every corpus
    was pure ASCII (caught by the round-9 UTF-8 fixture). DuckDB cannot
    index into a BLOB, so the per-character byte sum is reconstructed
    arithmetically from the code point via the UTF-8 encoding identity
    (1/2/3/4-byte regimes); verified equal to Python's
    sum(s.encode('utf-8')) across all regimes incl. astral planes."""
    byte_sum = """
list_sum(list_transform(string_split(text, ''), c -> CAST(
  CASE WHEN unicode(c) < 128 THEN unicode(c)
       WHEN unicode(c) < 2048 THEN 192 + (unicode(c) // 64) + 128 + (unicode(c) % 64)
       WHEN unicode(c) < 65536 THEN 224 + (unicode(c) // 4096) + 128 + ((unicode(c) // 64) % 64) + 128 + (unicode(c) % 64)
       ELSE 240 + (unicode(c) // 262144) + 128 + ((unicode(c) // 4096) % 64) + 128 + ((unicode(c) // 64) % 64) + 128 + (unicode(c) % 64)
  END AS DOUBLE)))
"""
    return f"""
SELECT doc_id,
       strlen(text) AS n_bytes,
       CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames,
       round({byte_sum}
             / CAST(strlen(text) AS DOUBLE), 6) AS mean_byte
FROM documents
WHERE text IS NOT NULL
"""


def embed_components_sql(n_components: int = 4, dim: int = 16,
                         include_norm: bool = True,
                         source: str = "documents",
                         keys: tuple[str, ...] = ("doc_id",)) -> str:
    """Oracle for the S15 hash-embedding stand-in (functions/embed.py):
    signed hashed bag-of-words, L2-normalized, components rounded to 6.
    All sums are over exact ±1 integers, so double math is noise-free.
    `source`/`keys` generalize it to any (sub)query exposing a `text`
    column — e.g. the chunking CTE for the ingest pipeline oracle."""
    ks = ", ".join(keys)
    raw = f"""
list_transform(generate_series(0, {dim - 1}), i ->
  CAST(list_sum(list_prepend(CAST(0 AS BIGINT), list_transform(hs, h ->
    CASE WHEN h % {dim} = i
         THEN (CAST(floor(h / {dim}.0) AS BIGINT) % 2) * 2 - 1
         ELSE CAST(0 AS BIGINT) END))) AS DOUBLE))
"""
    comps = ", ".join(
        f"round(CASE WHEN nrm = 0 THEN raw[{i + 1}] ELSE raw[{i + 1}] / nrm END, 6) AS e{i}"
        for i in range(n_components)
    )
    norm_col = ", round(CASE WHEN nrm = 0 THEN 0.0 ELSE 1.0 END, 6) AS unit_norm" \
        if include_norm else ""
    return f"""
WITH hashed AS (SELECT {ks}, {TOKEN_HASHES} AS hs FROM {source}
                WHERE text IS NOT NULL),
rawv AS (SELECT {ks}, {raw} AS raw FROM hashed),
normed AS (SELECT {ks}, raw,
                  sqrt(list_sum(list_transform(raw, x -> x * x))) AS nrm
           FROM rawv)
SELECT {ks}, {comps}{norm_col}
FROM normed
"""


def _raw_embed(hcol: str, dim: int = 16) -> str:
    """Signed hashed bag-of-words raw vector over a hash-array column —
    the shared core of every S15 oracle."""
    return f"""
list_transform(generate_series(0, {dim - 1}), i ->
  CAST(list_sum(list_prepend(CAST(0 AS BIGINT), list_transform({hcol}, h ->
    CASE WHEN h % {dim} = i
         THEN (CAST(floor(h / {dim}.0) AS BIGINT) % 2) * 2 - 1
         ELSE CAST(0 AS BIGINT) END))) AS DOUBLE))
"""


def embed_resilient_sql() -> str:
    """Oracle for the resilient embed path under the default
    (never-failing) encoder: plain S15 components + status='ok' +
    attempts=1. Failure injection is exercised in tests, not here —
    the oracle pins the no-failure contract."""
    inner = embed_components_sql(include_norm=False)
    return (
        f"WITH inner_q AS ({inner}) "
        "SELECT doc_id, e0, e1, e2, e3, 'ok' AS status, "
        "CAST(1 AS INTEGER) AS attempts FROM inner_q"
    )


def embed_asymmetry_sql(dim: int = 16) -> str:
    """Oracle for operators/embed_source.py::embed_asymmetry — document
    vs query ('q|'-salted) hash embeddings, first components and the
    cosine between the two normalized (component-rounded) encodings."""
    from .oracles import cosine_sql

    def nrm(x: str) -> str:
        return f"sqrt(list_sum(list_transform({x}, v -> v * v)))"

    return f"""
WITH hashed AS (
  SELECT doc_id, {TOKEN_HASHES} AS hd,
         list_transform({TOKS}, t -> {_token_hash("'q|' || t")}) AS hq
  FROM documents WHERE text IS NOT NULL
),
rawv AS (
  SELECT doc_id, {_raw_embed('hd', dim)} AS rd, {_raw_embed('hq', dim)} AS rq
  FROM hashed
),
normv AS (
  SELECT doc_id,
         CASE WHEN {nrm('rd')} = 0 THEN rd
              ELSE list_transform(rd, x -> round(x / {nrm('rd')}, 6)) END AS nd,
         CASE WHEN {nrm('rq')} = 0 THEN rq
              ELSE list_transform(rq, x -> round(x / {nrm('rq')}, 6)) END AS nq
  FROM rawv
)
SELECT doc_id, nd[1] + 0.0 AS d0, nq[1] + 0.0 AS q0,
       round({cosine_sql('nd', 'nq')}, 6) + 0.0 AS cos_dq
FROM normv
"""


def index_recall_report_sql(query_ids: list[int] | None = None, k: int = 10,
                            nprobe: int = 2, dim: int = 64) -> str:
    """Oracle for operators/ann.py::index_recall_report — same exact/LSH/
    IVF top-k construction, same overlap math. `dim` MUST equal the
    corpus embedding dimension (the operator infers it from the data;
    this static SQL cannot — entrypoints passes the driver-data _DIM)."""
    from .oracles import _bit_sql
    from .operators.lsh import NUM_HASHES, SEED, hyperplanes

    query_ids = query_ids or [0, 1, 2, 3, 4]
    ids = ", ".join(str(i) for i in query_ids)
    planes = hyperplanes(dim, NUM_HASHES, SEED)
    cos = METRIC_SQL["cosine"]("e.embedding", "q.qv")
    agree = " OR ".join(
        f"({_bit_sql('p.embedding', pl)} = {_bit_sql('p.qv', pl)})" for pl in planes
    )
    ccos = METRIC_SQL["cosine"]("c.centroid", "q.qv")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN ({ids})),
pairs AS (
  SELECT q.query_id, e.vec_id, e.label, e.embedding, q.qv,
         round({cos}, 6) AS score
  FROM embeddings e, q
),
exact AS (
  SELECT query_id, vec_id FROM pairs
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) <= {k}
),
lsh AS (
  SELECT query_id, vec_id FROM pairs p WHERE {agree}
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) <= {k}
),
ex AS (
  SELECT label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
cent AS (
  SELECT label, list(m ORDER BY i) AS centroid
  FROM (SELECT label, i, avg(x) AS m FROM ex GROUP BY label, i)
  GROUP BY label
),
probed AS (
  SELECT q.query_id, c.label FROM cent c, q
  QUALIFY row_number() OVER (PARTITION BY q.query_id
                             ORDER BY {ccos} DESC, c.label) <= {nprobe}
),
ivf AS (
  SELECT p.query_id, p.vec_id FROM pairs p JOIN probed USING (query_id, label)
  QUALIFY row_number() OVER (PARTITION BY p.query_id ORDER BY score DESC, vec_id) <= {k}
),
ov_lsh AS (
  SELECT e.query_id, count(*) AS n_overlap
  FROM exact e JOIN lsh USING (query_id, vec_id) GROUP BY e.query_id
),
ov_ivf AS (
  SELECT e.query_id, count(*) AS n_overlap
  FROM exact e JOIN ivf USING (query_id, vec_id) GROUP BY e.query_id
)
SELECT q.query_id, 'lsh' AS method, coalesce(o.n_overlap, 0) AS n_overlap,
       round(coalesce(o.n_overlap, 0) / {float(k)!r}, 4) AS recall
FROM q LEFT JOIN ov_lsh o USING (query_id)
UNION ALL
SELECT q.query_id, 'ivf' AS method, coalesce(o.n_overlap, 0) AS n_overlap,
       round(coalesce(o.n_overlap, 0) / {float(k)!r}, 4) AS recall
FROM q LEFT JOIN ov_ivf o USING (query_id)
"""


def windowed_event_counts_sql() -> str:
    return """
SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_id,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""


def pending_anti_join_sql(limit_ids: int = 300) -> str:
    return f"""
SELECT d.doc_id, d.source FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                  WHERE e.vec_id = d.doc_id AND e.vec_id < {limit_ids})
"""


def startup_rebuild_sql() -> str:
    return """
SELECT label, count(*) AS n_vectors,
       count(DISTINCT len(embedding)) = 1 AS dim_consistent,
       count(*) > 0 AS index_ready
FROM embeddings GROUP BY label
"""


def frame_stats_sql() -> str:
    """Closed-form frame accounting. The WHERE clause mirrors
    sample_frames' documented contract — a zero-byte blob produces ZERO
    frames, so the doc has no row at all (without it the closed form
    fabricated n_frames=0/tail=256 rows for empty documents; caught by
    the dup-text fixture, vacuous on the never-empty gate corpora)."""
    return """
SELECT doc_id,
       CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames,
       CAST(strlen(text) - (ceil(strlen(text) / 256.0) - 1) * 256 AS BIGINT) AS tail_bytes
FROM documents
WHERE strlen(text) > 0
"""


def _shingles_n(n: int) -> str:
    """Word n-gram shingles for arbitrary n — the DuckDB twin of
    functions/hashing.py::shingles_sql (same short-doc whole-text
    fallback)."""
    gram = " || ' ' || ".join(f"{TOKS}[i+{j}]" for j in range(n))
    return f"""
CASE WHEN len({TOKS}) >= {n}
     THEN list_transform(generate_series(1, len({TOKS}) - {n - 1}), i -> {gram})
     ELSE [lower(text)] END
"""


def decontamination_sql(
    n: int = 5, holdout_mod: int = 23, threshold: float = 0.05
) -> str:
    hashes = f"list_transform({_shingles_n(n)}, s -> {_token_hash('s')})"
    return f"""
WITH g AS (
  SELECT doc_id, unnest(list_distinct({hashes})) AS gh FROM documents
),
hold AS (SELECT DISTINCT gh FROM g WHERE doc_id % {holdout_mod} = 0),
train AS (SELECT * FROM g WHERE doc_id % {holdout_mod} != 0),
agg AS (
  SELECT t.doc_id,
         count(*) AS n_grams,
         CAST(sum(CASE WHEN h.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated
  FROM train t LEFT JOIN hold h ON t.gh = h.gh
  GROUP BY t.doc_id
)
SELECT doc_id, n_grams, n_contaminated,
       round(CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
         AS contamination_frac,
       round(CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
         > {threshold!r} AS is_contaminated
FROM agg
"""


def repetition_scores_sql(sizes: tuple[int, ...] = (2, 3)) -> str:
    branches = " UNION ALL ".join(
        f"SELECT doc_id, {n} AS gram_n, unnest({_shingles_n(n)}) AS gram FROM documents"
        for n in sizes
    )
    return f"""
WITH ex AS ({branches}),
per AS (
  SELECT doc_id, gram_n, gram, count(*) AS c
  FROM ex GROUP BY doc_id, gram_n, gram
),
agg AS (
  SELECT doc_id, gram_n,
         CAST(sum(c) AS BIGINT) AS n_grams,
         count(*) AS n_distinct,
         CAST(max(c) AS BIGINT) AS top_gram_n
  FROM per GROUP BY doc_id, gram_n
)
SELECT doc_id, gram_n, n_grams, n_distinct, top_gram_n,
       round(CAST(top_gram_n AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
         AS top_gram_frac,
       round(CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
         AS dup_gram_frac
FROM agg
"""


def gopher_filter_sql() -> str:
    # empty-input guards mirror textops.gopher_filter (0.0, not NULL)
    mwl = (
        f"CASE WHEN len({TOKS}) > 0 THEN "
        f"round(list_sum(list_transform({TOKS}, t -> CAST(length(t) AS DOUBLE)))"
        f" / CAST(len({TOKS}) AS DOUBLE), 6) ELSE 0.0 END"
    )
    ad = (
        "CASE WHEN length(text) > 0 THEN "
        "round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)"
        " / CAST(length(text) AS DOUBLE), 6) ELSE 0.0 END"
    )
    return f"""
WITH feat AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
         {mwl} AS mean_token_len,
         {ad} AS alpha_density,
         CAST({_hits('en')} AS INTEGER) AS stop_hits
  FROM documents
),
flags AS (
  SELECT *,
         (n_words >= 30 AND n_words <= 1000) AS rule_word_count,
         (mean_token_len >= 3.0 AND mean_token_len <= 5.0) AS rule_mean_len,
         (alpha_density >= 0.81) AS rule_alpha,
         (stop_hits >= 2) AS rule_stopwords
  FROM feat
)
SELECT doc_id, n_words, mean_token_len, alpha_density, stop_hits,
       rule_word_count, rule_mean_len, rule_alpha, rule_stopwords,
       (rule_word_count AND rule_mean_len AND rule_alpha AND rule_stopwords)
         AS passes
FROM flags
"""


def mixture_weights_sql() -> str:
    return f"""
WITH per AS (
  SELECT lang, source, count(*) AS n_docs,
         CAST(sum(len({TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source
),
w AS (
  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_raw
  FROM per
),
tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(w_raw) AS BIGINT) AS total_w
  FROM w
)
SELECT lang, source, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)
         AS token_share,
       round(CAST(w_raw AS DOUBLE) / CAST(total_w AS DOUBLE), 6) AS weight,
       round(CAST(w_raw * total_tokens AS DOUBLE)
             / CAST(total_w * n_tokens AS DOUBLE), 6) AS sample_mult
FROM w, tot
"""


def blocklist_filter_sql(
    terms: tuple[str, ...] = ("customer", "spark", "merge", "slow"),
    max_permille: int = 130,
) -> str:
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH b AS (
  SELECT doc_id,
         CAST(len({TOKS}) AS BIGINT) AS n_tokens,
         CAST(len(list_filter({TOKS}, t -> t IN ({inlist}))) AS BIGINT)
           AS n_blocked,
         md5(array_to_string(
               list_transform({TOKS},
                 t -> CASE WHEN t IN ({inlist}) THEN '[MASK]' ELSE t END),
               ' ')) AS masked_md5
  FROM documents
)
SELECT doc_id, n_tokens, n_blocked,
       round(CAST(n_blocked AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         AS blocked_frac,
       n_blocked * 1000 <= {max_permille} * n_tokens AS keep,
       masked_md5
FROM b
"""


def unigram_logprob_sql() -> str:
    return f"""
WITH g AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
dc AS (SELECT doc_id, tok, count(*) AS c_dt FROM g GROUP BY doc_id, tok),
v AS (SELECT tok, CAST(sum(c_dt) AS BIGINT) AS c FROM dc GROUP BY tok),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM v),
lp AS (
  SELECT tok,
         CAST(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000) AS BIGINT)
           AS mln
  FROM v, tot
),
per AS (
  SELECT dc.doc_id,
         CAST(sum(c_dt) AS BIGINT) AS n_tokens,
         CAST(sum(c_dt * mln) AS BIGINT) AS s_mln
  FROM dc JOIN lp USING (tok) GROUP BY dc.doc_id
)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN s_mln >= 0
                 THEN (2 * s_mln * 1000 + n_tokens) // (2 * n_tokens)
                 ELSE -((2 * (-s_mln) * 1000 + n_tokens) // (2 * n_tokens))
            END AS DOUBLE) / 1000000.0
         AS avg_logprob,
       CASE WHEN s_mln >= -3399 * n_tokens THEN 'head'
            WHEN s_mln < -3404 * n_tokens THEN 'tail'
            ELSE 'middle' END AS ppl_bucket
FROM per
"""


def matryoshka_recall_sql(
    query_ids: list[int] | None = None,
    k: int = 10,
    trunc_dims: tuple[int, ...] = (16, 32),
) -> str:
    from .oracles import cosine_sql

    query_ids = query_ids or [0, 1, 2, 3, 4]
    ids = ", ".join(str(i) for i in query_ids)
    full_score = cosine_sql("e.embedding", "q.qv")
    branches = []
    for d in trunc_dims:
        tscore = cosine_sql(
            f"list_slice(e.embedding, 1, {d})", f"list_slice(q.qv, 1, {d})"
        )
        branches.append(f"""
t{d} AS MATERIALIZED (
  SELECT q.query_id, e.vec_id,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY round({tscore}, 6) DESC, e.vec_id) AS rnk
  FROM embeddings e, q
  QUALIFY rnk <= {k}
)""")
    chain = ",".join(branches)
    unions = " UNION ALL ".join(
        f"""
SELECT {d} AS trunc_dim, t.query_id, {k} AS k,
       CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap,
       round(CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / {k}.0, 6) AS recall_at_k
FROM t{d} t LEFT JOIN full_k f
  ON f.query_id = t.query_id AND f.vec_id = t.vec_id
GROUP BY t.query_id"""
        for d in trunc_dims
    )
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({ids})
),
full_k AS MATERIALIZED (
  SELECT q.query_id, e.vec_id,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY round({full_score}, 6) DESC, e.vec_id) AS rnk
  FROM embeddings e, q
  QUALIFY rnk <= {k}
),{chain}
{unions}
"""


def train_val_split_sql(val_pct: int = 5, test_pct: int = 5) -> str:
    bucket = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
        " % 100"
    )
    return f"""
WITH tagged AS (
  SELECT CASE WHEN {bucket} < {test_pct} THEN 'test'
              WHEN {bucket} < {test_pct + val_pct} THEN 'val'
              ELSE 'train' END AS split,
         lang, len({TOKS}) AS n_tok
  FROM documents
),
per AS (
  SELECT split, lang, count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM tagged GROUP BY split, lang
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM per)
SELECT split, lang, n_docs, n_tokens,
       round(CAST(n_docs AS DOUBLE) / CAST(total_docs AS DOUBLE), 6)
         AS doc_share
FROM per, tot
"""


def substring_span_stats_sql(n: int = 5, flag_threshold: float = 0.2) -> str:
    """Oracle for dedup.substring_span_stats: same windows, same hash,
    same >=2-docs duplication rule."""
    hashes = f"list_transform({_shingles_n(n)}, s -> {_token_hash('s')})"
    return f"""
WITH ex AS (
  SELECT doc_id, unnest({hashes}) AS gh FROM documents
),
pairs AS (SELECT doc_id, gh, count(*) AS c FROM ex GROUP BY doc_id, gh),
freq AS (SELECT gh, count(*) AS n_docs FROM pairs GROUP BY gh),
agg AS (
  SELECT p.doc_id,
         CAST(sum(p.c) AS BIGINT) AS n_spans,
         CAST(sum(CASE WHEN f.n_docs >= 2 THEN p.c ELSE 0 END) AS BIGINT)
           AS n_dup_spans
  FROM pairs p JOIN freq f ON p.gh = f.gh
  GROUP BY p.doc_id
)
SELECT doc_id, n_spans, n_dup_spans,
       round(CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE), 6)
         AS dup_span_frac,
       round(CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE), 6)
         >= {flag_threshold!r} AS is_flagged
FROM agg
"""


def bpe_merge_pairs_sql(k: int = 25) -> str:
    """Oracle for textops.bpe_merge_pairs: same distinct-word reduction,
    same adjacent-pair expansion, same total order."""
    return f"""
WITH words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
),
wc AS (SELECT w, count(*) AS wn FROM words GROUP BY w),
pairs AS (
  SELECT wn,
         unnest(list_transform(generate_series(1, length(w) - 1),
                               i -> substr(w, i, 2))) AS pair
  FROM wc WHERE length(w) >= 2
)
SELECT pair, CAST(sum(wn) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC LIMIT {k}
"""


def quality_resample_sql(accept_ppm: dict[str, int] | None = None) -> str:
    """Oracle for textops.quality_resample: same per-doc scores (nested
    unigram-logprob replay), same md5 draw, same ppm thresholds."""
    accept_ppm = accept_ppm or {"head": 1_000_000, "middle": 500_000, "tail": 100_000}
    draw = (
        "CAST(('0x' || substr(md5('resample:' || CAST(doc_id AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 1000000"
    )
    ppm = (
        f"CASE WHEN ppl_bucket = 'head' THEN {accept_ppm['head']} "
        f"WHEN ppl_bucket = 'middle' THEN {accept_ppm['middle']} "
        f"ELSE {accept_ppm['tail']} END"
    )
    return f"""
WITH scored AS ({unigram_logprob_sql()}),
verdict AS (
  SELECT ppl_bucket, n_tokens, {ppm} AS ppm,
         ({draw}) < ({ppm}) AS keep
  FROM scored
)
SELECT ppl_bucket,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
       round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS accept_rate,
       round(CAST(max(ppm) AS DOUBLE) / 1000000.0, 6) AS target_rate
FROM verdict GROUP BY ppl_bucket
"""


def resample_verdicts_sql(accept_ppm: dict[str, int] | None = None) -> str:
    """Oracle for textops.resample_verdicts / the streaming gate: the
    per-doc row form of quality_resample_sql."""
    accept_ppm = accept_ppm or {"head": 1_000_000, "middle": 500_000, "tail": 100_000}
    draw = (
        "CAST(('0x' || substr(md5('resample:' || CAST(doc_id AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 1000000"
    )
    ppm = (
        f"CASE WHEN ppl_bucket = 'head' THEN {accept_ppm['head']} "
        f"WHEN ppl_bucket = 'middle' THEN {accept_ppm['middle']} "
        f"ELSE {accept_ppm['tail']} END"
    )
    return f"""
WITH scored AS ({unigram_logprob_sql()})
SELECT doc_id, n_tokens, ppl_bucket, ({draw}) < ({ppm}) AS keep
FROM scored
"""


def dsir_importance_sql(target_lang: str = "en", oov_mln: int = -15_000) -> str:
    """Oracle for textops.dsir_importance: replay both unigram fits, the
    OOV penalty, and the integer log-ratio verdict."""
    return f"""
WITH g AS (SELECT doc_id, lang, unnest({TOKS}) AS tok FROM documents),
vc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY tok),
tc AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM vc),
lpc AS (
  SELECT tok,
         CAST(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000) AS BIGINT)
           AS mln_c
  FROM vc, tc
),
vt AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM g
       WHERE lang = '{target_lang}' GROUP BY tok),
tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM vt),
lpt AS (
  SELECT tok,
         CAST(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000) AS BIGINT)
           AS mln_t
  FROM vt, tt
),
model AS (
  SELECT lpc.tok, lpc.mln_c, coalesce(lpt.mln_t, {oov_mln}) AS mln_t
  FROM lpc LEFT JOIN lpt ON lpc.tok = lpt.tok
),
per AS (
  SELECT g.doc_id, g.lang,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(m.mln_t) AS BIGINT) AS s_t,
         CAST(sum(m.mln_c) AS BIGINT) AS s_c
  FROM g JOIN model m ON g.tok = m.tok
  GROUP BY g.doc_id, g.lang
)
SELECT doc_id, lang, n_tokens,
       CAST(s_t - s_c AS BIGINT) AS log_ratio_mln,
       s_t >= s_c AS is_target_like
FROM per
"""


def dataset_manifest_sql() -> str:
    """Oracle for textops.dataset_manifest: same counts, same
    order-independent xor signature."""
    return f"""
SELECT source, lang,
       count(*) AS n_docs,
       CAST(sum(len({TOKS})) AS BIGINT) AS n_tokens,
       CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
       bit_xor(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
         AS content_sig
FROM documents
GROUP BY source, lang
"""


def paragraph_dedup_sql(para_tokens: int = 20) -> str:
    """Oracle for dedup.paragraph_dedup: same fixed-window paragraphs,
    same keep-first (min (doc_id, para_idx)) policy, same survivor xor
    signature."""
    pt = para_tokens
    piece = f"array_to_string(toks[para_idx*{pt}+1 : para_idx*{pt}+{pt}], ' ')"
    return f"""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
p AS (
  SELECT doc_id, source, toks,
         unnest(range(0, GREATEST(CAST(ceil(len(toks) / {pt}.0) AS BIGINT), 1)))
           AS para_idx
  FROM t
),
paras AS (
  SELECT doc_id, source, para_idx,
         md5({piece}) AS h,
         CAST(('0x' || substr(md5({piece}), 1, 8)) AS BIGINT) AS h32,
         doc_id * 1000000 + para_idx AS okey
  FROM p
),
kept AS (SELECT h, min(okey) AS keep_key FROM paras GROUP BY h)
SELECT source, count(*) AS n_paras,
       CAST(sum(CASE WHEN okey = keep_key THEN 0 ELSE 1 END) AS BIGINT)
         AS n_removed,
       round(CAST(sum(CASE WHEN okey = keep_key THEN 0 ELSE 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS removal_frac,
       bit_xor(CASE WHEN okey = keep_key THEN h32 END) AS survivor_sig
FROM paras JOIN kept USING (h)
GROUP BY source
"""


def winnowing_fingerprints_sql(window: int = 4) -> str:
    """Oracle for dedup.winnowing_fingerprints: same 3-gram hash
    sequence, same window-min selection (short docs keep the global
    min), same cross-doc doc-frequency verdict."""
    w = window
    return f"""
WITH g AS (
  SELECT doc_id, {SHINGLE_HASHES} AS gh FROM documents
),
f AS (
  SELECT doc_id, CAST(len(gh) AS BIGINT) AS n_grams,
         list_distinct(
           CASE WHEN len(gh) >= {w}
                THEN list_transform(generate_series(1, len(gh) - {w} + 1),
                                    i -> list_min(gh[i : i + {w} - 1]))
                ELSE [list_min(gh)] END) AS fps
  FROM g
),
ex AS (SELECT doc_id, n_grams, unnest(fps) AS fp FROM f),
freq AS (SELECT fp, count(DISTINCT doc_id) AS df FROM ex GROUP BY fp),
per AS (
  SELECT e.doc_id, min(e.n_grams) AS n_grams, count(*) AS n_fingerprints,
         CAST(sum(CASE WHEN q.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM ex e JOIN freq q USING (fp) GROUP BY e.doc_id
)
SELECT doc_id, n_grams, n_fingerprints, n_shared,
       round(CAST(n_shared AS DOUBLE) / CAST(n_fingerprints AS DOUBLE), 6)
         AS shared_frac
FROM per
"""


def lsh_tuning_curve_sql(num_minhash: int = NUM_MINHASH) -> str:
    """Closed-form S-curve replay of dedup.lsh_tuning_curve: same
    (bands, rows) factorizations, same 5%-step grid, same
    integer-micro rounding of pow-based probabilities."""
    splits = ", ".join(f"({b}, {num_minhash // b})" for b in (1, 2, 4, 8, 16))
    return f"""
WITH splits(bands, rows) AS (VALUES {splits}),
grid AS (SELECT unnest(generate_series(5, 95, 5)) AS s_pct)
SELECT bands, rows, s_pct,
       CAST(round((1 - pow(1 - pow(CAST(s_pct AS DOUBLE) / 100.0,
                                   CAST(rows AS DOUBLE)),
                           CAST(bands AS DOUBLE))) * 1e6, 0) AS BIGINT)
         AS p_collide_us,
       CAST(round(pow(1 - pow(0.5, 1.0 / CAST(bands AS DOUBLE)),
                      1.0 / CAST(rows AS DOUBLE)) * 1e6, 0) AS BIGINT)
         AS s50_us
FROM splits, grid
"""


def zipf_audit_sql(top_k: int = 50) -> str:
    """Replay of textops.zipf_audit: vocab fit over the same
    single-space tokenizer, top-k by (freq DESC, tok ASC), integer
    zipf product, ppm share, corpus constants."""
    return f"""
WITH g AS (SELECT unnest({TOKS}) AS tok FROM documents),
vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM g GROUP BY tok),
summary AS (
  SELECT CAST(count(*) AS BIGINT) AS vocab_size,
         CAST(sum(freq) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM vocab
),
top AS (
  SELECT tok, freq,
         CAST(row_number() OVER (ORDER BY freq DESC, tok ASC) AS BIGINT) AS rank
  FROM vocab ORDER BY freq DESC, tok ASC LIMIT {top_k}
)
SELECT rank, tok, freq, freq * rank AS zipf_product,
       CAST(round(CAST(freq AS DOUBLE) * 1e6
                  / CAST(total_tokens AS DOUBLE), 0) AS BIGINT) AS share_ppm,
       vocab_size, total_tokens, n_hapax
FROM top, summary
"""


def allpairs_cosine_sql(tau_num: int = 4, tau_den: int = 5,
                        source: str = "documents") -> str:
    """Replay of dedup.allpairs_cosine with the NAIVE quadratic
    candidate set (every pair sharing ANY positive-idf shingle hash) —
    equality against the Spark prefix-filtered result proves the
    Bayardo pruning is lossless at tau = tau_num/tau_den. All verdict
    arithmetic is integer-exact (idf millinats, bigint weights, HUGEINT
    for dot^2). `source` lets composed oracles scan a sharded view — a
    real parameter, not post-hoc string surgery on the generated SQL."""
    p2, q2 = tau_num * tau_num, tau_den * tau_den
    return f"""
WITH toks AS (SELECT doc_id, unnest({SHINGLE_HASHES}) AS tok FROM {source}
              WHERE text IS NOT NULL),
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, tok),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM {source}
      WHERE text IS NOT NULL),
idf AS (
  SELECT tok,
         CAST(round(ln(n_docs / CAST(count(*) AS DOUBLE)) * 1000, 0) AS BIGINT)
           AS idf_mln
  FROM tf, n GROUP BY tok, n_docs
),
w AS (
  SELECT f.doc_id, f.tok, f.tf * i.idf_mln AS w
  FROM tf f JOIN idf i USING (tok) WHERE i.idf_mln > 0
),
norms AS (SELECT doc_id, sum(w * w) AS norm2 FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         CAST(sum(a.w * b.w) AS BIGINT) AS dot
  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.doc_id_1, d.doc_id_2,
       CAST(round(CAST(d.dot AS DOUBLE)
                  / (sqrt(CAST(n1.norm2 AS DOUBLE))
                     * sqrt(CAST(n2.norm2 AS DOUBLE))) * 1e6, 0) AS BIGINT)
         AS cos_us
FROM dots d
JOIN norms n1 ON n1.doc_id = d.doc_id_1
JOIN norms n2 ON n2.doc_id = d.doc_id_2
WHERE d.dot > 0
  AND {q2} * CAST(d.dot AS HUGEINT) * CAST(d.dot AS HUGEINT)
      >= {p2} * CAST(n1.norm2 AS HUGEINT) * CAST(n2.norm2 AS HUGEINT)
"""


def minhash_vs_exact_recall_sql(threshold: float = 0.2) -> str:
    """Replay of dedup.minhash_vs_exact_recall: the ground truth is the
    CORPUS-WIDE AllPairs pair set (production idf) restricted to pairs
    with both endpoints in the frozen 40% md5 shard; the candidate
    pipeline runs on the shard (banding/jaccard are per-doc, so the two
    forms coincide). Integer counts, micro-unit ratios."""

    def shard(col: str) -> str:
        return (
            f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))"
            " AS BIGINT) % 10 < 4"
        )

    sharded = f"(SELECT * FROM documents WHERE {shard('doc_id')})"
    truth = (
        f"SELECT doc_id_1, doc_id_2 FROM ({allpairs_cosine_sql().strip()}) "
        f"WHERE ({shard('doc_id_1')}) AND ({shard('doc_id_2')})"
    )
    cand = minhash_near_dups_sql(threshold, source=sharded).strip()
    return f"""
WITH truth AS (SELECT doc_id_1, doc_id_2 FROM ({truth})),
cand AS (SELECT doc_id_1, doc_id_2 FROM ({cand})),
hits AS (SELECT * FROM truth INTERSECT SELECT * FROM cand),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
         (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits
)
SELECT n_truth, n_candidates, n_hits,
       CASE WHEN n_candidates > 0
            THEN CAST(round(CAST(n_hits AS DOUBLE)
                            / CAST(n_candidates AS DOUBLE) * 1e6, 0) AS BIGINT)
            ELSE 0 END AS precision_us,
       CASE WHEN n_truth > 0
            THEN CAST(round(CAST(n_hits AS DOUBLE)
                            / CAST(n_truth AS DOUBLE) * 1e6, 0) AS BIGINT)
            ELSE 0 END AS recall_us
FROM c
"""


def heaps_curve_sql(buckets: int = 10) -> str:
    """Replay of textops.heaps_curve: same md5 bucket draw, same
    first-appearance inversion, same cumulative sums."""
    bucket = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
        f" AS BIGINT) % {buckets}"
    )
    return f"""
WITH toks AS (
  SELECT {bucket} AS bucket, unnest({TOKS}) AS tok FROM documents
),
first_seen AS (
  SELECT tok, CAST(min(bucket) AS BIGINT) AS first_bucket
  FROM toks GROUP BY tok
),
marginal AS (
  SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS new_tokens
  FROM first_seen GROUP BY first_bucket
),
per_bucket AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY bucket
)
SELECT p.bucket,
       CAST(sum(p.n_tokens) OVER (ORDER BY p.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_tokens,
       CAST(sum(coalesce(m.new_tokens, 0)) OVER (ORDER BY p.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_vocab,
       CAST(coalesce(m.new_tokens, 0) AS BIGINT) AS new_tokens
FROM per_bucket p LEFT JOIN marginal m ON m.bucket = p.bucket
"""


def script_profile_sql(source: str = "documents") -> str:
    """Replay of textops.script_profile with the RE2 side of each
    (java, re2) class-range pair from textops.SCRIPT_CLASSES; 'g' flag
    because DuckDB regexp_replace is first-match-only by default
    (Spark's replaces all)."""
    from .operators.textops import SCRIPT_CLASSES

    count = {
        name: f"length(text) - length(regexp_replace(text, '{re2}+', '', 'g'))"
        for name, _, re2 in SCRIPT_CLASSES
    }
    cls_cols = ",\n       ".join(
        f"CAST({count[name]} AS BIGINT) AS n_{name}"
        for name, _, _ in SCRIPT_CLASSES
    )
    known = " + ".join(f"({count[name]})" for name, _, _ in SCRIPT_CLASSES)
    scripts = ("latin", "cyrillic", "greek", "cjk", "astral")
    m = "GREATEST(" + ", ".join(f"({count[s]})" for s in scripts) + ")"
    main = (
        "CASE WHEN length(text) = 0 THEN 'none' "
        f"WHEN {m} = 0 THEN 'other' "
        + " ".join(
            f"WHEN ({count[s]}) = {m} THEN '{s}'" for s in scripts
        )
        + " END"
    )
    return f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       {cls_cols},
       CAST(length(text) - ({known}) AS BIGINT) AS n_other,
       {main} AS main_script
FROM {source}
"""


def pii_scrub_sql(source: str = "documents") -> str:
    """Replay of textops.pii_scrub: same deterministic injection, RE2
    regexes (identical pattern text — the classes used are portable
    between RE2 and java.util.regex), list_transform Luhn, 'g'-flagged
    global redaction."""
    from .operators.textops import CARD_RE, EMAIL_RE, PHONE_RE

    cc15 = "lpad(CAST((doc_id * 982451653) % 1000000000000000 AS VARCHAR), 15, '0')"
    luhn15 = (
        "list_sum(list_transform(range(0, 15), i -> "
        "CASE WHEN i % 2 = 0 "
        f"THEN CASE WHEN 2 * (ascii(substr({cc15}, CAST(15 - i AS INT), 1)) - 48) > 9 "
        f"          THEN 2 * (ascii(substr({cc15}, CAST(15 - i AS INT), 1)) - 48) - 9 "
        f"          ELSE 2 * (ascii(substr({cc15}, CAST(15 - i AS INT), 1)) - 48) END "
        f"ELSE ascii(substr({cc15}, CAST(15 - i AS INT), 1)) - 48 END))"
    )
    check = f"(10 - ({luhn15}) % 10) % 10"
    digit = f"CASE WHEN doc_id % 2 = 0 THEN {check} ELSE ({check} + 5) % 10 END"
    pii = (
        "concat(text, ' contact user', CAST(doc_id AS VARCHAR),"
        " '@example.com tel +1-555-',"
        " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),"
        f" ' card ', {cc15}, CAST({digit} AS VARCHAR))"
    )
    luhn16 = (
        "list_sum(list_transform(range(0, 16), i -> "
        "CASE WHEN i % 2 = 1 "
        "THEN CASE WHEN 2 * (ascii(substr(c, CAST(16 - i AS INT), 1)) - 48) > 9 "
        "          THEN 2 * (ascii(substr(c, CAST(16 - i AS INT), 1)) - 48) - 9 "
        "          ELSE 2 * (ascii(substr(c, CAST(16 - i AS INT), 1)) - 48) END "
        "ELSE ascii(substr(c, CAST(16 - i AS INT), 1)) - 48 END))"
    )
    redacted = (
        "regexp_replace(regexp_replace(regexp_replace(pii_text,"
        f" '{EMAIL_RE}', '<EMAIL>', 'g'),"
        f" '{PHONE_RE}', '<PHONE>', 'g'),"
        f" '{CARD_RE}', '<CARD>', 'g')"
    )
    return f"""
WITH base AS (SELECT doc_id, {pii} AS pii_text FROM {source}
              WHERE text IS NOT NULL)
SELECT doc_id,
       CAST(len(regexp_extract_all(pii_text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(pii_text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(pii_text, '{CARD_RE}')) AS BIGINT) AS n_cards,
       CAST(len(list_filter(regexp_extract_all(pii_text, '{CARD_RE}'),
                            c -> ({luhn16}) % 10 = 0)) AS BIGINT) AS n_cards_valid,
       md5({redacted}) AS redacted_md5,
       CAST(length(pii_text) - length({redacted}) AS BIGINT) AS n_chars_removed
FROM base
"""


def bigram_logprob_sql() -> str:
    """Mirror of textops.bigram_logprob: same pair-table CTE, same
    millinat quantization, same exact integer micro-division."""
    return f"""
WITH g AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, {TOKS} AS t FROM documents),
       unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
dc AS (SELECT doc_id, w1, w2, count(*) AS c_d FROM g GROUP BY doc_id, w1, w2),
pair AS (SELECT w1, w2, CAST(sum(c_d) AS BIGINT) AS c12 FROM dc GROUP BY w1, w2),
hist AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pair GROUP BY w1),
model AS (
  SELECT w1, w2,
         CAST(round(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 1000)
              AS BIGINT) AS mln
  FROM pair JOIN hist USING (w1)
),
per AS (
  SELECT dc.doc_id,
         CAST(sum(c_d) AS BIGINT) AS n_bigrams,
         CAST(sum(c_d * mln) AS BIGINT) AS s_mln
  FROM dc JOIN model USING (w1, w2) GROUP BY dc.doc_id
)
SELECT doc_id, n_bigrams,
       CAST(CASE WHEN s_mln >= 0
                 THEN (2 * s_mln * 1000 + n_bigrams) // (2 * n_bigrams)
                 ELSE -((2 * (-s_mln) * 1000 + n_bigrams) // (2 * n_bigrams))
            END AS DOUBLE) / 1000000.0
         AS avg_logprob
FROM per
"""


def tfidf_keywords_sql(k: int = 5) -> str:
    """Mirror of textops.tfidf_keywords: same millinat idf quantization,
    integer tf * idf score, (score desc, token asc) total order."""
    return f"""
WITH g AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
dc AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM g GROUP BY doc_id, tok),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
idf AS (
  SELECT tok,
         CAST(round(ln(n_docs / CAST(count(DISTINCT doc_id) AS DOUBLE)) * 1000)
              AS BIGINT) AS idf_mln
  FROM dc, n GROUP BY tok, n_docs
)
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id
                          ORDER BY tf * idf_mln DESC, tok) AS rnk,
       tok AS token, tf, tf * idf_mln AS score_mln
FROM dc JOIN idf USING (tok)
QUALIFY rnk <= {k}
"""


def ingestion_dedup_sql(threshold: float = 0.2) -> str:
    """Layered replay of streaming.pipeline.ingestion_dedup_stream:
    batch 1 (doc_id % 10 == 0) dedups against the existing corpus
    (doc_id % 5 != 0) plus lower-id batch-1 docs; batch 2
    (doc_id % 10 == 5) additionally sees batch-1 SURVIVORS (novel docs
    are the only fingerprints appended to the store). dup_of is the
    minimum verified match, -1 when novel."""
    band_match = " OR ".join(
        f"a.band{b} = b.band{b}" for b in range(MINHASH_BANDS)
    )
    jac = (
        "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
        " / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6)"
    )
    return f"""
WITH {_sig_cte()},
v1 AS MATERIALIZED (
  SELECT a.doc_id, MIN(b.doc_id) AS dup_of
  FROM banded a JOIN banded b
    ON a.doc_id % 10 = 0
   AND (b.doc_id % 5 != 0 OR (b.doc_id % 10 = 0 AND b.doc_id < a.doc_id))
   AND ({band_match})
  WHERE {jac} >= {threshold!r}
  GROUP BY a.doc_id
),
v2 AS MATERIALIZED (
  SELECT a.doc_id, MIN(b.doc_id) AS dup_of
  FROM banded a JOIN banded b
    ON a.doc_id % 10 = 5
   AND (b.doc_id % 5 != 0
        OR (b.doc_id % 10 = 0
            AND b.doc_id NOT IN (SELECT doc_id FROM v1))
        OR (b.doc_id % 10 = 5 AND b.doc_id < a.doc_id))
   AND ({band_match})
  WHERE {jac} >= {threshold!r}
  GROUP BY a.doc_id
),
verdicts AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT f.doc_id,
       v.dup_of IS NOT NULL AS is_dup,
       CAST(COALESCE(v.dup_of, -1) AS BIGINT) AS dup_of
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) f
LEFT JOIN verdicts v USING (doc_id)
"""


def leakage_safe_split_sql(val_pct: int = 10, max_hamming: int = 3,
                           rounds: int = 10) -> str:
    """Replay of dedup.leakage_safe_split: component labels via the
    unrolled min-propagation chain, md5(comp)-bucket assignment, and an
    INDEPENDENT cross-boundary pair count from the quadratic pair CTE
    (the Spark side counts over its banded dup graph — agreeing zeros
    certify the no-leakage claim from two unrelated pair pipelines)."""
    bucket = (
        "CAST(('0x' || substr(md5(CAST(comp AS VARCHAR)), 1, 8)) AS BIGINT)"
        " % 100"
    )
    return _components_with_clause(max_hamming, rounds) + f""",
tagged AS MATERIALIZED (
  SELECT node, comp,
         CASE WHEN {bucket} < {val_pct} THEN 'val' ELSE 'train' END AS split
  FROM l{rounds}
),
leak AS (
  SELECT CAST(count(*) AS BIGINT) AS leaked_pairs
  FROM pairs p
  JOIN tagged a ON a.node = p.d1
  JOIN tagged b ON b.node = p.d2
  WHERE a.split != b.split
)
SELECT t.split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT t.comp) AS BIGINT) AS n_clusters,
       l.leaked_pairs
FROM tagged t, leak l GROUP BY t.split, l.leaked_pairs
"""


def _bpe_stage_sql(r: int) -> str:
    """One unrolled BPE train round: pair count over s{r}, the
    (n DESC, pair ASC) argmax, the padded leftmost-non-overlapping
    merge rewrite into s{r+1}."""
    return f"""
p{r} AS MATERIALIZED (
  SELECT p, CAST(SUM(wn) AS BIGINT) AS n FROM (
    SELECT wn,
           unnest(list_transform(generate_series(1, len(sl) - 1),
                                 i -> sl[i] || ' ' || sl[i + 1])) AS p
    FROM (SELECT string_split(s, ' ') AS sl, wn FROM s{r})
  ) GROUP BY p
),
top{r} AS MATERIALIZED (
  SELECT p, n FROM p{r} ORDER BY n DESC, p LIMIT 1
),
s{r + 1} AS MATERIALIZED (
  SELECT w,
         trim(replace(' ' || s || ' ',
                      (SELECT ' ' || p || ' ' FROM top{r}),
                      (SELECT ' ' || replace(p, ' ', '') || ' ' FROM top{r})))
           AS s,
         wn
  FROM s{r}
)"""


def bpe_train_merges_sql(n_merges: int = 5) -> str:
    """Replay of textops.bpe_train_merges: the same rounds unrolled as
    CTE stages (pair count over the distinct-word symbol table, the
    (n DESC, pair ASC) argmax, the padded leftmost-non-overlapping
    merge rewrite)."""
    chain = ",".join(_bpe_stage_sql(r) for r in range(n_merges))
    body = "\nUNION ALL\n".join(
        f"SELECT {r + 1} AS rank, split_part(p, ' ', 1) AS left_sym, "
        f"split_part(p, ' ', 2) AS right_sym, "
        f"replace(p, ' ', '') AS merged, n FROM top{r}"
        for r in range(n_merges)
    )
    return f"""
{_bpe_with_prefix(chain)}
{body}
"""


def _bpe_with_prefix(chain: str) -> str:
    """Shared WITH-clause prefix of the BPE oracles: word counts, the
    char-level symbol table s0, and the unrolled train/rewrite chain."""
    return f"""
WITH words AS MATERIALIZED (
  SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
),
wc AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS wn FROM words
  WHERE length(w) >= 1 GROUP BY w
),
s0 AS MATERIALIZED (
  SELECT w,
         array_to_string(list_transform(generate_series(1, length(w)),
                                        i -> substr(w, i, 1)), ' ') AS s,
         wn
  FROM wc
),{chain}"""


def bpe_encode_stats_sql(n_merges: int = 5) -> str:
    """Replay of textops.bpe_encode_stats: the identical unrolled train
    chain, then the tokens-per-word histogram over the FINAL symbol
    table s{n_merges}."""
    chain = ",".join(_bpe_stage_sql(r) for r in range(n_merges))
    return f"""
{_bpe_with_prefix(chain)}
SELECT CAST(len(string_split(s, ' ')) AS INT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(wn) AS BIGINT) AS n_occurrences
FROM s{n_merges}
GROUP BY n_tokens
"""


def bpe_fertility_by_lang_sql(n_merges: int = 5) -> str:
    """Replay of textops.bpe_fertility_by_lang: the unrolled train
    chain, word -> n_tokens map, per-language token budgets, integer
    ppm fertility."""
    chain = ",".join(_bpe_stage_sql(r) for r in range(n_merges))
    return f"""
{_bpe_with_prefix(chain)},
wmap AS MATERIALIZED (
  SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tokens
  FROM s{n_merges}
),
dw AS MATERIALIZED (
  SELECT lang, unnest(string_split(lower(text), ' ')) AS w FROM documents
)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(m.n_tokens) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(m.n_tokens) * 1000000 // count(*) AS BIGINT)
         AS fertility_ppm
FROM dw d JOIN wmap m USING (w)
WHERE length(d.w) >= 1
GROUP BY d.lang
"""


def bpe_encode_corpus_sql(n_merges: int = 5) -> str:
    """Replay of textops.bpe_encode_corpus: the identical unrolled train
    chain, the word -> n_tokens map off the final symbol table, joined
    back against the tokenized corpus for per-document token budgets."""
    chain = ",".join(_bpe_stage_sql(r) for r in range(n_merges))
    return f"""
{_bpe_with_prefix(chain)},
wmap AS MATERIALIZED (
  SELECT w, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_tokens
  FROM s{n_merges}
),
dw AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
)
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(m.n_tokens) AS BIGINT) AS n_bpe_tokens
FROM dw d JOIN wmap m USING (w)
WHERE length(d.w) >= 1
GROUP BY d.doc_id
"""


def dedup_mixture_shift_sql(max_hamming: int = 3, rounds: int = 10) -> str:
    """Oracle for dedup.dedup_mixture_shift: the components chain, one
    conditional aggregation per domain, integer ppm shares."""
    return (
        _components_with_clause(max_hamming, rounds)
        + f"""
, per AS (
  SELECT d.lang, d.source,
         CAST(sum(len({TOKS})) AS BIGINT) AS n_tokens_raw,
         CAST(sum(CASE WHEN l.comp = d.doc_id
                       THEN len({TOKS}) ELSE 0 END) AS BIGINT)
           AS n_tokens_dedup
  FROM documents d JOIN l{rounds} l ON l.node = d.doc_id
  GROUP BY d.lang, d.source
),
tot AS (
  SELECT CAST(sum(n_tokens_raw) AS BIGINT) AS tr,
         CAST(sum(n_tokens_dedup) AS BIGINT) AS td
  FROM per
)
SELECT lang, source, n_tokens_raw, n_tokens_dedup,
       CAST(n_tokens_raw * 1000000 // tr AS BIGINT) AS share_raw_ppm,
       CAST(n_tokens_dedup * 1000000 // td AS BIGINT) AS share_dedup_ppm,
       CAST(n_tokens_dedup * 1000000 // td
            - n_tokens_raw * 1000000 // tr AS BIGINT) AS shift_ppm
FROM per, tot
"""
    )


def simhash_threshold_curve_sql(max_hamming: int = 3) -> str:
    """Oracle for dedup.simhash_threshold_curve: the naive quadratic
    hamming scan grouped per distance, expanded cumulatively per
    threshold."""
    return f"""
WITH fp AS (SELECT doc_id, {SIMHASH} AS sh FROM documents
            WHERE text IS NOT NULL),
per AS (
  SELECT bit_count(xor(a.sh, b.sh)) AS hamming,
         CAST(count(*) AS BIGINT) AS n_at
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
  GROUP BY 1
),
t AS (SELECT CAST(unnest(range(0, {max_hamming + 1})) AS INTEGER)
        AS threshold)
SELECT t.threshold,
       CAST(coalesce(sum(CASE WHEN per.hamming = t.threshold
                              THEN per.n_at END), 0) AS BIGINT)
         AS n_pairs_at,
       CAST(coalesce(sum(per.n_at), 0) AS BIGINT) AS n_pairs_cum
FROM t LEFT JOIN per ON per.hamming <= t.threshold
GROUP BY t.threshold
"""
