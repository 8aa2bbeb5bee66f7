"""Flat (exact) k-NN search — the flagship query path.

Parity target: reference FlatIndex.search (vector_db/algorithms.py:161-193)
+ VectorService.search_similar_chunks (services/vector_service.py:184-310):
scope to a library, score every vector under a metric, exact top-k, then
hydrate result rows with an inner join that silently drops index orphans
(services/vector_service.py:254-278).

Spark shape of the plan (what .explain should show):
  partition/filter-pruned parquet scan of embeddings
  -> whole-stage-codegen'd score projection (functions/similarity.py)
  -> TakeOrderedAndProject (the built-in partial top-k: per-partition
     heap + driver merge, same O(n log k) the reference hand-rolls at
     similarity.py:347-395 and argpartition-optimizes at :464-470 — O2/O3
     in SURVEY §4 come free)
  -> BroadcastHashJoin against the row table (k <= 100 rows, J1)

At 100 TB: embeddings partitioned by library -> the filter is partition
pruning; top-k never shuffles the full table (each partition emits <= k
rows); the hydration join broadcasts the k-row side, never the row table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import similarity as sim
from ..sources.tables import load

K_MIN, K_MAX = 1, 100  # reference schemas/search_schema.py:26


def validate_k(k: int) -> None:
    """k ∈ [1,100] — reference request validation (search_schema.py:26),
    422 on violation; here a ValueError in driver code."""
    if not K_MIN <= k <= K_MAX:
        raise ValueError(f"k must be in [{K_MIN},{K_MAX}], got {k}")


def query_vector(spark: SparkSession, sf_dir: str, query_id: int) -> list[float]:
    """Materialize one stored embedding as the query parameter — the
    analog of the reference embedding a query string before planning
    (services/vector_service.py:243-252); the vector enters the plan as
    a literal."""
    return query_vector_row(spark, sf_dir, query_id)[0]


_QVEC_CACHE: dict[tuple, tuple[list[float], int]] = {}


def query_vector_row(
    spark: SparkSession, sf_dir: str, query_id: int
) -> tuple[list[float], int]:
    """(embedding, label) of a stored vector. The label lets probe paths
    prove their candidate set non-empty (the query's own row is always a
    candidate when it is inside the searched scope) and skip the
    empty-fallback check entirely on the hot path.

    Memoized per (table file identity, query_id): every search call needs
    this lookup, and the reference amortizes it the same way by keeping
    vectors resident in its storage dict (vector_db/storage.py:11-41).
    The key covers every part file (tables.path_signature), so a rewrite
    of any partition drops the entry."""
    import os

    from ..sources.tables import path_signature

    p = os.path.join(sf_dir, "embeddings.parquet")
    key = (*path_signature(p), query_id)
    if key in _QVEC_CACHE:
        return _QVEC_CACHE[key]
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == F.lit(query_id))
        .select("embedding", "label")
        .head()
    )
    if row is None:
        raise KeyError(f"query vector {query_id} not found")
    # label is OPTIONAL metadata (nullable at the source); a NULL label
    # rides through as None so consumers surface it as SQL NULL, the
    # same value the oracle reads from the table.
    _QVEC_CACHE[key] = (
        list(row[0]), int(row[1]) if row[1] is not None else None,
    )
    return _QVEC_CACHE[key]


def query_vector_rows(
    spark: SparkSession, sf_dir: str, query_ids: list[int]
) -> dict[int, tuple[list[float], int]]:
    """Batch form of query_vector_row: ONE filter-isin scan fills the
    memo for every missing id (a sweep over 5 query points costs one
    job, not five), then everything reads from _QVEC_CACHE."""
    import os

    from ..sources.tables import path_signature

    p = os.path.join(sf_dir, "embeddings.parquet")
    sig = path_signature(p)
    missing = [q for q in query_ids if (*sig, q) not in _QVEC_CACHE]
    if missing:
        rows = (
            load(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id").isin([int(q) for q in missing]))
            .select("vec_id", "embedding", "label")
            .collect()
        )
        for r in rows:
            _QVEC_CACHE[(*sig, int(r["vec_id"]))] = (
                list(r["embedding"]),
                int(r["label"]) if r["label"] is not None else None,
            )
        still = [q for q in missing if (*sig, q) not in _QVEC_CACHE]
        if still:
            raise KeyError(f"query vectors not found: {still}")
    return {q: _QVEC_CACHE[(*sig, q)] for q in query_ids}


def score_all(
    emb: DataFrame,
    qvec: Sequence[float],
    metric: str = "cosine",
    library: int | None = None,
) -> DataFrame:
    """Score every (in-library) vector against the query. Scores are
    rounded to 6 decimals *before* ranking so the top-k frontier is
    deterministic and oracle-stable (SURVEY §7 hard part #1).

    The query norm is a constant, but Catalyst can't fold it (lambda
    expressions are never foldable), so for cosine it is computed
    driver-side and enters the plan as a literal — cuts the per-row array
    passes from 5 to 3. Left-to-right Python double sum == Spark's
    aggregate fold, so scores are bit-identical to the unfolded form."""
    if library is not None:
        emb = emb.filter(F.col("label") == F.lit(library))
    q = sim.vector_lit(qvec)
    e = F.col("embedding")
    if metric == "cosine":
        import math

        qn = math.sqrt(sum(float(v) * float(v) for v in qvec))
        if qn == 0.0:
            score = F.lit(0.0)
        else:
            na = sim.norm(e)
            score = F.when(na == F.lit(0.0), F.lit(0.0)).otherwise(
                sim.dot(e, q) / (na * F.lit(qn))
            )
    else:
        score = sim.score(metric, e, q)
    return emb.withColumn("score", F.round(score, 6))


def knn(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_id: int = 0,
    k: int = 10,
    metric: str = "cosine",
    library: int | None = None,
    hydrate: bool = False,
) -> DataFrame:
    """Exact k-NN: top-k by (score desc, vec_id asc) — total order matches
    the reference's heap tie-break on (similarity, chunk_id)
    (similarity.py:389-392) made explicit for determinism."""
    validate_k(k)
    qvec = query_vector(spark, sf_dir, query_id)
    scored = score_all(load(spark, sf_dir, "embeddings"), qvec, metric, library)
    topk = (
        scored.orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "score")
    )
    if not hydrate:
        return topk
    # J1 hydration: inner join => index-orphan rows are dropped, matching
    # services/vector_service.py:265-278. The k-row side is broadcast.
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id"), F.col("text"), F.col("lang"), F.col("source")
    )
    return (
        docs.join(F.broadcast(topk), docs.doc_id == topk.vec_id, "inner")
        .select("vec_id", "label", "score", "text", "lang", "source")
    )


def knn_safe(
    spark: SparkSession,
    sf_dir: str,
    **kwargs,
) -> DataFrame:
    """Query-level error swallow (services/vector_service.py:290-310):
    embedding failures (here: missing query vector -> KeyError) and
    request-validation errors (k bounds / unknown metric -> ValueError,
    which the reference rejects at the schema layer before the swallow
    wrapper) RE-RAISE; any OTHER internal failure returns the empty
    search-response frame instead of propagating — search degrades to
    zero results, it never 500s.

    The reference swallow wraps the WHOLE search execution, not just
    request planning — so the result is forced EAGERLY here (a
    localCheckpoint of the <= k-row top-k, i.e. exactly the job the
    caller was about to run, with no recompute on collect): executor-side
    failures at evaluation time degrade to the empty frame too, instead
    of leaking out of a lazily returned plan."""
    try:
        return knn(spark, sf_dir, **kwargs).localCheckpoint(eager=True)
    except (KeyError, ValueError):
        raise
    except Exception:
        emb = load(spark, sf_dir, "embeddings")
        empty = emb.select("vec_id", "label", F.lit(0.0).alias("score")).limit(0)
        if kwargs.get("hydrate"):
            docs = load(spark, sf_dir, "documents")
            return (
                empty.crossJoin(docs.select("text", "lang", "source"))
                .select("vec_id", "label", "score", "text", "lang", "source")
                .limit(0)
            )
        return empty


def knn_distance(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_id: int = 0,
    k: int = 10,
    metric: str = "euclidean",
) -> DataFrame:
    """Distance-ordered variant (lower = closer), K3/K5 surface."""
    validate_k(k)
    qvec = query_vector(spark, sf_dir, query_id)
    emb = load(spark, sf_dir, "embeddings")
    q = sim.vector_lit(qvec)
    dist = F.round(sim.DISTANCES[metric](F.col("embedding"), q), 6)
    return (
        emb.withColumn("dist", dist)
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "dist")
    )


def knn_prefiltered(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_id: int = 0,
    k: int = 10,
    metric: str = "cosine",
    lang: str = "en",
) -> DataFrame:
    """Metadata-PREFILTERED vector search: restrict the candidate set by
    a document attribute (here `lang`) BEFORE scoring, then exact top-k
    — the filtered-ANN surface every production vector store exposes.
    The metadata restriction is a semi-join against the documents table
    pushed below the scoring projection, so only surviving vectors pay
    the kernel; at scale, when metadata lives denormalized on the vector
    table (the partitioned-store layout), this same plan becomes a
    partition-pruned scan + pushed filter with no join at all."""
    validate_k(k)
    qvec = query_vector(spark, sf_dir, query_id)
    from ..sources.tables import load as _load

    allowed = (
        _load(spark, sf_dir, "documents")
        .filter(F.col("lang") == lang)
        .select(F.col("doc_id").alias("vec_id"))
    )
    emb = _load(spark, sf_dir, "embeddings").join(allowed, "vec_id", "left_semi")
    scored = score_all(emb, qvec, metric, None)
    return (
        scored.orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "score")
    )


def range_search(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_id: int = 0,
    min_score: float = 0.2,
    metric: str = "cosine",
    library: int | None = None,
) -> DataFrame:
    """Radius (range) search: every vector whose similarity to the query
    clears `min_score` — the standard vector-store surface the top-k
    family can't express, because the RESULT SIZE is data-dependent (the
    reference's search is k-bounded, services/vector_service.py:214-241;
    range search is its recall-complete dual). Same scoring kernel and
    6-decimal rounding as knn/score_all, so the DuckDB oracle is exact.

    At scale this is the cheapest search shape in the file: one
    codegen'd scan + filter, NO shuffle at all (not even the top-k
    sort), embarrassingly parallel at any corpus size, and the library
    filter partition-prunes like every other per-library scan."""
    qvec = query_vector(spark, sf_dir, query_id)
    scored = score_all(load(spark, sf_dir, "embeddings"), qvec, metric, library)
    return scored.filter(F.col("score") >= F.lit(float(min_score))).select(
        "vec_id", "label", "score"
    )
