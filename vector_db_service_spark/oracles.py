"""DuckDB oracle-SQL fragment builders.

Each fragment mirrors one column expression from functions/similarity.py
term for term, in double precision, so the driver's side-by-side
value-hash comparison (CORRECTNESS_r{N}.json) is stable. Scores are
rounded to 6 decimals in BOTH engines before ranking; double accumulation
noise (~1e-15) never reaches the rounding boundary.

`a` / `b` are SQL expressions evaluating to FLOAT[] lists.
"""

from __future__ import annotations


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def cosine_sql(a: str, b: str) -> str:
    # zero-vector guard -> 0.0, mirroring similarity.py:47-52
    return (
        f"CASE WHEN {norm_sql(a)} = 0 OR {norm_sql(b)} = 0 THEN 0.0 "
        f"ELSE {dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}) END"
    )


def euclidean_distance_sql(a: str, b: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
        f"* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))))"
    )


def euclidean_similarity_sql(a: str, b: str) -> str:
    return f"1.0 / (1.0 + {euclidean_distance_sql(a, b)})"


def manhattan_distance_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    )


def manhattan_similarity_sql(a: str, b: str) -> str:
    return f"1.0 / (1.0 + {manhattan_distance_sql(a, b)})"


METRIC_SQL = {
    "cosine": cosine_sql,
    "dot_product": dot_sql,
    "euclidean": euclidean_similarity_sql,
    "manhattan": manhattan_similarity_sql,
}

DISTANCE_SQL = {
    "euclidean": euclidean_distance_sql,
    "manhattan": manhattan_distance_sql,
}


def knn_sql(query_id: int = 0, k: int = 10, metric: str = "cosine",
            library: int | None = None, hydrate: bool = False) -> str:
    """Oracle for operators/knn.py::knn — same scoring, same rounding,
    same (score desc, vec_id asc) total order."""
    score = METRIC_SQL[metric]("e.embedding", "q.qv")
    lib_filter = f"AND e.label = {library}" if library is not None else ""
    base = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id}),
scored AS (
  SELECT e.vec_id, e.label, round({score}, 6) AS score
  FROM embeddings e, q
  WHERE 1=1 {lib_filter}
),
topk AS (
  SELECT vec_id, label, score FROM scored
  QUALIFY row_number() OVER (ORDER BY score DESC, vec_id) <= {k}
)
"""
    if not hydrate:
        return base + "SELECT vec_id, label, score FROM topk"
    return base + (
        "SELECT t.vec_id, t.label, t.score, d.text, d.lang, d.source\n"
        "FROM topk t JOIN documents d ON d.doc_id = t.vec_id"
    )


def knn_distance_sql(query_id: int = 0, k: int = 10, metric: str = "euclidean") -> str:
    dist = DISTANCE_SQL[metric]("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id})
SELECT e.vec_id, e.label, round({dist}, 6) AS dist
FROM embeddings e, q
QUALIFY row_number() OVER (ORDER BY dist ASC, vec_id) <= {k}
"""
