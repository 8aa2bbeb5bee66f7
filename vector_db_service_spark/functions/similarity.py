"""Similarity kernels K1-K12 as pure Spark column expressions.

Parity target: reference vector_db/similarity.py (SimilarityCalculator,
cosine/dot/euclidean/manhattan + batch variants, zero-vector guard at
similarity.py:47-52 returning 0.0, `1/(1+distance)` similarity forms at
similarity.py:94-109,129-144).

Design notes (Spark-first, 100 TB aware):
- No Python UDFs. Every kernel is a higher-order-function expression
  (`zip_with` + `aggregate`) that runs JVM-side inside whole-stage
  codegen, so scoring N vectors is a single codegen'd projection over a
  columnar scan — the Spark analog of the reference's NumPy batch matmul
  (similarity.py:146-183), but partition-parallel instead of
  single-process.
- All arithmetic in DOUBLE even though vectors are float32 arrays
  (reference coerces to float32 at storage.py:70). DuckDB oracles
  compute in double; float32 accumulation noise (~1e-6 over 64 dims)
  would break the value-hash, double noise (~1e-15) rounds away at 6
  decimals.
- The "batch" kernels K7-K12 need no separate implementation: scoring a
  column against a literal query vector IS the batch form — Catalyst
  vectorizes it over every row of the scan.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def vector_lit(vec: Sequence[float]) -> Column:
    """A query vector as a literal array<double> column. This is how a
    materialized query embedding enters the plan — same shape as the
    reference passing np.ndarray into index.search (algorithms.py:161).
    Built as ONE parsed SQL string: the F.array(*[F.lit(v) ...]) form
    costs dim+1 py4j round trips per use (and these literals appear once
    per hyperplane per band across the LSH family). repr() round-trips
    each float64 bit-for-bit; the D suffix keeps Spark from parsing the
    literal as DECIMAL."""
    return F.expr(
        "array(" + ", ".join(f"{float(v)!r}D" for v in vec) + ")"
    )


def dot(a: Column, b: Column) -> Column:
    """K2/K12: plain dot product (similarity.py:56-73,285-307)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    """L2 norm, computed in double."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + _d(x) * _d(x)))


def cosine(a: Column, b: Column) -> Column:
    """K1/K7: cosine similarity with the reference's zero-vector guard —
    0.0 when either norm is zero (similarity.py:47-52,167-181), never a
    divide-by-zero (ANSI-safe)."""
    na, nb = norm(a), norm(b)
    return F.when((na == F.lit(0.0)) | (nb == F.lit(0.0)), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def euclidean_distance(a: Column, b: Column) -> Column:
    """K3/K8: L2 distance (similarity.py:75-92)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def euclidean_similarity(a: Column, b: Column) -> Column:
    """K4/K9: 1/(1+dist) (similarity.py:94-109)."""
    return F.lit(1.0) / (F.lit(1.0) + euclidean_distance(a, b))


def manhattan_distance(a: Column, b: Column) -> Column:
    """K5/K10: L1 distance (similarity.py:111-127)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(_d(x) - _d(y))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def manhattan_similarity(a: Column, b: Column) -> Column:
    """K6/K11: 1/(1+dist) (similarity.py:129-144)."""
    return F.lit(1.0) / (F.lit(1.0) + manhattan_distance(a, b))


# Metric registry — the engine's analog of the reference's metric-name
# dispatch (similarity.py:309-345 similarity_generator). Extensibility is
# "register an expression builder", mirroring the fixed enum at
# schemas/search_schema.py:15-20.
METRICS: dict[str, Callable[[Column, Column], Column]] = {
    "cosine": cosine,
    "dot_product": dot,
    "euclidean": euclidean_similarity,
    "manhattan": manhattan_similarity,
}

def cosine_distance(a: Column, b: Column) -> Column:
    """1 - cosine similarity (angular dissimilarity; zero-vector guard
    inherits cosine's 0.0 -> distance 1.0)."""
    return F.lit(1.0) - cosine(a, b)


# Raw distance forms (lower is closer) for callers that want distances.
DISTANCES: dict[str, Callable[[Column, Column], Column]] = {
    "euclidean": euclidean_distance,
    "manhattan": manhattan_distance,
    "cosine": cosine_distance,
}


def score(metric: str, a: Column, b: Column) -> Column:
    """Similarity score under `metric`, higher = more similar. Unknown
    metric raises, like the reference's ValueError (similarity.py:341)."""
    try:
        return METRICS[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; expected {sorted(METRICS)}") from None
