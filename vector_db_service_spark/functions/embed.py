"""Deterministic local embedding stand-in for the reference's Cohere
call (S15, reference services/embedding_service.py:108-166).

No network in CI, so texts are embedded with a seeded hashed
bag-of-words: each token's md5-prefix hash picks a dimension
(h mod dim) and a sign (bit just above the dim bits), components are
summed and the vector L2-normalized (zero guard: all-zero stays
all-zero). Deterministic, order-insensitive, cross-engine exact — the
whole construction is arithmetic on int64/double, so the DuckDB oracle
reproduces it bit-for-bit (embed_sql in oracles_pipeline.py).

This is explicitly a stand-in: swap `hash_embedding` for a Pandas-UDF
model call (Arrow-batched, ≤96 texts per request, retry/backoff in the
UDF — reference embedding_service.py:190-229) for a real model; the
rest of the pipeline is unchanged because the embedding enters the plan
as a plain array<double> column either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import let
from .text import token_hashes

EMBED_DIM = 16


def embedding_from_hashes(hashes: Column, dim: int = EMBED_DIM) -> Column:
    """The accumulate+normalize half of the hash embedding, over an
    already-computed token-hash array. Split out so callers that derive
    several encodings from ONE tokenization (e.g. the document/query
    input_type asymmetry) can let-bind the token array once instead of
    re-running split+md5 per encoder."""

    def _accum(hs: Column) -> Column:
        def _component(i: Column) -> Column:
            def _merge(acc: Column, h: Column) -> Column:
                sign = (F.floor(h / F.lit(float(dim))).cast("long") % F.lit(2))
                signed = (sign * F.lit(2) - F.lit(1)).cast("double")
                return acc + F.when(h % F.lit(dim) == i, signed).otherwise(F.lit(0.0))

            return F.aggregate(hs, F.lit(0.0), _merge)

        return F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _component)

    def _normalize(raw: Column) -> Column:
        n = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x))
        return F.when(n == F.lit(0.0), raw).otherwise(
            F.transform(raw, lambda x: F.round(x / n, 6))
        )

    return let(let(hashes, _accum), _normalize)


def hash_embedding(text: Column, dim: int = EMBED_DIM) -> Column:
    """Hashed bag-of-words embedding: array<double> of length `dim`."""
    return embedding_from_hashes(token_hashes(text), dim)
