"""Resilient embedding source — the operator SHAPE of the reference's
embedding service, with a deterministic stand-in encoder.

Parity targets (reference services/embedding_service.py):
- :103-166  retry with exponential backoff around each model call
- :190-229  per-batch failure isolation: one bad batch must not kill
            the whole embed pass — its rows are quarantined, the rest
            proceed
- :20,233-259  input_type asymmetry: "search_query" and
            "search_document" are DIFFERENT encoders (the reference
            passes input_type to Cohere); modeled here as a token-salt
            on the query side, so the two encodings measurably differ
- :23       batch limit 96 texts per call

Spark design: mapInPandas over Arrow batches; each <=96-text sub-batch
is one "model call" wrapped in try/retry/backoff INSIDE the worker —
at 100 TB the retry happens next to the data, and a quarantined batch
surfaces as rows with status='failed' that downstream validation
(validation_report) counts instead of the job dying. The encoder is
injectable (tests inject a flaky one to prove retried batches converge);
the default is the deterministic hash embedding, which never fails, so
the registered query stays oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import token_hash, tokens
from ..sources.tables import load
from .multimodal import EMBED_BATCH, _round_half_up

QUERY_TOKEN_PREFIX = "q|"  # the "search_query" encoder's token salt
EMBED_DIM = 16

RESILIENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("e0", T.DoubleType()),
    T.StructField("e1", T.DoubleType()),
    T.StructField("e2", T.DoubleType()),
    T.StructField("e3", T.DoubleType()),
    T.StructField("status", T.StringType()),
    T.StructField("attempts", T.IntegerType()),
])


def default_encoder(texts: list[str], input_type: str = "search_document") -> list[list[float]]:
    """Deterministic stand-in model call: the seeded hash embedding of
    functions/embed.py in numpy float64, optionally token-salted for
    the query-side encoder. Never fails — swap for the real HTTP call."""
    import hashlib

    import numpy as np

    prefix = QUERY_TOKEN_PREFIX if input_type == "search_query" else ""
    mod_p = 2_147_483_647
    out = []
    for text in texts:
        raw = np.zeros(EMBED_DIM, dtype=np.float64)
        for tok in text.lower().split(" "):
            h = int(hashlib.md5((prefix + tok).encode()).hexdigest()[:8], 16) % mod_p
            sign = 1.0 if (h // EMBED_DIM) % 2 else -1.0
            raw[h % EMBED_DIM] += sign
        n = float(np.sqrt(sum(v * v for v in raw.tolist())))
        if n == 0.0:
            out.append(raw.tolist()[:4])
        else:
            out.append([_round_half_up(v / n) for v in raw.tolist()[:4]])
    return out


def embed_resilient(
    docs: DataFrame,
    encoder: Callable[[list[str]], list[list[float]]] | None = None,
    max_retries: int = 3,
    backoff_base_s: float = 0.0,
    batch_size: int = EMBED_BATCH,
    input_type: str = "search_document",
) -> DataFrame:
    """S15 with the reference's resilience semantics: every <=96-text
    sub-batch is one encoder call, retried up to `max_retries` times
    with exponential backoff (backoff_base_s * 2^attempt; 0 in tests so
    retries are instant), and a sub-batch that exhausts its retries is
    QUARANTINED — its rows come back with status='failed' and null
    components while every other batch proceeds (batch-failure
    isolation, embedding_service.py:190-229)."""
    enc = encoder or (lambda texts: default_encoder(texts, input_type))

    def _batches(batches):
        import time as _time

        import pandas as pd

        cols = [f.name for f in RESILIENT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for start in range(0, len(pdf), batch_size):
                sub = pdf.iloc[start:start + batch_size]
                texts = [str(t) for t in sub["text"]]
                vecs = None
                attempts = 0
                while attempts < max_retries:
                    attempts += 1
                    try:
                        vecs = enc(texts)
                        break
                    except Exception:
                        if attempts < max_retries:
                            _time.sleep(backoff_base_s * (2 ** (attempts - 1)))
                for i, doc_id in enumerate(sub["doc_id"]):
                    if vecs is None:  # quarantined batch
                        rows.append({"doc_id": int(doc_id), "e0": None, "e1": None,
                                     "e2": None, "e3": None, "status": "failed",
                                     "attempts": attempts})
                    else:
                        e = vecs[i]
                        rows.append({"doc_id": int(doc_id), "e0": e[0], "e1": e[1],
                                     "e2": e[2], "e3": e[3], "status": "ok",
                                     "attempts": attempts})
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "text").mapInPandas(_batches, RESILIENT_SCHEMA)


def embed_resilient_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() surface for the resilient path under the default
    (never-failing) encoder: components + status='ok' + attempts=1,
    oracle-checked against the same SQL as the plain S15 path.

    Spread HERE, not inside embed_resilient: repartitioning changes
    which rows share a quarantine batch, which is a caller decision
    (tests pin batch-level isolation on hand-built partitions); for this
    per-document-deterministic encoder it only buys parallelism."""
    from ..sources.tables import spread_for_compute

    return embed_resilient(spread_for_compute(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())))


def embed_asymmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_type asymmetry as a checkable query: embed every
    document under BOTH encoders (document vs query token-salt) and
    report first components + the cosine between the two encodings —
    demonstrably != 1, i.e. the two input types are different encoders
    (embedding_service.py:20,233-259). Pure JVM expressions; the oracle
    mirrors both salted and unsalted hash pipelines.

    The token array is let-bound ONCE and both encoders derive from it
    (codegen CSE skips lambda-bearing trees, so without the binding the
    split+md5 pipeline would run once per use — ~6x here: two encoders
    x element_at + the cosine's dot and two norms)."""
    from ..functions import similarity as sim
    from ..functions.embed import embedding_from_hashes
    from ..functions.hashing import let
    from ..sources.tables import spread_for_compute

    docs = spread_for_compute(load(spark, sf_dir, "documents").filter(F.col("text").isNotNull()))

    def _both(t):
        def _with_tokens(tk):
            d = embedding_from_hashes(F.transform(tk, token_hash))
            q = embedding_from_hashes(
                F.transform(
                    tk,
                    lambda x: token_hash(F.concat(F.lit(QUERY_TOKEN_PREFIX), x)),
                )
            )
            return let(d, lambda dd: let(q, lambda qq: F.struct(
                F.element_at(dd, 1).alias("d0"),
                F.element_at(qq, 1).alias("q0"),
                F.round(sim.cosine(dd, qq), 6).alias("cos_dq"),
            )))

        return let(tokens(t), _with_tokens)

    return (
        docs.select("doc_id", _both(F.col("text")).alias("st"))
        .select("doc_id", "st.*")
    )


def validation_report(
    spark: SparkSession,
    sf_dir: str,
    encoder: Callable[[list[str]], list[list[float]]] | None = None,
) -> DataFrame:
    """P6 validation surface extended with the embed-quarantine counts:
    document integrity checks + how many rows the resilient embed pass
    quarantined (status='failed') and the max attempts any batch needed.
    Under the default deterministic encoder nothing fails (oracle pins
    0 / 1); tests inject a flaky encoder and watch the counts move."""
    # NO null-text filter here: validation's whole job is to see bad rows
    docs = load(spark, sf_dir, "documents")
    base = docs.agg(
        F.count("*").alias("total_docs"),
        F.sum(F.when(F.trim("text") == "", 1).otherwise(0)).alias("n_empty_text"),
        F.sum(F.when(F.length("text") != F.col("n_chars"), 1).otherwise(0))
        .alias("n_length_mismatch"),
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0)).alias("n_null_ids"),
    )
    emb = embed_resilient(docs, encoder=encoder)
    st = emb.agg(
        F.sum(F.when(F.col("status") == "failed", 1).otherwise(0))
        .cast("bigint").alias("n_embed_failed"),
        F.max("attempts").alias("max_embed_attempts"),
    )
    return base.crossJoin(st)
