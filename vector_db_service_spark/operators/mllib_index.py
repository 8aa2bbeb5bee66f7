"""MLlib batch index builds — the idiomatic Spark alternative alongside
the reference-faithful reimplementations (operators/lsh.py, grid.py).

The reference's hand-written indexes are replicated exactly elsewhere
(SURVEY §7 hard part #2: MLlib's semantics differ, so parity queries use
the faithful ones). These operators are the SCALE path the north-star
asks for: MLlib's LSH family trained once over the embedding table,
producing bucket tables that at 100 TB get written partitioned by hash
key so probes are partition-pruned joins.

Semantics-divergent from the reference BY DESIGN (documented here, and
registered without a DuckDB oracle: MLlib's seeded coefficients are not
reproducible in SQL — the driver records the weaker rows-only check):

- brp_bucket_index / brp_approx_knn: BucketedRandomProjectionLSH
  (Euclidean buckets, bucketLength-tuned), vs the reference's
  sign-of-dot single-bit tables (algorithms.py:285-310).
- minhash_jaccard_join: MinHashLSH.approxSimilarityJoin over binary
  HashingTF shingle vectors, vs functions/hashing.py's explicit
  (a*x+b) mod p permutations.

All models are seeded, so outputs are deterministic run-to-run.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import shingles
from ..sources.tables import load

SEED = 42


def _emb_vectors(emb: DataFrame) -> DataFrame:
    return emb.withColumn("vec", array_to_vector(F.col("embedding").cast("array<double>")))


def brp_bucket_index(spark: SparkSession, sf_dir: str, bucket_length: float = 1.0,
                     num_tables: int = 4) -> DataFrame:
    """Batch index build: per-vector BRP-LSH bucket ids, one row per
    (vec_id, table, bucket). The written form of this frame IS the index
    — at scale, partitionBy(table, bucket) makes probes pruned scans."""
    emb = _emb_vectors(load(spark, sf_dir, "embeddings"))
    brp = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=SEED,
    )
    model = brp.fit(emb)
    hashed = model.transform(emb)
    return hashed.select(
        "vec_id", "label",
        F.posexplode("hashes").alias("table_idx", "bucket_vec"),
    ).select(
        "vec_id", "label", "table_idx",
        F.element_at(vector_to_array(F.col("bucket_vec")), 1).cast("long").alias("bucket"),
    )


def brp_approx_knn(spark: SparkSession, sf_dir: str, query_id: int = 0,
                   k: int = 10, bucket_length: float = 1.0) -> DataFrame:
    """approxNearestNeighbors over the trained BRP model — MLlib's ANN
    probe (Euclidean), the idiomatic counterpart of lsh.search."""
    emb = _emb_vectors(load(spark, sf_dir, "embeddings"))
    qrow = emb.filter(F.col("vec_id") == query_id).select("vec").head()
    if qrow is None:
        raise KeyError(f"query vector {query_id} not found")
    brp = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=4, seed=SEED,
    )
    model = brp.fit(emb)
    res = model.approxNearestNeighbors(emb, qrow["vec"], k, distCol="dist")
    return res.select("vec_id", "label", F.round(F.col("dist"), 6).alias("dist"))


def minhash_jaccard_join(spark: SparkSession, sf_dir: str,
                         threshold: float = 0.8) -> DataFrame:
    """MLlib MinHashLSH near-duplicate join over hashed shingle sets:
    pairs with Jaccard DISTANCE below `threshold`. The idiomatic
    counterpart of operators/dedup.py::minhash_near_dups."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(shingles(F.col("text"))).alias("sh")
    )
    tf = HashingTF(inputCol="sh", outputCol="tf_vec", numFeatures=1 << 16, binary=True)
    featured = tf.transform(docs).filter(F.col("sh").isNotNull() & (F.size("sh") > 0))
    mh = MinHashLSH(inputCol="tf_vec", outputCol="hashes", numHashTables=8, seed=SEED)
    model = mh.fit(featured)
    pairs = model.approxSimilarityJoin(featured, featured, threshold, distCol="jdist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_id_1"),
            F.col("datasetB.doc_id").alias("doc_id_2"),
            F.round(F.col("jdist"), 6).alias("jaccard_dist"),
        )
        .filter(F.col("doc_id_1") < F.col("doc_id_2"))
    )
