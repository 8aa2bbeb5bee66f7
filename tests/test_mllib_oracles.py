"""Pins the round-8 MLlib exact-oracle contracts (companion of
test_brp_oracle.py):

- IVF_KMEANS_CENTERS_SF001 must equal what a live seed-42 kmeans|| fit
  produces over the sf0.01 embeddings table. The centers are DATA-
  dependent (unlike BRP's unit vectors), but bit-stable for a fixed
  input split — the test corpora are single-split parquet files — so a
  change in either MLlib's init or the testdata fails loudly here
  instead of silently desyncing the pinned-literal oracle.
- MINHASH_RAND_COEFFICIENTS must equal the live seed-42 MinHashLSH fit
  (a function of seed/numHashTables only), and the documented
  Long-arithmetic hash formula min((1+i)*a+b % HASH_PRIME) must
  reproduce model.transform's signatures exactly (Int-overflow
  semantics would diverge — verified against live output).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_service_spark.operators import ann  # noqa: E402
from vector_db_service_spark.operators import mllib_index as mi  # noqa: E402
from vector_db_service_spark.sources.tables import load, row_count  # noqa: E402

SF_001 = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_001), reason="sf0.01 testdata absent")
def test_pinned_kmeans_centers_match_live_fit(spark):
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, SF_001, "embeddings").withColumn(
        "vec", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    km = KMeans(
        k=mi.IVF_KMEANS_N_LISTS, seed=mi.SEED, featuresCol="vec",
        predictionCol="list_id",
    )
    model = km.fit(
        ann._quantizer_train_sample(emb, n_rows=row_count(SF_001, "embeddings"))
    )
    live = [[float(x) for x in c] for c in model.clusterCenters()]
    assert live == mi.IVF_KMEANS_CENTERS_SF001  # bit-exact, repr round-trips


def test_pinned_minhash_coefficients_and_formula(spark):
    from pyspark.ml.feature import MinHashLSH
    from pyspark.ml.linalg import Vectors

    df = spark.createDataFrame(
        [
            (0, Vectors.sparse(mi.MINHASH_NUM_FEATURES, [1, 100, 4000], [1.0] * 3)),
            (1, Vectors.sparse(mi.MINHASH_NUM_FEATURES, [5, 2047], [1.0] * 2)),
        ],
        ["id", "v"],
    )
    mh = MinHashLSH(
        inputCol="v", outputCol="h",
        numHashTables=mi.MINHASH_NUM_TABLES, seed=mi.SEED,
    )
    model = mh.fit(df)
    live = [(t._1(), t._2()) for t in model._java_obj.randCoefficients()]
    assert live == mi.MINHASH_RAND_COEFFICIENTS
    # the oracle's Long-arithmetic formula must reproduce the model's
    # signatures bit-for-bit (this is where Int-overflow semantics or a
    # changed HASH_PRIME would surface)
    for r in model.transform(df).collect():
        idxs = [int(i) for i in r["v"].indices]
        expected = [
            min(((1 + i) * a + b) % mi.MINHASH_HASH_PRIME for i in idxs)
            for a, b in mi.MINHASH_RAND_COEFFICIENTS
        ]
        got = [int(h[0]) for h in r["h"]]
        assert got == expected


@pytest.mark.skipif(not os.path.isdir(SF_001), reason="sf0.01 testdata absent")
def test_minhash_join_candidates_never_all_pairs(spark):
    """The join must stay LSH-pruned: verified pair count well below the
    quadratic bound (sanity that the banded candidate rule is active)."""
    out = mi.minhash_jaccard_join(spark, SF_001, threshold=0.5).count()
    n = row_count(SF_001, "documents")
    assert out < n * (n - 1) // 20
