"""Pins the BRP-LSH oracle contract: the hard-coded random unit vectors
in mllib_index.py must equal what a live seed-42 fit produces (they are
a function of seed/dim/numTables only — if MLlib's generator ever
changes, this fails loudly instead of silently desyncing the oracle),
and the SQL bucket formula must reproduce the model's buckets exactly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_service_spark.operators import mllib_index as mi  # noqa: E402
from vector_db_service_spark.sources.tables import load  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")


def test_pinned_rand_vectors_match_live_fit(spark):
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, SF, "embeddings").withColumn(
        "vec", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="vec",
        outputCol="hashes",
        bucketLength=mi.BRP_BUCKET_LENGTH,
        numHashTables=mi.BRP_NUM_TABLES,
        seed=mi.SEED,
    )
    model = brp.fit(emb)
    live = [[float(x) for x in v.toArray()] for v in model._java_obj.randUnitVectors()]
    assert live == mi.BRP_RAND_UNIT_VECTORS  # bit-exact, repr round-trips


def test_bucket_sql_matches_model(spark):
    import duckdb

    spark_rows = {
        (r["vec_id"], r["table_idx"]): r["bucket"]
        for r in mi.brp_bucket_index(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    oracle_rows = {
        (vid, ti): b
        for vid, _lbl, ti, b in con.execute(mi.brp_bucket_index_sql()).fetchall()
    }
    assert spark_rows == oracle_rows
