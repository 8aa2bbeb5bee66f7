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
        "doc_id", F.array_distinct(shingles("text")).alias("sh")
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


# Random unit vectors of the seed-42 BucketedRandomProjectionLSH fit at
# dim=64 / numHashTables=4 — a function of (seed, dim, numTables) ONLY,
# never of the data (pinned by tests/test_brp_oracle.py against a live
# fit). Embedding them as literals lets a static DuckDB oracle recompute
# floor(dot(v, u_i) / bucketLength) buckets exactly; repr() round-trips
# each float64 bit-for-bit.
BRP_BUCKET_LENGTH = 1.0
BRP_NUM_TABLES = 4
BRP_RAND_UNIT_VECTORS: list[list[float]] = [
    [0.12949674375780473, 0.10426463032006292, -0.10771877038736019, -0.1255372363345624, 0.031864015961875526, 0.07763903148140297, -0.09267625761376243, -0.15838508708815516, -0.02165389051618035, 0.16854269109352538, 0.09098491965165977, -0.013780063771881217, 0.15995718784720656, -0.07260502199283608, -0.13717864034381758, 0.040117573088542115, -0.05560766029690286, 0.062454079998983995, -0.1364876173085817, 0.036404539477744795, 0.17590650082725473, 0.049731132116372166, 0.054615194300076435, 0.17233239373966974, -0.03139385289904706, -0.009519024250218314, 0.1424166108604675, -0.03688726820688779, -0.019651834133742857, -0.21077117424649872, 0.16146554421004417, -0.15465212141720716, -0.2228011893040183, -0.10417242087441117, -0.2890542789985285, -0.18495762435445184, -0.013835841572937869, 0.1461959233590042, -0.030521449505394982, 0.029200581252854782, -0.036279601655707094, -0.2005551336051944, -0.05482524727370144, -0.057835009365983805, 0.1266353384984892, -0.004643580505872421, -0.1256144906681653, 0.21119488292759514, 0.1299317417234659, -0.12005833484317877, 0.12163713866691228, -0.21906770558940117, 0.03413749349242529, 0.02807014081433207, 0.15946395092753893, -0.17239926149026796, 0.03072450601327282, 0.06364796961267483, -0.0600848460661747, 0.06112732611580623, 0.25088844927734233, -0.07177726126717898, -0.21355986809913746, 0.04383816738170152],
    [0.04324546763126772, -0.1196250007447754, -0.000355742170688643, -0.06290591868245525, -0.07273002664444873, -0.0025350541717712822, 0.21857258132453325, -0.14693412707906917, 0.07881307914343753, -0.020660480606120326, 0.0880343533187672, 0.16282531161891542, 0.11732429428317515, 0.02942823915355396, 0.1220668317446316, -0.09813315096329371, 0.10664634497642195, -0.03370424478078597, -0.10137999150787967, -0.24747202128264886, -0.24704059522100943, -0.07652882574249704, -0.05428342382724887, 0.03297680839243599, -0.06382884375871065, 0.059223190811845725, -0.059273205519043574, 0.006057363702502043, 0.09351308498819277, -0.03607765734181544, 0.010717326609066756, 0.1671127197096646, 0.10133632225224352, 0.22856203619428414, 0.019371121326215757, -0.13201596955909142, 0.026644357112041522, 0.11895237041886508, 0.2006419009478108, -0.18627509281145743, -0.25310124524861277, 0.181641915258207, -0.07428222129311543, 0.098827609066886, 0.2088636922985201, 0.1497187960249646, -0.02549389751561777, -0.2992261327735093, 0.058379038344302144, 0.08717337513955836, -0.09887300181280123, 0.15919954423297916, 0.23621567316506964, 0.008946170086847385, 0.1718864885541727, -0.07733534461311735, 0.10204751223628504, 0.05543424240252225, -0.06225994690770243, 0.054967533676602995, 0.0879992390575857, 0.11509781648299505, 0.03937942153452649, 0.04267392826482056],
    [0.2253599547352401, 0.084686016900039, -0.12090235717915984, 0.012037035560567483, 0.05653929989547702, -0.19784366335303277, 0.15157652606891173, -0.07726288997430494, 0.09069712513868437, -0.01850775179851565, 0.09420127205578385, -0.044324398614280294, -0.01062930981041057, -0.06194936947753676, 0.03574121958713461, -0.11595951529739637, -0.06624457677123273, 0.2712366777191197, 0.01533153186863178, 0.18713711661424884, 0.04465499294074913, 0.08888672766398283, 0.0959456780978348, -0.07089928799994677, -0.23457091437136127, 0.009604915537812436, 0.019456711376994573, -0.10214125471448683, -0.21790520325684198, 0.16383454757654273, 0.055456209262321005, 0.16443921269983677, 0.037453954195909266, 0.12401790285189035, 0.08866502795089151, -0.02938251183534179, 0.04390435464347258, 0.10202408760518072, 0.18064985547214535, 0.13747465326312658, 0.045180519164631894, 0.14098454107711914, 0.0033389589485273265, -0.0812388597453255, -0.0017409007440788824, -0.13338295982400739, -0.0028185053398772997, 0.19979634198148805, 0.13939946082109098, -0.12874306733279453, 0.029588120684531684, 0.15535201312812244, 0.01059987575708014, -0.13304607224460271, 0.18034472263476178, 0.040046209069542905, -0.05070562271716691, -0.20676253064762004, 0.11012487642391115, -0.10545618963525344, 0.19875023092077387, 0.09380610937437693, 0.13795962125376615, 0.2927722551070435],
    [-0.06374135683995162, -0.09219503246981259, 0.20387147163340155, -0.10935797479905664, -0.04308987473913211, -0.22053735363025692, -0.0689505866185994, -0.335906687103947, 0.039147854997285396, -0.1496523981120987, -0.22241719602183366, 0.010556593479734708, -0.17237743213626663, 0.09042793042560178, -0.16716014790388486, 0.1623874130871556, 0.0016294745422463736, 0.0852497427913705, -0.17153256310120862, 0.10578917251323942, 0.0793227971835568, 0.016029777279764824, 0.05042081026847254, -0.07556934199188059, 0.05626682220005956, -0.10333901194035604, 0.008307604126977912, -0.09633777979600622, 0.1532688478369975, 0.11940703413743275, 0.16071269411711286, -0.009202061603050597, -0.07346227785473011, 0.1364132505370998, 0.12256128954494584, -0.08972364033338956, 0.11501214463815192, -0.328871752830656, 0.054044983219077775, 0.052742933259140166, 0.10928698480434651, -0.045185470946430495, 0.13894898075688086, -0.030477763874640906, 0.020215754742539182, 0.08675717574067274, 0.047838716967836085, 0.012605032955128678, -0.16082285233359414, -0.03444399726472531, -0.07829696607501378, -0.01900287098000823, 0.244327756207043, 0.23932680858694025, -0.10052570582133381, -0.01990727013443709, 0.01781187785973467, -0.1183833051902047, 0.02475355910216522, 0.0938850567409529, -0.05664336305195141, -0.023485688576799755, 0.10434324461021213, 0.17995762924893127],
]


def brp_bucket_index_sql(
    bucket_length: float = BRP_BUCKET_LENGTH,
    num_tables: int = BRP_NUM_TABLES,
) -> str:
    """DuckDB mirror of brp_bucket_index: bucket of table i is
    floor(dot(embedding, u_i) / bucketLength) over the pinned seed-42
    unit vectors — the exact MLlib hash function
    (BucketedRandomProjectionLSH.hashFunction)."""
    from .. import oracles

    selects = "\nUNION ALL\n".join(
        f"SELECT vec_id, label, {i} AS table_idx, "
        f"CAST(floor({oracles.dot_sql('embedding', oracles._plane_lit(BRP_RAND_UNIT_VECTORS[i]))}"
        f" / {bucket_length!r}) AS BIGINT) AS bucket FROM embeddings"
        for i in range(num_tables)
    )
    return selects


def brp_approx_knn_sql(
    query_id: int = 0,
    k: int = 10,
    bucket_length: float = BRP_BUCKET_LENGTH,
    num_tables: int = BRP_NUM_TABLES,
) -> str:
    """DuckDB mirror of approxNearestNeighbors single-probe semantics
    (LSH.scala): candidates = rows sharing >= 1 exact bucket with the
    query (hashDistance 0), ranked by true Euclidean distance, top k."""
    from .. import oracles

    def bucket(vec_expr: str, i: int) -> str:
        lit = oracles._plane_lit(BRP_RAND_UNIT_VECTORS[i])
        return (
            f"CAST(floor({oracles.dot_sql(vec_expr, lit)} / {bucket_length!r}) AS BIGINT)"
        )

    share = " OR ".join(
        f"({bucket('e.embedding', i)} = {bucket('q.qv', i)})" for i in range(num_tables)
    )
    dist = oracles.euclidean_distance_sql("e.embedding", "q.qv")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id}),
cand AS (
  SELECT e.vec_id, e.label, {dist} AS rawdist
  FROM embeddings e, q WHERE {share}
)
SELECT vec_id, label, round(rawdist, 6) AS dist
FROM cand ORDER BY rawdist, vec_id LIMIT {k}
"""
