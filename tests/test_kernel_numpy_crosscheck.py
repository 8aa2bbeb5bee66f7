"""Cross-validation of the Spark kernel expressions against NumPy
reference implementations over adversarial inputs — zeros, tiny/huge
magnitudes, negatives, and 500 seeded random pairs — evaluated in ONE
batched Spark job (the property-test style the reference lacks,
SURVEY §5)."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from vector_db_service_spark.functions import similarity as sim  # noqa: E402

DIM = 16


def _cases() -> list[tuple[int, list[float], list[float]]]:
    rng = np.random.RandomState(7)
    cases = []
    # adversarial: zero vs zero, zero vs unit, tiny, huge, negated, equal
    z = [0.0] * DIM
    u = [1.0] + [0.0] * (DIM - 1)
    cases += [(0, z, z), (1, z, u), (2, u, u)]
    cases.append((3, (np.ones(DIM) * 1e-20).tolist(), (np.ones(DIM) * 1e-20).tolist()))
    cases.append((4, (np.ones(DIM) * 1e18).tolist(), (np.ones(DIM) * 1e18).tolist()))
    cases.append((5, u, [-x for x in u]))
    for i in range(500):
        a = rng.normal(0, 10 ** rng.randint(-3, 4), DIM)
        b = rng.normal(0, 10 ** rng.randint(-3, 4), DIM)
        cases.append((6 + i, a.astype(np.float64).tolist(), b.astype(np.float64).tolist()))
    return cases


def _np_expected(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    na, nb = float(np.sqrt(np.sum(a * a))), float(np.sqrt(np.sum(b * b)))
    dot = float(np.sum(a * b))
    cos = 0.0 if na == 0.0 or nb == 0.0 else dot / (na * nb)
    eu = float(np.sqrt(np.sum((a - b) ** 2)))
    man = float(np.sum(np.abs(a - b)))
    return cos, dot, eu, man


def test_kernels_match_numpy_on_adversarial_and_random_pairs(spark):
    cases = _cases()
    schema = T.StructType([
        T.StructField("cid", T.LongType()),
        T.StructField("a", T.ArrayType(T.DoubleType())),
        T.StructField("b", T.ArrayType(T.DoubleType())),
    ])
    df = spark.createDataFrame(cases, schema)
    rows = df.select(
        "cid",
        sim.cosine(F.col("a"), F.col("b")).alias("cos"),
        sim.dot(F.col("a"), F.col("b")).alias("dot"),
        sim.euclidean_distance(F.col("a"), F.col("b")).alias("eu"),
        sim.manhattan_distance(F.col("a"), F.col("b")).alias("man"),
    ).collect()
    by_id = {c[0]: (c[1], c[2]) for c in cases}
    for r in rows:
        a, b = by_id[r["cid"]]
        cos, dot, eu, man = _np_expected(a, b)
        # same op order -> tiny tolerance covers numpy pairwise-sum drift
        assert abs(r["cos"] - cos) <= 1e-9 + 1e-9 * abs(cos), r["cid"]
        assert abs(r["dot"] - dot) <= 1e-9 + 1e-9 * abs(dot), r["cid"]
        assert abs(r["eu"] - eu) <= 1e-9 + 1e-9 * abs(eu), r["cid"]
        assert abs(r["man"] - man) <= 1e-9 + 1e-9 * abs(man), r["cid"]
        assert -1.0 - 1e-12 <= r["cos"] <= 1.0 + 1e-12  # range invariant
