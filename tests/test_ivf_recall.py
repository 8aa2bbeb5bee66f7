"""Pin the KMeans-IVF recall operating point (round-2 VERDICT next #1):
the registered sweep must measure avg recall@10 >= 0.8 at nprobe <= 4 at
the driver's comparison scale (sf0.01). Seeded KMeans => deterministic.
"""

from __future__ import annotations

import collections
import os

import pytest

from vector_db_service_spark.operators import ann

SF_001 = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_001), reason="sf0.01 testdata absent")
def test_kmeans_ivf_recall_at_sf001(spark):
    rows = ann.ivf_kmeans_recall_sweep(
        spark, SF_001, k=10, n_lists=7, nprobes=(1, 2, 4, 8)
    ).collect()
    agg = collections.defaultdict(list)
    for r in rows:
        agg[r["nprobe"]].append(r["recall"])
    avg = {p: sum(v) / len(v) for p, v in agg.items()}
    # the headline bar: trustworthy recall at nprobe <= 4
    assert avg[4] >= 0.8, avg
    # sweep is monotone in nprobe and saturates at full scan
    assert avg[1] <= avg[2] <= avg[4] <= avg[8], avg
    assert avg[8] == 1.0, avg


def test_sweep_shape(spark, sf_dir):
    rows = ann.ivf_kmeans_recall_sweep(
        spark, sf_dir, k=5, n_lists=4, nprobes=(1, 4)
    ).collect()
    # 5 default queries x 2 probes, recall in [0,1]
    assert len(rows) == 10
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    assert all(r["nprobe"] in (1, 4) for r in rows)


def test_py_score_bit_exact_vs_spark(spark):
    """The round-10 sweep computes centroid ranks driver-side with
    _py_score/_py_round6; both must equal the in-plan expressions BIT
    FOR BIT on real vectors, or the sweep's probed-list sets drift from
    the oracle's."""
    import itertools

    from pyspark.sql import functions as F

    import vector_db_service_spark.functions.similarity as sim
    from vector_db_service_spark.sources.tables import load

    vecs = [
        [float(x) for x in r["embedding"]]
        for r in load(spark, SF_001, "embeddings").limit(8).collect()
    ]
    rows = [(a, b) for a, b in itertools.combinations(vecs, 2)]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    for met in ("cosine", "dot_product", "euclidean", "manhattan"):
        got = [
            r[0]
            for r in df.select(sim.score(met, F.col("a"), F.col("b"))).collect()
        ]
        want = [ann._py_score(met, a, b) for a, b in rows]
        assert got == want, met  # == on floats: bit-identical or bust


def test_py_round6_matches_spark_round(spark):
    from pyspark.sql import functions as F

    import math

    xs = [
        0.1234565, 0.12345649999, 0.1234575, -0.9999995, 1.0000005,
        0.5877852522924731, 1e-7, 5e-7, -5e-7, 0.0, 123.45678949999,
    ]
    # regression corpus of generated near-ties: exact scale-7 midpoints
    # n + k/2e6 (ties under HALF_UP at scale 6) and their one-ulp
    # neighbors on both sides — the values where a JVM whose
    # Double.toString is not shortest-round-trip (pre-JDK-19) could in
    # principle diverge from Python's repr
    for n in (0, 1, 7, 123, 99999):
        for k in (1, 3, 7, 500001, 999999):
            mid = n + k / 2e6
            xs += [mid, math.nextafter(mid, -math.inf),
                   math.nextafter(mid, math.inf), -mid]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [r[0] for r in df.select(F.round("x", 6)).collect()]
    want = [ann._py_round6(x) for x in xs]
    assert got == want
