"""Pin the knn_join uniqueness invariant the mutual-pairs rewrite
depends on (r16 verdict #3): mutual_knn_pairs decides mutuality by
`groupBy(label, least(src,dst), greatest(src,dst)) HAVING count(*)==2`,
which is only correct while knn_join emits each DIRECTED edge at most
once and never a self-edge. Both are true today (`src != dst` filter +
`row_number <= m` per src + first-collision band dedup), but any future
edit that lets a directed edge duplicate would silently corrupt
mutuality — this test makes that failure loud."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMALL  # noqa: E402
from vector_db_service_spark.operators import ann  # noqa: E402

pytestmark = pytest.mark.smoke


def test_knn_join_no_duplicate_directed_edge_no_self_edge(spark):
    g = ann.knn_join(spark, SF_SMALL, m=3).select("label", "src", "dst")
    bad = g.groupBy("label", "src", "dst").agg(
        F.count("*").alias("n")
    ).filter((F.col("n") > 1) | (F.col("src") == F.col("dst")))
    rows = bad.limit(5).collect()
    assert not rows, f"knn_join uniqueness invariant violated: {rows}"


def test_knn_join_at_most_m_per_src(spark):
    g = ann.knn_join(spark, SF_SMALL, m=3)
    over = (
        g.groupBy("label", "src")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 3)
    )
    rows = over.limit(5).collect()
    assert not rows, f"knn_join emitted more than m rows per src: {rows}"
