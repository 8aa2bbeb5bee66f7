"""AQE skew-join coverage — the runtime leg of the skew story.

The 100x skew remediation for the banded k-NN join has two legs:

  1. DETERMINISTIC manual salting — ``ann.knn_join(salt=...)`` splits
     hot buckets into ``salt`` sub-buckets; proven output-identical to
     the unsalted form in tests/test_salted_join.py and
     broadcast-safe / non-cartesian in tests/test_plans.py.
  2. RUNTIME remediation — Spark AQE's OptimizeSkewedJoin splits an
     oversized shuffle partition into parallel sub-reads at stage
     boundary, with no plan or result change.

This module proves leg 2 actually engages under this repo's session
config (session.py enables AQE; ``spark.sql.adaptive.skewJoin.enabled``
is Spark's default true): a deliberately skewed sort-merge join,
executed with the skew thresholds lowered to fixture scale, finishes
with ``SortMergeJoin(skew=true)`` over an ``AQEShuffleRead skewed``
node in the FINAL adaptive plan. It also pins the unsalted
``knn_join`` to the plan shape that rule can act on — a shuffled
equi-join on the band key, never a broadcast-pinned or cartesian form
(AQE cannot split what never shuffles).
"""

from __future__ import annotations

import os
import sys
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vector_db_service_spark.operators import ann  # noqa: E402
from vector_db_service_spark.plans.inspect import explain_str as _plan  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")

# thresholds scaled down to fixture size so the one hot partition
# (~90% of rows on key 0, a few MB) trips the same rule that fires on a
# multi-GB partition in production; factor 1.0 = "bigger than median".
_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@contextmanager
def _confs(spark, overrides):
    saved = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_sort_merge_join_at_runtime(spark):
    """A 90%-hot-key shuffle join, executed (AQE decides from RUNTIME
    partition stats, so the plan must run), ends with the skew split
    applied: SortMergeJoin(skew=true) reading through an
    `AQEShuffleRead skewed` node. This is the exact remediation the
    unsalted banded join relies on when a production bucket goes hot
    without warning."""
    with _confs(spark, _SKEW_CONFS):
        left = (
            spark.range(0, 150_000)
            .withColumn(
                "k",
                F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 64),
            )
            # md5 pad defeats shuffle compression so partition BYTES,
            # the quantity the rule thresholds on, reflect the skew
            .withColumn("pad", F.md5(F.col("id").cast("string")))
        )
        right = (
            spark.range(0, 64)
            .withColumnRenamed("id", "k")
            .withColumn("v", F.col("k") * 2)
        )
        # keep pad in the output: column pruning would otherwise drop it
        # BEFORE the exchange and the hot partition's bytes collapse
        # under the detection threshold
        j = left.join(right, "k").select("k", "pad", "v")
        rows = j.collect()  # executes THIS plan; AQE finalizes it
        assert len(rows) == 150_000
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final[:2000]
        assert "AQEShuffleRead skewed" in final, final[:2000]


def test_unsalted_knn_join_is_aqe_skew_eligible(spark):
    """The UNSALTED knn_join must stay in the one plan shape
    OptimizeSkewedJoin can rescue: a shuffled equi-join on the band
    bucket (Exchange hashpartitioning -> SortMergeJoin/ShuffledHashJoin),
    never broadcast-pinned on the big probe side and never cartesian.
    With that shape pinned and the runtime split proven live above, the
    skew story holds even when nobody passed `salt` — AQE is the
    default net, manual salting the deterministic override."""
    # disable broadcast so the fixture-scale plan shows the shape the
    # planner picks when BOTH sides are big (at 100 TB neither side of
    # the embeddings self-join fits a broadcast)
    with _confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        df = ann.knn_join(spark, SF, m=2)  # salt=None: no manual remediation
        plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    shuffled_join = ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    assert shuffled_join, plan[:2000]
    # formatted explain separates node name and args: assert the
    # shuffle and its hash partitioning individually
    assert "Exchange" in plan and "hashpartitioning" in plan
