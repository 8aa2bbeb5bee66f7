"""Physical-plan inspection helpers — the machine-checkable form of the
engine's scale contracts (used by tests/test_plans.py and available to
operators for self-checks).

The reference has no planner (SURVEY §4): its optimizations are
hand-rolled heuristics. Here Catalyst plans everything, and these helpers
assert the properties that matter at 100 TB: filters reach the parquet
scan, projections prune ReadSchema, top-k compiles to
TakeOrderedAndProject (per-partition heap, no global sort shuffle),
small sides broadcast, and kernels stay JVM-side (no BatchEvalPython).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (explain() only prints)."""
    jvm_mode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jvm_mode)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in a scan's PushedFilters list."""
    plan = explain_str(df).replace(" ", "")
    return "PushedFilters" in plan and fragment.replace(" ", "") in plan


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def python_udf_free(df: DataFrame) -> bool:
    """True when no row-at-a-time or Arrow Python evaluation appears in
    the plan — i.e. the whole query runs JVM-side under codegen."""
    plan = explain_str(df)
    return "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the first scan's ReadSchema — what actually gets
    read off disk after pruning."""
    for line in explain_str(df).splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rstrip(">")
            return [c.split(":")[0].strip() for c in inner.split(",") if ":" in c]
    return []
