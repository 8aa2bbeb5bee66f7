"""SQL-string forms of the similarity kernels — the engine's SQL user
surface (SURVEY §4 stretch: expose cosine_sim(a,b) etc. to spark.sql
users without a Python handle).

Two mechanisms:
- `KERNEL_SQL`: Spark-SQL expression fragments (higher-order functions)
  textually parameterized on the two array expressions. Usable inside
  any spark.sql query; compiles to the SAME Catalyst expressions as the
  DataFrame builders in functions/similarity.py, so plans and results
  are identical.
- `register_table_views` (sources/tables.py) + these fragments = the
  full engine accessible from pure SQL.

No UDF registration is needed (and none would survive codegen as well):
every kernel is already expressible in Spark SQL's built-in surface —
that is the point of the expression-first design.
"""

from __future__ import annotations


def dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate({a}, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def cosine_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN {norm_sql(a)} = 0.0D OR {norm_sql(b)} = 0.0D THEN 0.0D "
        f"ELSE {dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}) END"
    )


def euclidean_distance_sql(a: str, b: str) -> str:
    return (
        f"sqrt(aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"0.0D, (acc, v) -> acc + v))"
    )


def euclidean_similarity_sql(a: str, b: str) -> str:
    return f"1.0D / (1.0D + {euclidean_distance_sql(a, b)})"


def manhattan_distance_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"abs(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0.0D, (acc, v) -> acc + v)"
    )


def manhattan_similarity_sql(a: str, b: str) -> str:
    return f"1.0D / (1.0D + {manhattan_distance_sql(a, b)})"


KERNEL_SQL = {
    "cosine": cosine_sql,
    "dot_product": dot_sql,
    "euclidean": euclidean_similarity_sql,
    "manhattan": manhattan_similarity_sql,
}
