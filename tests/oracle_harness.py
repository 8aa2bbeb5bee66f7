"""Local replica of the driver's DuckDB-oracle comparison: run a Spark
query and its oracle SQL side-by-side, sort columns by name, compare
row multisets. Used by test_oracle_parity.py and ad-hoc debugging."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _null_norm(x):
    """One spelling for SQL NULL regardless of the pandas dtype it rode
    in on: Spark hands a NULL boolean as None (object dtype), DuckDB as
    NaN (float64) — same NULL, different repr. Scalars only; arrays
    pass through untouched."""
    if x is None:
        return None
    if isinstance(x, float) and math.isnan(x):
        return None
    return x


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(_null_norm).astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, oracle_df: pd.DataFrame, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    s = _canon(spark_df.toPandas())
    o = _canon(oracle_df)
    problems: list[str] = []
    if list(s.columns) != list(o.columns):
        return [f"column mismatch: spark={list(s.columns)} oracle={list(o.columns)}"]
    if len(s) != len(o):
        return [f"row-count mismatch: spark={len(s)} oracle={len(o)}"]
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a is None and b is None:
                    continue
                # NULL in a float column may arrive as None (object
                # dtype on the other frame) — treat it as NaN so a
                # NULL-vs-NULL pair compares equal across dtypes.
                fa = float("nan") if a is None else float(a)
                fb = float("nan") if b is None else float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if fa != fb and abs(fa - fb) > float_tol:
                    problems.append(f"col {c} row {i}: spark={fa!r} oracle={fb!r}")
                    if len(problems) > 5:
                        return problems
        else:
            neq = sv.astype(str).values != ov.astype(str).values
            if neq.any():
                i = int(neq.argmax())
                problems.append(f"col {c} row {i}: spark={sv.iloc[i]!r} oracle={ov.iloc[i]!r}")
    return problems
