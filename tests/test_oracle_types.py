"""Oracle output-type hygiene gate.

The driver value-hashes Spark output against the DuckDB oracle output;
equal values hash differently when representations differ. Two known
hazards (both hit in round 1):

  * DuckDB ``sum(BIGINT)`` / ``list_sum`` returns HUGEINT, which hashes
    differently than Spark's bigint even at equal values — every integer
    sum must be wrapped in ``CAST(... AS BIGINT)``.
  * DuckDB ``round()`` can emit IEEE ``-0.0`` where Spark emits ``0.0``
    (e.g. ``round(1.0 - cosine, 6)`` on a self-match row) — normalize
    with ``+ 0.0``.

This module probes EVERY registered oracle at the driver's comparison
scale so representation drift is caught before the driver samples it.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from tests.oracle_harness import duckdb_con

SF_DIR = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_output_types(con, name):
    sql = _oracles()[name]
    rel = con.sql(sql)
    hazardous = [
        c
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not hazardous, (
        f"{name}: columns {hazardous} are HUGEINT — wrap the integer sum in "
        "CAST(... AS BIGINT) so the driver's value-hash matches Spark's bigint"
    )
    df = rel.df()
    neg_zero = [
        c
        for c in df.columns
        if df[c].dtype.kind == "f"
        and bool(np.any((df[c].to_numpy() == 0.0) & np.signbit(df[c].to_numpy())))
    ]
    assert not neg_zero, (
        f"{name}: columns {neg_zero} contain IEEE -0.0 — append '+ 0.0' after "
        "round() in the oracle SQL so DuckDB matches Spark's +0.0"
    )
