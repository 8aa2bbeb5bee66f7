"""Oracle parity over the CONSTANT-DIMENSION embedding corpus.

Every embeddings-scanning oracled query runs Spark-vs-DuckDB over the
const-dim fixture (dim 7 pinned to 0.25, dim 13 pinned to 0.0 across
the whole corpus). The zero-range normalization guards in the grid and
scalar-quantization paths — written on BOTH engines, mirrored from the
reference, but never load-bearing on the random gate corpora — plus
every min/max/variance statistic over a degenerate dimension get their
first driver-identical compare here."""

from __future__ import annotations

import atexit
import os
import re
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tests.constdim_fixture import build_constdim_fixture  # noqa: E402
from tests.oracle_harness import compare, duckdb_con  # noqa: E402
from tests.test_oracle_parity import _PINNED_SF  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

CD_QUERIES = sorted(
    n for n, sql in ORACLES.items()
    if re.search(r"\bembeddings\b", sql) and n not in _PINNED_SF
)

_DIR: list[str] = []


@pytest.fixture(scope="module")
def cd_dir():
    if not _DIR:
        d = tempfile.mkdtemp(prefix="vdbs_constdim_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        build_constdim_fixture(d)
        _DIR.append(d)
    return _DIR[0]


@pytest.fixture(scope="module")
def cd_con(cd_dir):
    c = duckdb_con(cd_dir)
    yield c
    c.close()


def test_fixture_is_genuinely_degenerate(cd_dir):
    import pyarrow.parquet as pq

    rows = pq.read_table(
        os.path.join(cd_dir, "embeddings.parquet")
    ).to_pylist()
    assert rows
    assert all(r["embedding"][7] == 0.25 for r in rows)
    assert all(r["embedding"][13] == 0.0 for r in rows)
    # the other dims keep their spread
    d0 = {round(r["embedding"][0], 6) for r in rows}
    assert len(d0) > 100


@pytest.mark.parametrize("name", CD_QUERIES)
def test_constdim_parity(spark, cd_con, cd_dir, name):
    sdf = QUERIES[name](spark, cd_dir)
    odf = cd_con.sql(ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems[:6])
