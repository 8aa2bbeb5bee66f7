"""Oracle parity over the VOID-column corpus (tests/void_fixture.py).

Every oracled query that scans `events` or the documents lang/source
columns runs Spark-vs-DuckDB on a corpus where those columns are 100%
NULL — the never-populated-source degenerate. Any empty-population
branch present on one engine only (an unguarded x/count division under
ANSI, a first()/head() over zero rows, an aggregate emitting a row
where the other engine emits none) surfaces as an error or value-hash
mismatch."""

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
from tests.oracle_harness import compare, duckdb_con  # noqa: E402
from tests.test_oracle_parity import _PINNED_SF  # noqa: E402
from tests.void_fixture import build_void_fixture  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

_SEL = re.compile(r"\b(events|lang|source)\b")

VOID_QUERIES = sorted(
    n for n, sql in ORACLES.items()
    if _SEL.search(sql) and n not in _PINNED_SF
)

_DIR: list[str] = []


@pytest.fixture(scope="module")
def vd_dir():
    if not _DIR:
        d = tempfile.mkdtemp(prefix="vdbs_void_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        build_void_fixture(d)
        _DIR.append(d)
    return _DIR[0]


@pytest.fixture(scope="module")
def vd_con(vd_dir):
    c = duckdb_con(vd_dir)
    yield c
    c.close()


def test_fixture_genuinely_void(vd_dir):
    import pyarrow.parquet as pq

    from tests.void_fixture import VOID_COLS

    for t, cols in VOID_COLS.items():
        tbl = pq.read_table(os.path.join(vd_dir, f"{t}.parquet"))
        for c in cols:
            assert tbl.column(c).null_count == len(tbl), f"{t}.{c} not void"
        assert tbl.num_rows > 0


@pytest.mark.parametrize("name", VOID_QUERIES)
def test_void_parity(spark, vd_con, vd_dir, name):
    sdf = QUERIES[name](spark, vd_dir)
    odf = vd_con.sql(ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems[:6])
