"""Oracle parity over a TIME-TIE event corpus — the temporal analog of
the ties (embedding) and UTF-8 (text) fixture gates.

Every events-scanning oracled query (selected automatically: its oracle
SQL scans `events`) runs Spark-vs-DuckDB over the time-ties fixture
(duplicate timestamps within a user and across event types, gaps of
exactly the session threshold, events exactly on hour / 10-minute
window edges, microsecond-999999 ms-floor edges, tied values in ranking
windows). Any divergence in as-of tie-breaks, boundary inclusivity,
watermark flooring, or value-order tie-breaks surfaces here as a
value-hash mismatch instead of shipping silently on the gate corpora
whose microsecond-unique timestamps never collide."""

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
from tests.time_ties_fixture import build_time_ties_fixture  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

TIME_QUERIES = sorted(
    n for n, sql in ORACLES.items()
    if re.search(r"\bevents\b", sql) and n not in _PINNED_SF
)

_DIR: list[str] = []


@pytest.fixture(scope="module")
def tt_dir():
    if not _DIR:
        d = tempfile.mkdtemp(prefix="vdbs_timeties_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        build_time_ties_fixture(d)
        _DIR.append(d)
    return _DIR[0]


@pytest.fixture(scope="module")
def tt_con(tt_dir):
    c = duckdb_con(tt_dir)
    yield c
    c.close()


def test_fixture_is_genuinely_tied(tt_dir):
    """The corpus must actually contain the tie regimes: duplicate
    (user, ts) pairs, exact 30-minute gaps, on-the-hour events, and
    999999-microsecond stamps."""
    import datetime

    import pyarrow.parquet as pq

    rows = pq.read_table(os.path.join(tt_dir, "events.parquet")).to_pylist()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    n_dup = n_gap = n_hour = n_usmax = 0
    for urows in by_user.values():
        urows.sort(key=lambda r: (r["ts"], r["event_id"]))
        seen: dict = {}
        for r in urows:
            seen[r["ts"]] = seen.get(r["ts"], 0) + 1
            if r["ts"].minute == 0 and r["ts"].second == 0 \
                    and r["ts"].microsecond == 0:
                n_hour += 1
            if r["ts"].microsecond == 999999:
                n_usmax += 1
        n_dup += sum(c - 1 for c in seen.values() if c > 1)
        ts_sorted = sorted(r["ts"] for r in urows)
        for a, b in zip(ts_sorted, ts_sorted[1:]):
            if b - a == datetime.timedelta(minutes=30):
                n_gap += 1
    assert n_dup > 50, f"too few duplicate (user, ts) pairs: {n_dup}"
    assert n_gap > 50, f"too few exact 30-min gaps: {n_gap}"
    assert n_hour > 50, f"too few on-the-hour events: {n_hour}"
    assert n_usmax > 50, f"too few ms-floor-edge stamps: {n_usmax}"


@pytest.mark.parametrize("name", TIME_QUERIES)
def test_time_ties_parity(spark, tt_con, tt_dir, name):
    sdf = QUERIES[name](spark, tt_dir)
    odf = tt_con.sql(ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems[:6])
