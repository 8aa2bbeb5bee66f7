"""Oracle parity over a NON-ASCII corpus — the round-9 fixture gate.

Every text-touching oracled query (selected automatically: its oracle
SQL scans `documents`) is run Spark-vs-DuckDB over the UTF-8 fixture
(accents, CJK, emoji/astral, NBSP-joined tokens, U+2029 / real
paragraph breaks, combining marks). Any byte-vs-char, UTF-16-vs-code-
point, or NaN-vs-NULL divergence between the engines surfaces here as
a value-hash mismatch instead of shipping silently on ASCII-only test
corpora. The full registry can also be pointed at the fixture via
SPARK_GRAFT_SF_ORACLE (tests/test_oracle_parity.py reuses any corpus
directory).
"""

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
from tests.utf8_fixture import build_utf8_fixture  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# every oracled query whose SQL scans ANY table the fixture rewrites —
# the ones a byte/char divergence can reach. Since round 10 the fixture
# injects multi-byte payloads into every string column of every table
# (events' JSON props, event_type, order status/priority, dimension
# names, documents source/lang), not just documents.text, so this is
# effectively every oracle that touches a string anywhere. Automatic,
# so future operators are covered the day they are registered.
_REWRITTEN = (
    "documents", "events", "orders", "lineitem", "customer",
    "supplier", "part", "nation", "region",
)
# word-boundary match, not raw substring: 'part' would otherwise also
# match 'partition by' (and similar incidentals), silently sweeping
# every windowed oracle into the set regardless of what it scans
TEXT_QUERIES = sorted(
    n for n, sql in ORACLES.items()
    if any(re.search(rf"\b{t}\b", sql) for t in _REWRITTEN)
)

_DIR: list[str] = []


@pytest.fixture(scope="module")
def utf8_dir():
    if not _DIR:
        d = tempfile.mkdtemp(prefix="vdbs_utf8_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        build_utf8_fixture(d)
        _DIR.append(d)
    return _DIR[0]


@pytest.fixture(scope="module")
def utf8_con(utf8_dir):
    c = duckdb_con(utf8_dir)
    yield c
    c.close()


def test_fixture_is_genuinely_multibyte(utf8_dir):
    import pyarrow.parquet as pq

    texts = pq.read_table(
        os.path.join(utf8_dir, "documents.parquet")
    ).column("text").to_pylist()
    n_multibyte = sum(1 for t in texts if len(t.encode("utf-8")) > len(t))
    assert n_multibyte > len(texts) * 0.7, "fixture is mostly ASCII"
    joined = "".join(texts)
    for probe in ("é", "数", "😀", " ", "\n\n", "́", "привет"):
        assert probe in joined, f"missing multi-byte regime {probe!r}"


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_utf8_oracle_parity(spark, utf8_dir, utf8_con, name):
    sdf = QUERIES[name](spark, utf8_dir)
    odf = utf8_con.sql(ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: " + "; ".join(problems[:6])
