"""Property pin for the shared byte-level blob oracle.

`utf8_bytes_sql` reconstructs a string's UTF-8 byte sequence
arithmetically in DuckDB (code points -> 1/2/3/4-byte regimes) because
DuckDB cannot index into a BLOB. Every multimodal oracle builds on it,
so it must equal Python's actual encoder on ARBITRARY text — including
the empty string (the dup-text fixture caught `string_split('', '')`
yielding [''] with unicode('') == -1, a phantom -1 byte) and astral
code points. Hypothesis drives the comparison; regressions in the
reconstruction arithmetic fail here before any fixture sweep runs."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_service_spark.operators.multimodal import (  # noqa: E402
    utf8_bytes_sql,
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


# surrogates are not encodable text; everything else — including astral
# planes, combining marks, NULs — must round-trip
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_TEXT)
def test_utf8_bytes_matches_python_encoder(con, text):
    got = con.execute(
        f"SELECT {utf8_bytes_sql('t')} FROM (SELECT ? AS t)", [text]
    ).fetchone()[0]
    assert [int(b) for b in got] == list(text.encode("utf-8"))


def test_utf8_bytes_empty_string_is_empty(con):
    """The dup-text regression pinned explicitly: no phantom byte."""
    got = con.execute(
        f"SELECT {utf8_bytes_sql('t')} FROM (SELECT '' AS t)"
    ).fetchone()[0]
    assert list(got) == []
