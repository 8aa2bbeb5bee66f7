"""Oracle parity for the JSON-path consumers over MALFORMED props.

At 100 TB a log table's JSON column contains truncated, empty, and
syntactically-broken payloads. Spark's `get_json_object` returns NULL
for them; DuckDB's `json_extract_string` RAISES — so before the
json_valid guard landed, the registered oracles for `p3_json_filter`
and `rel_events_json_stats` would crash (not even mismatch) on any
corpus with a single bad row, while the engine handled it. This module
rewrites `events.props` with the hard-malformed regimes both engines
agree are NULL and runs the driver-identical compare.

Known engine-level leniency difference, deliberately EXCLUDED from the
fixture: Spark's Jackson parser accepts single-QUOTED JSON
(`{'k': 5}` -> '5') where DuckDB's strict parser does not — the same
class of documented divergence as HALF_UP rounding, and irrelevant to
corpora that produce spec-valid JSON."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tests.conftest import SF_SMALL  # noqa: E402
from tests.oracle_harness import compare, duckdb_con  # noqa: E402

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# event_id % 8 -> props rewrite; modes 0-2 keep the valid payload so
# the queries stay non-vacuous
_BAD = {3: "{bad", 4: "", 5: "null", 6: '{"k": }', 7: "{k: 5}"}


def _build(dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        src = os.path.join(SF_SMALL, f"{t}.parquet")
        out = os.path.join(dst, f"{t}.parquet")
        if t != "events":
            shutil.copyfile(src, out)
            continue
        tbl = pq.read_table(src)
        rows = tbl.to_pylist()
        for r in rows:
            mode = int(r["event_id"]) % 8
            if mode in _BAD:
                r["props"] = _BAD[mode]
        pq.write_table(pa.Table.from_pylist(rows, schema=tbl.schema), out)


@pytest.fixture(scope="module")
def bj_dir():
    d = tempfile.mkdtemp(prefix="vdbs_badjson_")
    _build(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", ["p3_json_filter", "rel_events_json_stats"])
def test_badjson_parity(spark, bj_dir, name):
    con = duckdb_con(bj_dir)
    try:
        problems = compare(
            QUERIES[name](spark, bj_dir), con.sql(ORACLES[name]).df()
        )
    finally:
        con.close()
    assert not problems, f"{name}: " + "; ".join(problems[:6])


def test_badjson_filter_still_nonvacuous(spark, bj_dir):
    """Valid rows survive the rewrite, so the '$.k = 42' filter still
    has matches to find (a 0-row pass would prove nothing)."""
    assert QUERIES["p3_json_filter"](spark, bj_dir).count() > 0
