"""Schema-drift resilience of the events loader: `ts` has shipped as
int64 epoch-nanos and as parquet timestamp[us] across testdata
generations, and int64 epoch-micros is the third plausible encoding. The
loader must normalize all of them to the same timezone-free `ts_us`
column without a scan-time type error (the round-4 failure mode)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vector_db_service_spark.sources import tables

TS_US = [1_700_000_000_000_000, 1_700_000_123_456_789]


def _write(tmp_path, arr: pa.Array) -> str:
    sf_dir = str(tmp_path)
    t = pa.table({"event_id": pa.array([1, 2], pa.int64()), "ts": arr})
    pq.write_table(t, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize(
    "arr",
    [
        pa.array([v * 1000 for v in TS_US], pa.int64()),  # epoch-nanos
        pa.array(TS_US, pa.timestamp("us")),  # timestamp[us] (NTZ)
        pa.array(TS_US, pa.int64()),  # epoch-micros
    ],
    ids=["int64-nanos", "timestamp-us", "int64-micros"],
)
def test_loader_normalizes_every_encoding(spark, tmp_path, arr):
    sf_dir = _write(tmp_path, arr)
    out = tables.load(spark, sf_dir, "events").orderBy("event_id").collect()
    assert [r.ts_us for r in out] == TS_US
    assert "ts" not in {f.name for f in tables.load(spark, sf_dir, "events").schema.fields}


def test_ts_stat_max_reads_footer(tmp_path):
    sf_dir = _write(tmp_path, pa.array(TS_US, pa.int64()))
    mx = tables._ts_stat_max(sf_dir)
    assert mx == max(TS_US)


def test_real_testdata_loads(spark):
    from conftest import SF_SMALL

    df = tables.load(spark, SF_SMALL, "events")
    row = df.select("ts_us").head()
    # sanity: epoch micros for a modern date, not nanos or seconds
    assert 1e14 < row.ts_us < 1e17
