"""Pin the flagship invariants at sf0.1 every round: the full three-
scale oracle sweep ran ad hoc in round 6; this fixes the sf0.1 leg of
it as a permanent fixture (10 sentinel queries spanning every major
family) so it cannot silently rot. The default parity suite runs at
SPARK_GRAFT_SF_ORACLE (sf0.001); this module is the only one pinned to
sf0.1 regardless.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tests.oracle_harness import compare, duckdb_con  # noqa: E402

SF01 = "/root/testdata/sf0.1"

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# one sentinel per family: flagship kNN, LSH, grid, dedup, streaming,
# aggregate, stored index, trained quantizer, multimodal, relational,
# plus the round-7 dedup/hygiene flagships (substring spans, SemDeDup
# keep, the stream-static resample gate)
SENTINELS = (
    "knn_search_hydrated",
    "knn_lsh_cosine",
    "knn_grid_euclidean",
    "dedup_minhash_pairs",
    "stream_windowed_event_counts",
    "a1_count_by_library",
    "i11_stored_grid_probe",
    "ann_ivfpq_topk",
    "mm_decode",
    "rel_asof_purchase_click",
    "dedup_substring_spans",
    "dedup_semantic_keep",
    "stream_quality_resample",
    # round-8 flagships: lossless AllPairs join, paragraph keep-first,
    # winnowing fingerprints, spectrum audit
    "dedup_allpairs_cosine",
    "dedup_paragraphs",
    "dedup_winnowing_fingerprints",
    "emb_spectrum_audit",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.1 testdata absent"
)


@pytest.fixture(scope="module")
def con01():
    c = duckdb_con(SF01)
    yield c
    c.close()


@pytest.mark.sentinel_sf01
@pytest.mark.parametrize("name", SENTINELS)
def test_sentinel_at_sf01(spark, con01, name):
    sdf = QUERIES[name](spark, SF01)
    odf = con01.sql(ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}@sf0.1: " + "; ".join(problems[:6])
