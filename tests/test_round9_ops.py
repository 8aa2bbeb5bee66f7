"""Round-9 operators: Unicode script profile and PII scrub (Luhn).

Value-level parity with DuckDB is covered by test_oracle_parity (both
oracles scan `documents`, so test_utf8_parity replays them over the
multi-byte fixture too). Here: semantics against an independent pure-
Python implementation, crafted-row edge cases, and the plan contract
(one JVM projection — no Python UDF, no shuffle).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_db_service_spark.operators import textops  # noqa: E402
from vector_db_service_spark.plans.inspect import explain_str as _plan  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.001")


def _luhn_sum(digits: str) -> int:
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total


def _expected_card(doc_id: int) -> tuple[str, bool]:
    """Reimplement the injection in pure Python (independent of both
    SQL engines): 15 payload digits + Luhn check, corrupted for odd
    doc_ids."""
    cc15 = str((doc_id * 982451653) % 10**15).zfill(15)
    # payload sum with the check digit appended: payload's rightmost
    # digit sits at doubled position 1
    s = _luhn_sum(cc15 + "0")
    check = (10 - s % 10) % 10
    if doc_id % 2 == 1:
        check = (check + 5) % 10
    card = cc15 + str(check)
    return card, _luhn_sum(card) % 10 == 0


def test_pii_luhn_matches_pure_python(spark):
    docs = spark.createDataFrame(
        [(i, f"some text {i}") for i in range(40)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in textops.pii_scrub(docs).collect()}
    for i in range(40):
        card, valid = _expected_card(i)
        r = rows[i]
        assert r["n_cards"] == 1, (i, card)
        assert r["n_cards_valid"] == (1 if valid else 0), (i, card)
        # even doc_ids carry the true check digit -> always valid;
        # +5 corruption can never wrap back to valid
        assert valid == (i % 2 == 0)


def test_pii_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [(1, "alice"), (2, "bob met carol")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textops.pii_scrub(docs).collect()}
    for r in out.values():
        assert r["n_emails"] == 1 and r["n_phones"] == 1 and r["n_cards"] == 1
        # email/phone/card are all longer than their placeholders
        assert r["n_chars_removed"] > 0
        assert len(r["redacted_md5"]) == 32


def test_script_profile_crafted_rows(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир"),
            (3, "日本語テスト"),
            (4, "abc 漢字漢字漢字"),  # CJK outnumbers latin
            (5, ""),
            (6, "😀🚀"),
            (7, "1234 ..!"),  # digits + punctuation only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.script_profile(docs).collect()}
    assert out[1]["main_script"] == "latin" and out[1]["n_latin"] == 10
    assert out[2]["main_script"] == "cyrillic" and out[2]["n_cyrillic"] == 9
    assert out[3]["main_script"] == "cjk" and out[3]["n_cjk"] == 6
    assert out[4]["main_script"] == "cjk"
    assert out[5]["main_script"] == "none" and out[5]["n_chars"] == 0
    assert out[6]["main_script"] == "astral" and out[6]["n_astral"] == 2
    assert out[7]["main_script"] == "other"
    assert out[7]["n_digit"] == 4 and out[7]["n_other"] == 3


def test_script_profile_classes_partition_the_text(spark):
    """Class ranges are disjoint: the class counts + n_other always sum
    to n_chars (a regression here means two ranges overlap and a code
    point was counted twice)."""
    from vector_db_service_spark.sources.tables import load

    prof = textops.script_profile(load(spark, SF, "documents"))
    class_cols = [f"n_{name}" for name, _, _ in textops.SCRIPT_CLASSES]
    expr = " + ".join(class_cols) + " + n_other != n_chars"
    assert prof.filter(expr).count() == 0


def test_round9_ops_are_single_jvm_projections(spark):
    from vector_db_service_spark.sources.tables import load

    docs = load(spark, SF, "documents")
    for df in (textops.script_profile(docs), textops.pii_scrub(docs)):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Exchange" not in plan


def test_band_keys_sql_path_bit_identical(spark):
    """Round-11: band_keys(str) builds ONE parsed SQL expression instead
    of ~2048 py4j Column nodes (~0.5 s of driver time per banded query);
    the keys must be BIT-identical to the Column-API form — same
    double-cast zip_with dot, same 0.0D fold seed, same sign CASE and
    integer packing — at every band width the repo uses."""
    from pyspark.sql import functions as F

    from vector_db_service_spark.operators.lsh import (
        N_SIGN_BANDS, SEED, band_keys, hyperplanes,
    )
    from vector_db_service_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    dim = emb.select(F.size("embedding")).head()[0]
    for bb in (1, 2, 4):
        planes = hyperplanes(dim, N_SIGN_BANDS * bb, SEED)
        old = band_keys(F.col("embedding"), planes, bb)
        new = band_keys("embedding", planes, bb)
        assert emb.select((old != new).alias("bad")).filter("bad").count() == 0
        assert (
            emb.select(old.alias("o"), new.alias("n"))
            .filter("o IS NULL OR n IS NULL").count() == 0
        )


def test_signature_bits_sql_path_bit_identical(spark):
    """Same single-parse-vs-Column-API bit-identity pin as band_keys,
    for the single-bit signature form the LSH index builds on."""
    from pyspark.sql import functions as F

    from vector_db_service_spark.operators.lsh import (
        NUM_HASHES, SEED, hyperplanes, signature_bits,
    )
    from vector_db_service_spark.sources.tables import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    dim = emb.select(F.size("embedding")).head()[0]
    planes = hyperplanes(dim, NUM_HASHES, SEED)
    old = signature_bits(F.col("embedding"), planes)
    new = signature_bits("embedding", planes)
    assert emb.select((old != new).alias("bad")).filter("bad").count() == 0
    assert (
        emb.select(old.alias("o"), new.alias("n"))
        .filter("o IS NULL OR n IS NULL").count() == 0
    )
