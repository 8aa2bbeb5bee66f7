"""Text-operator headroom probe: 100x the sf0.1 documents table
(~500K docs) and time the scan-shaped corpus ops — the companion of the
README's 2M-vector flat-kNN probe. These operators are single-scan
projections / broadcast-join scans / tiny-group aggregations, so wall
time should grow ~linearly in rows with the local[32] scheduling floor
amortized away; the dedup pair family is deliberately EXCLUDED (its
output grows with the duplicate structure the copies inject — measured
separately in scale_probe.py).

Writes one JSON line; run exclusively (no concurrent Spark work).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import functions as F  # noqa: E402

from vector_db_service_spark.session import get_spark  # noqa: E402
from vector_db_service_spark import entrypoints  # noqa: E402

COPIES = 100
SYN = "/tmp/spark_graft_scale/docs100x"
PROBES = [
    "text_gopher_filter",
    "text_blocklist_filter",
    "text_quality_scores",
    "text_unigram_logprob",
    "text_decontamination",
    "pipeline_train_val_split",
    "pipeline_sequence_packing",
    "text_mixture_weights",
    "text_bpe_merge_pairs",
    "pipeline_quality_resample",
    # round-8 additions: paragraph keep-first (hash-pair shuffles only),
    # winnowing selection (one projection + fingerprint-pair shuffle),
    # zipf audit (map-side-combined vocab aggregate)
    "dedup_paragraphs",
    "dedup_winnowing_fingerprints",
    "text_zipf_audit",
]


def build(spark) -> None:
    if os.path.isdir(SYN):
        shutil.rmtree(SYN)
    os.makedirs(SYN, exist_ok=True)
    src = "/root/testdata/sf0.1"
    docs = spark.read.parquet(f"{src}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("cp"))
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("cp") * F.lit(10_000_000)).alias("doc_id"),
            F.when(F.col("cp") == 0, F.col("text"))
            .otherwise(
                F.concat(F.col("text"), F.lit(" rev"), F.col("cp").cast("string"))
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        # declared size must track the mutated text
        .withColumn("n_chars", F.length("text"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{SYN}/documents.parquet")
    )


def main() -> None:
    spark = get_spark("text-headroom-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    n = spark.read.parquet(f"{SYN}/documents.parquet").count()
    # warm the JVM/JIT on the small corpus first
    for name in PROBES:
        entrypoints.QUERIES[name](spark, "/root/testdata/sf0.1").count()
    out: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("docs100x", SYN)):
        for name in PROBES:
            t0 = time.perf_counter()
            entrypoints.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            out.setdefault(name, {})[sf_name] = round(time.perf_counter() - t0, 3)
            print(f"# {sf_name} {name}: {out[name][sf_name]}s", file=sys.stderr)
    print(json.dumps({"copies": COPIES, "n_docs_100x": n, "timings": out}))


if __name__ == "__main__":
    main()
