"""Streaming-friendly sketch operators (HyperLogLog, Count-Min) built
from deterministic column expressions — the "novel sketch as a
composition of DataFrame ops" family.

Spark ships approx_count_distinct (HLL++) and DuckDB approx_count_distinct
too, but their internals differ, so the built-ins can never be
oracle-checked cross-engine. These sketches use the engine's own md5
string hash (functions/text.py::token_hash) and integer register
arithmetic, so Spark and DuckDB compute BIT-IDENTICAL registers and the
estimates agree exactly — the sketch math itself becomes testable, not
just its output shape.

Scale shape: both sketches are one narrow scan + a groupBy onto a tiny
fixed-size state (64 HLL registers / 4x64 CMS cells) with map-side
partial aggregation — the classic mergeable-summary pattern: per-partition
sketches merge associatively, which is why these run unchanged as
streaming accumulators or at 100 TB (state size is constant regardless
of input rows).

Flajolet et al. 2007 (HyperLogLog) and Cormode & Muthukrishnan 2005
(Count-Min) are the published constructions; parameters here are sized
for exact cross-engine reproducibility (hash = 52-bit md5 prefix: fits
double and DuckDB's BIGINT conv path exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

HLL_M = 64          # registers (b = 6 bucket bits)
HLL_ALPHA = 0.709   # alpha_64 from the HLL paper
HLL_HASH_HEX = 13   # 13 hex digits = 52 bits: < 2^53, exact in double
CMS_DEPTH = 4
CMS_WIDTH = 64


def _hash52(col, salt: str):
    """52-bit md5-prefix hash — deterministic and identical in DuckDB via
    CAST(concat('0x', substr(md5(...),1,13)) AS BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, HLL_HASH_HEX),
        16,
        10,
    ).cast("long")


def hll_distinct(spark: SparkSession, sf_dir: str, key: str = "user_id") -> DataFrame:
    """HyperLogLog distinct-count of events.`key` with the exact count
    alongside: bucket = low 6 hash bits, rank = leading-zero count of the
    remaining 46 bits + 1 (computed exactly via length(bin(w)) — integer
    string length, no floating log), registers = max rank per bucket,
    estimate = alpha * m^2 / sum(2^-M_j) with the standard small-range
    correction. Every step is integer or exact-power-of-two double math,
    so the DuckDB oracle reproduces the estimate bit-for-bit."""
    ev = load(spark, sf_dir, "events").select(F.col(key).alias("k"))
    h = _hash52(F.col("k"), "hll:")
    w = (h / F.lit(HLL_M)).cast("long")  # high 46 bits
    rank = F.when(w == 0, F.lit(47)).otherwise(F.lit(47) - F.length(F.bin(w)))
    regs = (
        ev.select((h % HLL_M).alias("bucket"), rank.alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("m_j"))
    )
    # sum over ALL m buckets of 2^-M_j; absent buckets have M_j = 0 -> 1.0
    agg = regs.agg(
        F.count("*").alias("n_nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("s_nonempty"),
    )
    exact = ev.agg(F.countDistinct("k").alias("exact_distinct"))
    est_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (
        F.col("s_nonempty") + (F.lit(HLL_M) - F.col("n_nonempty"))
    )
    zeros = F.lit(HLL_M) - F.col("n_nonempty")
    est = F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(est_raw)
    return agg.crossJoin(exact).select(
        F.lit(HLL_M).alias("m"),
        F.col("n_nonempty").cast("long").alias("n_registers"),
        F.round(est, 4).alias("hll_estimate"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.round(F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 4)
        .alias("rel_error"),
    )


def hll_distinct_sql(key: str = "user_id") -> str:
    h = f"CAST(concat('0x', substr(md5(concat('hll:', CAST({key} AS VARCHAR))), 1, {HLL_HASH_HEX})) AS BIGINT)"
    return f"""
WITH hashed AS (
  SELECT {h} % {HLL_M} AS bucket,
         CAST(floor({h} / {HLL_M}.0) AS BIGINT) AS w
  FROM events
),
ranked AS (
  SELECT bucket, CASE WHEN w = 0 THEN 47 ELSE 47 - length(bin(w)) END AS r
  FROM hashed
),
regs AS (SELECT bucket, max(r) AS m_j FROM ranked GROUP BY bucket),
agg AS (
  SELECT count(*) AS n_nonempty, sum(power(2.0, -m_j)) AS s_nonempty FROM regs
),
ex AS (SELECT count(DISTINCT {key}) AS exact_distinct FROM events),
est AS (
  SELECT n_nonempty, s_nonempty, exact_distinct,
         {HLL_ALPHA * HLL_M * HLL_M} / (s_nonempty + ({HLL_M} - n_nonempty)) AS e_raw
  FROM agg, ex
)
SELECT {HLL_M} AS m, CAST(n_nonempty AS BIGINT) AS n_registers,
       round(CASE WHEN e_raw <= {2.5 * HLL_M} AND ({HLL_M} - n_nonempty) > 0
                  THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - n_nonempty))
                  ELSE e_raw END, 4) AS hll_estimate,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       round(abs(CASE WHEN e_raw <= {2.5 * HLL_M} AND ({HLL_M} - n_nonempty) > 0
                      THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - n_nonempty))
                      ELSE e_raw END - exact_distinct) / exact_distinct, 4)
         AS rel_error
FROM est
"""


def countmin_heavy_hitters(
    spark: SparkSession, sf_dir: str, key: str = "event_type"
) -> DataFrame:
    """Count-Min sketch over events.`key` with per-key ground truth: 4
    hash rows x 64 buckets of counters (the mergeable fixed-size state),
    point estimate = min over rows of the addressed counter. The CMS
    estimate always >= exact count; `overestimate` shows the collision
    error the sketch admits. Integer arithmetic end-to-end -> exact
    oracle parity."""
    ev = load(spark, sf_dir, "events").select(F.col(key).alias("k"))
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (_hash52(F.col("k"), f"cm{i}:") % CMS_WIDTH).alias("bucket"),
            )
            for i in range(CMS_DEPTH)
        ]
    )
    cells = (
        ev.select(F.explode(rows).alias("s"))
        .select("s.i", "s.bucket")
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = ev.groupBy("k").agg(F.count("*").alias("exact_n"))
    probes = exact.select(
        "k", "exact_n", F.explode(rows).alias("s")
    ).select("k", "exact_n", "s.i", "s.bucket")
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("k", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            F.col("k").alias(key),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cms_estimate").cast("long").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("exact_n")).cast("long").alias("overestimate"),
        )
    )


def countmin_sql(key: str = "event_type") -> str:
    def h(i: int, expr: str) -> str:
        return (
            f"CAST(concat('0x', substr(md5(concat('cm{i}:', CAST({expr} AS VARCHAR))),"
            f" 1, {HLL_HASH_HEX})) AS BIGINT) % {CMS_WIDTH}"
        )

    cell_union = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, {h(i, key)} AS bucket FROM events" for i in range(CMS_DEPTH)
    )
    probe_union = "\nUNION ALL\n".join(
        f"SELECT k, exact_n, {i} AS i, {h(i, 'k')} AS bucket FROM ex"
        for i in range(CMS_DEPTH)
    )
    return f"""
WITH cells AS (
  SELECT i, bucket, count(*) AS c FROM ({cell_union}) GROUP BY i, bucket
),
ex AS (SELECT {key} AS k, count(*) AS exact_n FROM events GROUP BY {key}),
probes AS ({probe_union})
SELECT p.k AS {key}, CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(min(c.c) AS BIGINT) AS cms_estimate,
       CAST(min(c.c) - p.exact_n AS BIGINT) AS overestimate
FROM probes p JOIN cells c USING (i, bucket)
GROUP BY p.k, p.exact_n
"""
