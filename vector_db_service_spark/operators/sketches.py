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
from pyspark.sql.window import Window

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
    # NULL keys excluded: the COUNT(DISTINCT) population (whole family)
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col(key).isNotNull())
        .select(F.col(key).alias("k"))
    )
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
  FROM events WHERE {key} IS NOT NULL
),
ranked AS (
  SELECT bucket, CASE WHEN w = 0 THEN 47 ELSE 47 - length(bin(w)) END AS r
  FROM hashed
),
regs AS (SELECT bucket, max(r) AS m_j FROM ranked GROUP BY bucket),
agg AS (
  SELECT count(*) AS n_nonempty, sum(power(2.0, -m_j)) AS s_nonempty FROM regs
),
ex AS (SELECT count(DISTINCT {key}) AS exact_distinct FROM events
       WHERE {key} IS NOT NULL),
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
    oracle parity. NULL keys are excluded — a sketch estimates the
    non-null key distribution, the same population COUNT(DISTINCT)
    describes (null hashes to NULL on Spark but to the hash of the bare
    salt in DuckDB's null-skipping concat, so no phantom key exists on
    either side)."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col(key).isNotNull())
        .select(F.col(key).alias("k"))
    )
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
        f"SELECT {i} AS i, {h(i, key)} AS bucket FROM events"
        f" WHERE {key} IS NOT NULL"
        for i in range(CMS_DEPTH)
    )
    probe_union = "\nUNION ALL\n".join(
        f"SELECT k, exact_n, {i} AS i, {h(i, 'k')} AS bucket FROM ex"
        for i in range(CMS_DEPTH)
    )
    return f"""
WITH cells AS (
  SELECT i, bucket, count(*) AS c FROM ({cell_union}) GROUP BY i, bucket
),
ex AS (SELECT {key} AS k, count(*) AS exact_n FROM events
       WHERE {key} IS NOT NULL GROUP BY {key}),
probes AS ({probe_union})
SELECT p.k AS {key}, CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(min(c.c) AS BIGINT) AS cms_estimate,
       CAST(min(c.c) - p.exact_n AS BIGINT) AS overestimate
FROM probes p JOIN cells c USING (i, bucket)
GROUP BY p.k, p.exact_n
"""


BLOOM_M = 1024  # bits
BLOOM_K = 4     # hash functions
KMV_K = 32      # bottom-k signature size


def bloom_membership(
    spark: SparkSession, sf_dir: str, key: str = "user_id"
) -> DataFrame:
    """Bloom-filter membership over the distinct events.`key` set: an
    m=1024-bit / k=4-hash filter built as a DISTINCT bit-position frame
    (the mergeable form — per-partition bit sets union associatively,
    which is the 100 TB/streaming accumulation shape; a bitmap is just
    this frame packed). Probes 16 present ids and 8 absent ones and
    reports per-probe filter verdict vs ground truth: false negatives
    are impossible by construction (the test pins this), false positives
    are the admitted error. md5-slice hashing -> bit-identical DuckDB
    oracle.

    Pipeline use: the O10 pending-set anti-join at 100 TB ships this
    filter to the scan as a pushdown pre-filter instead of shuffling the
    full id set."""
    ev = load(spark, sf_dir, "events").select(F.col(key).alias("k")).distinct()
    positions = F.array(
        *[(_hash52(F.col("k"), f"bf{i}:") % BLOOM_M) for i in range(BLOOM_K)]
    )
    bits = (
        ev.select(F.explode(positions).alias("bit")).distinct()
    )
    probe_ids = list(range(16)) + [10_000_000 + i for i in range(8)]
    probes = spark.createDataFrame(
        [(int(p),) for p in probe_ids], "probe_key long"
    )
    pbits = probes.select(
        "probe_key",
        F.explode(
            F.array(
                *[
                    (_hash52(F.col("probe_key"), f"bf{i}:") % BLOOM_M)
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("bit"),
    )
    hit_counts = (
        pbits.join(F.broadcast(bits), "bit")
        .groupBy("probe_key")
        .agg(F.count("*").alias("n_hit"))
    )
    # presence restricted to the probe set FIRST (broadcast semi-join
    # into the data-sized distinct-key scan — no shuffle of `actual`),
    # then both bounded sides (<= 24 rows each) broadcast into the
    # probe-frame joins: the former shape exchanged and sorted the full
    # distinct-key set for a 24-row left join (2 SortMergeJoins,
    # plan-audited r16)
    actual = ev.select(F.col("k").alias("probe_key"))
    present = actual.join(
        F.broadcast(probes), "probe_key", "left_semi"
    ).distinct().withColumn("_a", F.lit(1))
    return (
        probes.join(F.broadcast(hit_counts), "probe_key", "left")
        .join(F.broadcast(present), "probe_key", "left")
        .select(
            "probe_key",
            (F.coalesce(F.col("n_hit"), F.lit(0)) == BLOOM_K).alias("bloom_hit"),
            F.col("_a").isNotNull().alias("actually_present"),
        )
    )


def bloom_membership_sql(key: str = "user_id") -> str:
    def h(i: int, expr: str) -> str:
        return (
            f"CAST(concat('0x', substr(md5(concat('bf{i}:', CAST({expr} AS VARCHAR))),"
            f" 1, {HLL_HASH_HEX})) AS BIGINT) % {BLOOM_M}"
        )

    probe_ids = list(range(16)) + [10_000_000 + i for i in range(8)]
    probe_rows = ", ".join(f"({p})" for p in probe_ids)
    bit_union = "\nUNION ALL\n".join(
        f"SELECT {h(i, 'k')} AS bit FROM ks" for i in range(BLOOM_K)
    )
    pbit_union = "\nUNION ALL\n".join(
        f"SELECT probe_key, {h(i, 'probe_key')} AS bit FROM probes"
        for i in range(BLOOM_K)
    )
    return f"""
WITH ks AS (SELECT DISTINCT {key} AS k FROM events),
bits AS (SELECT DISTINCT bit FROM ({bit_union})),
probes(probe_key) AS (VALUES {probe_rows}),
pbits AS ({pbit_union}),
hits AS (
  SELECT probe_key, count(*) AS n_hit
  FROM pbits JOIN bits USING (bit) GROUP BY probe_key
)
SELECT p.probe_key,
       coalesce(h.n_hit, 0) = {BLOOM_K} AS bloom_hit,
       EXISTS (SELECT 1 FROM ks WHERE ks.k = p.probe_key) AS actually_present
FROM probes p LEFT JOIN hits h USING (probe_key)
"""


def kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) set-overlap sketch: estimate the Jaccard and
    intersection size of {click users} vs {purchase users} from two
    K={KMV_K}-value signatures instead of the full sets. The two
    signatures merge into a bottom-K union signature; the fraction of it
    present in BOTH input signatures estimates Jaccard, and the K-th
    smallest normalized hash estimates |A u B| ((K-1)/h_(K) — Bar-Yossef
    et al. 2002). Exact counts computed alongside quantify the error.
    Everything is md5-slice integer math + one exact double division,
    so the DuckDB oracle reproduces the estimates bit-for-bit.

    Scale shape: each signature is a bottom-K TakeOrderedAndProject over
    the distinct keys — constant state, partition-mergeable, the corpus-
    overlap primitive (e.g. contamination checks between two crawls).
    NULL user ids are excluded (the COUNT(DISTINCT) population)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())

    def sig(event_type: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .select("user_id").distinct()
            .select(_hash52(F.col("user_id"), "kmv:").alias("h"))
            .orderBy("h").limit(KMV_K)
        )

    a, b = sig("click"), sig("purchase")
    union_k = a.unionByName(b).distinct().orderBy("h").limit(KMV_K)
    in_both = (
        union_k.join(a, "h", "left_semi").join(b, "h", "left_semi")
        .agg(F.count("*").alias("n_both"))
    )
    kth = union_k.agg(
        F.count("*").alias("n_union_k"), F.max("h").alias("h_k")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = (
        clicks.join(purch, "user_id", "left_semi")
        .agg(F.count("*").alias("exact_intersection"))
        .crossJoin(
            clicks.unionByName(purch).distinct().agg(F.count("*").alias("exact_union"))
        )
    )
    est_union = (F.lit(KMV_K - 1).cast("double")
                 / (F.col("h_k").cast("double") / F.lit(float(1 << 52))))
    # try_divide: an EMPTY key population (a shard whose user ids were
    # never populated) makes n_union_k = 0 — ANSI raises on the plain
    # division where DuckDB yields NULL (void-fixture find)
    jac = F.try_divide(
        F.col("n_both").cast("double"), F.col("n_union_k").cast("double")
    )
    return (
        in_both.crossJoin(kth).crossJoin(exact)
        .select(
            F.lit(KMV_K).alias("k"),
            F.round(jac, 6).alias("est_jaccard"),
            F.round(est_union, 4).alias("est_union"),
            F.round(jac * est_union, 4).alias("est_intersection"),
            F.col("exact_intersection").cast("long").alias("exact_intersection"),
            F.col("exact_union").cast("long").alias("exact_union"),
        )
    )


def kmv_overlap_sql() -> str:
    h = ("CAST(concat('0x', substr(md5(concat('kmv:', CAST(user_id AS VARCHAR))),"
         f" 1, {HLL_HASH_HEX})) AS BIGINT)")
    return f"""
WITH a AS (
  SELECT {h} AS h FROM (SELECT DISTINCT user_id FROM events
                      WHERE event_type = 'click' AND user_id IS NOT NULL)
  ORDER BY h LIMIT {KMV_K}
),
b AS (
  SELECT {h} AS h FROM (SELECT DISTINCT user_id FROM events
                      WHERE event_type = 'purchase' AND user_id IS NOT NULL)
  ORDER BY h LIMIT {KMV_K}
),
u AS (
  SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b)
  ORDER BY h LIMIT {KMV_K}
),
stats AS (
  SELECT count(*) AS n_union_k, max(h) AS h_k,
         CAST(sum(CASE WHEN h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM u
),
ex AS (
  SELECT
    (SELECT count(*) FROM
       (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
     WHERE user_id IN (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'purchase')) AS exact_intersection,
    (SELECT count(DISTINCT user_id) FROM events
     WHERE event_type IN ('click', 'purchase')) AS exact_union
)
SELECT {KMV_K} AS k,
       round(CAST(n_both AS DOUBLE) / CAST(n_union_k AS DOUBLE), 6) AS est_jaccard,
       round({KMV_K - 1}.0 / (CAST(h_k AS DOUBLE) / {float(1 << 52)!r}), 4) AS est_union,
       round((CAST(n_both AS DOUBLE) / CAST(n_union_k AS DOUBLE))
             * ({KMV_K - 1}.0 / (CAST(h_k AS DOUBLE) / {float(1 << 52)!r})), 4)
         AS est_intersection,
       CAST(exact_intersection AS BIGINT) AS exact_intersection,
       CAST(exact_union AS BIGINT) AS exact_union
FROM stats, ex
"""


def hll_distinct_by_group(
    spark: SparkSession, sf_dir: str, key: str = "user_id",
    group: str = "event_type",
) -> DataFrame:
    """GROUP-scoped HyperLogLog: one 64-register sketch per `group` value
    (distinct `key` per group), exact counts alongside. The registers
    frame is (group x m) rows — the dimension-sliced mergeable-summary
    layout: per-partition partial registers combine with max(), so the
    same plan serves streaming accumulation and 100 TB batch."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col(key).isNotNull())  # COUNT(DISTINCT) population
        .select(F.col(group).alias("g"), F.col(key).alias("k"))
    )
    h = _hash52(F.col("k"), "hll:")
    w = (h / F.lit(HLL_M)).cast("long")
    rank = F.when(w == 0, F.lit(47)).otherwise(F.lit(47) - F.length(F.bin(w)))
    regs = (
        ev.select("g", (h % HLL_M).alias("bucket"), rank.alias("r"))
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("m_j"))
    )
    agg = regs.groupBy("g").agg(
        F.count("*").alias("n_nonempty"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("s_nonempty"),
    )
    exact = ev.groupBy("g").agg(F.countDistinct("k").alias("exact_distinct"))
    est_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (
        F.col("s_nonempty") + (F.lit(HLL_M) - F.col("n_nonempty"))
    )
    zeros = F.lit(HLL_M) - F.col("n_nonempty")
    est = F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(est_raw)
    return agg.join(exact, "g").select(
        F.col("g").alias(group),
        F.col("n_nonempty").cast("long").alias("n_registers"),
        F.round(est, 4).alias("hll_estimate"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


def hll_distinct_by_group_sql(key: str = "user_id", group: str = "event_type") -> str:
    h = f"CAST(concat('0x', substr(md5(concat('hll:', CAST({key} AS VARCHAR))), 1, {HLL_HASH_HEX})) AS BIGINT)"
    return f"""
WITH hashed AS (
  SELECT {group} AS g, {h} % {HLL_M} AS bucket,
         CAST(floor({h} / {HLL_M}.0) AS BIGINT) AS w
  FROM events WHERE {key} IS NOT NULL
),
ranked AS (
  SELECT g, bucket, CASE WHEN w = 0 THEN 47 ELSE 47 - length(bin(w)) END AS r
  FROM hashed
),
regs AS (SELECT g, bucket, max(r) AS m_j FROM ranked GROUP BY g, bucket),
agg AS (
  SELECT g, count(*) AS n_nonempty, sum(power(2.0, -m_j)) AS s_nonempty
  FROM regs GROUP BY g
),
ex AS (SELECT {group} AS g, count(DISTINCT {key}) AS exact_distinct
       FROM events GROUP BY {group}),
est AS (
  SELECT a.g, a.n_nonempty, exact_distinct,
         {HLL_ALPHA * HLL_M * HLL_M} / (s_nonempty + ({HLL_M} - n_nonempty)) AS e_raw
  FROM agg a JOIN ex USING (g)
)
SELECT g AS {group}, CAST(n_nonempty AS BIGINT) AS n_registers,
       round(CASE WHEN e_raw <= {2.5 * HLL_M} AND ({HLL_M} - n_nonempty) > 0
                  THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - n_nonempty))
                  ELSE e_raw END, 4) AS hll_estimate,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM est
"""


QH_BINS = 64      # fixed equi-width bins
QH_BIN_W = 8.0    # bin width: covers events.value's [0, 512) envelope
QH_QUANTILES = (50, 90, 99)   # integer percents: exact threshold math


def quantile_histogram(
    spark: SparkSession, sf_dir: str, group: str = "event_type"
) -> DataFrame:
    """Mergeable fixed-bin quantile sketch over events.value, one sketch
    per `group` — the histogram half of a t-digest-style pipeline
    monitor. Sketch state is (group, bin) -> count: per-partition
    partials combine with sum(), so the identical plan serves streaming
    accumulation, 100 TB batch, and cross-day sketch merges.

    The quantile estimate is the UPPER EDGE of the first bin whose
    cumulative count reaches ceil(q% * n) — all integer thresholds and
    exact power-of-two-free double edges (bin * 8.0), so the DuckDB
    oracle reproduces estimates bit-for-bit. The cumulative pass runs
    over <= QH_BINS rows per group."""
    ev = load(spark, sf_dir, "events").select(
        F.col(group).alias("g"), F.col("value").alias("v")
    )
    counts = ev.select("g", histogram_bin(F.col("v")).alias("b")).groupBy(
        "g", "b"
    ).agg(F.count("*").alias("c"))
    return histogram_quantiles(counts, group)


def histogram_bin(v) -> "F.Column":
    """Fixed equi-width bin id for the quantile histogram (shared by the
    batch sketch and its streaming accumulator)."""
    return F.least(F.lit(QH_BINS - 1), F.floor(v / F.lit(QH_BIN_W)).cast("int"))


def histogram_quantiles(counts: DataFrame, group: str) -> DataFrame:
    """Finalize (g, b) -> c sketch state into per-group quantile
    estimates — identical math whether the state came from a batch
    aggregation or a streaming complete-mode accumulator."""
    w = Window.partitionBy("g").orderBy("b")
    cum = counts.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("g"))
    )
    qcols = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.col("n") * F.lit(q) / F.lit(100)),
                (F.col("b") + 1).cast("double") * F.lit(QH_BIN_W),
            )
        ).alias(f"est_p{q}")
        for q in QH_QUANTILES
    ]
    return (
        cum.groupBy("g")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.count("*").alias("n_bins_used"),
            *qcols,
        )
        .select(
            F.col("g").alias(group), "n_events", "n_bins_used",
            *[f"est_p{q}" for q in QH_QUANTILES],
        )
    )


def quantile_histogram_sql(group: str = "event_type") -> str:
    qsel = ",\n       ".join(
        f"min(CASE WHEN cum >= ceil(n * {q} / 100.0) "
        f"THEN (b + 1) * {QH_BIN_W} END) AS est_p{q}"
        for q in QH_QUANTILES
    )
    return f"""
WITH counts AS (
  SELECT {group} AS g,
         least({QH_BINS - 1}, CAST(floor(value / {QH_BIN_W}) AS INTEGER)) AS b,
         count(*) AS c
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT g, b, c,
         sum(c) OVER (PARTITION BY g ORDER BY b) AS cum,
         sum(c) OVER (PARTITION BY g) AS n
  FROM counts
)
SELECT g AS {group},
       CAST(max(n) AS BIGINT) AS n_events,
       count(*) AS n_bins_used,
       {qsel}
FROM cum GROUP BY g
"""


def _hll_est(n_nonempty, s_nonempty):
    """Standard HLL estimate with small-range correction, as a Column —
    shared by the whole-corpus, per-slice, and merged estimates so the
    merge demonstration uses ONE formula."""
    est_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (
        s_nonempty + (F.lit(HLL_M) - n_nonempty)
    )
    zeros = F.lit(HLL_M) - n_nonempty
    return F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
    ).otherwise(est_raw)


def hll_merge(spark: SparkSession, sf_dir: str, key: str = "user_id") -> DataFrame:
    """The MERGE property of the HLL sketch demonstrated as a checkable
    query: events split into two disjoint slices (event_id parity — the
    stand-in for two ingest days), a register set built per slice, the
    two register sets merged with max(), and the merged estimate
    compared against the estimate built over the whole corpus in one
    pass. max() is associative, so merged == whole EXACTLY — the
    property that lets 100 TB pipelines sketch per day/shard and
    combine without rescanning; `merge_matches_whole` pins it.

    One scan builds the per-slice registers; every later frame is at
    most 2 x HLL_M rows (broadcast scalar combines)."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col(key).isNotNull())  # the COUNT(DISTINCT) population
        .select(F.col(key).alias("k"), (F.col("event_id") % 2).alias("slc"))
    )
    h = _hash52(F.col("k"), "hll:")
    w = (h / F.lit(HLL_M)).cast("long")
    rank = F.when(w == 0, F.lit(47)).otherwise(F.lit(47) - F.length(F.bin(w)))
    sliced = ev.select("slc", (h % HLL_M).alias("bucket"), rank.alias("r"))
    regs_slice = sliced.groupBy("slc", "bucket").agg(F.max("r").alias("m_j"))

    def estimate(regs: DataFrame, out: str) -> DataFrame:
        agg = regs.agg(
            F.count("*").alias("n_ne"),
            F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("s_ne"),
        )
        return agg.select(F.round(_hll_est(F.col("n_ne"), F.col("s_ne")), 4).alias(out))

    merged = regs_slice.groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    whole = sliced.groupBy("bucket").agg(F.max("r").alias("m_j"))
    e0 = estimate(regs_slice.filter(F.col("slc") == 0), "est_slice0")
    e1 = estimate(regs_slice.filter(F.col("slc") == 1), "est_slice1")
    em = estimate(merged, "est_merged")
    ew = estimate(whole, "est_whole")
    exact = ev.agg(F.countDistinct("k").cast("long").alias("exact_distinct"))
    row = (
        e0.crossJoin(F.broadcast(e1))
        .crossJoin(F.broadcast(em))
        .crossJoin(F.broadcast(ew))
        .crossJoin(F.broadcast(exact))
    )
    return row.select(
        "est_slice0", "est_slice1", "est_merged", "est_whole", "exact_distinct",
        (F.col("est_merged") == F.col("est_whole")).alias("merge_matches_whole"),
    )


def hll_merge_sql(key: str = "user_id") -> str:
    h = (
        f"CAST(concat('0x', substr(md5(concat('hll:', CAST({key} AS VARCHAR)))"
        f", 1, {HLL_HASH_HEX})) AS BIGINT)"
    )

    def est(src: str, out: str) -> str:
        return f"""
{out}_agg AS (
  SELECT count(*) AS n_ne, sum(power(2.0, -m_j)) AS s_ne FROM {src}
),
{out}_v AS (
  SELECT round(CASE WHEN {HLL_ALPHA * HLL_M * HLL_M} / (s_ne + ({HLL_M} - n_ne))
                         <= {2.5 * HLL_M} AND ({HLL_M} - n_ne) > 0
               THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - n_ne))
               ELSE {HLL_ALPHA * HLL_M * HLL_M} / (s_ne + ({HLL_M} - n_ne))
               END, 4) AS {out}
  FROM {out}_agg
)"""

    return f"""
WITH sliced AS (
  SELECT event_id % 2 AS slc, {h} % {HLL_M} AS bucket,
         CASE WHEN CAST(floor({h} / {HLL_M}.0) AS BIGINT) = 0 THEN 47
              ELSE 47 - length(bin(CAST(floor({h} / {HLL_M}.0) AS BIGINT)))
         END AS r
  FROM events WHERE {key} IS NOT NULL
),
regs_slice AS (SELECT slc, bucket, max(r) AS m_j FROM sliced GROUP BY slc, bucket),
s0 AS (SELECT bucket, m_j FROM regs_slice WHERE slc = 0),
s1 AS (SELECT bucket, m_j FROM regs_slice WHERE slc = 1),
merged AS (SELECT bucket, max(m_j) AS m_j FROM regs_slice GROUP BY bucket),
whole AS (SELECT bucket, max(r) AS m_j FROM sliced GROUP BY bucket),
{est('s0', 'est_slice0')[1:]},
{est('s1', 'est_slice1')[1:]},
{est('merged', 'est_merged')[1:]},
{est('whole', 'est_whole')[1:]},
ex AS (SELECT CAST(count(DISTINCT {key}) AS BIGINT) AS exact_distinct
       FROM events WHERE {key} IS NOT NULL)
SELECT est_slice0, est_slice1, est_merged, est_whole, exact_distinct,
       est_merged = est_whole AS merge_matches_whole
FROM est_slice0_v, est_slice1_v, est_merged_v, est_whole_v, ex
"""


def countmin_merge(
    spark: SparkSession, sf_dir: str, key: str = "event_type"
) -> DataFrame:
    """The LINEARITY of the Count-Min sketch demonstrated as a
    checkable query — the second mergeable-sketch family after
    hll_merge's max-merge: CM counters are sums, so two shards' tables
    merge by ELEMENTWISE ADDITION and the merged table is bit-identical
    to the whole-corpus table (not just approximately — counts add).
    Events split on event_id parity (two ingest days), one counter
    table per slice, merged = cell-wise sum, and per key the point
    estimates (min over depth rows) from slice / merged / whole tables
    plus the exact count. merge == whole is in the output, and the
    per-slice estimates show the decomposition a shard-parallel
    pipeline actually runs.

    One scan builds the per-slice cells; everything after is
    counter-table-sized (depth x width x 2 rows)."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col(key).isNotNull())  # the COUNT(DISTINCT) population
        .select(F.col(key).alias("k"), (F.col("event_id") % 2).alias("slc"))
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                (_hash52(F.col("k"), f"cm{i}:") % CMS_WIDTH).alias("bucket"),
            )
            for i in range(CMS_DEPTH)
        ]
    )
    cells_slice = (
        ev.select("slc", F.explode(rows).alias("s"))
        .select("slc", "s.i", "s.bucket")
        .groupBy("slc", "i", "bucket")
        .agg(F.count("*").alias("c"))
    )
    merged = cells_slice.groupBy("i", "bucket").agg(F.sum("c").alias("c"))
    whole = (
        ev.select(F.explode(rows).alias("s"))
        .select("s.i", "s.bucket")
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = ev.groupBy("k").agg(F.count("*").alias("exact_n"))
    probes = exact.select(
        "k", "exact_n", F.explode(rows).alias("s")
    ).select("k", "exact_n", "s.i", "s.bucket")

    def est(cells: DataFrame, out: str) -> DataFrame:
        # LEFT join + coalesce-to-0: a key whose hashed bucket holds no
        # cell in this table has counter 0 there, and the CM point
        # estimate is min over ALL depth rows — an inner join would drop
        # the key from a slice it never touched instead of estimating 0
        # (r15 advisor)
        return (
            probes.join(F.broadcast(cells), ["i", "bucket"], "left")
            .groupBy("k", "exact_n")
            .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias(out))
        )

    e0 = est(cells_slice.filter(F.col("slc") == 0).drop("slc"), "est_slice0")
    e1 = est(cells_slice.filter(F.col("slc") == 1).drop("slc"), "est_slice1")
    em = est(merged, "est_merged")
    ew = est(whole, "est_whole")
    return (
        e0.join(e1, ["k", "exact_n"])
        .join(em, ["k", "exact_n"])
        .join(ew, ["k", "exact_n"])
        .select(
            F.col("k").alias(key),
            F.col("exact_n").cast("long").alias("exact_n"),
            "est_slice0", "est_slice1", "est_merged", "est_whole",
            (F.col("est_merged") == F.col("est_whole")).alias(
                "merge_matches_whole"
            ),
        )
    )


def countmin_merge_sql(key: str = "event_type") -> str:
    def h(i: int) -> str:
        return (
            f"CAST(concat('0x', substr(md5(concat('cm{i}:', "
            f"CAST(k AS VARCHAR))), 1, 13)) AS BIGINT) % {CMS_WIDTH}"
        )

    probes = " UNION ALL ".join(
        f"SELECT k, exact_n, {i} AS i, {h(i)} AS bucket FROM exact"
        for i in range(CMS_DEPTH)
    )
    cells = " UNION ALL ".join(
        f"SELECT slc, {i} AS i, {h(i)} AS bucket FROM ev"
        for i in range(CMS_DEPTH)
    )

    def est(src: str, out: str) -> str:
        # left join + coalesce mirrors the engine: empty counter cell = 0
        return f"""{out}_v AS (
  SELECT p.k, p.exact_n, CAST(min(coalesce(c.c, 0)) AS BIGINT) AS {out}
  FROM probes p LEFT JOIN {src} c ON c.i = p.i AND c.bucket = p.bucket
  GROUP BY p.k, p.exact_n
)"""

    return f"""
WITH ev AS (SELECT {key} AS k, event_id % 2 AS slc FROM events
            WHERE {key} IS NOT NULL),
exact AS (SELECT k, CAST(count(*) AS BIGINT) AS exact_n FROM ev GROUP BY k),
probes AS ({probes}),
cells_slice AS (
  SELECT slc, i, bucket, count(*) AS c FROM ({cells}) GROUP BY slc, i, bucket
),
s0 AS (SELECT i, bucket, c FROM cells_slice WHERE slc = 0),
s1 AS (SELECT i, bucket, c FROM cells_slice WHERE slc = 1),
merged AS (SELECT i, bucket, sum(c) AS c FROM cells_slice GROUP BY i, bucket),
whole AS (
  SELECT i, bucket, count(*) AS c FROM ({cells}) GROUP BY i, bucket
),
{est('s0', 'est_slice0')},
{est('s1', 'est_slice1')},
{est('merged', 'est_merged')},
{est('whole', 'est_whole')}
SELECT e0.k AS {key}, e0.exact_n,
       e0.est_slice0, e1.est_slice1, em.est_merged, ew.est_whole,
       em.est_merged = ew.est_whole AS merge_matches_whole
FROM est_slice0_v e0
JOIN est_slice1_v e1 ON e1.k = e0.k
JOIN est_merged_v em ON em.k = e0.k
JOIN est_whole_v ew ON ew.k = e0.k
"""


def hll_intersection(
    spark: SparkSession,
    sf_dir: str,
    type_a: str = "click",
    type_b: str = "purchase",
    key: str = "user_id",
) -> DataFrame:
    """Audience-OVERLAP estimation from mergeable sketches — the
    segment-intersection question ("how many users both click AND
    purchase?") answered without a distinct-join: build one HLL
    register set per segment, take the UNION estimate from the
    max-merged registers (the exact merge property hll_merge pins),
    and read the intersection off inclusion-exclusion
    |A∩B| ≈ |A| + |B| - |A∪B|. The exact intersection count rides
    along so the estimate's error is driver-visible. Each estimate is
    rounded to 4dp BEFORE the subtraction, so the arithmetic is the
    same pair of doubles on both engines.

    Scale: one scan builds both register sets (2 x HLL_M rows);
    everything after is register-sized. Inclusion-exclusion error
    grows as the intersection shrinks relative to the union — the
    known sketch-theory caveat, which is exactly why the exact column
    is in the output."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(type_a, type_b)
        & F.col(key).isNotNull()  # COUNT(DISTINCT) population
    ).select(F.col(key).alias("k"), "event_type")
    h = _hash52(F.col("k"), "hll:")
    w = (h / F.lit(HLL_M)).cast("long")
    rank = F.when(w == 0, F.lit(47)).otherwise(F.lit(47) - F.length(F.bin(w)))
    sliced = ev.select(
        "event_type", (h % HLL_M).alias("bucket"), rank.alias("r")
    )
    regs = sliced.groupBy("event_type", "bucket").agg(F.max("r").alias("m_j"))

    def estimate(src: DataFrame, out: str) -> DataFrame:
        agg = src.agg(
            F.count("*").alias("n_ne"),
            F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("s_ne"),
        )
        return agg.select(
            F.round(_hll_est(F.col("n_ne"), F.col("s_ne")), 4).alias(out)
        )

    ea = estimate(regs.filter(F.col("event_type") == type_a), "est_a")
    eb = estimate(regs.filter(F.col("event_type") == type_b), "est_b")
    eu = estimate(
        regs.groupBy("bucket").agg(F.max("m_j").alias("m_j")), "est_union"
    )
    exact = (
        ev.groupBy("k")
        .agg(F.count_distinct("event_type").alias("nt"))
        .filter(F.col("nt") == 2)
        .agg(F.count("*").cast("long").alias("exact_intersection"))
    )
    return (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(exact))
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_intersection"),
            "exact_intersection",
        )
    )


def hll_intersection_sql(
    type_a: str = "click", type_b: str = "purchase", key: str = "user_id"
) -> str:
    h = (
        f"CAST(concat('0x', substr(md5(concat('hll:', CAST(k AS VARCHAR)))"
        f", 1, {HLL_HASH_HEX})) AS BIGINT)"
    )

    def est(src: str, out: str) -> str:
        return f"""{out}_agg AS (
  SELECT count(*) AS n_ne, sum(power(2.0, -m_j)) AS s_ne FROM {src}
),
{out}_v AS (
  SELECT round(CASE WHEN {HLL_ALPHA * HLL_M * HLL_M} / (s_ne + ({HLL_M} - n_ne))
                         <= {2.5 * HLL_M} AND ({HLL_M} - n_ne) > 0
               THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - n_ne))
               ELSE {HLL_ALPHA * HLL_M * HLL_M} / (s_ne + ({HLL_M} - n_ne))
               END, 4) AS {out}
  FROM {out}_agg
)"""

    return f"""
WITH ev AS (
  SELECT {key} AS k, event_type FROM events
  WHERE event_type IN ('{type_a}', '{type_b}') AND {key} IS NOT NULL
),
sliced AS (
  SELECT event_type, {h} % {HLL_M} AS bucket,
         CASE WHEN CAST(floor({h} / {HLL_M}.0) AS BIGINT) = 0 THEN 47
              ELSE 47 - length(bin(CAST(floor({h} / {HLL_M}.0) AS BIGINT)))
         END AS r
  FROM ev
),
regs AS (SELECT event_type, bucket, max(r) AS m_j FROM sliced
         GROUP BY event_type, bucket),
sa AS (SELECT bucket, m_j FROM regs WHERE event_type = '{type_a}'),
sb AS (SELECT bucket, m_j FROM regs WHERE event_type = '{type_b}'),
su AS (SELECT bucket, max(m_j) AS m_j FROM regs GROUP BY bucket),
{est('sa', 'est_a')},
{est('sb', 'est_b')},
{est('su', 'est_union')},
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_intersection FROM (
    SELECT k FROM ev GROUP BY k HAVING count(DISTINCT event_type) = 2
  )
)
SELECT est_a, est_b, est_union,
       round(est_a + est_b - est_union, 4) AS est_intersection,
       exact_intersection
FROM est_a_v, est_b_v, est_union_v, ex
"""


def bloom_join_prune(
    spark: SparkSession, sf_dir: str, nation: int = 1
) -> DataFrame:
    """Bloom-PRUNED join audit — the runtime-row-filter technique
    measured rather than assumed: build the m={BLOOM_M}/k={BLOOM_K}
    filter over a FILTERED dimension's keys (customers of one nation),
    probe every order's custkey against it BEFORE the join, and verify
    exactly. At 100 TB this is the filter Spark's runtime bloom
    pushdown ships to the fact scan so non-matching rows die before the
    shuffle; the audit reports what that buys — rows pruned map-side —
    and what it costs — false positives that still reach the join and
    are discarded there. False negatives are impossible by construction
    (the membership op's test pins this), so correctness is never at
    stake, only shuffle volume. One broadcast of the bit set; the
    truth side is the exact broadcast semi-join.

    Output (single row, all BIGINT): orders probed, bloom passes, true
    matches, false positives, plus the pruned fraction in ppm."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey") == nation
    ).select(F.col("c_custkey").alias("k")).distinct()
    bits = cust.select(
        F.explode(
            F.array(
                *[(_hash52(F.col("k"), f"bf{i}:") % BLOOM_M)
                  for i in range(BLOOM_K)]
            )
        ).alias("bit")
    ).distinct()
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("probe_key")
    )
    pbits = orders.select(
        "o_orderkey",
        F.explode(
            F.array(
                *[(_hash52(F.col("probe_key"), f"bf{i}:") % BLOOM_M)
                  for i in range(BLOOM_K)]
            )
        ).alias("bit"),
    )
    passed = (
        pbits.join(F.broadcast(bits), "bit")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") == BLOOM_K)
        .select("o_orderkey")
    )
    true_match = orders.join(
        F.broadcast(cust.select(F.col("k").alias("probe_key"))),
        "probe_key", "left_semi",
    ).select("o_orderkey")
    n_orders = orders.count()
    n_pass = passed.count()
    n_true = true_match.count()
    # a Bloom filter admits every true key, so FP = passes - trues
    n_fp = n_pass - n_true
    pruned_ppm = ((n_orders - n_pass) * 1_000_000) // max(n_orders, 1)
    return spark.createDataFrame(
        [(n_orders, n_pass, n_true, n_fp, pruned_ppm)],
        "n_orders long, n_bloom_pass long, n_true_match long, "
        "n_false_positive long, pruned_ppm long",
    )


def bloom_join_prune_sql(nation: int = 1) -> str:
    """Mirror: identical md5-slice bit algebra over the filtered
    dimension keys and the order probes."""
    def h(i: int, expr: str) -> str:
        return (
            f"CAST(concat('0x', substr(md5(concat('bf{i}:',"
            f" CAST({expr} AS VARCHAR))), 1, {HLL_HASH_HEX})) AS BIGINT)"
            f" % {BLOOM_M}"
        )

    bit_union = "\nUNION ALL\n".join(
        f"SELECT {h(i, 'k')} AS bit FROM ks" for i in range(BLOOM_K)
    )
    pbit_union = "\nUNION ALL\n".join(
        f"SELECT o_orderkey, {h(i, 'probe_key')} AS bit FROM orders_p"
        for i in range(BLOOM_K)
    )
    return f"""
WITH ks AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_nationkey = {nation}
),
bits AS (SELECT DISTINCT bit FROM ({bit_union})),
orders_p AS (SELECT o_orderkey, o_custkey AS probe_key FROM orders),
pbits AS ({pbit_union}),
passed AS (
  SELECT o_orderkey FROM pbits JOIN bits USING (bit)
  GROUP BY o_orderkey HAVING count(*) = {BLOOM_K}
),
tm AS (
  SELECT o_orderkey FROM orders_p
  WHERE probe_key IN (SELECT k FROM ks)
),
agg AS (
  SELECT (SELECT count(*) FROM orders_p) AS n_orders,
         (SELECT count(*) FROM passed) AS n_pass,
         (SELECT count(*) FROM tm) AS n_true
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(n_pass AS BIGINT) AS n_bloom_pass,
       CAST(n_true AS BIGINT) AS n_true_match,
       CAST(n_pass - n_true AS BIGINT) AS n_false_positive,
       CAST(((n_orders - n_pass) * 1000000) // greatest(n_orders, 1)
            AS BIGINT) AS pruned_ppm
FROM agg
"""


def kmv_merge(spark: SparkSession, sf_dir: str, key: str = "user_id") -> DataFrame:
    """KMV MERGEABILITY proven as a checkable query — the third
    mergeable-sketch family (hll_merge: max-merge registers;
    countmin_merge: sum-merge counters; here: bottom-K of the UNION of
    two shards' bottom-K signatures == the whole-corpus bottom-K, a
    theorem because any hash in the whole-corpus bottom-K is in its own
    shard's bottom-K). Events split on event_id parity, one K={KMV_K}
    signature per slice, merged = bottom-K of the union, and the
    distinct-count estimate (K-1)/h_(K) per slice / merged / whole plus
    the exact count. A signature smaller than K stores the full hash
    set, so its estimate IS its size (no extrapolation from a
    non-saturated sketch). merge == whole ships in the output.

    Scale shape: each signature is a bottom-K TakeOrderedAndProject
    over the distinct keys — constant state, partition-mergeable, the
    shard-parallel distinct-count primitive."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col(key).isNotNull())  # the COUNT(DISTINCT) population
        .select(F.col(key).alias("k"), (F.col("event_id") % 2).alias("slc"))
    )

    def sig(keys: DataFrame) -> DataFrame:
        return (
            keys.distinct()
            .select(_hash52(F.col("k"), "kmvm:").alias("h"))
            .orderBy("h")
            .limit(KMV_K)
        )

    s0 = sig(ev.filter(F.col("slc") == 0).select("k"))
    s1 = sig(ev.filter(F.col("slc") == 1).select("k"))
    merged = (
        s0.unionByName(s1).distinct().orderBy("h").limit(KMV_K)
    )
    whole = sig(ev.select("k"))

    def est(df: DataFrame, name: str) -> DataFrame:
        stats = df.agg(
            F.count("*").alias("n"), F.max("h").alias("hk")
        )
        e = F.when(
            F.col("n") < KMV_K, F.col("n").cast("double")
        ).otherwise(
            F.round(
                F.lit(float(KMV_K - 1))
                / (F.col("hk").cast("double") / F.lit(float(1 << 52))),
                4,
            )
        )
        return stats.select(
            e.alias(f"est_{name}"),
            F.col("n").alias(f"n_{name}"),
            F.col("hk").alias(f"hk_{name}"),
        )

    exact = ev.select("k").distinct().agg(
        F.count("*").cast("long").alias("exact_distinct")
    )
    return (
        est(s0, "slice0").crossJoin(est(s1, "slice1"))
        .crossJoin(est(merged, "merged"))
        .crossJoin(est(whole, "whole"))
        .crossJoin(exact)
        .select(
            F.lit(KMV_K).alias("k"),
            "est_slice0", "est_slice1", "est_merged", "est_whole",
            "exact_distinct",
            (
                (F.col("n_merged") == F.col("n_whole"))
                & (F.col("hk_merged") == F.col("hk_whole"))
            ).alias("merge_matches_whole"),
        )
    )


def kmv_merge_sql(key: str = "user_id") -> str:
    h = (f"CAST(concat('0x', substr(md5(concat('kmvm:', "
         f"CAST(k AS VARCHAR))), 1, {HLL_HASH_HEX})) AS BIGINT)")

    def est(src: str, name: str) -> str:
        return f"""{name}_v AS (
  SELECT CASE WHEN count(*) < {KMV_K} THEN CAST(count(*) AS DOUBLE)
              ELSE round({KMV_K - 1}.0
                         / (CAST(max(h) AS DOUBLE) / {float(1 << 52)!r}), 4)
         END AS est_{name},
         count(*) AS n_{name}, max(h) AS hk_{name}
  FROM {src}
)"""

    return f"""
WITH ev AS (SELECT {key} AS k, event_id % 2 AS slc FROM events
            WHERE {key} IS NOT NULL),
s0 AS (SELECT {h} AS h FROM (SELECT DISTINCT k FROM ev WHERE slc = 0)
       ORDER BY h LIMIT {KMV_K}),
s1 AS (SELECT {h} AS h FROM (SELECT DISTINCT k FROM ev WHERE slc = 1)
       ORDER BY h LIMIT {KMV_K}),
merged AS (SELECT DISTINCT h FROM (SELECT h FROM s0 UNION ALL SELECT h FROM s1)
           ORDER BY h LIMIT {KMV_K}),
whole AS (SELECT {h} AS h FROM (SELECT DISTINCT k FROM ev)
          ORDER BY h LIMIT {KMV_K}),
{est('s0', 'slice0')},
{est('s1', 'slice1')},
{est('merged', 'merged')},
{est('whole', 'whole')},
ex AS (SELECT CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct FROM ev)
SELECT {KMV_K} AS k, est_slice0, est_slice1, est_merged, est_whole,
       exact_distinct,
       n_merged = n_whole AND hk_merged = hk_whole AS merge_matches_whole
FROM slice0_v, slice1_v, merged_v, whole_v, ex
"""
