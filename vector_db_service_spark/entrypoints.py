"""Central registry wiring operators to the driver contract
(__spark_entry__.py): every implemented operator from SURVEY.md §2 gets a
named (spark, sf_dir) -> DataFrame callable and, where SQL-expressible, a
DuckDB oracle string.

Column names are aliased identically on both sides — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from functools import partial

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from . import oracles
from .operators import catalog, relational
from .operators import knn as knn_ops
from .sources.tables import embedding_dim as tables_embedding_dim
from .sources.tables import load
from .sources.tables import row_count as tables_row_count

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_WORKER_IMPORTS_READY: set[str] = set()


def _ensure_worker_imports(spark: SparkSession) -> None:
    """Ship this package to Python workers via addPyFile. Pandas-UDF
    closures are pickled BY REFERENCE to `vector_db_service_spark.*`;
    when the harness owns the SparkSession (created before this package
    reached sys.path) and runs from another cwd, workers cannot import
    the module and every Arrow-batched query dies at unpickle. addPyFile
    is the standard post-start remedy: the zip lands on every current and
    future worker's sys.path. Memoized per application; a no-op
    thereafter."""
    import tempfile
    import zipfile
    from pathlib import Path

    sc = spark.sparkContext
    app = sc.applicationId
    if app in _WORKER_IMPORTS_READY:
        return
    pkg_root = Path(__file__).resolve().parent
    zpath = os.path.join(
        tempfile.gettempdir(), f"vdbs_pkg_{os.getuid()}_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for p in sorted(pkg_root.rglob("*.py")):
                z.write(p, arcname=str(p.relative_to(pkg_root.parent)))
    sc.addPyFile(zpath)
    _WORKER_IMPORTS_READY.add(app)


_DIM = 64  # driver embeddings.parquet dimension (TESTDATA.md)


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    def wrapped(spark: SparkSession, sf_dir: str, _fn: QueryFn = fn) -> DataFrame:
        _ensure_worker_imports(spark)
        return _fn(spark, sf_dir)

    QUERIES[name] = wrapped
    if oracle is not None:
        ORACLES[name] = oracle


# --- K1-K12 / I2 / T1-T5: flat k-NN under every metric -------------------
for _metric in ("cosine", "dot_product", "euclidean", "manhattan"):
    register(
        f"knn_flat_{_metric}",
        partial(lambda s, d, m: knn_ops.knn(s, d, query_id=0, k=10, metric=m), m=_metric),
        oracles.knn_sql(query_id=0, k=10, metric=_metric),
    )

# distance-ordered variants (K3/K5 raw distances)
for _metric in ("euclidean", "manhattan", "cosine"):
    register(
        f"knn_dist_{_metric}",
        partial(lambda s, d, m: knn_ops.knn_distance(s, d, query_id=0, k=10, metric=m), m=_metric),
        oracles.knn_distance_sql(query_id=0, k=10, metric=_metric),
    )

# query-level error swallow (vector_service.py:290-310): happy path is
# byte-identical to flat search, so the same oracle checks the wrapper
register(
    "knn_safe_flat",
    lambda s, d: knn_ops.knn_safe(s, d, query_id=0, k=10, metric="cosine"),
    oracles.knn_sql(query_id=0, k=10, metric="cosine"),
)

# library-scoped search (S3/S7 partition pruning + §2.7 step 1-3 semantics)
register(
    "knn_flat_cosine_library",
    lambda s, d: knn_ops.knn(s, d, query_id=0, k=10, metric="cosine", library=0),
    oracles.knn_sql(query_id=0, k=10, metric="cosine", library=0),
)

# flagship: hydrated search result (§2.7 full path, J1 inner-join hydration)
register(
    "knn_search_hydrated",
    lambda s, d: knn_ops.knn(s, d, query_id=0, k=10, metric="cosine", hydrate=True),
    oracles.knn_sql(query_id=0, k=10, metric="cosine", hydrate=True),
)

# metadata-prefiltered vector search (the filtered-ANN surface): restrict
# candidates by a document attribute via semi-join BEFORE scoring
register(
    "knn_prefiltered_lang",
    lambda s, d: knn_ops.knn_prefiltered(s, d, query_id=0, k=10,
                                         metric="cosine", lang="en"),
    f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.label, e.embedding FROM embeddings e
  WHERE EXISTS (SELECT 1 FROM documents d
                WHERE d.doc_id = e.vec_id AND d.lang = 'en')
)
SELECT vec_id, label, round({oracles.cosine_sql('cand.embedding', 'q.qv')}, 6) AS score
FROM cand, q
ORDER BY score DESC, vec_id
LIMIT 10
""",
)


# --- S1-S4 / P2-P5: scans, lookups, predicate filters ---------------------
register(
    "s1_point_lookup",
    lambda s, d: load(s, d, "documents").filter(F.col("doc_id") == 42)
    .select("doc_id", "text", "lang", "source", "n_chars"),
    "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = 42",
)
register(
    "s2_batch_lookup",
    lambda s, d: load(s, d, "embeddings")
    .filter(F.col("vec_id").isin([1, 5, 9, 13, 101]))
    .select("vec_id", "label"),
    "SELECT vec_id, label FROM embeddings WHERE vec_id IN (1, 5, 9, 13, 101)",
)
register(
    "s3_scan_by_library",
    lambda s, d: load(s, d, "embeddings").filter(F.col("label") == 3).select("vec_id", "label"),
    "SELECT vec_id, label FROM embeddings WHERE label = 3",
)
register(
    "p2_conjunctive_filter",
    lambda s, d: load(s, d, "events")
    .filter((F.col("event_type") == "purchase") & (F.col("value") > 100))
    .select("event_id", "user_id", F.round("value", 2).alias("value")),
    "SELECT event_id, user_id, round(value, 2) AS value FROM events "
    "WHERE event_type = 'purchase' AND value > 100",
)
register(
    "p3_dynamic_filter",
    lambda s, d: catalog.filter_by(load(s, d, "documents"), {"lang": "en", "source": "src7"})
    .select("doc_id", "lang", "source"),
    "SELECT doc_id, lang, source FROM documents WHERE lang = 'en' AND source = 'src7'",
)
register(
    "p3_json_filter",
    lambda s, d: catalog.filter_by_json(load(s, d, "events"), "props", {"$.k": "42"})
    .select("event_id", "user_id", "event_type", F.round("value", 2).alias("value")),
    # json_valid guard: Spark's get_json_object returns NULL on
    # malformed JSON where DuckDB's json_extract_string RAISES — at
    # 100 TB malformed props rows exist and must filter out, not crash
    # the oracle (tests/test_badjson_parity.py; vacuous on the
    # all-valid gate corpora). Known engine-level leniency difference,
    # documented there: Spark additionally accepts single-QUOTED JSON.
    "SELECT event_id, user_id, event_type, round(value, 2) AS value FROM events "
    "WHERE CASE WHEN json_valid(props) "
    "THEN json_extract_string(props, '$.k') END = '42'",
)
register(
    "p5_create_or_get",
    lambda s, d: catalog.create_or_get_documents(load(s, d, "documents")),
    """
WITH t AS (
  SELECT doc_id, source,
         array_to_string((string_split(lower(text), ' '))[1:3], ' ') AS title
  FROM documents
)
SELECT doc_id, source, title,
       min(doc_id) OVER (PARTITION BY source, title) AS resolved_id,
       doc_id = min(doc_id) OVER (PARTITION BY source, title) AS created
FROM t
""",
)
register(
    "p4_exists_probe",
    lambda s, d: catalog.exists(load(s, d, "documents"), F.col("doc_id") == 7),
    "SELECT count(*) > 0 AS found FROM (SELECT 1 FROM documents WHERE doc_id = 7 LIMIT 1)",
)

# --- S10-S13: mutations as post-state transforms ---------------------------
def _upsert_poststate(s: SparkSession, d: str) -> DataFrame:
    emb = load(s, d, "embeddings")
    updates = (
        emb.filter(F.col("vec_id") < 5)
        .withColumn("embedding", F.transform("embedding", lambda x: x * F.lit(2.0)))
    )
    after = catalog.upsert_vectors(emb, updates)
    from .functions import similarity as sim
    return (
        after.filter(F.col("vec_id") < 10)
        .select("vec_id", "label", F.round(sim.norm(F.col("embedding")), 6).alias("vnorm"))
    )

register(
    "s10_vector_upsert",
    _upsert_poststate,
    f"""
WITH updates AS (
  SELECT vec_id, list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS embedding, label
  FROM embeddings WHERE vec_id < 5
),
merged AS (
  SELECT vec_id, embedding, label, 0 AS _v FROM embeddings
  UNION ALL
  SELECT vec_id, embedding, label, 1 AS _v FROM updates
),
latest AS (
  SELECT vec_id, embedding, label FROM merged
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY _v DESC) = 1
)
SELECT vec_id, label, round({oracles.norm_sql('embedding')}, 6) AS vnorm
FROM latest WHERE vec_id < 10
""",
)
def _cdc_merge_poststate(s: SparkSession, d: str) -> DataFrame:
    """Deterministic CDC batch over the embeddings snapshot: update
    vec_id<20 (doubled vectors, seq 2 beats an earlier seq-1 update),
    delete 20<=vec_id<30, insert 5 fresh ids — then one-pass MERGE and
    post-state accounting."""
    emb = load(s, d, "embeddings")
    upd1 = emb.filter(F.col("vec_id") < 20).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
        "label", F.lit("U").alias("op"), F.lit(1).cast("long").alias("seq"),
    )
    upd2 = emb.filter(F.col("vec_id") < 20).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
        "label", F.lit("U").alias("op"), F.lit(2).cast("long").alias("seq"),
    )
    dels = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 30)).select(
        "vec_id", "embedding", "label",
        F.lit("D").alias("op"), F.lit(2).cast("long").alias("seq"),
    )
    ins = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding",
        F.lit(77).cast("int").alias("label"),
        F.lit("I").alias("op"), F.lit(1).cast("long").alias("seq"),
    )
    cdc = upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
    after = catalog.apply_cdc(emb, cdc)
    from .functions import similarity as sim
    return after.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.sum(sim.norm(F.col("embedding"))), 4).alias("sum_norm"),
    )


register(
    # lakehouse CDC MERGE: I/U/D batch applied in one keyed window pass;
    # latest-seq wins, deletes drop — the MERGE INTO source plan
    "s10_cdc_merge",
    _cdc_merge_poststate,
    f"""
WITH cdc AS (
  SELECT vec_id, list_transform(embedding, x -> x * CAST(1.5 AS DOUBLE)) AS embedding,
         label, 'U' AS op, 1 AS seq FROM embeddings WHERE vec_id < 20
  UNION ALL
  SELECT vec_id, list_transform(embedding, x -> x * CAST(2.0 AS DOUBLE)) AS embedding,
         label, 'U' AS op, 2 AS seq FROM embeddings WHERE vec_id < 20
  UNION ALL
  SELECT vec_id, embedding, label, 'D' AS op, 2 AS seq
  FROM embeddings WHERE vec_id >= 20 AND vec_id < 30
  UNION ALL
  SELECT vec_id + 2000000 AS vec_id, embedding, 77 AS label, 'I' AS op, 1 AS seq
  FROM embeddings WHERE vec_id < 5
),
merged AS (
  SELECT vec_id, embedding, label, 'U' AS op, 0 AS seq FROM embeddings
  UNION ALL
  SELECT vec_id, embedding, label, op, seq FROM cdc
),
latest AS (
  SELECT vec_id, embedding, label, op FROM merged
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY seq DESC, op DESC) = 1
)
SELECT label, count(*) AS n_vectors,
       round(sum({oracles.norm_sql('embedding')}), 4) AS sum_norm
FROM latest WHERE op != 'D'
GROUP BY label
""",
)
register(
    "s11_delete_by_predicate",
    lambda s, d: catalog.delete_where(load(s, d, "embeddings"), F.col("label") == 0)
    .groupBy("label").agg(F.count("*").alias("n_vectors")),
    "SELECT label, count(*) AS n_vectors FROM embeddings WHERE NOT (label = 0) GROUP BY label",
)

def _cascade_poststate(s: SparkSession, d: str) -> DataFrame:
    emb_after, docs_after = catalog.cascade_delete_library(
        load(s, d, "embeddings"), load(s, d, "documents"), library=2
    )
    return (
        emb_after.agg(F.count("*").alias("n")).withColumn("tbl", F.lit("embeddings"))
        .unionByName(docs_after.agg(F.count("*").alias("n")).withColumn("tbl", F.lit("documents")))
    )

register(
    "s12_cascade_delete",
    _cascade_poststate,
    """
SELECT count(*) AS n, 'embeddings' AS tbl FROM embeddings WHERE label != 2
UNION ALL
SELECT count(*) AS n, 'documents' AS tbl FROM documents
WHERE doc_id NOT IN (SELECT vec_id FROM embeddings WHERE label = 2)
""",
)
register(
    "s13_partial_update",
    lambda s, d: catalog.update_where(
        load(s, d, "documents"), F.col("source") == "src1", {"lang": F.lit("xx")}
    ).groupBy("lang").agg(F.count("*").alias("n_docs")),
    "SELECT CASE WHEN source = 'src1' THEN 'xx' ELSE lang END AS lang, "
    "count(*) AS n_docs FROM documents GROUP BY 1",
)

# --- J2/J3: semi/anti joins -------------------------------------------------
register(
    "j2_semi_join",
    lambda s, d: load(s, d, "embeddings").join(
        load(s, d, "documents").filter(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id")),
        "vec_id",
        "left_semi",
    ).select("vec_id", "label"),
    "SELECT vec_id, label FROM embeddings e WHERE EXISTS "
    "(SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id AND d.lang = 'en')",
)
register(
    "j3_orphan_anti_join",
    lambda s, d: catalog.orphan_vectors(
        load(s, d, "embeddings"),
        load(s, d, "documents").filter(F.col("doc_id") < 400),
    ).select("vec_id", "label"),
    "SELECT vec_id, label FROM embeddings e WHERE NOT EXISTS "
    "(SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id AND d.doc_id < 400)",
)

# --- A1-A7: stats aggregates ------------------------------------------------
register(
    "a1_count_by_library",
    lambda s, d: catalog.count_by_library(load(s, d, "embeddings")),
    "SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label",
)
register(
    "a2_chunk_stats",
    lambda s, d: catalog.chunk_stats(load(s, d, "documents")),
    """
SELECT count(*) AS total_docs,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 4) AS avg_chars,
       CAST(sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
FROM documents
""",
)
register(
    "a5_vector_stats",
    lambda s, d: catalog.vector_stats(load(s, d, "embeddings")),
    """
SELECT count(*) AS total_vectors,
       min(len(embedding)) AS min_dim,
       max(len(embedding)) AS max_dim,
       count(DISTINCT label) AS n_libraries
FROM embeddings
""",
)
register(
    "a6_memory_stats",
    lambda s, d: catalog.memory_stats(load(s, d, "embeddings")),
    "SELECT CAST(sum(len(embedding)) * 4 AS BIGINT) AS vector_bytes,"
    " count(*) AS n_vectors FROM embeddings",
)
register(
    "a7_dim_minmax",
    lambda s, d: catalog.dim_minmax(load(s, d, "embeddings")),
    """
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim, unnest(embedding) AS x
  FROM embeddings
)
SELECT dim, round(min(CAST(x AS DOUBLE)), 6) AS dim_min,
       round(max(CAST(x AS DOUBLE)), 6) AS dim_max
FROM ex GROUP BY dim
""",
)

# --- relational surface (joins, rollup, pivot, windows, JSON, sessions) ----
register(
    "rel_pricing_summary",
    relational.pricing_summary,
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
register(
    "rel_revenue_by_nation",
    relational.revenue_by_nation,
    """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
register(
    "rel_top_customers",
    relational.top_customers,
    """
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 4) AS total_spent, count(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_name, total_spent, n_orders
FROM spend JOIN customer ON o_custkey = c_custkey
QUALIFY row_number() OVER (ORDER BY total_spent DESC, c_custkey) <= 10
""",
)
register(
    "rel_order_priority_rollup",
    relational.order_priority_rollup,
    """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
register(
    "rel_status_pivot",
    relational.status_pivot,
    """
SELECT o_orderpriority,
       count(*) FILTER (o_orderstatus = 'F') AS n_f,
       count(*) FILTER (o_orderstatus = 'O') AS n_o,
       count(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
""",
)
register(
    "rel_docs_top_by_length",
    relational.docs_top_by_length,
    """
SELECT lang, doc_id, n_chars,
       row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk
FROM documents
QUALIFY rnk <= 3
""",
)
register(
    "rel_events_json_stats",
    relational.events_json_stats,
    # json_valid guard mirrors get_json_object's NULL-on-malformed
    # (see p3_json_filter's note; tests/test_badjson_parity.py)
    """
SELECT event_type, count(*) AS n_events,
       round(avg(CAST(CASE WHEN json_valid(props)
                      THEN json_extract_string(props, '$.k') END AS INT)), 4)
         AS avg_k,
       max(CAST(CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS INT)) AS max_k,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type
""",
)
register(
    "rel_events_hourly",
    relational.events_hourly,
    """
SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_id,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1
""",
)
register(
    "rel_value_deciles",
    relational.value_deciles,
    """
WITH d AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id)
           AS decile
  FROM events
)
SELECT event_type, decile, count(*) AS n_events,
       round(min(value), 4) AS lo, round(max(value), 4) AS hi
FROM d GROUP BY event_type, decile
""",
)
register(
    "rel_orders_grouping_sets",
    relational.orders_grouping_sets,
    """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS INT) AS g_pri,
       CAST(grouping(o_orderstatus) AS INT) AS g_st,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
""",
)
register(
    # continuous-aggregate cascade: daily served from hourly partials;
    # oracle aggregates the raw table -> proves re-aggregation lossless
    "rel_events_daily_rollup",
    relational.events_daily_from_hourly,
    """
SELECT CAST(floor(floor(epoch_us(ts) / 3600000000) / 24) AS BIGINT) AS day_id,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       round(sum(value), 4) / count(*) AS avg_value
FROM events GROUP BY 1, 2
""",
)
register(
    # effective-dated temporal join (r14b): clicks joined to the
    # purchase-derived running tier ACTIVE at each click's timestamp —
    # facts x SCD dimension without a non-equi range join (interleaved
    # running sum on the (ts, event_id) total order)
    "rel_temporal_tier_join",
    relational.temporal_tier_join,
    """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
tiered AS (
  SELECT *, sum(is_p) OVER (PARTITION BY user_id
                            ORDER BY ts_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS tier
  FROM ev
)
SELECT CAST(tier AS BIGINT) AS tier,
       CAST(count(*) AS BIGINT) AS n_clicks,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM tiered WHERE is_p = 0
GROUP BY tier
""",
)
register(
    # co-located bucketed join (r15): orders and customer written
    # CLUSTERED+SORTED by the join key, so the fact-dim join runs
    # exchange-free (no shuffle of either side — the plan pin asserts
    # no Exchange feeds the join); integer-cents revenue so the
    # layout-independent oracle hashes exactly
    "rel_bucketed_join_audit",
    lambda s, d: relational.bucketed_join_audit(s, d, n_buckets=8),
    """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment
""",
)
register(
    # k-anonymity audit (r15): per quasi-identifier group (nation x
    # market segment), size and at-risk verdict under k=5 — the
    # privacy gate before a dataset release; one map-side-combined
    # aggregation, output bounded by the QI domain
    "rel_kanonymity_audit",
    lambda s, d: relational.kanonymity_audit(s, d, k=5),
    """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       (count(*) < 5) AS at_risk
FROM customer GROUP BY c_nationkey, c_mktsegment
""",
)
register(
    # first-order journey transition matrix (r14b): each event paired
    # with its user's previous event type (lag window, explicit _start
    # state), counted corpus-wide — the Markov view funnels flatten
    "rel_event_transitions",
    relational.event_transitions,
    """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
  WHERE user_id IS NOT NULL
),
lagged AS (
  SELECT coalesce(lag(event_type)
                    OVER (PARTITION BY user_id ORDER BY ts_us, event_id),
                  '_start') AS prev_type,
         event_type AS next_type
  FROM ev
)
SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_transitions
FROM lagged GROUP BY prev_type, next_type
""",
)
register(
    # SCD2 dimension build (r14b): per user, consecutive same-type
    # events collapse into versioned validity intervals
    # (gaps-and-islands: lag flag -> running-sum island -> per-island
    # aggregate -> lead for the exclusive valid_to; -1 = current row)
    "rel_scd2_user_history",
    relational.scd2_user_history,
    """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w != event_type
            THEN 1 ELSE 0 END AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
isl AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
versions AS (
  SELECT user_id, island, min(event_type) AS event_type,
         min(ts_us) AS valid_from_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM isl GROUP BY user_id, island
)
SELECT user_id, CAST(island AS INT) AS version_no, event_type,
       valid_from_us,
       CAST(COALESCE(lead(valid_from_us)
                       OVER (PARTITION BY user_id ORDER BY island), -1)
            AS BIGINT) AS valid_to_us,
       n_events
FROM versions
""",
)
register(
    # declarative DQ audit (r14b): expectations over the warehouse —
    # nulls, ranges, PK uniqueness, cross-table referential integrity;
    # every rule one aggregate or one broadcast anti-join
    "rel_data_quality_audit",
    relational.data_quality_audit,
    f"""
SELECT 'fk_orders_customer' AS rule,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_checked,
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT) AS n_failed
UNION ALL
SELECT 'fk_lineitem_orders',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT)
UNION ALL
SELECT 'nn_customer_name',
       CAST((SELECT count(*) FROM customer) AS BIGINT),
       CAST((SELECT count(*) FROM customer WHERE c_name IS NULL) AS BIGINT)
UNION ALL
SELECT 'range_order_totalprice_positive',
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM orders WHERE NOT (o_totalprice > 0))
            AS BIGINT)
UNION ALL
SELECT 'range_lineitem_quantity_1_50',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem
             WHERE NOT (l_quantity BETWEEN 1 AND 50)) AS BIGINT)
UNION ALL
SELECT 'unique_pk_orders',
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
            AS BIGINT)
UNION ALL
SELECT 'embedding_dim_uniform',
       CAST((SELECT count(*) FROM embeddings) AS BIGINT),
       CAST((SELECT count(*) FROM embeddings
             WHERE len(embedding) != {_DIM}) AS BIGINT)
""",
)
register(
    "rel_sessionize_events",
    relational.sessionize_events,
    """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
              OR ts_us - lag(ts_us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessioned AS (
  SELECT user_id, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sessioned GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
       max(n_events) AS max_session_events
FROM per_session GROUP BY user_id
""",
)


# --- I3-I6: LSH index (reference single-bit-table semantics) ---------------
from .operators import grid as grid_ops  # noqa: E402
from .operators import lsh as lsh_ops  # noqa: E402

_PLANES = lsh_ops.hyperplanes(_DIM)

register(
    "lsh_signatures",
    lambda s, d: lsh_ops.signatures(load(s, d, "embeddings"), _PLANES),
    oracles.lsh_signatures_sql(_PLANES),
)
register(
    "lsh_bucket_stats",
    lambda s, d: lsh_ops.bucket_stats(load(s, d, "embeddings"), _PLANES),
    oracles.lsh_bucket_stats_sql(_PLANES),
)
register(
    "knn_lsh_cosine",
    lambda s, d: lsh_ops.search(s, d, query_id=0, k=10, metric="cosine"),
    oracles.lsh_search_sql(_PLANES, query_id=0, k=10, metric="cosine"),
)


def _lsh_multiprobe_sql(
    query_id: int = 0, k: int = 10, dim: int = _DIM, band_bits: int = 2
) -> str:
    """Mirror of lsh_ops.multiprobe_search: banded keys for corpus AND
    query from the same seed-42 algebra, candidates = any band with
    bit_count(xor) <= 1, exact cosine re-rank."""
    from .operators.lsh import NUM_HASHES, SEED, hyperplanes

    planes = hyperplanes(dim, NUM_HASHES, SEED)
    cos = oracles.METRIC_SQL["cosine"]("e.embedding", "q.qv")
    return f"""
WITH banded AS MATERIALIZED (
{oracles.banded_cte_sql(planes, band_bits)}
),
qb AS (SELECT band_idx, band_key FROM banded WHERE vec_id = {query_id}),
cand AS (
  SELECT DISTINCT b.vec_id
  FROM banded b JOIN qb ON qb.band_idx = b.band_idx
   AND bit_count(xor(CAST(b.band_key AS BIGINT),
                     CAST(qb.band_key AS BIGINT))) <= 1
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id})
SELECT e.vec_id, e.label, round({cos}, 6) AS score
FROM embeddings e JOIN cand c ON c.vec_id = e.vec_id, q
QUALIFY row_number() OVER (ORDER BY score DESC, e.vec_id) <= {k}
"""


register(
    # LSH multi-probe (r14b): probe every bucket within Hamming-1 of
    # the query's band keys — the recall-vs-tables trade (Lv et al.
    # VLDB'07); predicate evaluated inside the scan, no join/shuffle
    "knn_lsh_multiprobe",
    lambda s, d: lsh_ops.multiprobe_search(s, d, query_id=0, k=10),
    _lsh_multiprobe_sql(query_id=0, k=10),
)

# --- I7-I10: Grid index -----------------------------------------------------
def _grid_cells(s: SparkSession, d: str) -> DataFrame:
    emb = load(s, d, "embeddings")
    mins, maxs = grid_ops.bounds_cached(s, d)
    return grid_ops.build_index(emb, mins, maxs)


def _grid_stats(s: SparkSession, d: str) -> DataFrame:
    emb = load(s, d, "embeddings")
    mins, maxs = grid_ops.bounds_cached(s, d)
    return grid_ops.cell_stats(emb, mins, maxs)


def _grid_stats_by_library(s: SparkSession, d: str) -> DataFrame:
    emb = load(s, d, "embeddings")
    mins, maxs = grid_ops.bounds_cached(s, d)
    idx = grid_ops.build_index(emb, mins, maxs)
    per_cell = idx.groupBy("label", "cell_key").agg(F.count("*").alias("cell_n"))
    return per_cell.groupBy("label").agg(
        F.count("*").alias("non_empty_cells"),
        F.round(F.avg("cell_n"), 4).alias("avg_cell_size"),
        F.max("cell_n").alias("max_cell_size"),
        F.sum("cell_n").alias("n_vectors"),
    )


register(
    "grid_stats_by_library",
    _grid_stats_by_library,
    f"""
WITH keys AS ({oracles.grid_cells_sql()}),
per_cell AS (
  SELECT label, cell_key, count(*) AS cell_n FROM keys GROUP BY label, cell_key
)
SELECT label, count(*) AS non_empty_cells,
       round(avg(cell_n), 4) AS avg_cell_size,
       max(cell_n) AS max_cell_size,
       CAST(sum(cell_n) AS BIGINT) AS n_vectors
FROM per_cell GROUP BY label
""",
)
register("grid_cells", _grid_cells, oracles.grid_cells_sql())
register("grid_cell_stats", _grid_stats, oracles.grid_cell_stats_sql())
register(
    "knn_grid_euclidean",
    lambda s, d: grid_ops.search(s, d, query_id=0, k=10, metric="euclidean"),
    oracles.grid_search_sql(query_id=0, k=10, metric="euclidean"),
)


# --- training-data pipeline: dedup / ANN / text analysis / multimodal ------
from . import oracles_pipeline as opl  # noqa: E402
from .operators import ann, dedup, multimodal, textops  # noqa: E402

register(
    "dedup_exact_summary",
    lambda s, d: dedup.exact_dedup_summary(load(s, d, "documents")),
    opl.exact_dedup_summary_sql(),
)
register(
    "dedup_exact_keep_first",
    lambda s, d: dedup.exact_dedup_keep_first(load(s, d, "documents")),
    opl.exact_dedup_keep_first_sql(),
)
register(
    "dedup_minhash_signatures",
    lambda s, d: dedup.minhash_signatures(load(s, d, "documents")),
    opl.minhash_signatures_sql(),
)
register(
    "dedup_minhash_pairs",
    lambda s, d: dedup.minhash_near_dups(load(s, d, "documents"), threshold=0.2),
    opl.minhash_near_dups_sql(threshold=0.2),
)
register(
    "dedup_ngram_jaccard_topk",
    lambda s, d: dedup.ngram_jaccard_topk(load(s, d, "documents"), k=20),
    opl.ngram_jaccard_topk_sql(k=20),
)
register(
    "dedup_simhash_fingerprints",
    lambda s, d: dedup.simhash_fingerprints(load(s, d, "documents")),
    opl.simhash_fingerprints_sql(),
)
register(
    "dedup_simhash_pairs",
    lambda s, d: dedup.simhash_near_dups(load(s, d, "documents"), max_hamming=3),
    opl.simhash_near_dups_sql(max_hamming=3),
)
register(
    # simhash radius-tuning curve (r15): cumulative pair volume per
    # hamming threshold — the knee a dedup operator reads before
    # picking the radius (the simhash counterpart of the MinHash
    # S-curve); lossless at every threshold <= 3 by pigeonhole,
    # re-proven by the quadratic oracle per radius
    "dedup_simhash_threshold_curve",
    lambda s, d: dedup.simhash_threshold_curve(load(s, d, "documents"),
                                               max_hamming=3),
    opl.simhash_threshold_curve_sql(max_hamming=3),
)
register(
    # pointer-doubling variant (O(log diameter) rounds — the 100 TB
    # path); the oracle is the 10-round plain propagation, equal
    # whenever component diameter <= 10 (equality with the plain
    # variant is pinned in tests)
    # the component labeling is materialized ONCE per corpus to a temp
    # parquet (NOT a checkpoint — block-manager cleanup between timed
    # queries evicted cached checkpoints; see near_dup_labels_cached)
    # and SHARED with dedup_keep_canonical — one graph pass, two readers
    "dedup_components",
    lambda s, d: dedup.near_dup_components_fast(
        load(s, d, "documents"), labels=dedup.near_dup_labels_cached(s, d)
    ),
    opl.near_dup_components_sql(),
)
register(
    # deduped-corpus materialization: one canonical (= component-min)
    # survivor per near-dup cluster, per-source removal accounting;
    # shares the memoized labeling with dedup_components
    "dedup_keep_canonical",
    lambda s, d: dedup.near_dup_keep_canonical(
        load(s, d, "documents"), labels=dedup.near_dup_labels_cached(s, d)
    ),
    opl.near_dup_keep_canonical_sql(),
)
register(
    # dedup x mixture interaction (r15): how deduping shifts each
    # (lang, source) domain's token share — exact integer ppm on both
    # sides; shares the memoized component labeling, corpus scans once
    "pipeline_dedup_mixture_shift",
    lambda s, d: dedup.dedup_mixture_shift(
        load(s, d, "documents"), labels=dedup.near_dup_labels_cached(s, d)
    ),
    opl.dedup_mixture_shift_sql(),
)
register(
    # iterative BPE trainer (r14): n_merges rounds of pair-count ->
    # argmax -> merge over the distinct-word symbol table — the actual
    # tokenizer-induction loop; the corpus is scanned once, each round
    # rides the Zipf-reduced word table. Exact unrolled-CTE oracle.
    "text_bpe_train_merges",
    lambda s, d: textops.bpe_train_merges(load(s, d, "documents"), n_merges=5),
    opl.bpe_train_merges_sql(n_merges=5),
)
def _rake_sql(k: int = 3) -> str:
    """Mirror of textops.rake_keyphrases: same gaps-and-islands phrase
    split, same integer micro-unit degree/freq scores, same
    (score desc, phrase asc, island asc) rank cut."""
    from .functions.text import STOPWORDS

    stops = ", ".join(f"'{s}'" for s in STOPWORDS["en"])
    return f"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos,
         regexp_replace(arr[i], '[^a-z]', '', 'g') AS w
  FROM (
    SELECT doc_id, arr,
           unnest(generate_series(1, len(arr))) AS i
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS arr
          FROM documents)
  )
),
flagged AS (
  SELECT *,
         (w = '' OR w IN ({stops})) AS stop
  FROM toks
),
isl AS (
  SELECT *, sum(CASE WHEN stop THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
words AS (
  SELECT doc_id, island, pos, w FROM isl WHERE NOT stop
),
plen AS (
  SELECT doc_id, island, count(*) AS phrase_len
  FROM words GROUP BY doc_id, island
),
occ AS (
  SELECT w.*, p.phrase_len
  FROM words w JOIN plen p ON p.doc_id = w.doc_id AND p.island = w.island
),
wstats AS (
  SELECT doc_id, w,
         (sum(phrase_len) * 1000000) // count(*) AS wscore_us
  FROM occ GROUP BY doc_id, w
),
phrases AS (
  SELECT o.doc_id, o.island,
         string_agg(o.w, ' ' ORDER BY o.pos) AS phrase,
         CAST(sum(s.wscore_us) AS BIGINT) AS score_us
  FROM occ o JOIN wstats s ON s.doc_id = o.doc_id AND s.w = o.w
  GROUP BY o.doc_id, o.island
)
SELECT doc_id, phrase, score_us,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_us DESC, phrase, island)
            AS INT) AS rnk
FROM phrases
QUALIFY rnk <= {k}
"""


register(
    # RAKE keyphrases (r14b): gaps-and-islands phrase split on
    # stopword/punct boundaries, integer micro-unit degree/freq word
    # scores, per-doc top-k — everything doc-local, one skinny exchange
    "text_rake_keyphrases",
    lambda s, d: textops.rake_keyphrases(load(s, d, "documents"), k=3),
    _rake_sql(k=3),
)
register(
    # BPE encode (r14b): apply the trained merges to the Zipf-reduced
    # word table and report the tokens-per-word distribution — the
    # tokenizer-budget measurement (how much of the corpus compresses
    # under the learned merges). Same unrolled-CTE chain, aggregated
    # over the FINAL symbol table.
    "text_bpe_encode",
    lambda s, d: textops.bpe_encode_stats(load(s, d, "documents"), n_merges=5),
    opl.bpe_encode_stats_sql(n_merges=5),
)
register(
    # tokenizer fertility by language (r15): tokens-per-word under the
    # trained merges, per lang in exact integer ppm — the multilingual
    # tokenizer-equity metric a mixture/pricing decision reads
    "text_bpe_fertility_by_lang",
    lambda s, d: textops.bpe_fertility_by_lang(load(s, d, "documents"),
                                               n_merges=5),
    opl.bpe_fertility_by_lang_sql(n_merges=5),
)
register(
    # corpus-side BPE encode (r14 verdict "missing #4"): the trained
    # word -> n_tokens map (Zipf-reduced final symbol table) broadcast-
    # joined against the tokenized corpus, per-document token budgets
    # out — the corpus is scanned once and never re-merged per symbol
    "text_bpe_encode_corpus",
    lambda s, d: textops.bpe_encode_corpus(load(s, d, "documents"), n_merges=5),
    opl.bpe_encode_corpus_sql(n_merges=5),
)
register(
    # leakage-safe train/val split (r14): assignment keyed on the
    # near-dup COMPONENT label, so duplicate clusters move together and
    # no near-dup pair crosses the boundary; the zero-leak claim is
    # COUNTED independently on both sides (banded graph vs quadratic
    # pair CTE), never asserted. Shares the memoized labeling.
    "pipeline_leakage_safe_split",
    lambda s, d: dedup.leakage_safe_split(
        load(s, d, "documents"), labels=dedup.near_dup_labels_cached(s, d)
    ),
    opl.leakage_safe_split_sql(),
)
register(
    # span-level cross-doc duplication (hash-window analog of
    # suffix-array substring dedup): per-doc duplicated-span fraction
    "dedup_substring_spans",
    lambda s, d: dedup.substring_span_stats(load(s, d, "documents")),
    opl.substring_span_stats_sql(),
)
register(
    # CCNet-style paragraph-level exact dedup: keep-first per paragraph
    # hash corpus-wide, per-source removal accounting + survivor xor
    # signature (new r8)
    "dedup_paragraphs",
    lambda s, d: dedup.paragraph_dedup(load(s, d, "documents")),
    opl.paragraph_dedup_sql(),
)
register(
    # MOSS winnowing fingerprints: window-min of 3-gram hashes, per-doc
    # fingerprint density + cross-doc shared-fingerprint fraction
    # (new r8)
    "dedup_winnowing_fingerprints",
    lambda s, d: dedup.winnowing_fingerprints(load(s, d, "documents")),
    opl.winnowing_fingerprints_sql(),
)
register(
    # Bayardo AllPairs prefix-filtered TF-IDF cosine join over shingle
    # hashes; the naive quadratic oracle proves the prefix + positional
    # pruning lossless at the registered tau = 4/5 = 0.8 (new r8)
    "dedup_allpairs_cosine",
    # materialize-once: the recall audit joins this same pair table as
    # its ground truth (compute on miss, so each surface stays honest)
    lambda s, d: dedup.allpairs_cached(s, d),
    opl.allpairs_cosine_sql(),
)
register(
    # MinHash-LSH S-curve tuning table: collision probability per
    # (bands, rows) split of the 16 perms over a similarity grid, in
    # integer micros (new r8)
    "dedup_lsh_tuning_curve",
    lambda s, d: dedup.lsh_tuning_curve(s),
    opl.lsh_tuning_curve_sql(),
)
register(
    # candidate-quality evaluation: banded-jaccard MinHash pipeline
    # scored against the deterministic corpus-wide AllPairs ground
    # truth restricted to a frozen 40% shard; the truth table is the
    # SHARED materialized pair frame (allpairs_cached), never a
    # recompute (new r8, re-scoped r9)
    "dedup_minhash_recall_vs_exact",
    lambda s, d: dedup.minhash_vs_exact_recall(
        load(s, d, "documents"), truth_pairs=dedup.allpairs_cached(s, d)
    ),
    opl.minhash_vs_exact_recall_sql(),
)
def _containment_sql(threshold: float = 0.5) -> str:
    band_match = " OR ".join(
        f"a.band{b} = b.band{b}" for b in range(opl.MINHASH_BANDS)
    )
    return f"""
WITH {opl._sig_cte()},
cand AS (
  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, a.sh AS sh_1, b.sh AS sh_2
  FROM banded a JOIN banded b ON a.doc_id < b.doc_id AND ({band_match})
),
meas AS (
  SELECT doc_id_1, doc_id_2,
         round(CAST(len(list_intersect(sh_1, sh_2)) AS DOUBLE)
               / CAST(len(sh_1) AS DOUBLE), 6) AS containment_1_in_2,
         round(CAST(len(list_intersect(sh_1, sh_2)) AS DOUBLE)
               / CAST(len(sh_2) AS DOUBLE), 6) AS containment_2_in_1
  FROM cand
)
SELECT DISTINCT doc_id_1, doc_id_2, containment_1_in_2, containment_2_in_1
FROM meas
WHERE containment_1_in_2 >= {threshold!r} OR containment_2_in_1 >= {threshold!r}
"""


register(
    "dedup_containment_pairs",
    lambda s, d: dedup.containment_pairs(load(s, d, "documents"), threshold=0.5),
    _containment_sql(threshold=0.5),
)
register(
    "dedup_embedding_pairs",
    # threshold 0.3: the synthetic embeddings are near-orthogonal (max
    # within-label cosine ~0.48 at sf0.01), so 0.8 would make the check
    # vacuous — 0.3 yields ~100 pairs at sf0.01
    lambda s, d: dedup.embedding_near_dups(
        load(s, d, "embeddings"), threshold=0.3,
        n_rows=tables_row_count(d, "embeddings"),
        dim=tables_embedding_dim(d),
    ),
    opl.embedding_near_dups_sql(threshold=0.3, dim=_DIM),
)
register(
    "ann_brute_force_topk",
    lambda s, d: ann.brute_force_topk(s, d, query_ids=[0, 1, 2, 3, 4], k=5),
    opl.brute_force_topk_sql(query_ids=[0, 1, 2, 3, 4], k=5),
)
register(
    "ann_ivf_topk",
    lambda s, d: ann.ivf_topk(s, d, query_id=0, k=10, nprobe=1),
    opl.ivf_topk_sql(query_id=0, k=10, nprobe=1),
)
def _knn_join_sql(m: int = 3, dim: int = _DIM, band_bits: int = 2) -> str:
    """Mirror of the BANDED operators/ann.py::knn_join — identical
    seed-42 sign-band candidate join, exact cosine re-rank per source.
    `dim` must equal the corpus dimension (the operator infers it; this
    static SQL mirrors the driver data's _DIM)."""
    from .operators.lsh import N_SIGN_BANDS, SEED, hyperplanes

    # N_SIGN_BANDS * band_bits, NOT the static NUM_HASHES: the engine
    # builds 5 bands of band_bits planes each, and the two layouts only
    # coincide at band_bits=2 (5*2 == NUM_HASHES). The scale-parity
    # sweep caught pipeline_hard_negatives diverging at sf0.1, where
    # auto_band_bits resolves the GLOBAL (n_labels=1) banding to 4 —
    # a width this builder previously could not express.
    planes = hyperplanes(dim, N_SIGN_BANDS * band_bits, SEED)
    cos = oracles.METRIC_SQL["cosine"]("a.embedding", "b.embedding")
    return f"""
WITH banded AS MATERIALIZED (
{oracles.banded_cte_sql(planes, band_bits)}
),
cand AS (
  SELECT DISTINCT a.label, a.vec_id AS src, b.vec_id AS dst,
         round({cos}, 6) AS score
  FROM banded a JOIN banded b
    ON a.label = b.label AND a.band_idx = b.band_idx
   AND a.band_key = b.band_key AND a.vec_id != b.vec_id
)
SELECT label, src, dst, score,
       row_number() OVER (PARTITION BY src
                          ORDER BY score DESC, dst) AS rnk
FROM cand
QUALIFY rnk <= {m}
"""


register(
    "ann_knn_join",
    lambda s, d: ann.knn_join(s, d, m=3),
    _knn_join_sql(m=3),
)


def _hard_negatives_sql(dim: int = _DIM, band_bits: int = 2) -> str:
    """Mirror of ann.hard_negative_mining: the knn_join banding WITHOUT
    the label scope, label-mismatch filter, top-1 per anchor on the
    (score desc, negative_id asc) total order."""
    from .operators.lsh import N_SIGN_BANDS, SEED, hyperplanes

    # N_SIGN_BANDS * band_bits, NOT the static NUM_HASHES: the engine
    # builds 5 bands of band_bits planes each, and the two layouts only
    # coincide at band_bits=2 (5*2 == NUM_HASHES). The scale-parity
    # sweep caught pipeline_hard_negatives diverging at sf0.1, where
    # auto_band_bits resolves the GLOBAL (n_labels=1) banding to 4 —
    # a width this builder previously could not express.
    planes = hyperplanes(dim, N_SIGN_BANDS * band_bits, SEED)
    cos = oracles.METRIC_SQL["cosine"]("a.embedding", "b.embedding")
    return f"""
WITH banded AS MATERIALIZED (
{oracles.banded_cte_sql(planes, band_bits)}
),
cand AS (
  SELECT DISTINCT a.vec_id AS anchor_id, a.label AS anchor_label,
         b.vec_id AS negative_id, b.label AS neg_label,
         round({cos}, 6) AS score
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.label != b.label
)
SELECT anchor_id, anchor_label, negative_id, neg_label, score FROM cand
QUALIFY row_number() OVER (PARTITION BY anchor_id
                           ORDER BY score DESC, negative_id) <= 1
"""


register(
    # hard-negative mining (r14): per anchor, the most-similar vector
    # with a DIFFERENT label — contrastive training's highest-value
    # pair; global (not label-scoped) banded candidates, map-side
    # partial top-1, no window exchange. Exact oracle.
    "pipeline_hard_negatives",
    lambda s, d: ann.hard_negative_mining(s, d),
    _hard_negatives_sql(),
)


def _mutual_knn_sql(m: int = 3) -> str:
    """Reciprocal-pair wrapper around the banded knn_join oracle: keep
    (a, b) iff each is in the other's top-m; emit once (src < dst) with
    the exactly-commutative cosine score."""
    return f"""
WITH kj AS MATERIALIZED ({_knn_join_sql(m=m)})
SELECT f.label, f.src AS vec_id_a, f.dst AS vec_id_b, f.score
FROM kj f JOIN kj r
  ON f.label = r.label AND f.src = r.dst AND f.dst = r.src
WHERE f.src < f.dst
"""


register(
    # reciprocal k-NN: the dataset-pruning symmetric-neighbor filter
    # (mutuality screens hub vectors); linear edge-list self-join on the
    # banded knn_join, never a pair blow-up
    "ann_mutual_knn_pairs",
    lambda s, d: ann.mutual_knn_pairs(s, d, m=3),
    _mutual_knn_sql(m=3),
)


def _mutual_components_sql(m: int = 3, rounds: int = 40) -> str:
    """Component histogram over the mutual-kNN graph: plain min-label
    propagation unrolled `rounds` CTE stages (reach = rounds; measured
    mutual-graph diameters 18-35 at the test tiers — the Spark side is
    exact-fixed-point, so a deeper future corpus fails loudly as a
    parity mismatch). Every CTE MATERIALIZED: DuckDB inlines per
    reference and each stage reads the previous one twice."""
    stages = []
    for r in range(rounds):
        prev, cur = f"l{r}", f"l{r + 1}"
        stages.append(f"""
{cur} AS MATERIALIZED (
  SELECT node, min(comp) AS comp FROM (
    SELECT node, comp FROM {prev}
    UNION ALL
    SELECT e.src AS node, l.comp FROM edges e JOIN {prev} l ON l.node = e.dst
  ) GROUP BY node
)""")
    chain = ",".join(stages)
    return f"""
WITH kj AS MATERIALIZED ({_knn_join_sql(m=m)}),
mut AS MATERIALIZED (
  SELECT f.src AS a, f.dst AS b
  FROM kj f JOIN kj r ON f.label = r.label AND f.src = r.dst AND f.dst = r.src
  WHERE f.src < f.dst
),
edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM mut UNION ALL SELECT b, a FROM mut
),
l0 AS MATERIALIZED (SELECT vec_id AS node, vec_id AS comp FROM embeddings),
{chain}
SELECT comp, CAST(count(*) AS BIGINT) AS n_vectors
FROM l{rounds} GROUP BY comp
"""


register(
    # cluster view of reciprocal-neighbor dedup: connected components
    # over the mutual-kNN graph (exact pointer-doubling with fixed-point
    # early exit; singletons included)
    "ann_mutual_knn_components",
    lambda s, d: ann.mutual_knn_components(s, d, m=3),
    _mutual_components_sql(m=3),
)


def _knn_link_prediction_sql(m: int = 3, top: int = 50) -> str:
    """Mirror of ann.knn_link_prediction: the mutual-pair CTE, per-node
    Adamic-Adar weights quantized once (round(1000/ln(deg)), deg >= 2
    by construction), the wedge join, the existing-edge anti-join, and
    the (aa_mln desc, n_common desc, a, b) cut."""
    return f"""
WITH mut AS MATERIALIZED (
  SELECT label, vec_id_a AS a, vec_id_b AS b FROM ({_mutual_knn_sql(m=m)})
),
und AS MATERIALIZED (
  SELECT label, a AS src, b AS dst FROM mut
  UNION ALL SELECT label, b, a FROM mut
),
deg AS MATERIALIZED (
  SELECT label, src AS w,
         CAST(round(1000.0 / ln(CAST(count(*) AS DOUBLE))) AS BIGINT)
           AS aa_mln_w
  FROM und GROUP BY label, src
  HAVING count(*) >= 2
),
wedges AS (
  SELECT x.label, x.src AS w, x.dst AS a, y.dst AS b
  FROM (SELECT label, dst AS src, src AS dst FROM und) x
  JOIN und y ON y.label = x.label AND y.src = x.src
  WHERE x.dst < y.dst
),
cand AS (
  SELECT w2.label, w2.w, w2.a, w2.b FROM wedges w2
  ANTI JOIN mut e ON e.label = w2.label AND e.a = w2.a AND e.b = w2.b
)
SELECT c.label, c.a, c.b,
       CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(d.aa_mln_w) AS BIGINT) AS aa_mln
FROM cand c JOIN deg d ON d.label = c.label AND d.w = c.w
GROUP BY c.label, c.a, c.b
ORDER BY aa_mln DESC, n_common DESC, a, b
LIMIT {top}
"""


register(
    # link prediction over the mutual-kNN graph (r15): common-neighbor
    # + Adamic-Adar scores for non-adjacent wedge pairs — the
    # borderline near-dup review queue the reciprocity filter dropped;
    # all-integer scoring, wedge join bounded by n*m^2
    "ann_link_prediction",
    lambda s, d: ann.knn_link_prediction(s, d, m=3, top=50),
    _knn_link_prediction_sql(m=3, top=50),
)


def _nn_descent_chain_sql(m: int = 3, rounds: int = 1) -> str:
    """The NN-descent CTE chain (g0 .. g{rounds}) WITHOUT the `WITH`
    keyword or a final select, so callers can extend the chain with
    their own stages (`_nn_descent_recall_sql` appends the truth-side
    CTEs) instead of string-slicing the finished query (r14 advisor:
    the rindex surgery was brittle — the marker string also appears
    inside each stage's inner subquery)."""
    cos = oracles.METRIC_SQL["cosine"]("a.embedding", "b.embedding")
    parts = [f"""
g0 AS MATERIALIZED (
  SELECT label, src, dst, score FROM ({_knn_join_sql(m=m)})
)"""]
    for r in range(rounds):
        parts.append(f"""
und{r} AS MATERIALIZED (
  SELECT DISTINCT label, src, dst FROM (
    SELECT label, src, dst FROM g{r}
    UNION ALL
    SELECT label, dst AS src, src AS dst FROM g{r}
  )
),
nbr2{r} AS MATERIALIZED (
  SELECT DISTINCT x.label, x.src, y.dst
  FROM und{r} x JOIN und{r} y ON x.label = y.label AND x.dst = y.src
  WHERE x.src != y.dst
),
fresh{r} AS (
  SELECT n.label, n.src, n.dst FROM nbr2{r} n
  ANTI JOIN g{r} k ON n.label = k.label AND n.src = k.src AND n.dst = k.dst
),
scored{r} AS (
  SELECT f.label, f.src, f.dst, round({cos}, 6) AS score
  FROM fresh{r} f
  JOIN embeddings a ON a.vec_id = f.src
  JOIN embeddings b ON b.vec_id = f.dst
),
g{r + 1} AS MATERIALIZED (
  SELECT label, src, dst, score FROM (
    SELECT label, src, dst, score,
           row_number() OVER (PARTITION BY src
                              ORDER BY score DESC, dst) AS rk
    FROM (SELECT * FROM g{r} UNION ALL SELECT * FROM scored{r})
  ) WHERE rk <= {m}
)""")
    return ",".join(parts)


def _nn_descent_sql(m: int = 3, rounds: int = 1) -> str:
    """Mirror of ann.nn_descent_refine: per round — undirect the
    current graph, expand to neighbors-of-neighbors, exact-score only
    NEW candidates, keep top-m per node among old ∪ new on the same
    (score desc, dst asc) total order; unrolled `rounds` times."""
    return f"""
WITH {_nn_descent_chain_sql(m=m, rounds=rounds)}
SELECT label, src, dst, score,
       row_number() OVER (PARTITION BY src
                          ORDER BY score DESC, dst) AS rnk
FROM g{rounds}
QUALIFY rnk <= {m}
"""


register(
    # dominant principal direction (r14b): integer-exact uncentered
    # Gram matrix (distributed, dim^2 partials per task) + fixed-round
    # power iteration with sign-split floor division — bit-identical
    # cross-engine; the train-once collect is dim^2 rows, never data
    "emb_pca_power_iteration",
    lambda s, d: ann.pca_power_iteration(s, d),
    ann.pca_power_iteration_sql(dim=_DIM),
)
register(
    # top-2 principal directions (r15): integer-exact Hotelling-style
    # deflation BY PROJECTION — the second iterate re-orthogonalizes
    # against v1 after every rescale (milli-unit ratio, sign-split
    # floor division); the oracle unrolls BOTH chains including every
    # projection step. The 2-D corpus projection / whitening plane.
    "emb_pca_top2",
    lambda s, d: ann.pca_top2(s, d),
    ann.pca_top2_sql(dim=_DIM),
)
register(
    # NN-descent (r14b): one neighbor-of-neighbor refinement round over
    # the banded kNN graph — the distributed kNN-graph construction
    # loop; candidates linear in n*m^2, new pairs exact-scored once,
    # map-side partial top-m (no window exchange)
    "ann_nn_descent",
    lambda s, d: ann.nn_descent_refine(s, d, m=3),
    _nn_descent_sql(m=3),
)


def _nn_descent_recall_sql(m: int = 3, anchors: int = 300) -> str:
    """Mirror of ann.nn_descent_recall: exact within-label top-m truth
    over a fixed-count md5-hash-ordered anchor sample, semi-join hit
    counts for the base graph and both refinement rounds, integer
    micro-unit recall. The 2-round chain CTEs (g0, g1, g2) come from
    `_nn_descent_chain_sql` directly — no string surgery."""
    cos = oracles.METRIC_SQL["cosine"]("a.embedding", "b.embedding")
    return f"""
WITH {_nn_descent_chain_sql(m=m, rounds=2)},
anchors AS MATERIALIZED (
  SELECT vec_id FROM embeddings
  QUALIFY row_number() OVER (
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= {anchors}
),
truth AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst, round({cos}, 6) AS score
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id != b.vec_id
    WHERE a.vec_id IN (SELECT vec_id FROM anchors)
  )
  QUALIFY row_number() OVER (PARTITION BY src
                             ORDER BY score DESC, dst) <= {m}
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM truth),
h0 AS (
  SELECT CAST(count(*) AS BIGINT) AS hits
  FROM g0 k SEMI JOIN truth t ON t.src = k.src AND t.dst = k.dst
),
h1 AS (
  SELECT CAST(count(*) AS BIGINT) AS hits
  FROM g1 k SEMI JOIN truth t ON t.src = k.src AND t.dst = k.dst
),
h2 AS (
  SELECT CAST(count(*) AS BIGINT) AS hits
  FROM g2 k SEMI JOIN truth t ON t.src = k.src AND t.dst = k.dst
)
SELECT 'banded_base' AS stage, h0.hits, tot.total,
       CAST((h0.hits * 1000000) // greatest(tot.total, 1) AS BIGINT)
         AS recall_micro
FROM h0, tot
UNION ALL
SELECT 'nn_descent_r1', h1.hits, tot.total,
       CAST((h1.hits * 1000000) // greatest(tot.total, 1) AS BIGINT)
FROM h1, tot
UNION ALL
SELECT 'nn_descent_r2', h2.hits, tot.total,
       CAST((h2.hits * 1000000) // greatest(tot.total, 1) AS BIGINT)
FROM h2, tot
"""


register(
    # the NN-descent VALUE made driver-visible (r14b; truth side
    # re-based r15): exact recall of the base vs refined graph against
    # the true within-label top-m over a FIXED-COUNT md5-hash-ordered
    # anchor sample — O(anchors * n) at any scale, where the earlier
    # 1-in-5 fraction stayed quadratic by construction
    "ann_nn_descent_recall",
    lambda s, d: ann.nn_descent_recall(s, d, m=3),
    _nn_descent_recall_sql(m=3),
)


def _knn_classify_sql(n_queries: int = 25, k: int = 5) -> str:
    """Mirror of ann.knn_classify: per-query exact top-k neighbors
    (self excluded, (score desc, vec_id) order), integer label votes,
    (n_votes desc, label asc) argmax, correctness against the stored
    label."""
    cos = oracles.METRIC_SQL["cosine"]("e.embedding", "q.qv")
    ids = ", ".join(str(i) for i in range(n_queries))
    return f"""
WITH qs AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS true_label
  FROM embeddings WHERE vec_id IN ({ids})
),
top AS MATERIALIZED (
  SELECT query_id, vec_id, label FROM (
    SELECT q.query_id, e.vec_id, e.label,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({cos}, 6) DESC, e.vec_id) AS rn
    FROM embeddings e, qs q WHERE e.vec_id != q.query_id
  ) WHERE rn <= {k}
),
votes AS (
  SELECT query_id, label, CAST(count(*) AS BIGINT) AS n_votes
  FROM top WHERE label IS NOT NULL GROUP BY query_id, label
),
pred AS (
  SELECT query_id, label AS pred_label, n_votes FROM (
    SELECT query_id, label, n_votes,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY n_votes DESC, label) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT q.query_id, q.true_label, p.pred_label, p.n_votes,
       (p.pred_label = q.true_label) AS correct
FROM qs q JOIN pred p USING (query_id)
"""


register(
    # k-NN label classification (r15): majority vote among the k
    # nearest neighbors (self excluded) vs the stored label — the
    # taxonomy-coherence check; integer votes, total-order argmax,
    # map-side partial top-k for the neighbor scan
    "ann_knn_classify",
    lambda s, d: ann.knn_classify(s, d, k=5),
    _knn_classify_sql(n_queries=25, k=5),
)


def _ood_zscore_sql(top: int = 25) -> str:
    """Mirror of ann.ood_zscore: the same two integer passes with
    sign-split floor means and floor variances."""
    return f"""
WITH cells AS MATERIALIZED (
  SELECT label, vec_id, i - 1 AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS x_us
  FROM (
    SELECT label, vec_id, embedding,
           unnest(generate_series(1, len(embedding))) AS i
    FROM embeddings
  )
),
stats1 AS MATERIALIZED (
  SELECT label, dim, count(*) AS n,
         CASE WHEN sum(x_us) >= 0
              THEN sum(x_us) // count(*)
              ELSE -((-sum(x_us)) // count(*)) END AS mean_us
  FROM cells GROUP BY label, dim
),
dev AS MATERIALIZED (
  SELECT c.label, c.vec_id, c.dim, c.x_us - s.mean_us AS d, s.n
  FROM cells c JOIN stats1 s ON s.label = c.label AND s.dim = c.dim
),
vr AS MATERIALIZED (
  SELECT label, dim, sum(d * d) // max(n) AS var_us2
  FROM dev GROUP BY label, dim
),
scored AS (
  SELECT d2.vec_id, d2.label,
         CAST(sum((d2.d * d2.d * 1000) // greatest(v.var_us2, 1)) AS BIGINT)
           AS ood_score
  FROM dev d2 JOIN vr v ON v.label = d2.label AND v.dim = d2.dim
  GROUP BY d2.vec_id, d2.label
)
SELECT vec_id, label, ood_score FROM scored
QUALIFY row_number() OVER (ORDER BY ood_score DESC, vec_id) <= {top}
"""


register(
    # OOD z-score screen (r14b): per-label diagonal-Gaussian deviation
    # in exact integer micro-units — the distribution-shift complement
    # of the norm-outlier screen; two explode+groupBy passes, broadcast
    # stats, TakeOrderedAndProject cut
    "emb_ood_zscore",
    lambda s, d: ann.ood_zscore(s, d, top=25),
    _ood_zscore_sql(top=25),
)


def _graph_beam_sql(
    query_id: int = 0, k: int = 10, beam: int = 8, rounds: int = 2,
    sample_mod: int = 16, m: int = 3, served: bool = False,
) -> str:
    """Mirror of ann.graph_beam_search: the identical walk unrolled —
    entry-layer scores, per-round frontier cut + neighbor expansion,
    final top-k over the visited set. With `served`, the walk runs in
    the MAINTAINED-index world (streaming.beam_search_served): corpus =
    the post-mutation state, edges = the banded knn_join algebra over
    it — exactly what the maintenance stream's store holds (pinned
    equal in tests and by the stream_knn_graph_maintenance oracle)."""
    stages = []
    for r in range(rounds):
        stages.append(f"""
f{r} AS MATERIALIZED (
  SELECT vec_id, label, score FROM v{r}
  QUALIFY row_number() OVER (ORDER BY score DESC, vec_id) <= {beam}
),
v{r + 1} AS MATERIALIZED (
  SELECT DISTINCT s.vec_id, s.label, s.score FROM (
    SELECT vec_id, label, score FROM v{r}
    UNION ALL
    SELECT sa.vec_id, sa.label, sa.score
    FROM f{r} f JOIN und u ON u.src = f.vec_id
    JOIN scored_all sa ON sa.vec_id = u.dst
  ) s
)""")
    chain = ",".join(stages)
    cos = oracles.METRIC_SQL["cosine"]("e.embedding", "q.qv")
    if served:
        src = "post"
        pre = """post AS MATERIALIZED (
  SELECT vec_id, label,
         CASE WHEN label IN (1, 2) AND vec_id % 7 = 3
              THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS embedding
  FROM embeddings
),
"""
        kj = _knn_join_post_body(m=m)
    else:
        src = "embeddings"
        pre = ""
        kj = _knn_join_sql(m=m)
    return f"""
WITH {pre}q AS (SELECT embedding AS qv FROM {src} WHERE vec_id = {query_id}),
scored_all AS MATERIALIZED (
  SELECT e.vec_id, e.label, round({cos}, 6) AS score FROM {src} e, q
),
base_kj AS MATERIALIZED (
  SELECT src, dst FROM ({kj})
),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM base_kj UNION ALL SELECT dst, src FROM base_kj
  )
),
v0 AS MATERIALIZED (
  SELECT vec_id, label, score FROM scored_all
  WHERE vec_id % {sample_mod} = 0
),{chain}
SELECT vec_id, label, score FROM v{rounds}
QUALIFY row_number() OVER (ORDER BY score DESC, vec_id) <= {k}
"""


register(
    # graph-navigated beam search (r14b): HNSW-family serving shape —
    # sampled entry layer + rounds of kNN-graph descent, O(n/sample +
    # rounds*beam*m) scored vectors instead of a flat scan; the oracle
    # replays the identical walk, pinning the whole trajectory
    "ann_graph_beam_search",
    lambda s, d: ann.graph_beam_search(s, d, query_id=0, k=10),
    _graph_beam_sql(query_id=0, k=10),
)


def _mutual_triangles_sql(m: int = 3) -> str:
    """Mirror of ann.mutual_knn_triangles: the mutual-pair CTE, the
    oriented a<b<c two-hop join with the closing-edge semi-join, and
    integer wedge counts from undirected degrees."""
    return f"""
WITH mut AS MATERIALIZED ({_mutual_knn_sql(m=m)}),
e AS MATERIALIZED (
  SELECT label, vec_id_a AS a, vec_id_b AS b FROM mut
),
tri AS (
  SELECT e1.label, CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1
  JOIN e e2 ON e1.label = e2.label AND e1.b = e2.a
  WHERE EXISTS (
    SELECT 1 FROM e e3
    WHERE e3.label = e1.label AND e3.a = e1.a AND e3.b = e2.b
  )
  GROUP BY e1.label
),
und AS (
  SELECT label, a AS node FROM e UNION ALL SELECT label, b FROM e
),
deg AS (
  SELECT label, node, count(*) AS deg FROM und GROUP BY label, node
),
wed AS (
  SELECT label, CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg GROUP BY label
),
edg AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_edges FROM e GROUP BY label
)
SELECT edg.label, edg.n_edges,
       COALESCE(wed.n_wedges, 0) AS n_wedges,
       COALESCE(tri.n_triangles, 0) AS n_triangles
FROM edg
LEFT JOIN wed ON wed.label = edg.label
LEFT JOIN tri ON tri.label = edg.label
"""


register(
    # triangle census of the mutual-kNN graph (r14b): local clustering
    # of the embedding manifold — oriented a<b<c two-hop join + closing
    # semi-join, integer wedge counts; no stage touches embeddings
    "ann_knn_triangles",
    lambda s, d: ann.mutual_knn_triangles(s, d, m=3),
    _mutual_triangles_sql(m=3),
)


def _mutual_pagerank_sql(m: int = 3, rounds: int = 3, top: int = 25) -> str:
    """Fixed-round integer-micro-unit PageRank over the mutual-kNN
    graph, unrolled as CTE stages — floor division of positives and
    BIGINT sums make every stage bit-identical to the Spark side."""
    stages = []
    for r in range(rounds):
        prev, cur = f"p{r}", f"p{r + 1}"
        stages.append(f"""
{cur} AS MATERIALIZED (
  SELECT d.src AS node,
         CAST(150000 + COALESCE(s.total, 0) AS BIGINT) AS pr
  FROM deg d LEFT JOIN (
    SELECT e.dst AS node,
           CAST(SUM((p.pr * 85) // (g.deg * 100)) AS BIGINT) AS total
    FROM edges e
    JOIN {prev} p ON p.node = e.src
    JOIN deg g ON g.src = e.src
    GROUP BY e.dst
  ) s ON s.node = d.src
)""")
    chain = ",".join(stages)
    return f"""
WITH kj AS MATERIALIZED ({_knn_join_sql(m=m)}),
mut AS MATERIALIZED (
  SELECT f.src AS a, f.dst AS b
  FROM kj f JOIN kj r ON f.label = r.label AND f.src = r.dst AND f.dst = r.src
  WHERE f.src < f.dst
),
edges AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM mut UNION ALL SELECT b, a FROM mut
),
deg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src
),
p0 AS MATERIALIZED (
  SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg
),
{chain}
SELECT node AS vec_id, pr AS rank_us FROM p{rounds}
ORDER BY pr DESC, node LIMIT {top}
"""


register(
    # graph-centrality representative selection (r14): fixed-round
    # integer-exact PageRank over the mutual-kNN graph — the coreset /
    # cluster-representative ranking signal; sparse power-iteration
    # shape (linear edge joins, one (node, pr) row per graph node)
    "ann_knn_pagerank",
    lambda s, d: ann.mutual_knn_pagerank(s, d, m=3, rounds=3, top=25),
    _mutual_pagerank_sql(m=3, rounds=3, top=25),
)
register(
    # sign-binarized Hamming ANN (r14): 32x-compressed sign-bit index
    # (dim/8 bytes per vector — at 100 TB the binary index fits where
    # the floats don't), XOR+bit_count candidate scan cut at `rerank`,
    # exact cosine re-rank of the tiny survivor set — the classic
    # binary-quantization two-stage serving path. One codegen'd scan +
    # TakeOrderedAndProject; exact two-stage oracle.
    "ann_binary_hamming_topk",
    lambda s, d: ann.binary_hamming_topk(s, d, query_id=0, k=10, rerank=50),
    oracles.binary_hamming_topk_sql(query_id=0, k=10, rerank=50),
)
register(
    # radius search: data-dependent result SIZE (the recall-complete
    # dual of the k-bounded reference search) — one codegen'd scan +
    # filter, zero shuffles
    "knn_range_search",
    lambda s, d: knn_ops.range_search(s, d, query_id=0, min_score=0.2),
    oracles.range_search_sql(query_id=0, min_score=0.2),
)
# Skew-salted variant: hot buckets split over 4 sub-keys
# (SKEW_SALT_THRESHOLD remediation as code). hot_bucket_min is set low
# enough that salting actually engages at test scale; the pair set is
# provably identical, so the UNSALTED oracle checks it exactly.
register(
    "ann_knn_join_salted",
    lambda s, d: ann.knn_join(s, d, m=3, salt=4, hot_bucket_min=20),
    _knn_join_sql(m=3),
)
def _band_skew_sql(dim: int = _DIM, band_bits: int = 2,
                   threshold: float = 50.0) -> str:
    """Mirror of operators/ann.py::band_skew_report over the identical
    seed-42 banded keys."""
    from .operators.lsh import N_SIGN_BANDS, SEED, hyperplanes

    # N_SIGN_BANDS * band_bits, NOT the static NUM_HASHES: the engine
    # builds 5 bands of band_bits planes each, and the two layouts only
    # coincide at band_bits=2 (5*2 == NUM_HASHES). The scale-parity
    # sweep caught pipeline_hard_negatives diverging at sf0.1, where
    # auto_band_bits resolves the GLOBAL (n_labels=1) banding to 4 —
    # a width this builder previously could not express.
    planes = hyperplanes(dim, N_SIGN_BANDS * band_bits, SEED)
    return f"""
WITH banded AS MATERIALIZED (
{oracles.banded_cte_sql(planes, band_bits)}
),
per_bucket AS (
  SELECT band_idx, label, band_key, count(*) AS n
  FROM banded GROUP BY band_idx, label, band_key
)
SELECT band_idx, count(*) AS n_buckets,
       CAST(sum(n) AS BIGINT) AS n_rows,
       round(CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS avg_bucket,
       max(n) AS max_bucket,
       round(CAST(max(n) AS DOUBLE)
             / (CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 4) AS skew,
       CAST(max(n) AS DOUBLE)
         / (CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)) > {threshold!r}
         AS needs_salting
FROM per_bucket GROUP BY band_idx
"""


register(
    # skew probe for the banded pair joins (SKEW_SALT_THRESHOLD
    # operating rule documented in operators/ann.py)
    "ann_band_skew_report",
    lambda s, d: ann.band_skew_report(s, d),
    _band_skew_sql(),
)
register(
    "ann_blocked_pair_recall",
    lambda s, d: ann.blocked_pair_recall(s, d, threshold=0.3),
    opl.blocked_pair_recall_sql(threshold=0.3, dim=_DIM),
)
register(
    "ann_scalar_quantize",
    lambda s, d: ann.scalar_quantize(s, d),
    """
WITH ex AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
b AS (
  SELECT i, min(x) AS mn,
         CASE WHEN max(x) - min(x) = 0 THEN 1 ELSE max(x) - min(x) END AS rng
  FROM ex GROUP BY i
),
n AS (
  SELECT e.vec_id, e.label, e.i, (e.x - b.mn) / b.rng AS nx,
         CAST(floor(((e.x - b.mn) / b.rng) * 255 + 0.5) AS BIGINT) AS c
  FROM ex e JOIN b USING (i)
)
SELECT vec_id, label,
       max(CASE WHEN i = 1 THEN c END) AS c0,
       max(CASE WHEN i = 2 THEN c END) AS c1,
       round(sum((nx - c / 255.0) * (nx - c / 255.0)) / count(*), 9) AS mse_norm
FROM n GROUP BY vec_id, label
""",
)
register(
    "ann_index_recall_report",
    lambda s, d: ann.index_recall_report(s, d, k=10, nprobe=2),
    opl.index_recall_report_sql(k=10, nprobe=2, dim=_DIM),
)
register(
    # Matryoshka adaptive retrieval: prefix-truncated (16/32 of 64 dims)
    # cosine top-k vs the full-dimension top-k, recall@k per query
    "ann_matryoshka_recall",
    lambda s, d: ann.matryoshka_recall(s, d),
    opl.matryoshka_recall_sql(),
)
register(
    "text_token_stats",
    lambda s, d: textops.token_stats(load(s, d, "documents")),
    opl.token_stats_sql(),
)
register(
    # benchmark-decontamination hygiene pass: 5-gram overlap of every
    # training doc against the held-out slice's gram set (broadcast)
    "text_decontamination",
    lambda s, d: textops.decontamination(load(s, d, "documents")),
    opl.decontamination_sql(),
)
register(
    # Gopher-style within-doc repetition: dup-gram and top-gram
    # fractions per n-gram size, long format
    "text_repetition_scores",
    lambda s, d: textops.repetition_scores(load(s, d, "documents")),
    opl.repetition_scores_sql(),
)
register(
    # stacked Gopher quality rules with per-rule flags + conjunction
    "text_gopher_filter",
    lambda s, d: textops.gopher_filter(load(s, d, "documents")),
    opl.gopher_filter_sql(),
)
register(
    # sqrt-temperature domain-mixture sampling weights over
    # (lang, source); integer-exact cross-group math
    "text_mixture_weights",
    lambda s, d: textops.mixture_weights(load(s, d, "documents")),
    opl.mixture_weights_sql(),
)
register(
    # frozen train/val/test split assignment: md5(doc_id) buckets so
    # docs never migrate between splits; per-split/lang accounting
    "pipeline_train_val_split",
    lambda s, d: textops.train_val_split(load(s, d, "documents")),
    opl.train_val_split_sql(),
)
register(
    # C4-style banned-termlist hygiene pass: per-doc blocked-token
    # fraction (integer-exact keep verdict) + md5 of the redacted text
    "text_blocklist_filter",
    lambda s, d: textops.blocklist_filter(load(s, d, "documents")),
    opl.blocklist_filter_sql(),
)
register(
    # CCNet-style unigram LM quality score: corpus-fit unigram model,
    # per-doc mean log-prob in integer millinats, head/middle/tail
    # perplexity buckets decided by integer comparison
    "text_unigram_logprob",
    lambda s, d: textops.unigram_logprob(load(s, d, "documents")),
    opl.unigram_logprob_sql(),
)
register(
    # Zipf rank-frequency corpus audit: top-k terms with the integer
    # zipf product and ppm share, plus vocab/hapax Heaps'-law constants
    # (new r8)
    "text_zipf_audit",
    lambda s, d: textops.zipf_audit(load(s, d, "documents")),
    opl.zipf_audit_sql(),
)
register(
    # Heaps'-law vocabulary growth: first-appearance inversion makes
    # the 10-prefix curve ONE scan + a |vocab| shuffle (new r8)
    "text_heaps_curve",
    lambda s, d: textops.heaps_curve(load(s, d, "documents")),
    opl.heaps_curve_sql(),
)
register(
    # per-doc Unicode script profile (Latin/Cyrillic/Greek/CJK/astral/
    # marks/digits/space/other code-point counts + dominant script):
    # one codegen'd regex projection, no shuffle (new r9)
    "text_script_profile",
    lambda s, d: textops.script_profile(load(s, d, "documents")),
    opl.script_profile_sql(),
)
register(
    # PII detect/redact hygiene pass: email/phone/card-candidate counts,
    # Luhn-validated card count, md5 of the redacted text — one JVM
    # regex projection, deterministic injected PII (new r9)
    "text_pii_scrub",
    lambda s, d: textops.pii_scrub(load(s, d, "documents")),
    opl.pii_scrub_sql(),
)
register(
    # content-addressed per-shard dataset card: counts + an
    # order-independent xor content signature per (source, lang)
    "pipeline_dataset_manifest",
    lambda s, d: textops.dataset_manifest(load(s, d, "documents")),
    opl.dataset_manifest_sql(),
)
register(
    # DSIR-style data selection: per-doc log importance ratio between a
    # target-slice unigram model and the general corpus model
    "text_dsir_importance",
    lambda s, d: textops.dsir_importance(load(s, d, "documents")),
    opl.dsir_importance_sql(),
)
register(
    # CCNet-style perplexity-bucket resampling: deterministic md5-draw
    # acceptance at per-bucket ppm rates, per-bucket accounting
    "pipeline_quality_resample",
    lambda s, d: textops.quality_resample(load(s, d, "documents")),
    opl.quality_resample_sql(),
)
register(
    # priority sampling (Duffield/Lund/Thorup): exactly-k weighted
    # sample, inclusion odds ~ token count, deterministic md5 draw.
    # priority = (w * 2^32) / (h+1) is IEEE mul+div only — exact on
    # both engines, so the double column ships UNROUNDED.
    "pipeline_weighted_sample",
    lambda s, d: textops.weighted_sample(load(s, d, "documents")),
    """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS weight_tokens,
       CAST(len(string_split(text, ' ')) AS DOUBLE) * 4294967296.0
         / CAST(CAST(('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1 AS DOUBLE)
         AS priority
FROM documents
ORDER BY priority DESC, doc_id ASC
LIMIT 25
""",
)
register(
    # epoch-wise shuffle (r14b): reproducible per-epoch permutation as
    # a SORT KEY (md5(epoch:doc_id)) — no permuted copy materialized;
    # first-n positions per epoch emitted
    "pipeline_epoch_shuffle",
    lambda s, d: textops.epoch_shuffle(load(s, d, "documents")),
    """
SELECT epoch, position, doc_id FROM (
  SELECT 1 AS epoch, doc_id,
         CAST(row_number() OVER (
           ORDER BY md5('1:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS INT) AS position
  FROM documents
  UNION ALL
  SELECT 2, doc_id,
         CAST(row_number() OVER (
           ORDER BY md5('2:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS INT)
  FROM documents
)
WHERE position <= 20
""",
)
register(
    # GPT-style concat-and-chunk sequence packing, per source shard:
    # deterministic md5 order, straddling docs counted, fill rates
    "pipeline_sequence_packing",
    lambda s, d: textops.sequence_packing(load(s, d, "documents")),
    textops.sequence_packing_sql(),
)
# ingest chunking (document -> sentence_number'd chunks, the step the
# reference's create_document_with_chunks consumes pre-split)
register(
    "text_chunk_documents",
    lambda s, d: textops.chunk_documents(load(s, d, "documents")),
    textops.chunk_documents_sql(),
)
register(
    "text_bpe_token_estimate",
    lambda s, d: textops.bpe_token_estimate(load(s, d, "documents")),
    f"""
SELECT doc_id,
       len({opl.TOKS}) AS n_ws_tokens,
       CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
         list_transform({opl.TOKS}, t -> CAST(ceil(length(t) / 4.0) AS BIGINT)))) AS BIGINT)
         AS n_bpe_est,
       len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct,
       CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
         list_transform({opl.TOKS}, t -> CAST(ceil(length(t) / 4.0) AS BIGINT))))
         + len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS BIGINT) AS n_total_est
FROM documents
""",
)
register(
    # tokenizer-training primitive: first BPE merge iteration — top
    # adjacent char-pair counts over the distinct-word table
    "text_bpe_merge_pairs",
    lambda s, d: textops.bpe_merge_pairs(load(s, d, "documents")),
    opl.bpe_merge_pairs_sql(),
)
register(
    "text_quality_scores",
    lambda s, d: textops.quality_scores(load(s, d, "documents")),
    opl.quality_scores_sql(),
)
register(
    "text_language_id",
    lambda s, d: textops.language_id(load(s, d, "documents")),
    opl.language_id_sql(),
)
register(
    "text_language_summary",
    lambda s, d: textops.corpus_language_summary(load(s, d, "documents")),
    opl.corpus_language_summary_sql(),
)
register(
    "text_fingerprints",
    lambda s, d: textops.fingerprints(load(s, d, "documents")),
    opl.fingerprints_sql(),
)
register(
    "mm_library_centroids_pandas",
    multimodal.library_centroids_pandas,
    """
SELECT label, count(*) AS n_vectors,
       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS c0,
       round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS c1,
       round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS c2,
       round(avg(CAST(embedding[4] AS DOUBLE)), 6) AS c3
FROM embeddings GROUP BY label
""",
)
register(
    # image near-dup via 64-bit dHash over the REAL decoded raster:
    # block-joined hamming<=3 pairs (pigeonhole-lossless); the oracle is
    # the independent quadratic scan, so parity proves the losslessness
    "mm_phash_near_dups",
    lambda s, d: multimodal.phash_near_dups(s, d, max_hamming=3),
    multimodal.phash_near_dups_sql(max_hamming=3),
)
register(
    # image near-dup CLUSTERS (r14b): connected components over the
    # dHash pair graph via the pointer-jumped min-contraction;
    # singletons included; the oracle is the independent quadratic
    # pair scan + unrolled min propagation
    "mm_phash_components",
    lambda s, d: multimodal.phash_components(s, d, max_hamming=3),
    multimodal.phash_components_sql(max_hamming=3),
)
register(
    # audio modality: synthesized 16-bit signed little-endian PCM,
    # REAL numpy frombuffer decode, RMS / zero-crossings / peak —
    # byte-level oracle like mm_decode
    "mm_waveform_stats",
    multimodal.waveform_stats,
    multimodal.waveform_stats_sql(),
)
register(
    # audio spectral screen (r14b): integer micro-unit DFT probe bins
    # over the decoded PCM — exact BIGINT responses, dominant bin per
    # doc; the trig table is quantized ONCE in Python and shared with
    # the oracle's literal VALUES table by construction
    "mm_audio_spectral",
    multimodal.audio_spectral,
    multimodal.audio_spectral_sql(),
)
register(
    # video scene cuts (r14b): exact integer L1 diff between
    # consecutive frame slices, cut = diff beyond the pinned threshold;
    # the keyframe-selection screen with a byte-level oracle
    "mm_scene_cuts",
    multimodal.scene_cuts,
    multimodal.scene_cuts_sql(),
)
register(
    # audio activity detection (r15): VAD-style segmentation — frame
    # energies gated by the parameter-free integer mean compare
    # (e * n_frames > total), gaps-and-islands segments; the
    # pay-per-active-second budget columns. Byte-level oracle.
    "mm_audio_activity",
    multimodal.audio_activity,
    multimodal.audio_activity_sql(),
)
register(
    # keyframe selection (r15): the step scene_cuts enables — gaps-and-
    # islands shots at the cut boundaries, one representative frame per
    # shot (max byte-sum brightness proxy, lowest-index tie-break);
    # model passes pay per KEYFRAME, not per frame. Byte-level oracle.
    "mm_video_keyframes",
    multimodal.video_keyframes,
    multimodal.video_keyframes_sql(),
)
register("mm_blob_features", multimodal.blob_features, opl.blob_features_sql())
register("mm_blob_resize", multimodal.blob_resize, multimodal.blob_resize_sql())
register("mm_frame_stats", multimodal.frame_stats, opl.frame_stats_sql())
register(
    # real (non-stubbed) image decode: synthesized P6 PPM corpus ->
    # pure-Python stride decode -> per-channel raster stats, byte-level
    # oracle over the source text bytes
    "mm_decode",
    multimodal.mm_decode,
    multimodal.mm_decode_sql(),
)
register(
    # COMPRESSED image decode: synthesized PNG corpus (stdlib-zlib
    # DEFLATE, scanline filters cycling all five types) -> pure-Python
    # inflate + unfilter -> the same raster stats and byte-level oracle
    # as mm_decode, so a wrong unfilter breaks the hash
    "mm_decode_png",
    multimodal.mm_decode_png,
    multimodal.mm_decode_sql(),
)
register(
    # DEEP PNG decode (round 10): Adam7-interlaced 16-bit RGB corpus ->
    # per-pass unfilter + pixel scatter + high-byte normalization ->
    # the same raster stats and byte-level oracle as mm_decode, so a
    # defect anywhere in the interlace/16-bit path breaks the hash
    "mm_decode_png_deep",
    multimodal.mm_decode_png_deep,
    multimodal.mm_decode_sql(),
)


register(
    "rel_token_heavy_hitters",
    relational.token_heavy_hitters,
    """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 25
""",
)
register(
    "rel_asof_purchase_click",
    relational.asof_join_purchase_click,
    """
WITH base AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
carried AS (
  SELECT event_id, user_id, event_type, ts_us,
         last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
  FROM base
)
SELECT event_id, user_id, ts_us, last_click_ts,
       CASE WHEN last_click_ts IS NOT NULL
            THEN (ts_us - last_click_ts) / 1000000.0 END AS secs_since_click
FROM carried WHERE event_type = 'purchase'
""",
)
register(
    "rel_range_join_context",
    relational.range_join_purchase_context,
    """
WITH base AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
p AS (SELECT user_id, event_id AS p_event_id, ts_us AS p_ts FROM base
      WHERE event_type = 'purchase')
SELECT p.p_event_id, p.user_id, count(*) AS n_context_events
FROM p JOIN base c ON p.user_id = c.user_id
WHERE c.ts_us >= p.p_ts - 3600000000 AND c.ts_us < p.p_ts
GROUP BY p.p_event_id, p.user_id
""",
)
register(
    "rel_parts_by_type_size",
    relational.parts_by_type_size,
    """
SELECT p_type, count(*) AS n_parts,
       round(CASE WHEN count(p_retailprice) = 0 THEN NULL
                  ELSE sum(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0
                       / count(p_retailprice) END, 4) AS avg_price,
       max(p_size) AS max_size
FROM part GROUP BY p_type
""",
)
register(
    "rel_shipping_priority",
    relational.shipping_priority,
    """
SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
register(
    "rel_user_running_totals",
    relational.user_running_totals,
    """
SELECT user_id, event_id,
       count(*) OVER w AS running_n,
       round(sum(value) OVER w, 4) AS running_value
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
register(
    "rel_value_percentiles",
    lambda s, d: load(s, d, "events").groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.max("value"), 4).alias("vmax"),
    ),
    """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(max(value), 4) AS vmax
FROM events GROUP BY event_type
""",
)
def _interarrival(s: SparkSession, d: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(s, d, "events")
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = (F.col("ts_us") - F.lag("ts_us").over(w)) / F.lit(1_000_000.0)
    return (
        ev.withColumn("gap_s", gap)
        .filter(F.col("gap_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.avg("gap_s"), 4).alias("avg_gap_s"),
            F.round(F.max("gap_s"), 4).alias("max_gap_s"),
        )
    )


register(
    "rel_interarrival_stats",
    _interarrival,
    """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY epoch_us(ts), event_id))
         / 1000000.0 AS gap_s
  FROM events
)
SELECT event_type, count(*) AS n_gaps,
       round(avg(gap_s), 4) AS avg_gap_s,
       round(max(gap_s), 4) AS max_gap_s
FROM g WHERE gap_s IS NOT NULL GROUP BY event_type
""",
)
register(
    "rel_customer_segments",
    lambda s, d: load(s, d, "customer").groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        F.round(F.min("c_acctbal"), 4).alias("min_acctbal"),
        F.round(F.max("c_acctbal"), 4).alias("max_acctbal"),
    ),
    """
SELECT c_mktsegment, count(*) AS n_customers,
       round(avg(c_acctbal), 4) AS avg_acctbal,
       round(min(c_acctbal), 4) AS min_acctbal,
       round(max(c_acctbal), 4) AS max_acctbal
FROM customer GROUP BY c_mktsegment
""",
)
register(
    "rel_order_size_distribution",
    lambda s, d: load(s, d, "lineitem").groupBy("l_orderkey")
    .agg(F.count("*").alias("n_items"))
    .groupBy("n_items").agg(F.count("*").alias("n_orders")),
    """
WITH per AS (SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY l_orderkey)
SELECT n_items, count(*) AS n_orders FROM per GROUP BY n_items
""",
)
register(
    "rel_conversion_funnel",
    relational.conversion_funnel,
    """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events GROUP BY user_id
),
staged AS (
  SELECT CASE
    WHEN t_signup IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
         AND t_signup < t_click AND t_click < t_purchase THEN 'full_funnel'
    WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
         AND t_signup < t_click THEN 'signup_click'
    WHEN t_signup IS NOT NULL THEN 'signup_only'
    ELSE 'no_signup' END AS funnel_stage
  FROM firsts
)
SELECT funnel_stage, count(*) AS n_users FROM staged GROUP BY funnel_stage
""",
)
register(
    "rel_value_outliers",
    relational.value_outliers,
    """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma,
         count(*) AS n_events
  FROM events GROUP BY event_type
)
SELECT e.event_type, first(s.n_events) AS n_events,
       round(first(s.mu), 4) AS mean_value,
       round(first(s.sigma), 4) AS std_value,
       CAST(sum(CASE WHEN abs(e.value - s.mu) > 3.0 * s.sigma THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM events e JOIN stats s USING (event_type)
GROUP BY e.event_type
""",
)
register(
    "rel_salted_user_counts",
    relational.user_event_counts_salted,
    "SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value "
    "FROM events GROUP BY user_id",
)
def _orders_cube(s: SparkSession, d: str) -> DataFrame:
    # grouping() is only valid INSIDE the cube aggregation
    return (
        load(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_st"),
            F.grouping("o_orderpriority").cast("int").alias("g_pri"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


register(
    # CUBE completes the grouping family (ROLLUP + GROUPING SETS exist)
    "rel_orders_cube",
    _orders_cube,
    """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_st,
       CAST(grouping(o_orderpriority) AS INT) AS g_pri,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)


def _sliding_1h_sum(s: SparkSession, d: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(s, d, "events").filter(F.col("user_id") < 20)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 4).alias("sum_last_hour"),
    )


register(
    # RANGE-frame interval window (value-based frame, not row-based):
    # trailing 1-hour per-user totals — the time-decayed-feature shape
    "rel_sliding_1h_sum",
    _sliding_1h_sum,
    """
SELECT user_id, event_id,
       count(*) OVER w AS n_last_hour,
       round(sum(value) OVER w, 4) AS sum_last_hour
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
register(
    "rel_moving_avg_value",
    relational.moving_avg_value,
    """
SELECT user_id, event_id,
       round(avg(value) OVER w, 4) AS ma3_value,
       count(*) OVER w AS n_in_window
FROM events
WHERE user_id < 30
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
register(
    "rel_percent_rank_orders",
    relational.percent_rank_orders,
    """
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WHERE o_orderkey < 2000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
register(
    "rel_above_nation_avg",
    relational.customers_above_nation_avg,
    """
SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS acctbal,
       round(nat_avg, 4) AS nation_avg
FROM customer
JOIN (SELECT c_nationkey, avg(c_acctbal) AS nat_avg
      FROM customer GROUP BY c_nationkey) USING (c_nationkey)
WHERE c_acctbal > nat_avg
""",
)
register(
    "rel_user_day_retention",
    relational.user_day_retention,
    """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day_id
  FROM events
)
SELECT a.day_id,
       count(*) AS n_active,
       CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       round(CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS retention_rate
FROM ud a
LEFT JOIN ud b ON a.user_id = b.user_id AND b.day_id = a.day_id + 1
GROUP BY a.day_id
""",
)
register(
    # skyline / Pareto front (minimize price, maximize recency) per
    # priority class. The oracle is the textbook NOT EXISTS dominance
    # predicate — fully independent of the operator's two-stage
    # window algebra (local bucket skyline -> global merge), so the
    # parity check proves the lossless-pruning argument, not just
    # replays it. Naive oracle is quadratic but fine at sf0.01.
    "rel_skyline_orders",
    relational.skyline_orders,
    """
WITH pts AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice AS price,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS d_day
  FROM orders
  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
)
SELECT o_orderpriority, o_orderkey, price, d_day
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.o_orderpriority IS NOT DISTINCT FROM p.o_orderpriority
    AND q.price <= p.price AND q.d_day >= p.d_day
    AND (q.price < p.price OR q.d_day > p.d_day)
)
""",
)
register(
    # Z-order layout audit. The Morton interleave text is SHARED with
    # the operator (relational._morton_sql — a definition, like a hash
    # function); the grouping, bounding boxes, and the locality claim
    # (x_span/y_span <= 31 for every 10-bit prefix) are what parity +
    # the unit test check. floor-before-cast everywhere: DuckDB CAST
    # rounds where Spark truncates.
    "rel_zorder_locality",
    relational.zorder_locality,
    f"""
WITH pts AS (
  SELECT o_custkey % 1024 AS x,
         least(CAST(floor(o_totalprice / 512.0) AS BIGINT), 1023) AS y
  FROM orders
), keyed AS (
  SELECT x, y, ({relational._morton_sql('x', 'y', 10)}) >> 10 AS z_bucket
  FROM pts
)
SELECT z_bucket, count(*) AS n_orders,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max,
       max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
FROM keyed GROUP BY z_bucket
""",
)
register(
    # strictly-sequential funnel: the oracle derives each stage time
    # with grouped-CTE joins where the operator uses chained windows
    # over one exchange — different logic shape, same semantics.
    "rel_event_funnel",
    relational.event_funnel,
    """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
  WHERE user_id IS NOT NULL
), u1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts_us END) AS t_signup
  FROM ev GROUP BY user_id
), u2 AS (
  SELECT e.user_id, u1.t_signup,
         min(CASE WHEN e.event_type = 'click' AND e.ts_us > u1.t_signup
                  THEN e.ts_us END) AS t_click
  FROM ev e JOIN u1 USING (user_id) GROUP BY e.user_id, u1.t_signup
), u3 AS (
  SELECT e.user_id, u2.t_signup, u2.t_click,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts_us > u2.t_click
                  THEN e.ts_us END) AS t_purchase
  FROM ev e JOIN u2 USING (user_id) GROUP BY e.user_id, u2.t_signup, u2.t_click
)
SELECT count(*) AS n_users,
       count(t_signup) AS n_signup,
       count(t_click) AS n_seq_click,
       count(t_purchase) AS n_seq_purchase,
       round(CAST(count(t_click) AS DOUBLE)
             / nullif(CAST(count(t_signup) AS DOUBLE), 0), 6) AS click_rate,
       round(CAST(count(t_purchase) AS DOUBLE)
             / nullif(CAST(count(t_click) AS DOUBLE), 0), 6) AS purchase_rate
FROM u3
""",
)
register(
    "rel_top_suppliers_per_nation",
    relational.top_suppliers_per_nation,
    """
SELECT n_name, s_suppkey, s_name, round(s_acctbal, 4) AS acctbal,
       row_number() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS rnk
FROM supplier JOIN nation ON s_nationkey = n_nationkey
QUALIFY rnk <= 3
""",
)


# --- I11: index lifecycle (algorithm switch + partition-scoped rebuild) ---
from .operators import lifecycle  # noqa: E402

register(
    "knn_dispatch_flat",
    lambda s, d: lifecycle.knn_auto(s, d, library=0, query_id=0, k=10),
    oracles.knn_sql(query_id=0, k=10, metric="cosine", library=0),
)
register(
    "knn_dispatch_lsh",
    lambda s, d: lifecycle.knn_auto(s, d, library=1, query_id=0, k=10),
    oracles.lsh_search_sql(_PLANES, query_id=0, k=10, metric="cosine", library=1),
)
register(
    "knn_dispatch_grid",
    lambda s, d: lifecycle.knn_auto(s, d, library=2, query_id=0, k=10),
    oracles.grid_search_sql(query_id=0, k=10, metric="euclidean", library=2),
)
from .operators import store as store_ops  # noqa: E402

register(
    # I11 against the MATERIALIZED store: lazy ensure (build + dynamic-
    # partition overwrite on first touch or staleness, memoized
    # fingerprint after) then a probe of the STORED rows. The result
    # contract equals the derived lsh probe, so the same oracle checks
    # the whole write->read path on a cold store and the pure read path
    # on a warm one. The FORCED rebuild (write->read in one call) stays
    # covered by store_ops.rebuild_and_probe in
    # tests/test_incremental_index.py.
    "i11_stored_index_probe",
    lambda s, d: store_ops.lsh_probe(s, d, library=1, query_id=0, k=10),
    oracles.lsh_search_sql(_PLANES, query_id=0, k=10, metric="cosine", library=1),
)
register(
    "i11_stored_grid_probe",
    lambda s, d: store_ops.grid_probe(s, d, library=2, query_id=0, k=10),
    oracles.grid_search_sql(query_id=0, k=10, metric="euclidean", library=2),
)
register(
    # I11 on the ANN side: probe the MATERIALIZED IVF centroid table
    # (lazy build, fingerprint freshness) — centroid ranking is a tiny
    # stored read, the corpus scan is pruned to the probed lists. Result
    # contract equals the derived ivf_topk, same oracle.
    "i11_stored_ivf_probe",
    lambda s, d: store_ops.ivf_probe(s, d, query_id=0, k=10, nprobe=2),
    opl.ivf_topk_sql(query_id=0, k=10, nprobe=2),
)
register(
    "i11_index_lifecycle",
    lambda s, d: lifecycle.index_state_after_switch(s, d, library=2, new_algorithm="grid"),
    """
WITH reg AS (
  SELECT DISTINCT label,
         CASE WHEN label = 2 THEN 'grid'
              ELSE ['flat', 'lsh', 'grid'][(label % 3) + 1] END AS algorithm
  FROM embeddings
),
per AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
SELECT reg.label, reg.algorithm,
       CASE reg.algorithm WHEN 'flat' THEN 0
                          WHEN 'lsh' THEN per.n * 10
                          ELSE per.n END AS n_index_rows
FROM reg JOIN per ON reg.label = per.label
""",
)


# --- MLlib batch index builds (north-star scale path). The BRP pair now
# carries EXACT oracles: the model's seed-42 random unit vectors are a
# function of (seed, dim, numTables) only, pinned as literals in
# mllib_index.py (test-asserted against a live fit), so DuckDB recomputes
# floor(dot/width) buckets and the single-probe kNN itself. The remaining
# Trained-quantizer family. The canonical-Lloyd fits (ann._lloyd_canonical)
# are SQL-replayable, so PQ / IVF-PQ / the recall sweep carry EXACT oracles
# (oracles_quant). Only the MLlib-fitted pair stays rows-only: MLlib's
# kmeans|| init and MinHash perm draws are not SQL-reproducible. ----------
from . import oracles_quant  # noqa: E402
from .operators import mllib_index  # noqa: E402

register(
    "mllib_brp_bucket_index",
    mllib_index.brp_bucket_index,
    mllib_index.brp_bucket_index_sql(),
)
register(
    # n_lists=7 / nprobe=4: the operating point the recall sweep
    # (ann_ivf_recall_sweep) measures at 0.84 avg recall@10 on sf0.01.
    # EXACT oracle since r8: the seed-42 kmeans|| fit is bit-stable for
    # the single-split test corpora, so the fitted centers replay as
    # pinned literals (mllib_index.IVF_KMEANS_CENTERS_SF001) and
    # assignment/routing reuse the ivfpq oracle's argmin algebra.
    # PRECONDITION: the oracle is valid on the sf0.01 corpus ONLY (the
    # driver's gate scale) — any other corpus refits live on the Spark
    # side and mismatches by construction; local runs go through
    # test_oracle_parity._PINNED_SF
    "mllib_ivf_kmeans_topk",
    lambda s, d: ann.ivf_kmeans_topk(s, d, query_id=0, k=10, n_lists=7, nprobe=4),
    mllib_index.ivf_kmeans_topk_sql(query_id=0, k=10, nprobe=4),
)
register(
    # measured recall@10 of the canonical-Lloyd IVF quantizer over
    # nprobe in {1,2,4,8} — EXACT oracle: the fit is deterministic and
    # SQL-replayable (oracles_quant replays init/assign/update as CTEs)
    "ann_ivf_recall_sweep",
    lambda s, d: ann.ivf_kmeans_recall_sweep(s, d, k=10, n_lists=7),
    oracles_quant.recall_sweep_sql(k=10, n_lists=7),
)
register(
    # BATCHED IVF serving (r15): a 10-query batch routed to its nprobe
    # nearest lists (probe map is driver-side index metadata), corpus
    # scored ONLY where probed — scored-pair volume ~ nprobe/n_lists of
    # brute force — then the map-side partial top-k per query. The
    # cost/recall pairing of ann_ivf_recall_sweep, as the serving path.
    "ann_ivf_multi_query",
    lambda s, d: ann.ivf_multi_query_topk(s, d, k=10, n_lists=7, nprobe=4),
    oracles_quant.ivf_multi_query_sql(k=10, n_lists=7, nprobe=4),
)
register(
    # rerank-budget sweep (r15; r16 averages it over the same 10-query
    # set ann_ivf_multi_query serves — r15 verdict #4: one query's
    # recall curve is too noisy to set a serving knob by): recall@10 vs
    # the exact-rerank budget over ONE ADC ranking per query (monotone
    # prefix cuts, the nprobe-sweep trick on the other serving axis) —
    # the knob that prices the second stage's full-precision reads
    "ann_ivfpq_rerank_sweep",
    lambda s, d: ann.ivfpq_rerank_sweep(s, d, query_ids=list(range(10)), k=10),
    oracles_quant.ivfpq_rerank_sweep_sql(query_ids=tuple(range(10)), k=10),
)
register(
    # RESIDUAL-encoded IVF-PQ (r15): PQ trained and applied on
    # r = x - c(list) — residuals concentrate near zero so the same
    # code budget quantizes tighter (the FAISS default); the query side
    # uses PER-LIST lookup tables (q - c_l differs per probed list).
    # Same routing/ADC/re-rank algebra as mllib-free ivfpq_topk, so the
    # two are comparable line by line; recon-error win pinned in tests.
    "ann_ivfpq_residual_topk",
    lambda s, d: ann.ivfpq_residual_topk(s, d, query_id=0, k=10),
    oracles_quant.ivfpq_residual_sql(query_id=0, k=10),
)
register(
    # the refit's SERVING consequence (r15): IVF recall@10 on the
    # drifted corpus under the stale vs the refit quantizer — measured
    # 0.84 -> 0.87 mean at sf0.01; both fits canonical Lloyd, zero
    # pinned state, the whole chain replayed by the oracle
    "ann_refit_recall_gain",
    lambda s, d: ann.refit_recall_gain(s, d, k=10, n_lists=7, nprobe=4),
    oracles_quant.refit_recall_gain_sql(k=10, n_lists=7, nprobe=4),
)
register(
    # trigger -> refit -> serving gain ON THE SAME BYTES (r16, r15
    # verdict #6): the full stream_ivf_refit lifecycle runs first, then
    # recall@10 is measured with post_refit routing read FROM the refit
    # store's list_id column. The oracle is ann_refit_recall_gain's —
    # the hash match proves serving from the stored artifact reproduces
    # the re-derived numbers, chaining the two halves the r15 ops left
    # independent.
    "stream_ivf_refit_served",
    lambda s, d: stream_ops.ivf_refit_lifecycle_recall(
        s, d, k=10, n_lists=7, nprobe=4
    ),
    oracles_quant.refit_recall_gain_sql(k=10, n_lists=7, nprobe=4),
)
register(
    # FILTERED search on the trained index (r15): the metadata
    # predicate (documents lang semi-join) restricts candidates BEFORE
    # scoring, composing multiplicatively with the probe fraction —
    # scored volume ~ sel * nprobe/n_lists * n * q
    "ann_ivf_filtered",
    lambda s, d: ann.ivf_filtered_topk(s, d, k=10, n_lists=7, nprobe=4),
    oracles_quant.ivf_filtered_sql(k=10, n_lists=7, nprobe=4),
)
register(
    # sample-trained PQ: driver-side canonical Lloyd fit on a bounded
    # hash sample, distributed single-projection encode — EXACT oracle
    # (the CTE chain replays the fit, then the unrounded-argmin encode)
    "ann_product_quantize",
    lambda s, d: ann.product_quantize(s, d, n_subvectors=4, codebook_k=16),
    oracles_quant.product_quantize_sql(n_subvectors=4, sub_dim=16),
)
register(
    # ADC serving path over the PQ codes: LUT projection -> top-rerank
    # -> exact broadcast re-rank — EXACT oracle (fit replay + LUT)
    "ann_pq_topk",
    lambda s, d: ann.pq_topk(s, d, query_id=0, k=10, n_subvectors=8),
    oracles_quant.pq_topk_sql(query_id=0, k=10),
)
register(
    # the composed serving path: IVF routing (partition pruning) over
    # the PQ code table (ADC scan) + exact re-rank — EXACT oracle
    # (both fit replays + routing + ADC + re-rank in one CTE chain)
    "ann_ivfpq_topk",
    lambda s, d: ann.ivfpq_topk(s, d, query_id=0, k=10),
    oracles_quant.ivfpq_topk_sql(query_id=0, k=10),
)
register(
    # SemDeDup-style paraphrase-level dedup: canonical-Lloyd clusters,
    # deterministic per-cluster representative, cosine-to-rep verdict
    "dedup_semantic_keep",
    lambda s, d: ann.semantic_dedup_keep(s, d),
    oracles_quant.semantic_dedup_keep_sql(),
)
register(
    # simplified (centroid) silhouette audit of the IVF quantizer — the
    # "is k right" check before trusting an inverted-list layout; linear
    # in corpus size, one scan, |n_lists|-group aggregate (new r8)
    "ann_cluster_silhouette",
    lambda s, d: ann.cluster_silhouette(s, d, n_lists=7),
    oracles_quant.cluster_silhouette_sql(n_lists=7),
)
register(
    # 3-sigma embedding-norm outlier screen over integer-micro norms —
    # embedding hygiene before indexing/contrastive sampling (new r8)
    "emb_norm_outliers",
    lambda s, d: ann.norm_outliers(s, d),
    oracles_quant.norm_outliers_sql(),
)
register(
    # participation-ratio effective rank of the embedding second
    # moment — dimensional-collapse audit; O(d^2) exchange at any
    # corpus size (new r8)
    "emb_spectrum_audit",
    lambda s, d: ann.spectrum_audit(s, d),
    oracles_quant.spectrum_audit_sql(),
)
register(
    "mllib_brp_approx_knn",
    lambda s, d: mllib_index.brp_approx_knn(s, d, query_id=0, k=10),
    mllib_index.brp_approx_knn_sql(query_id=0, k=10),
)
register(
    # EXACT oracle since r8: md5-based feature indices (SQL-replayable,
    # unlike HashingTF murmur3) + pinned seed-42 randCoefficients replay
    # the full MinHashLSH candidate join + jaccard verdict in DuckDB
    "mllib_minhash_jaccard_join",
    lambda s, d: mllib_index.minhash_jaccard_join(s, d, threshold=0.5),
    mllib_index.minhash_jaccard_join_sql(threshold=0.5),
)


# --- §2.11 streaming / background-task analogs + S15 embedding stand-in ---
from .functions.embed import hash_embedding  # noqa: E402
from .streaming import pipeline as stream_ops  # noqa: E402

register(
    "stream_windowed_event_counts",
    lambda s, d: stream_ops.windowed_event_counts(s, d),
    opl.windowed_event_counts_sql(),
)
register(
    # watermark late-data audit (r14b): two content-keyed micro-batches
    # (even event_ids first, odd stragglers second) through an
    # append-mode windowed count — per finalized window, the rows that
    # arrived in-state, the late-but-accepted, and the dropped; the
    # oracle replays Spark's ms-floor watermark algebra exactly
    "stream_late_data_audit",
    lambda s, d: stream_ops.late_data_audit_stream(s, d),
    stream_ops.late_data_audit_sql(),
)
def _knn_join_post_body(m: int = 3, dim: int = _DIM,
                        band_bits: int = 2) -> str:
    """The banded knn_join algebra over an in-scope `post` CTE — shared
    by the maintained-graph oracle and the served-walk oracle (both
    consume the graph the maintenance stream stores)."""
    from .operators.lsh import N_SIGN_BANDS, SEED, hyperplanes

    # N_SIGN_BANDS * band_bits, NOT the static NUM_HASHES: the engine
    # builds 5 bands of band_bits planes each, and the two layouts only
    # coincide at band_bits=2 (5*2 == NUM_HASHES). The scale-parity
    # sweep caught pipeline_hard_negatives diverging at sf0.1, where
    # auto_band_bits resolves the GLOBAL (n_labels=1) banding to 4 —
    # a width this builder previously could not express.
    planes = hyperplanes(dim, N_SIGN_BANDS * band_bits, SEED)
    cos = oracles.METRIC_SQL["cosine"]("a.embedding", "b.embedding")
    return f"""
WITH banded AS MATERIALIZED (
{oracles.banded_cte_sql(planes, band_bits, source="post")}
),
cand AS (
  SELECT DISTINCT a.label, a.vec_id AS src, b.vec_id AS dst,
         round({cos}, 6) AS score
  FROM banded a JOIN banded b
    ON a.label = b.label AND a.band_idx = b.band_idx
   AND a.band_key = b.band_key AND a.vec_id != b.vec_id
)
SELECT CAST(label AS INT) AS label, src, dst, score,
       CAST(row_number() OVER (PARTITION BY src
                               ORDER BY score DESC, dst) AS INT) AS rnk
FROM cand
QUALIFY rnk <= {m}
"""


def _knn_join_post_sql(m: int = 3, dim: int = _DIM, band_bits: int = 2) -> str:
    """The banded knn_join algebra over the POST-STATE embeddings (the
    index-maintenance mutation log applied: labels 1/2, vec_id % 7 = 3,
    IEEE-exact negation) — the oracle of the maintained k-NN graph."""
    return f"""
WITH post AS MATERIALIZED (
  SELECT vec_id, label,
         CASE WHEN label IN (1, 2) AND vec_id % 7 = 3
              THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS embedding
  FROM embeddings
)
SELECT * FROM ({_knn_join_post_body(m=m, dim=dim, band_bits=band_bits)})
"""


register(
    # incremental kNN-graph maintenance (r14b): knn_join is
    # label-scoped, so a mutation batch invalidates exactly its labels'
    # graph partitions — compacted delta store + partition-scoped
    # rebuild, untouched partitions byte-identical (pinned)
    "stream_knn_graph_maintenance",
    lambda s, d: stream_ops.knn_graph_maintenance_stream(s, d),
    _knn_join_post_sql(m=3),
)
register(
    # maintained-graph SERVING (r16, r15 verdict #2): the beam walk
    # against the graph the maintenance stream keeps fresh — lifecycle
    # (full build + mutation stream + partition-scoped rebuilds) runs
    # first, then the query pays ONLY the walk over the stored edges
    # and the post-state corpus. Turns the scale probe's build/walk
    # split (sublinear serving) into an oracle-gated contract: the
    # DuckDB side replays the identical walk in the post-state world.
    "ann_beam_search_served",
    lambda s, d: stream_ops.beam_search_served(s, d, query_id=0, k=10),
    _graph_beam_sql(query_id=0, k=10, served=True),
)
register(
    # incremental view maintenance (r14b): the per-label stats view
    # maintained ALGEBRAICALLY from the CDC feed's before/after images
    # — per-batch cost O(batch + |labels|), base corpus read once at
    # init; cumulative snapshots make replay idempotent
    "stream_ivm_label_stats",
    lambda s, d: stream_ops.ivm_label_stats_stream(s, d),
    stream_ops.ivm_label_stats_sql(),
)


def _embed_components(s: SparkSession, d: str) -> DataFrame:
    from .functions.hashing import let

    def _proj(e):
        n = F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x))
        return F.struct(
            *[F.element_at(e, i + 1).alias(f"e{i}") for i in range(4)],
            F.round(F.when(n == 0.0, F.lit(0.0)).otherwise(F.lit(1.0)), 6).alias("unit_norm"),
        )

    from .sources.tables import spread_for_compute

    return (
        # embed-source contract: a NULL text cannot be embedded -> no row
        # (oracle: embed_components_sql's WHERE text IS NOT NULL)
        spread_for_compute(
            load(s, d, "documents").filter(F.col("text").isNotNull())
        )
        .select("doc_id", let(hash_embedding(F.col("text")), _proj).alias("st"))
        .select("doc_id", "st.*")
    )


register("s15_embed_documents", _embed_components, opl.embed_components_sql())


def _ingest_chunks_embedded(s: SparkSession, d: str) -> DataFrame:
    """§3.2 ingest pipeline end-to-end: document -> sliding-window chunks
    (textops.chunk_documents, the reference's pre-split contract) -> S15
    hash-embedding per chunk, projected to the oracle-checkable component
    columns. The whole path is chunk + embed inside ONE scan stage — the
    shape bulk ingest keeps at 100 TB (reference
    services/document_service.py:21-60 + background_tasks.py:260-311)."""
    from .functions.embed import hash_embedding
    from .functions.hashing import let

    def _proj(e):
        n = F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x))
        return F.struct(
            *[F.element_at(e, i + 1).alias(f"e{i}") for i in range(4)],
            F.round(F.when(n == 0.0, F.lit(0.0)).otherwise(F.lit(1.0)), 6).alias("unit_norm"),
        )

    from .sources.tables import spread_for_compute

    chunks = textops.chunk_documents(spread_for_compute(load(s, d, "documents")))
    return chunks.select(
        "doc_id",
        "sentence_number",
        let(hash_embedding(F.col("chunk_text")), _proj).alias("st"),
    ).select("doc_id", "sentence_number", "st.*")


register(
    "ingest_chunks_embedded",
    _ingest_chunks_embedded,
    opl.embed_components_sql(
        source=f"(SELECT doc_id, sentence_number, chunk_text AS text "
               f"FROM ({textops.chunk_documents_sql()}))",
        keys=("doc_id", "sentence_number"),
    ),
)

# --- sketch operators (operators/sketches.py): deterministic HLL + CMS ----
from .operators import sketches  # noqa: E402

register(
    "sketch_hll_distinct_users",
    lambda s, d: sketches.hll_distinct(s, d, key="user_id"),
    sketches.hll_distinct_sql(key="user_id"),
)
register(
    "sketch_countmin_event_types",
    lambda s, d: sketches.countmin_heavy_hitters(s, d, key="event_type"),
    sketches.countmin_sql(key="event_type"),
)
register(
    # group-scoped HLL: one 64-register sketch per event_type — the
    # dimension-sliced mergeable-summary layout
    "sketch_hll_by_event_type",
    lambda s, d: sketches.hll_distinct_by_group(s, d, key="user_id",
                                                group="event_type"),
    sketches.hll_distinct_by_group_sql(key="user_id", group="event_type"),
)
register(
    # mergeable bit-set Bloom filter + probe verdicts vs ground truth —
    # the pending-set pushdown primitive (O10 at 100 TB)
    "sketch_bloom_membership",
    lambda s, d: sketches.bloom_membership(s, d, key="user_id"),
    sketches.bloom_membership_sql(key="user_id"),
)
register(
    # Bloom-pruned join audit (r14b): the runtime-row-filter technique
    # measured — filter built over a filtered dimension's keys, every
    # fact row probed pre-join, pruning and false-positive cost
    # verified against the exact semi-join
    "sketch_bloom_join_prune",
    lambda s, d: sketches.bloom_join_prune(s, d, nation=1),
    sketches.bloom_join_prune_sql(nation=1),
)
register(
    # KMV bottom-k overlap sketch: Jaccard + intersection estimates for
    # {click users} vs {purchase users} with exact counts alongside —
    # the corpus-contamination-check primitive
    "sketch_kmv_overlap",
    lambda s, d: sketches.kmv_overlap(s, d),
    sketches.kmv_overlap_sql(),
)
register(
    # mergeable fixed-bin quantile sketch per event_type: state is
    # (group, bin) counts, estimates are exact integer-threshold math
    "sketch_quantile_histogram",
    lambda s, d: sketches.quantile_histogram(s, d),
    sketches.quantile_histogram_sql(),
)
register(
    # HLL merge property as a checkable query: per-slice registers
    # merged with max() must estimate EXACTLY like the one-pass sketch
    "sketch_hll_merge",
    lambda s, d: sketches.hll_merge(s, d),
    sketches.hll_merge_sql(),
)
register(
    # Count-Min LINEARITY (r15): two shards' counter tables merge by
    # elementwise addition and equal the whole-corpus table exactly
    # (counts add) — the second mergeable-sketch family after
    # hll_merge's max-merge; the oracle recomputes `whole`
    # independently so the equality is proven, not constructed
    "sketch_countmin_merge",
    lambda s, d: sketches.countmin_merge(s, d),
    sketches.countmin_merge_sql(),
)
register(
    # audience-overlap estimation (r15): per-segment HLL registers,
    # union via the exact max-merge, intersection via inclusion-
    # exclusion, exact count riding along so the estimate's error is
    # driver-visible; register-sized after one scan
    "sketch_hll_intersection",
    lambda s, d: sketches.hll_intersection(s, d),
    sketches.hll_intersection_sql(),
)

# --- second-stage retrieval (hybrid fusion + diversification) -------------
from .operators import retrieval  # noqa: E402

register(
    "retrieval_bm25_scores",
    lambda s, d: retrieval.bm25_scores(load(s, d, "documents")),
    f"WITH {retrieval.bm25_sql()}\nSELECT doc_id, bm25 FROM bm",
)
register(
    # hybrid lexical+vector retrieval: cosine top-20 and BM25 top-20
    # fused by Reciprocal Rank Fusion — both rank lists on 6dp-rounded
    # scores with doc_id tiebreak so the fusion is cross-engine exact
    "retrieval_hybrid_rrf",
    lambda s, d: retrieval.hybrid_rrf_search(s, d, query_id=0, list_k=20, k=10),
    retrieval.hybrid_rrf_sql(query_id=0, list_k=20, k=10),
)
register(
    # MMR diversified top-k over a bounded candidate pool; unrolled
    # greedy oracle replays the identical argmax chain
    "retrieval_mmr_rerank",
    lambda s, d: retrieval.mmr_rerank(s, d, query_id=0, pool=20, k=5),
    retrieval.mmr_sql(query_id=0, pool=20, k=5),
)
register(
    "s15_embed_pandas_batched",
    multimodal.embed_documents_pandas,
    opl.embed_components_sql(include_norm=False),
)


def _stream_embed_pending(s: SparkSession, d: str) -> DataFrame:
    out = stream_ops.embed_pending_stream(s, d)
    return out.select(
        "doc_id",
        *[F.round(F.element_at("embedding", i + 1), 6).alias(f"e{i}") for i in range(4)],
    )


register(
    "stream_embed_pending",
    _stream_embed_pending,
    opl.embed_components_sql(include_norm=False),
)
register(
    "stream_stateful_user_totals",
    stream_ops.stateful_user_totals,
    "SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value "
    "FROM events GROUP BY user_id",
)
register(
    "stream_sliding_event_counts",
    stream_ops.sliding_event_counts,
    """
SELECT CAST(floor(epoch_us(ts) / 1800000000) - d AS BIGINT) AS slide_id,
       count(*) AS n_events
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS d)
WHERE ts IS NOT NULL
GROUP BY slide_id
""",
)
register(
    # stream-stream interval join (watermarked both sides); AvailableNow
    # processes the whole file, so the appended pair set equals the batch
    # range join restricted to clicks -> exact oracle
    "stream_click_purchase_join",
    stream_ops.stream_interval_join,
    """
WITH base AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
p AS (SELECT user_id, event_id AS p_event_id, ts_us AS p_ts FROM base
      WHERE event_type = 'purchase')
SELECT p.p_event_id, p.user_id, count(*) AS n_click_context
FROM p JOIN base c ON p.user_id = c.user_id
WHERE c.event_type = 'click'
  AND c.ts_us >= p.p_ts - 3600000000 AND c.ts_us < p.p_ts
GROUP BY p.p_event_id, p.user_id
""",
)
register(
    # SESSION windows (F.session_window): dynamic-length per-user windows
    # closing after a 30-min gap. Append mode emits exactly the sessions
    # the final watermark closed (end <= max_ts - gap) — deterministic
    # under AvailableNow, so the batch oracle withholds the same open
    # tail and the check is value-hash exact.
    "stream_session_windows",
    stream_ops.session_window_counts,
    """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
  WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
              OR ts_us - lag(ts_us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessioned AS (
  SELECT user_id, ts_us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
sess AS (
  SELECT user_id, sid, count(*) AS n_events,
         min(ts_us) AS s_us, max(ts_us) + 1800000000 AS e_us
  FROM sessioned GROUP BY user_id, sid
),
wm AS (SELECT max(epoch_us(ts)) - 1800000000 AS w FROM events)
SELECT user_id, s_us, e_us, CAST(n_events AS BIGINT) AS n_events
FROM sess, wm WHERE e_us <= wm.w
""",
)
register(
    # streaming accumulation of the mergeable quantile sketch: counts
    # sum across micro-batches exactly as across partitions, so the
    # BATCH oracle is value-hash exact against the streamed state
    "stream_quantile_histogram",
    stream_ops.quantile_histogram_stream,
    sketches.quantile_histogram_sql(),
)
register(
    # stream-static hygiene gate: per-micro-batch decontamination
    # against the broadcast static holdout gram set; stateless, so the
    # batch oracle is exact over the union of batches
    "stream_decontamination",
    stream_ops.decontamination_stream,
    opl.decontamination_sql(),
)
register(
    # stream-static admission gate: per-micro-batch perplexity-bucket
    # resampling against the ONCE-fit static unigram model
    "stream_quality_resample",
    stream_ops.quality_resample_stream,
    opl.resample_verdicts_sql(),
)
register(
    # mergeable-state demo #3 (after HLL and the quantile histogram):
    # the manifest's counts sum and its xor signature folds across
    # micro-batches; batch oracle value-hash exact
    "stream_dataset_manifest",
    stream_ops.dataset_manifest_stream,
    opl.dataset_manifest_sql(),
)
register(
    "stream_dedup_events",
    stream_ops.dedup_events_stream,
    """
SELECT event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type
""",
)
register(
    # streaming CDC merge ON THE STORE: per-micro-batch update/delete
    # merge into the label-partitioned vector store (partition-scoped
    # rewrites; deletes win on overlap) — the streaming form of
    # s10_cdc_merge; exact oracle = the batch CASE/WHERE merge
    "stream_cdc_upserts",
    stream_ops.cdc_upserts_stream,
    """
WITH post AS (
  SELECT vec_id, label,
         CASE WHEN vec_id % 11 = 5 THEN list_reverse(embedding)
              ELSE embedding END AS embedding
  FROM embeddings WHERE label IS NOT NULL AND vec_id % 13 != 7
)
SELECT vec_id, label,
       round(CAST(embedding[1] AS DOUBLE), 6) AS e0,
       round(CAST(embedding[2] AS DOUBLE), 6) AS e1,
       round(CAST(embedding[3] AS DOUBLE), 6) AS e2,
       round(CAST(embedding[4] AS DOUBLE), 6) AS e3
FROM post
""",
)
register(
    # streaming QUERY WORKLOAD: micro-batched search requests
    # broadcast-joined against the static corpus, exact per-query top-k
    # per batch; stateless, so the appended union equals the batch
    # multi-query oracle exactly
    "stream_knn_queries",
    lambda s, d: stream_ops.knn_query_stream(s, d, k=5),
    opl.brute_force_topk_sql(query_ids=list(range(10)), k=5),
)
register(
    # online INGESTION dedup (r14): new-document micro-batches probed
    # against a persistent MinHash fingerprint store (band-bucket probe
    # + exact-jaccard verify, keep-first within a batch); novel docs
    # append their fingerprints, so later batches dedup against earlier
    # survivors — incremental corpus dedup, never a re-dedup. Exact
    # layered-CTE oracle.
    "stream_ingestion_dedup",
    stream_ops.ingestion_dedup_stream,
    opl.ingestion_dedup_sql(),
)
register(
    # streaming IVF index maintenance (r13 verdict #3): mutation batches
    # are assigned to the EXISTING durable kmeans centers (one broadcast
    # projection — the quantizer is never refit per batch), only touched
    # list partitions rewrite, and a drift monitor (per-list count +
    # quantization-error deltas vs the fit-time baseline, integer
    # micro-unit arithmetic) raises refit_due — the reference's
    # rebuild-on-mutation background task applied to a TRAINED index
    # (services/background_tasks.py:14-91). EXACT oracle via the pinned
    # sf0.01 kmeans|| centers, same precondition and _PINNED_SF routing
    # as mllib_ivf_kmeans_topk.
    "stream_ivf_maintenance",
    stream_ops.ivf_maintenance_stream,
    mllib_index.ivf_maintenance_sql(),
)
register(
    # the refit that refit_due SCHEDULES (r14 verdict "missing #2" —
    # the trigger now has a consequence): maintained stream under a
    # drift-inducing x4-scaled feed, loud guard that the threshold
    # fired, canonical-Lloyd REFIT on the post-state corpus (the
    # SQL-replayable fit, not the RNG MLlib one), full list rebuild on
    # the new centers, and per-list pre/post quantization-error stats
    # so the refit's value is driver-visible. Post-refit state ==
    # from-scratch build pinned in tests. Pinned-center precondition ->
    # _PINNED_SF routing, same as stream_ivf_maintenance.
    "stream_ivf_refit",
    stream_ops.ivf_refit_stream,
    mllib_index.ivf_refit_sql(),
)
register(
    # streaming incremental INDEX maintenance (r12 verdict #6): startup
    # full LSH build, then foreachBatch over a two-file mutation log
    # recomputes ONLY the mutated libraries' partitions via the stored
    # index's dynamic-partition overwrite — the reference's
    # rebuild-on-mutation BackgroundTasks (background_tasks.py:14-91,
    # vector_service.py:350-390). Exact oracle: signature bits over the
    # post-state embeddings (untouched-partition byte-identity is pinned
    # in tests/test_round13_ops.py).
    "stream_index_maintenance",
    stream_ops.index_maintenance_stream,
    oracles.index_maintenance_sql(_PLANES),
)
register(
    # per-document TF-IDF keyword extraction (metadata enrichment):
    # integer millinat idf, exact integer scores, total-ordered top-k
    "text_tfidf_keywords",
    lambda s, d: textops.tfidf_keywords(load(s, d, "documents"), k=5),
    opl.tfidf_keywords_sql(k=5),
)
register(
    # bigram LM fluency: common words in an UNUSUAL ORDER score well
    # under the unigram gate but poorly here; same millinat-integer
    # determinism as text_unigram_logprob
    "text_bigram_logprob",
    lambda s, d: textops.bigram_logprob(load(s, d, "documents")),
    opl.bigram_logprob_sql(),
)
register(
    # perplexity-proxy quality signal: per-document character entropy
    "text_char_entropy",
    lambda s, d: textops.char_entropy(load(s, d, "documents")),
    textops.char_entropy_sql(),
)
register(
    # contrastive training-pair generation: minhash near-dups as
    # positives, deterministic md5-ring successors as negatives
    "pipeline_contrastive_pairs",
    lambda s, d: dedup.contrastive_pairs(load(s, d, "documents"), threshold=0.2),
    f"""
WITH pos AS (
  SELECT doc_id_1 AS anchor_id, doc_id_2 AS other_id, 'pos' AS label
  FROM ({opl.minhash_near_dups_sql(threshold=0.2)})
),
sharded AS (
  SELECT doc_id, text,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {dedup.CONTRASTIVE_SHARDS} AS shard
  FROM documents WHERE text IS NOT NULL
),
ranked AS (
  SELECT doc_id, shard,
         row_number() OVER (PARTITION BY shard ORDER BY md5(text), doc_id) AS rk,
         count(*) OVER (PARTITION BY shard) AS n_docs
  FROM sharded
),
negs AS (
  SELECT a.doc_id AS anchor_id, b.doc_id AS other_id, 'neg' AS label
  FROM ranked a JOIN ranked b
    ON b.shard = a.shard AND b.rk = a.rk % a.n_docs + 1
  UNION ALL
  SELECT a.doc_id, b.doc_id, 'neg'
  FROM ranked a JOIN ranked b
    ON b.shard = a.shard AND b.rk = (a.rk + 1) % a.n_docs + 1
)
SELECT anchor_id, other_id, label FROM pos
UNION ALL
SELECT anchor_id, other_id, label FROM negs WHERE anchor_id != other_id
""",
)
register(
    "text_stratified_sample",
    lambda s, d: textops.stratified_sample(load(s, d, "documents"), rate_pct=20),
    """
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 100 < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM documents GROUP BY lang
""",
)
register(
    "text_curation_funnel",
    lambda s, d: textops.curation_funnel(load(s, d, "documents")),
    f"""
WITH scored AS (
  SELECT lang,
         len({opl.TOKS}) >= 10
         AND CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) >= 0.6 AS keep
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS keep_rate
FROM scored GROUP BY lang
""",
)
register(
    # END-TO-END curation: quality gate -> exact dedup keep-first ->
    # deterministic 20% stratified sample -> per-language accounting,
    # fused into one plan (scan + semi-join + aggregation)
    "pipeline_curation_end_to_end",
    lambda s, d: textops.curation_pipeline(load(s, d, "documents")),
    f"""
WITH scored AS (
  SELECT doc_id, lang, text FROM documents
  WHERE len({opl.TOKS}) >= 10
    AND CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
        / CAST(length(text) AS DOUBLE) >= 0.6
),
canon AS (SELECT min(doc_id) AS doc_id FROM scored GROUP BY md5(text)),
surv AS (
  SELECT s.doc_id, s.lang, s.text FROM scored s
  WHERE s.doc_id IN (SELECT doc_id FROM canon)
)
SELECT lang, count(*) AS n_curated,
       CAST(sum(len({opl.TOKS})) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 100 < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM surv GROUP BY lang
""",
)
register(
    "o10_pending_anti_join",
    lambda s, d: load(s, d, "documents").join(
        load(s, d, "embeddings").filter(F.col("vec_id") < 300)
        .select(F.col("vec_id").alias("doc_id")),
        "doc_id", "left_anti",
    ).select("doc_id", "source"),
    opl.pending_anti_join_sql(limit_ids=300),
)
register(
    "startup_rebuild_report",
    stream_ops.startup_rebuild,
    opl.startup_rebuild_sql(),
)


from .operators import embed_source  # noqa: E402

register(
    # P6 extended with the embed-quarantine surface: under the default
    # deterministic encoder nothing fails (oracle pins 0 failed / 1
    # attempt); flaky-encoder injection is exercised in tests
    "p6_validation_report",
    lambda s, d: embed_source.validation_report(s, d),
    """
SELECT count(*) AS total_docs,
       CAST(sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_text,
       CAST(sum(CASE WHEN length(text) != n_chars THEN 1 ELSE 0 END) AS BIGINT)
         AS n_length_mismatch,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_ids,
       CAST(0 AS BIGINT) AS n_embed_failed,
       CAST(1 AS INTEGER) AS max_embed_attempts
FROM documents
""",
)
register(
    # S15 resilience shape: per-batch retry/backoff + quarantine inside
    # mapInPandas; default encoder never fails so the path stays
    # oracle-checkable
    "s15_embed_resilient",
    embed_source.embed_resilient_query,
    opl.embed_resilient_sql(),
)
register(
    # input_type asymmetry: search_document vs search_query are
    # DIFFERENT encoders (token-salted) — cos_dq != 1 proves it
    "s15_embed_asymmetry",
    embed_source.embed_asymmetry,
    opl.embed_asymmetry_sql(),
)
register(
    "a9_two_level_agg",
    lambda s, d: load(s, d, "embeddings").groupBy("label")
    .agg(F.count("*").alias("n"))
    .agg(
        F.round(F.avg("n"), 4).alias("avg_vectors_per_library"),
        F.max("n").alias("max_vectors"),
        F.min("n").alias("min_vectors"),
    ),
    """
WITH per AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
SELECT round(avg(n), 4) AS avg_vectors_per_library,
       max(n) AS max_vectors, min(n) AS min_vectors
FROM per
""",
)
register(
    "s16_json_roundtrip",
    lambda s, d: load(s, d, "documents")
    .select(F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("j"))
    .select(
        F.get_json_object("j", "$.doc_id").cast("long").alias("doc_id"),
        F.get_json_object("j", "$.lang").alias("lang"),
        F.get_json_object("j", "$.n_chars").cast("long").alias("n_chars"),
    )
    .groupBy("lang").agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")),
    """
WITH j AS (
  SELECT to_json(struct_pack(doc_id := doc_id, lang := lang, n_chars := n_chars)) AS js
  FROM documents
)
SELECT CAST(json_extract_string(js, '$.lang') AS VARCHAR) AS lang,
       count(*) AS n_docs,
       CAST(sum(CAST(json_extract_string(js, '$.n_chars') AS BIGINT)) AS BIGINT) AS total_chars
FROM j GROUP BY lang
""",
)


_ROUNDTRIP_TMP: str | None = None


def _roundtrip_dir(leaf: str) -> str:
    """One per-process temp root, reused across bench/parity sweeps and
    removed at exit — repeated invocations overwrite in place instead of
    leaking a fresh mkdtemp per call."""
    global _ROUNDTRIP_TMP
    if _ROUNDTRIP_TMP is None:
        import atexit
        import shutil
        import tempfile

        _ROUNDTRIP_TMP = tempfile.mkdtemp(prefix="vdbs_roundtrip_")
        atexit.register(shutil.rmtree, _ROUNDTRIP_TMP, ignore_errors=True)
    return _ROUNDTRIP_TMP + "/" + leaf


def _csv_roundtrip(s: SparkSession, d: str) -> DataFrame:
    """S16 extended to a real FILE sink+source: write the customer table
    as CSV (header + explicit schema on read-back — CSV carries no
    types), read it back, aggregate. The oracle aggregates the source
    directly, so the check proves the roundtrip lossless for every
    column it touches."""
    out = _roundtrip_dir("customer_csv")
    cust = load(s, d, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", F.round("c_acctbal", 4).alias("c_acctbal")
    )
    cust.write.mode("overwrite").option("header", True).csv(out)
    back = (
        s.read.option("header", True)
        .schema("c_custkey long, c_nationkey int, c_mktsegment string, c_acctbal double")
        .csv(out)
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        F.max("c_custkey").alias("max_custkey"),
    )


register(
    "s17_csv_file_roundtrip",
    _csv_roundtrip,
    """
SELECT c_mktsegment, count(*) AS n_customers,
       round(sum(round(c_acctbal, 4)), 4) AS total_acctbal,
       max(c_custkey) AS max_custkey
FROM customer GROUP BY c_mktsegment
""",
)


def _orc_roundtrip(s: SparkSession, d: str) -> DataFrame:
    """ORC sink+source (Spark-native second columnar format): write the
    events projection as ORC, read back, aggregate — proves the engine
    serves more than one columnar format with identical semantics."""
    out = _roundtrip_dir("events_orc")
    ev = load(s, d, "events").select("event_id", "user_id", "event_type", "value")
    ev.write.mode("overwrite").orc(out)
    back = s.read.orc(out)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.max("event_id").alias("max_event_id"),
    )


register(
    "s18_orc_file_roundtrip",
    _orc_roundtrip,
    """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       max(event_id) AS max_event_id
FROM events GROUP BY event_type
""",
)
register(
    # dataset versioning / time travel (r14): partition-level
    # copy-on-write commits of the CDC history + a (version, label) ->
    # dir manifest, so any historical snapshot reads at full scan speed
    # — reproducible training snapshots, the Delta/Iceberg contract
    # without a table format. Output = per-version row count + BIGINT
    # micro-unit checksum; exact oracle replays each version's CDC
    # predicates.
    "s19_store_time_travel",
    store_ops.store_time_travel,
    store_ops.store_time_travel_sql(),
)


register(
    # retention/vacuum for the versioned store (r14): keep exactly the
    # dirs the latest snapshot references, physically delete the rest,
    # then RE-READ the surviving snapshot — a wrong needed-set fails as
    # a read error or hash mismatch, never a silent pass. Dir
    # accounting is pure label algebra, so the oracle recomputes it.
    "s20_store_vacuum",
    store_ops.store_vacuum_retention,
    store_ops.store_vacuum_retention_sql(),
)


register(
    # small-file compaction (r14b): rewrite the latest snapshot one
    # file per label as a NEW copy-on-write commit (the OPTIMIZE analog
    # — old versions stay readable); pre/post summary parity proves the
    # rewrite moved bytes, not data. File-count reduction pinned in
    # tests (engine artifact, not SQL-derivable).
    "s21_store_compaction",
    store_ops.store_compaction,
    store_ops.store_compaction_sql(),
)


register(
    # schema evolution (r14b): a new column lands as a new commit; the
    # mergeSchema read NULL-backfills history without touching old
    # bytes — membership and the new column are pure arithmetic, so the
    # NULL semantics are proven by value hash, not asserted
    "s22_store_schema_evolution",
    store_ops.schema_evolution,
    store_ops.schema_evolution_sql(),
)


register(
    # version diff (r14b): the review surface before a promote — per
    # label, rows added/removed/changed/identical between the bootstrap
    # and the final CDC version, via one full-outer join per label
    # scope; oracle recomputes every cell from the CDC predicates
    "s24_store_version_diff",
    store_ops.version_diff,
    store_ops.version_diff_sql(),
)
register(
    # RESTORE as a commit (r15): roll back to v0 via an O(metadata)
    # manifest entry pointing at v0's directories — history v1/v2 stays
    # readable, and the v3==v0 equality is in the driver-compared
    # artifact (the Delta RESTORE analog)
    "s25_store_restore",
    store_ops.store_restore,
    store_ops.store_restore_sql(),
)
register(
    # incremental change-feed read (r15): the rows a downstream
    # incremental consumer pulls between two versions — removed rows
    # with NULL payload, changed rows with the new payload checksum;
    # prunes to pointer-unequal label dirs at scale (the COW invariant)
    "s26_store_incremental_read",
    store_ops.store_incremental_read,
    store_ops.store_incremental_read_sql(),
)
register(
    # shallow clone (r14b): fork the store in O(metadata) — a new
    # manifest over the source's dirs; a further mutation commits into
    # the CLONE's tree only, and the source-head checksum doubles as
    # the byte-untouched proof
    "s23_store_clone",
    store_ops.store_clone,
    store_ops.store_clone_sql(),
)


# --- remaining §2 surface: scans, inserts, flag updates, stats, kernels ----
from .functions import similarity as sim  # noqa: E402

register(
    "s4_scan_by_parent",
    lambda s, d: load(s, d, "events").filter(F.col("user_id") == 5)
    .select("event_id", "user_id", "event_type", F.round("value", 4).alias("value")),
    "SELECT event_id, user_id, event_type, round(value, 4) AS value "
    "FROM events WHERE user_id = 5",
)
register(
    "s5_full_scan",
    lambda s, d: load(s, d, "region"),
    "SELECT r_regionkey, r_name FROM region",
)
register(
    "s6_vector_store_scan",
    lambda s, d: load(s, d, "embeddings")
    .select("vec_id", "label", F.round(sim.norm(F.col("embedding")), 6).alias("vnorm")),
    f"SELECT vec_id, label, round({oracles.norm_sql('embedding')}, 6) AS vnorm FROM embeddings",
)


def _insert_poststate(s: SparkSession, d: str) -> DataFrame:
    docs = load(s, d, "documents")
    new_rows = s.createDataFrame(
        [(1_000_001, "inserted row one", "en", "__new__", 16),
         (1_000_002, "inserted row two", "en", "__new__", 16)],
        schema=docs.schema,
    )
    return (
        docs.unionByName(new_rows)
        .groupBy("source").agg(F.count("*").alias("n_docs"), F.max("doc_id").alias("max_id"))
    )


register(
    "s8_insert",
    _insert_poststate,
    """
WITH post AS (
  SELECT doc_id, source FROM documents
  UNION ALL SELECT 1000001, '__new__' UNION ALL SELECT 1000002, '__new__'
)
SELECT source, count(*) AS n_docs, max(doc_id) AS max_id FROM post GROUP BY source
""",
)


def _batch_insert_poststate(s: SparkSession, d: str) -> DataFrame:
    emb = load(s, d, "embeddings")
    batch = (
        emb.filter(F.col("vec_id") < 10)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding",
                F.lit(99).cast("int").alias("label"))
    )
    return emb.unionByName(batch).groupBy("label").agg(F.count("*").alias("n_vectors"))


register(
    "s9_batch_insert",
    _batch_insert_poststate,
    """
WITH post AS (
  SELECT vec_id, label FROM embeddings
  UNION ALL SELECT vec_id + 1000000, 99 FROM embeddings WHERE vec_id < 10
)
SELECT label, count(*) AS n_vectors FROM post GROUP BY label
""",
)
register(
    "s14_flag_update",
    lambda s, d: load(s, d, "embeddings").select("label").distinct()
    .withColumn("indexed", F.col("label").isin([0, 1, 2])),
    "SELECT DISTINCT label, label IN (0, 1, 2) AS indexed FROM embeddings",
)
register(
    "p1_projection",
    lambda s, d: load(s, d, "lineitem")
    .select("l_orderkey", "l_linenumber", F.round("l_quantity", 4).alias("qty")),
    "SELECT l_orderkey, l_linenumber, round(l_quantity, 4) AS qty FROM lineitem",
)
register(
    "p5_title_match",
    lambda s, d: load(s, d, "documents")
    .filter((F.col("source") == "src3") & (F.col("lang") == "en"))
    .select("doc_id", "source", "lang"),
    "SELECT doc_id, source, lang FROM documents WHERE source = 'src3' AND lang = 'en'",
)
register(
    "a3_library_stats",
    lambda s, d: load(s, d, "embeddings").groupBy("label")
    .agg(F.count("*").alias("n"))
    .agg(
        F.count("*").alias("total_libraries"),
        F.sum(F.when(F.col("n") >= 50, 1).otherwise(0)).alias("n_indexed"),
    ),
    """
WITH per AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
SELECT count(*) AS total_libraries,
       CAST(sum(CASE WHEN n >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_indexed
FROM per
""",
)
register(
    "a4_document_stats",
    lambda s, d: load(s, d, "documents").agg(
        F.count("*").alias("total_docs"),
        F.countDistinct("source").alias("n_sources_with_docs"),
        F.countDistinct("lang").alias("n_langs_with_docs"),
    ),
    "SELECT count(*) AS total_docs, count(DISTINCT source) AS n_sources_with_docs, "
    "count(DISTINCT lang) AS n_langs_with_docs FROM documents",
)


def _kernel_pairwise(s: SparkSession, d: str) -> DataFrame:
    """K1-K6 as a row-wise kernel sweep: consecutive-id vector pairs
    scored under every metric + distance form in one projection."""
    emb = load(s, d, "embeddings")
    a = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("vec_id_1"), F.col("embedding").alias("e1")
    )
    b = emb.select((F.col("vec_id") - 1).alias("vec_id_1"),
                   F.col("vec_id").alias("vec_id_2"), F.col("embedding").alias("e2"))
    e1, e2 = F.col("e1"), F.col("e2")
    return (
        a.join(b, "vec_id_1")
        .select(
            "vec_id_1", "vec_id_2",
            F.round(sim.cosine(e1, e2), 6).alias("cos_sim"),
            F.round(sim.dot(e1, e2), 6).alias("dot_sim"),
            F.round(sim.euclidean_distance(e1, e2), 6).alias("eu_dist"),
            F.round(sim.euclidean_similarity(e1, e2), 6).alias("eu_sim"),
            F.round(sim.manhattan_distance(e1, e2), 6).alias("man_dist"),
            F.round(sim.manhattan_similarity(e1, e2), 6).alias("man_sim"),
        )
    )


def _kernel_pairwise_sql() -> str:
    a, b = "a.embedding", "b.embedding"
    return f"""
SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       round({oracles.cosine_sql(a, b)}, 6) AS cos_sim,
       round({oracles.dot_sql(a, b)}, 6) AS dot_sim,
       round({oracles.euclidean_distance_sql(a, b)}, 6) AS eu_dist,
       round({oracles.euclidean_similarity_sql(a, b)}, 6) AS eu_sim,
       round({oracles.manhattan_distance_sql(a, b)}, 6) AS man_dist,
       round({oracles.manhattan_similarity_sql(a, b)}, 6) AS man_sim
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
WHERE a.vec_id < 50
"""


register("kernel_pairwise", _kernel_pairwise, _kernel_pairwise_sql())


def _kernel_zero_guard(s: SparkSession, d: str) -> DataFrame:
    """Zero-vector guard semantics (similarity.py:47-52,167-181): cosine
    against an all-zero vector is 0.0, never a division error; the
    1/(1+dist) forms stay finite."""
    emb = load(s, d, "embeddings").filter(F.col("vec_id") < 5)
    zero = F.transform(F.col("embedding"), lambda x: F.lit(0.0))
    return emb.select(
        "vec_id",
        F.round(sim.cosine(F.col("embedding"), zero), 6).alias("cos_vs_zero"),
        F.round(sim.cosine(zero, zero), 6).alias("cos_zero_zero"),
        F.round(sim.euclidean_similarity(F.col("embedding"), zero), 6).alias("eu_sim_vs_zero"),
    )


register(
    "kernel_zero_guard",
    _kernel_zero_guard,
    f"""
WITH z AS (
  SELECT vec_id, embedding,
         list_transform(embedding, x -> CAST(0.0 AS DOUBLE)) AS zv
  FROM embeddings WHERE vec_id < 5
)
SELECT vec_id,
       round({oracles.cosine_sql('embedding', 'zv')}, 6) AS cos_vs_zero,
       round({oracles.cosine_sql('zv', 'zv')}, 6) AS cos_zero_zero,
       round({oracles.euclidean_similarity_sql('embedding', 'zv')}, 6) AS eu_sim_vs_zero
FROM z
""",
)

# T5: k > n returns all n rows (similarity.py:464-466); library 1 has
# fewer than 100 vectors at small SFs, so k=100 returns the whole library
register(
    "t5_k_exceeds_n",
    lambda s, d: knn_ops.knn(s, d, query_id=0, k=100, metric="cosine", library=1),
    oracles.knn_sql(query_id=0, k=100, metric="cosine", library=1),
)

# I12: per-library index info (vector_service.py:394-431) — count, dim,
# and the library's preferred algorithm (config-driven dispatch modeled
# as a deterministic label -> algorithm mapping)
register(
    "i12_index_info",
    # per-LIBRARY info: NULL labels are excluded (the registry contract,
    # lifecycle.algorithm_registry — a vector without a library id has
    # no per-library index to report on)
    lambda s, d: load(s, d, "embeddings")
    .filter(F.col("label").isNotNull())
    .groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.first(F.size("embedding")).alias("dim"),
    ).withColumn(
        "algorithm",
        F.element_at(F.array(F.lit("flat"), F.lit("lsh"), F.lit("grid")),
                     (F.col("label") % 3 + 1).cast("int")),
    ),
    """
SELECT label, count(*) AS n_vectors, first(len(embedding)) AS dim,
       ['flat', 'lsh', 'grid'][(label % 3) + 1] AS algorithm
FROM embeddings WHERE label IS NOT NULL GROUP BY label
""",
)


# --- §2.13 observability: composed status + search-response metadata ------
from .operators import observability  # noqa: E402

register(
    "obs_service_status",
    observability.service_status,
    observability.SERVICE_STATUS_SQL,
)
register(
    "obs_search_meta",
    lambda s, d: observability.search_meta(s, d, query_id=0, k=10, metric="cosine"),
    observability.search_meta_sql(
        oracles.knn_sql(query_id=0, k=10, metric="cosine"),
        query_id=0, k=10, metric="cosine",
    ),
)
# wall-clock timing is nondeterministic -> rows-only, no oracle
register(
    "obs_timed_search",
    lambda s, d: observability.timed_search(s, d, query_id=0, k=10, metric="cosine"),
)
from .sources.tables import TABLES as _TABLES  # noqa: E402

register(
    "obs_health",
    observability.health,
    # n_tables derives from the registered-table tuple, not a hardcoded
    # count — adding/removing a table cannot desync the oracle
    f"SELECT 'healthy' AS status, 'vector-db-spark' AS service, "
    f"{len(_TABLES)} AS n_tables",
)
register(
    "obs_clear_library_stats",
    lambda s, d: observability.clear_library_stats(s, d, library=0),
    observability.clear_library_stats_sql(library=0),
)
register(
    # the reference's choose_search_strategy rules (similarity.py:
    # 397-436) evaluated declaratively per library over corpus stats
    "obs_index_advisor",
    observability.index_advisor,
    observability.index_advisor_sql(),
)


# --- round 16: serving autotune, PCA transform, index/graph health ----------

def _graph_degree_audit_sql(m: int = 3) -> str:
    """Mirror of ann.graph_degree_audit over the banded knn_join
    algebra: reverse-edge semi-join for reciprocity, per-dst counts for
    the in-degree max, integer micro-unit ratio."""
    return f"""
WITH g AS MATERIALIZED (
  SELECT label, src, dst FROM ({_knn_join_sql(m=m)})
),
mut AS (
  SELECT g.label, CAST(count(*) AS BIGINT) AS n_mutual
  FROM g SEMI JOIN g r
    ON r.label = g.label AND r.src = g.dst AND r.dst = g.src
  GROUP BY g.label
),
per AS (
  SELECT label, CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
         CAST(count(*) AS BIGINT) AS n_edges
  FROM g GROUP BY label
),
indeg AS (
  SELECT label, CAST(max(d) AS BIGINT) AS max_in_degree FROM (
    SELECT label, dst, count(*) AS d FROM g GROUP BY label, dst
  ) GROUP BY label
)
SELECT p.label, p.n_nodes, p.n_edges,
       CAST(coalesce(m.n_mutual, 0) AS BIGINT) AS n_mutual,
       CAST(coalesce(m.n_mutual, 0) * 1000000 // p.n_edges AS BIGINT)
         AS reciprocity_micro,
       i.max_in_degree
FROM per p LEFT JOIN mut m ON m.label = p.label
JOIN indeg i ON i.label = p.label
"""


register(
    # serving-knob DECISION on top of the recall sweep (r16): smallest
    # nprobe whose MEAN recall@10 over the query set meets the target,
    # loud max-fallback when nothing qualifies — one sweep pass, then
    # len(nprobes) rows of metadata
    "ann_ivf_nprobe_autotune",
    lambda s, d: ann.ivf_nprobe_autotune(
        s, d, k=10, n_lists=7, target_recall_micro=800_000
    ),
    oracles_quant.nprobe_autotune_sql(
        k=10, n_lists=7, target_recall_micro=800_000
    ),
)
register(
    # the top-2 PCA plane APPLIED as a transform (r16): integer-exact
    # 2-D projection of every vector (the curation-UI scatter / first
    # two whitening rows) — broadcast directions, row-parallel scan,
    # zero shuffle; oracle unrolls both chains and replays the dot
    "emb_pca_project2d",
    lambda s, d: ann.pca_project2d(s, d),
    ann.pca_project2d_sql(dim=_DIM),
)
register(
    # k-NN graph health (r16): per-label reciprocity + max in-degree —
    # reciprocity bounds what the mutual-kNN contraction keeps;
    # in-degree skew is the hot-partition signal for frontier joins
    "ann_graph_degree_audit",
    lambda s, d: ann.graph_degree_audit(s, d, m=3),
    _graph_degree_audit_sql(m=3),
)
register(
    # IVF list-balance audit (r16): per-list share + imbalance ratio vs
    # the uniform split, EMPTY lists kept — the tail-latency/skew stat
    # that triggers refit or list-splitting before recall shows drift
    "ann_ivf_balance_audit",
    lambda s, d: ann.ivf_balance_audit(s, d, n_lists=7),
    oracles_quant.ivf_balance_audit_sql(n_lists=7),
)
register(
    # KMV mergeability proven (r16): bottom-K of the union of shard
    # bottom-Ks == whole-corpus bottom-K; per-slice/merged/whole
    # distinct estimates with the non-saturated guard (n < K -> exact)
    "sketch_kmv_merge",
    lambda s, d: sketches.kmv_merge(s, d),
    sketches.kmv_merge_sql(),
)
register(
    # the balance audit's CONSEQUENCE (r16, the detect->act discipline):
    # deterministic argmax list split by a canonical two-means trained
    # on the list's own sample — single-list blast radius (partition-
    # scoped, like the maintenance rebuilds), shares before/after
    "ann_ivf_list_split",
    lambda s, d: ann.ivf_list_split(s, d, n_lists=7),
    oracles_quant.ivf_list_split_sql(n_lists=7),
)
register(
    # the mixture weights APPLIED (r16): epoch token-budget allocation
    # across (lang, source) domains — largest-remainder integer
    # rounding (uncapped allocs sum EXACTLY to the budget), availability
    # caps reported as shortfall, windows only over the domain aggregate
    "pipeline_token_budget_fill",
    lambda s, d: textops.token_budget_fill(load(s, d, "documents")),
    textops.token_budget_fill_sql(),
)


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """entry() target: the §3.1 flagship read path end-to-end."""
    return knn_ops.knn(spark, sf_dir, query_id=0, k=10, metric="cosine", hydrate=True)


# --- Registration order ---------------------------------------------------
# External correctness tooling samples the FIRST 50 registered queries.
# Since round 16 the head is COMPUTED from the committed
# CORRECTNESS_r*.json history (r15 verdict #1: the hand-curated list's
# narrative drifted from the artifacts): rotationlib.priority_order
# ranks never-green first, then the round's declared changed-path list,
# then oldest-green-first, and scripts/gen_status.py materializes it
# into rotation_generated.py. Everything displaced stays green under
# tests/test_oracle_parity.py (the identical compare over ALL
# registered oracles); tests/test_rotation.py pins the committed head
# against a fresh computation.
try:
    from .rotation_generated import PRIORITY_50 as _PRIORITY_50
except ImportError:  # bootstrap: scripts/gen_status.py writes the file
    _PRIORITY_50 = []


def _apply_registration_order() -> None:
    # tolerate names that left the registry mid-edit; the strict
    # committed-equals-computed contract lives in tests/test_rotation.py
    head = [n for n in _PRIORITY_50 if n in QUERIES]
    seen = set(head)
    order = head + [n for n in QUERIES if n not in seen]
    for registry in (QUERIES, ORACLES):
        reordered = {n: registry[n] for n in order if n in registry}
        registry.clear()
        registry.update(reordered)


_apply_registration_order()
