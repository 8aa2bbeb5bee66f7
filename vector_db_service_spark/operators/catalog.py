"""Catalog / CRUD-equivalent operators (SURVEY §2.1-§2.4, §2.9).

The reference's repositories mutate PostgreSQL rows in place
(repositories/*.py); on an immutable columnar store every mutation is a
*transformation that returns the post-state*:

  insert          -> union of old + new            (S8/S9)
  upsert          -> union + row_number latest-wins dedup (S10,
                     reference add_vector vector_db/storage.py:43-100)
  delete          -> left_anti join on the victim keys (S11,
                     chunk_repository.py:164-190)
  cascade delete  -> anti-joins keyed on library_id (S12,
                     library_repository.py:75-85 + models.py:41-42,63)
  partial update  -> when(key matches, new).otherwise(old) (S13/S14)

At 100 TB these run as partition-scoped overwrites (only the mutated
library partitions are rewritten) or as Delta/Iceberg MERGE; the logical
plans below are exactly what those table formats compile MERGE into.

Stats operators A1-A6 mirror the reference's stats endpoints
(chunk_repository.py:268-286, library_repository.py:145-158,
storage.py:263-316) as single-pass aggregations with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load


# --- filters (P1-P6) ------------------------------------------------------

def filter_by(df: DataFrame, conditions: dict[str, object]) -> DataFrame:
    """P3 dynamic metadata filter: fold equality predicates from a dict
    (reference filter_chunks, chunk_repository.py:239-253). Catalyst
    pushes the conjunction down to the parquet scan."""
    for k, v in conditions.items():
        df = df.filter(F.col(k) == F.lit(v))
    return df


def filter_by_json(df: DataFrame, json_col: str,
                   conditions: dict[str, object]) -> DataFrame:
    """P3 dynamic filter over a JSON metadata column: the reference's
    dict filter can hit keys stored in the chunk's extra_metadata JSON
    blob (chunk_repository.py:239-253 over database/models.py:87).
    Predicates are JSONPath -> value equality via get_json_object — a
    JVM-codegen expression, no UDF. JSON extraction cannot push to the
    parquet scan; at 100 TB hot keys get promoted to real columns."""
    for path, v in conditions.items():
        df = df.filter(F.get_json_object(F.col(json_col), path) == F.lit(v))
    return df


def create_or_get_documents(docs: DataFrame) -> DataFrame:
    """P5: the reference's create_or_get first-writer-wins semantics
    (document_repository.py:14-31 — find by title in library, return the
    existing document if present, else create; title match
    :83-93). Titles are synthesized (first 3 tokens, lowercased) because
    the driver fixtures carry no title column; the semantics are modeled
    exactly: the EARLIEST doc_id per (source, title) is the canonical
    document, every later arrival resolves to it, `created` marks the
    writer that won. One window min per (source, title) partition —
    shuffles once on the dedup key, no join."""
    title = F.array_join(F.slice(F.split(F.lower(F.col("text")), " "), 1, 3), " ")
    w = Window.partitionBy("source", "title")
    return (
        docs.withColumn("title", title)
        .select(
            "doc_id", "source", "title",
            F.min("doc_id").over(w).alias("resolved_id"),
        )
        .withColumn("created", F.col("doc_id") == F.col("resolved_id"))
    )


def exists(df: DataFrame, predicate: Column) -> DataFrame:
    """P4 existence probe (chunk_repository.py:194-199) as a 1-row frame.
    Uses LIMIT 1 under an aggregate so the scan stops early."""
    return df.filter(predicate).limit(1).agg(F.count(F.lit(1)) > F.lit(0)).toDF("found")


# --- mutations as post-state transforms (S8-S14) --------------------------

def upsert_vectors(emb: DataFrame, updates: DataFrame) -> DataFrame:
    """S10 add-or-replace keyed by vec_id (storage.py:43-100). Latest
    write wins via row_number over a 2-row-per-key window — the
    anti-join-free MERGE shape; shuffles once on the key."""
    tagged_old = emb.withColumn("_v", F.lit(0))
    tagged_new = updates.withColumn("_v", F.lit(1))
    w = Window.partitionBy("vec_id").orderBy(F.desc("_v"))
    return (
        tagged_old.unionByName(tagged_new)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_v", "_rn")
    )


def delete_where(df: DataFrame, predicate: Column) -> DataFrame:
    """S11 delete-by-predicate: post-state = the complement. On a
    partitioned table this is a partition-scoped rewrite."""
    return df.filter(~predicate)


def cascade_delete_library(
    emb: DataFrame, docs: DataFrame, library: int
) -> tuple[DataFrame, DataFrame]:
    """S12 cascade: deleting a library removes its vectors and the
    documents those vectors hydrate (reference FK cascades,
    models.py:41-42,63). Returns both post-state tables."""
    emb_after = emb.filter(F.col("label") != F.lit(library))
    victims = emb.filter(F.col("label") == F.lit(library)).select(
        F.col("vec_id").alias("doc_id")
    )
    docs_after = docs.join(F.broadcast(victims), "doc_id", "left_anti")
    return emb_after, docs_after


def update_where(df: DataFrame, predicate: Column, assignments: dict[str, Column]) -> DataFrame:
    """S13 partial update: conditional projection, no shuffle
    (chunk_repository.py:128-148)."""
    for col_name, new_val in assignments.items():
        df = df.withColumn(col_name, F.when(predicate, new_val).otherwise(F.col(col_name)))
    return df


# --- joins (J2/J3) --------------------------------------------------------

def orphan_vectors(emb: DataFrame, docs: DataFrame) -> DataFrame:
    """J3 orphan diff: vector-store ids MINUS row-store ids
    (background_tasks.py:110-123, set subtraction at :123) as a
    left_anti join — no driver-side set materialization, scales to any
    id cardinality."""
    doc_ids = docs.select(F.col("doc_id").alias("vec_id"))
    return emb.join(doc_ids, "vec_id", "left_anti")


# --- stats aggregates (A1-A7) ---------------------------------------------

def count_by_library(emb: DataFrame) -> DataFrame:
    """A1 (chunk_repository.py:203-217) — partial agg map-side, tiny
    shuffle of one row per label."""
    return emb.groupBy("label").agg(F.count("*").alias("n_vectors"))


def chunk_stats(docs: DataFrame) -> DataFrame:
    """A2 multi-metric single-pass stats (chunk_repository.py:268-286):
    the reference scans 3 columns and counts client-side; here one
    aggregate node computes all metrics in one pass."""
    return docs.agg(
        F.count("*").alias("total_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(F.when(F.col("n_chars") > 300, 1).otherwise(0)).alias("n_long"),
    )


def vector_stats(emb: DataFrame) -> DataFrame:
    """A5 storage stats (storage.py:263-283): count, dimension,
    library count."""
    return emb.agg(
        F.count("*").alias("total_vectors"),
        F.min(F.size("embedding")).alias("min_dim"),
        F.max(F.size("embedding")).alias("max_dim"),
        F.countDistinct("label").alias("n_libraries"),
    )


def memory_stats(emb: DataFrame) -> DataFrame:
    """A6 memory accounting (storage.py:285-316): float32 => 4 bytes per
    component, the reference's n*d*4 formula (algorithms.py:199-201)."""
    return emb.agg(
        (F.sum(F.size("embedding")) * F.lit(4)).alias("vector_bytes"),
        F.count("*").alias("n_vectors"),
    )


def dim_minmax(emb: DataFrame) -> DataFrame:
    """A7 per-dimension min/max over all vectors (grid normalization
    input, algorithms.py:597-608). posexplode -> groupBy(pos): one
    shuffle of n*d narrow rows with map-side partial min/max, the
    scalable form of the reference's full-matrix np.min/np.max."""
    return (
        emb.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.round(F.min(F.col("x").cast("double")), 6).alias("dim_min"),
            F.round(F.max(F.col("x").cast("double")), 6).alias("dim_max"),
        )
    )


def apply_cdc(snapshot: DataFrame, cdc: DataFrame) -> DataFrame:
    """Change-data-capture MERGE: apply an (op, seq)-ordered batch of
    I/U/D records to a keyed snapshot in ONE pass — union + one window
    over the key, keep the highest-seq record per key, drop it if that
    record is a delete. The anti-join-free lakehouse merge shape: one
    shuffle on the key regardless of how many ops target it; on a
    Delta/Iceberg table this plan IS the MERGE INTO source.

    `snapshot` rows are implicit seq-0 upserts; `cdc` carries
    (vec_id, embedding, label, op, seq) with op in ('I','U','D').
    Ties on (vec_id, seq) break deterministically by op descending
    ('U' > 'I' > 'D'), so a same-seq upsert wins over a delete — callers
    that need a different policy must disambiguate with seq."""
    base = snapshot.select(
        "vec_id", "embedding", "label",
        F.lit("U").alias("op"), F.lit(0).cast("long").alias("seq"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("seq"), F.desc("op"))
    return (
        base.unionByName(cdc.select("vec_id", "embedding", "label", "op", "seq"))
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "D"))
        .drop("_rn", "op", "seq")
    )
