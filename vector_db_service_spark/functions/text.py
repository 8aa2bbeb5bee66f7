"""Text-analysis column expressions for the training-data pipeline ops.

These are beyond the reference's surface (its only text handling is
emptiness checks, storage.py:59,112) — they're the document-pipeline
operators a 100 TB corpus engine needs (BASELINE.json north_star):
tokenization, quality scoring, language-ID heuristics, fingerprinting.

Everything is a JVM-side column expression (no Python UDFs), and every
primitive is chosen to have an exactly-equivalent DuckDB form so the
oracle hash-matches:
- token hash = first 8 hex chars of md5, parsed as int64 (md5 is
  bit-identical across engines; the 32-bit prefix fits exactly).
- rolling hash = left fold (acc*31 + h) mod p over token hashes.
- all ratios in double, rounded at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD_P = 2_147_483_647  # 2^31 - 1, keeps a*h + b inside int64 under ANSI mode

# tiny fixed stopword lists for the language-ID heuristic (deterministic,
# shared verbatim with the oracle SQL)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
}
LANGS = sorted(STOPWORDS)  # tie-break order: alphabetical


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text (single-space split —
    identical across Spark split() and DuckDB string_split())."""
    return F.split(F.lower(text), " ")


def word_count(text: Column) -> Column:
    """Alpha-word count via regex — [a-z]+ behaves identically in Java
    regex and RE2."""
    return F.regexp_count(F.lower(text), F.lit("[a-z]+"))


def alpha_chars(text: Column) -> Column:
    return F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))


def token_hash(tok: Column) -> Column:
    """32-bit md5-prefix hash mod p — the engine's deterministic,
    cross-engine string hash."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % F.lit(MOD_P)


def token_hashes(text: Column) -> Column:
    return F.transform(tokens(text), token_hash)


def rolling_fingerprint(text: Column) -> Column:
    """Document fingerprint: left-fold polynomial rolling hash over token
    hashes, (acc*31 + h) mod p."""
    return F.aggregate(
        token_hashes(text),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(31) + h) % F.lit(MOD_P),
    )


def stopword_hits(text: Column, lang: str) -> Column:
    """Distinct stopword hits (set semantics match DuckDB list_intersect)."""
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.array_intersect(tokens(text), stops))


def predicted_lang(text: Column) -> Column:
    """Arg-max language by stopword hits, alphabetical tie-break —
    expressed as a CASE cascade so the oracle can replicate it verbatim."""
    hits = {lang: stopword_hits(text, lang) for lang in LANGS}
    expr = F.lit(LANGS[-1])
    # cascade from last to first so earlier (alphabetically smaller)
    # languages win ties
    for lang in reversed(LANGS[:-1]):
        later = [hits[other] for other in LANGS if other > lang]
        cond = None
        for h in later:
            c = hits[lang] >= h
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr
