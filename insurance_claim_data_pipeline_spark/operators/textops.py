"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

These are the text-side operators a large-scale training-data pipeline
needs (LLM-data extension surface; the reference has no text analytics —
SURVEY.md §2.2). All are pure expression pipelines: one narrow projection
per document, no shuffle at all except where a groupBy is the semantics.
At 100 TB this family is embarrassingly parallel map work — the plans
contain a single scan each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles, shingles_sql, tokens
from ..registry import register
from ..session import load_table

TOKEN_STATS_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id, lang,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
       ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) AS type_token_ratio,
       ROUND(list_reduce(list_transform(toks, t -> CAST(length(t) AS DOUBLE)), (a, b) -> a + b)
             / CAST(len(toks) AS DOUBLE), 6) AS avg_token_len,
       CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')
                ) AS BIGINT) AS n_bpe_tokens
FROM tok
"""


@register("text_token_stats", oracle=TOKEN_STATS_ORACLE, tags=("text", "llm"))
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-document token statistics
    (count, distinct count, type-token ratio, mean token length) plus a
    BPE-ish regex token count (GPT-2-pre-tokenizer-shaped alternation:
    letter runs / digit runs / punctuation runs, each with optional
    leading space) — the cheap proxy for LLM token budgeting when the
    real tokenizer isn't in the cluster image."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks).cast("long")
    uniq = F.size(F.array_distinct(toks)).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")), F.lit(0.0), lambda a, b: a + b
    )
    bpe = F.regexp_count("text", F.lit(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+")).cast("long")
    return doc.select(
        "doc_id",
        "lang",
        n.alias("n_tokens"),
        uniq.alias("n_unique_tokens"),
        F.round(uniq.cast("double") / n.cast("double"), 6).alias("type_token_ratio"),
        F.round(sum_len / n.cast("double"), 6).alias("avg_token_len"),
        bpe.alias("n_bpe_tokens"),
    )


_STOPWORDS = ("a", "the")

QUALITY_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, n_chars,
         CAST(len(toks) AS DOUBLE) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_unique,
         CAST(len(list_filter(toks, t -> t IN {_STOPWORDS!r})) AS DOUBLE) AS n_stop,
         CAST(len(list_filter(toks, t -> length(t) <= 2)) AS DOUBLE) AS n_short
  FROM tok
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(n_stop / n_tokens, 6) AS stopword_ratio,
       ROUND(n_short / n_tokens, 6) AS short_token_ratio,
       ROUND(0.4 * (1.0 - n_stop / n_tokens)
           + 0.4 * (n_unique / n_tokens)
           + 0.2 * LEAST(n_tokens / 100.0, 1.0), 6) AS quality_score
FROM m
"""


@register("text_quality_score", oracle=QUALITY_ORACLE, tags=("text", "llm"))
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: stopword ratio, short-token ratio and
    lexical diversity blended into one score (the shape of a pretraining
    quality filter; weights are illustrative)."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))).cast("double")
    n_short = F.size(F.filter(toks, lambda t: F.length(t) <= 2)).cast("double")
    score = (
        0.4 * (F.lit(1.0) - n_stop / n)
        + 0.4 * (uniq / n)
        + 0.2 * F.least(n / 100.0, F.lit(1.0))
    )
    return doc.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.round(n_short / n, 6).alias("short_token_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


# tiny per-language function-word profiles (n-gram/dictionary heuristic)
_LANG_PROFILES = {
    "en": ("the", "a", "of", "and", "in", "to", "is"),
    "es": ("el", "la", "de", "los", "y", "en", "que"),
    "fr": ("le", "la", "de", "et", "les", "des", "un"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein"),
}


def _langid_oracle() -> str:
    hit_cols = ",\n         ".join(
        f"CAST(len(list_intersect(list_distinct(toks), {list(words)!r})) AS BIGINT) AS hits_{lang}"
        for lang, words in _LANG_PROFILES.items()
    )
    langs = list(_LANG_PROFILES)
    best = "GREATEST(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'unknown' "
    for lang in langs:  # fixed priority order breaks ties deterministically
        case += f"WHEN hits_{lang} = {best} THEN '{lang}' "
    case += "END"
    return f"""
WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
h AS (
  SELECT doc_id, lang,
         {hit_cols}
  FROM tok
)
SELECT doc_id, lang AS labeled_lang, {case} AS predicted_lang,
       {best} AS best_hits
FROM h
"""


@register("text_langid", oracle=_langid_oracle(), tags=("text", "llm"))
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-overlap language-ID heuristic: score each document
    against per-language function-word profiles, predict the best match
    (ties broken by fixed language order, zero hits → 'unknown').
    The synthetic corpus is English-like regardless of its ``lang``
    label, so predictions mostly disagree with the label — the point is
    the operator shape, and the oracle checks it exactly."""
    doc = load_table(spark, sf_dir, "documents")
    toksd = F.array_distinct(tokens("text"))
    hits = {
        lang: F.size(F.array_intersect(toksd, F.array(*[F.lit(w) for w in words]))).cast("long")
        for lang, words in _LANG_PROFILES.items()
    }
    best = F.greatest(*hits.values())
    pred = F.when(best == 0, "unknown")
    for lang in _LANG_PROFILES:
        pred = pred.when(hits[lang] == best, lang)
    return doc.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.alias("best_hits"),
    )


FINGERPRINT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id, text, toks, {shingles_sql('toks')} AS shs FROM tok
)
SELECT doc_id,
       md5(text) AS content_md5,
       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS bag_of_words_md5,
       CASE WHEN len(shs) > 0
            THEN list_reduce(list_transform(shs, s -> md5(s)), (a, b) -> LEAST(a, b))
            ELSE NULL END AS min_shingle_md5
FROM sh
"""


@register("text_fingerprint", oracle=FINGERPRINT_ORACLE, tags=("text", "llm"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: raw content hash, order-insensitive
    bag-of-words hash, and the min-hashed shingle (a 1-permutation
    MinHash — the building block the dedup family generalizes)."""
    doc = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    shs = shingles(toks)
    min_shingle = F.when(
        F.size(shs) > 0,
        F.array_min(F.transform(shs, lambda s: F.md5(s))),
    )
    return doc.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("bag_of_words_md5"),
        min_shingle.alias("min_shingle_md5"),
    )
