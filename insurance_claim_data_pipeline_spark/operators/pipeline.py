"""End-to-end LLM training-data prep pipeline — quality filter →
exact dedup → near-dup canonicalization → leakage-free split — as ONE
composed, fully DuckDB-oracled query.

Each stage exists (and is independently oracled) elsewhere in the
engine: quality scoring (textops.text_quality_score), exact md5 dedup
(dedup.dedup_exact), shingle-Jaccard near-dup pairs + min-label
connected components (dedup.ngram_jaccard_pairs /
min_label_components), hash-bucket splits (sampling.sample_split_hash).
This operator chains them the way a real corpus-prep job does, and the
oracle replays the ENTIRE chain in SQL (the component step as a
recursive-CTE closure), so the hash check certifies the composition —
stage boundaries, filter-before-dedup ordering, canonical-keep rule —
not just the pieces.

Scale shape: everything is the constituent operators' plans glued by
narrow (doc_id) joins — no stage materializes to the driver; the
iterative component loop only ever sees the (tiny) near-dup pair
graph of docs that already survived quality + exact dedup, which is
exactly the order you want at 100 TB (each stage shrinks the frame the
next one pays for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles_sql, tokens
from ..registry import register
from ..session import load_table
from .dedup import JACCARD_THRESHOLD, min_label_components, ngram_jaccard_pairs
from .sampling import TRAIN_PCT, VAL_PCT, _bucket_sql, hash_bucket
from .textops import _STOPWORDS

QUALITY_MIN = 0.67  # compared on the 6-dp ROUNDED score in both engines

PREP_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS DOUBLE) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_unique,
         CAST(len(list_filter(toks, t -> t IN {_STOPWORDS!r})) AS DOUBLE) AS n_stop
  FROM tok
), q AS (
  SELECT doc_id,
         ROUND(0.4 * (1.0 - n_stop / n_tokens)
             + 0.4 * (n_unique / n_tokens)
             + 0.2 * LEAST(n_tokens / 100.0, 1.0), 6) AS quality_score
  FROM m
), keepq AS (
  SELECT d.doc_id, d.text, q.quality_score
  FROM documents d JOIN q ON d.doc_id = q.doc_id
  WHERE q.quality_score >= {QUALITY_MIN}
), exact AS (
  SELECT MIN(doc_id) AS doc_id FROM keepq GROUP BY md5(text)
), surv AS (
  SELECT k.doc_id, k.text, k.quality_score
  FROM keepq k JOIN exact e ON k.doc_id = e.doc_id
), tok2 AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM surv
), sh AS (
  SELECT doc_id, unnest({shingles_sql('toks')}) AS shingle FROM tok2
), sizes AS (
  SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), edges AS (
  SELECT doc_a, doc_b FROM cand
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE)
        >= {JACCARD_THRESHOLD}
), sym AS (
  SELECT doc_a AS u, doc_b AS v FROM edges
  UNION SELECT doc_b, doc_a FROM edges
  UNION SELECT doc_a, doc_a FROM edges
  UNION SELECT doc_b, doc_b FROM edges
), reach AS (
  WITH RECURSIVE r(u, v) AS (
    SELECT u, v FROM sym
    UNION
    SELECT r.u, s.v FROM r JOIN sym s ON r.v = s.u
  )
  SELECT * FROM r
), comp AS (
  SELECT u AS doc_id, MIN(v) AS component_id FROM reach GROUP BY u
), canon AS (
  SELECT s.doc_id, s.quality_score
  FROM surv s LEFT JOIN comp c ON s.doc_id = c.doc_id
  WHERE c.doc_id IS NULL OR c.component_id = s.doc_id
)
SELECT doc_id,
       CASE WHEN {_bucket_sql('doc_id')} < {TRAIN_PCT} THEN 'train'
            WHEN {_bucket_sql('doc_id')} < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       quality_score
FROM canon
"""


@register("llm_prep_pipeline", oracle=PREP_ORACLE, tags=("llm", "pipeline", "iterative"))
def llm_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-prep chain: quality-filter (score ≥
    {QUALITY_MIN}) → exact dedup (min doc_id per md5(text)) → near-dup
    canonicalization (keep each Jaccard component's smallest doc) →
    deterministic split assignment. Returns the surviving corpus as
    (doc_id, split, quality_score)."""
    doc = load_table(spark, sf_dir, "documents")

    toks = tokens("text")
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))).cast("double")
    score = F.round(
        0.4 * (F.lit(1.0) - n_stop / n)
        + 0.4 * (uniq / n)
        + 0.2 * F.least(n / 100.0, F.lit(1.0)),
        6,
    )
    keepq = doc.select("doc_id", "text", score.alias("quality_score")).filter(
        F.col("quality_score") >= QUALITY_MIN
    )

    exact_keep = keepq.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    surv = keepq.join(exact_keep.select("doc_id"), "doc_id")

    pairs = ngram_jaccard_pairs(surv.select("doc_id", "text")).select("doc_a", "doc_b")
    comp = min_label_components(pairs)
    canon = (
        surv.join(comp, "doc_id", "left")
        .filter(F.col("component_id").isNull() | (F.col("component_id") == F.col("doc_id")))
        .select("doc_id", "quality_score")
    )

    b = hash_bucket("doc_id")
    split = (
        F.when(b < TRAIN_PCT, "train")
        .when(b < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    return canon.select("doc_id", split.alias("split"), "quality_score")
