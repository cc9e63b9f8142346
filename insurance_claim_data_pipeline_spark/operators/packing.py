"""Sequence packing for LLM pretraining batches.

``pack_concat_chunks`` implements concat-and-chunk packing — the
strategy GPT-style pretraining actually uses: documents are laid end to
end in one deterministic global order and the token stream is cut into
fixed-length chunks (SEQ_LEN). Each document's placement is a function
of the running token offset before it, i.e. a global prefix sum.

Scale design (the interesting part): a naive ``SUM() OVER (ORDER BY …)``
with no PARTITION BY collapses to a single task in Spark. This module
computes the prefix sum the scalable way instead:

1. per-bucket cumulative sums, windowed over ``bucket = doc_id div W``
   (deterministic fixed-width buckets — no sampling, no partition-id
   dependence, any bucketing of an ordered key yields the same global
   prefix sum);
2. bucket totals (one map-side-combined aggregate, |buckets| = N/W
   rows);
3. bucket start offsets via a running sum over the tiny bucket-totals
   frame, broadcast-joined back.

At 100 TB pick W so N/W offsets fit one task (W ≈ √N), or recurse the
same construction one more level — the classic two-level scan. The
per-doc math (start offset, chunk id, boundary-crossing flag) is then
embarrassingly parallel.

The reference has no packing (or any text op) — this is §2.2 extension
surface / LLM-data north star (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table, tiny_frame_key

SEQ_LEN = 512  # tokens per training sequence
PACK_BUCKET_W = 100  # doc_ids per prefix-sum bucket (tune ≈ √N at scale)

PACK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok,
         CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_end
  FROM tok
)
SELECT doc_id, n_tok,
       cum_end - n_tok AS start_offset,
       (cum_end - n_tok) // {SEQ_LEN} AS chunk_id,
       ((cum_end - n_tok) // {SEQ_LEN} != (cum_end - 1) // {SEQ_LEN}) AS crosses_chunk
FROM c
"""


@register("pack_concat_chunks", oracle=PACK_ORACLE, tags=("llm", "packing", "window", "bench"))
def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: global token offset per doc
    (two-level distributed prefix sum — see module docstring), the
    SEQ_LEN-chunk each document starts in, and whether it straddles a
    chunk boundary (loss-masking needs to know).

    floor(x / SEQ_LEN) over doubles equals integer division exactly
    while the running token total stays below 2^53 — ~9e15 tokens,
    two orders of magnitude above a 100 TB corpus."""
    doc = load_table(spark, sf_dir, "documents")
    d = doc.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.floor(F.col("doc_id") / PACK_BUCKET_W).cast("long").alias("bkt"),
    )
    cum_in_bkt = F.sum("n_tok").over(Window.partitionBy("bkt").orderBy("doc_id"))
    d = d.withColumn("cum_in_bkt", cum_in_bkt)
    # tiny frame: one row per bucket; this window runs on N/W rows, not
    # N (the whole point of the two-level construction). The single
    # partition is by design; tiny_frame_key gives WindowExec an
    # explicit (non-foldable) partition spec so it does not log the
    # "No Partition Defined" warning — see session.tiny_frame_key.
    bkt_off = F.coalesce(
        F.sum("bkt_tok").over(
            Window.partitionBy(tiny_frame_key("bkt"))
            .orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    offsets = (
        d.groupBy("bkt")
        .agg(F.sum("n_tok").alias("bkt_tok"))
        .select("bkt", bkt_off.alias("bkt_off"))
    )
    j = d.join(F.broadcast(offsets), "bkt")
    cum_end = F.col("bkt_off") + F.col("cum_in_bkt")
    start = (cum_end - F.col("n_tok")).alias("start_offset")
    chunk = F.floor((cum_end - F.col("n_tok")) / SEQ_LEN).cast("long")
    last_chunk = F.floor((cum_end - 1) / SEQ_LEN).cast("long")
    return j.select(
        "doc_id",
        "n_tok",
        start,
        chunk.alias("chunk_id"),
        (chunk != last_chunk).alias("crosses_chunk"),
    )


# ---- shard manifest (WebDataset-style output sharding) ------------------
SHARD_BYTES = 16_384  # byte budget per output shard

SHARD_ORACLE = f"""
WITH c AS (
  SELECT doc_id, n_chars,
         CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_end
  FROM documents
), assign AS (
  SELECT doc_id, n_chars,
         (cum_end - n_chars) // {SHARD_BYTES} AS shard_id
  FROM c
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc_id
FROM assign GROUP BY 1
"""


@register("sink_shard_manifest", oracle=SHARD_ORACLE, tags=("llm", "packing", "sink"))
def sink_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest: lay documents end-to-end in
    doc_id order, cut the byte stream at SHARD_BYTES boundaries by
    assigning each doc to shard ``floor(preceding_bytes / budget)``,
    and emit the per-shard manifest (doc count, payload bytes,
    contiguous id range) that a downstream dataloader indexes.

    Same two-level distributed prefix sum as ``pack_concat_chunks``
    (per-bucket running sums + broadcast bucket offsets — module
    docstring), so shard assignment is a narrow map after one bucketed
    window; the manifest aggregate shuffles only |shards| rows. Docs
    larger than the budget own their shard start but still spill into
    the next boundary — next-fit sharding, the streaming-friendly
    discipline an output writer can apply with zero look-ahead. Shard
    ids are contiguous doc_id ranges BY CONSTRUCTION (the id order is
    the layout order), which the oracle's min/max columns certify."""
    doc = load_table(spark, sf_dir, "documents")
    d = doc.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.floor(F.col("doc_id") / PACK_BUCKET_W).cast("long").alias("bkt"),
    )
    cum_in_bkt = F.sum("n_chars").over(Window.partitionBy("bkt").orderBy("doc_id"))
    d = d.withColumn("cum_in_bkt", cum_in_bkt)
    bkt_off = F.coalesce(
        F.sum("bkt_b").over(
            Window.partitionBy(tiny_frame_key("bkt"))
            .orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    offsets = (
        d.groupBy("bkt")
        .agg(F.sum("n_chars").alias("bkt_b"))
        .select("bkt", bkt_off.alias("bkt_off"))
    )
    j = d.join(F.broadcast(offsets), "bkt")
    start = F.col("bkt_off") + F.col("cum_in_bkt") - F.col("n_chars")
    assigned = j.select(
        "doc_id", "n_chars", F.floor(start / SHARD_BYTES).cast("long").alias("shard_id")
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


# ---- curriculum-ordered packing -----------------------------------------

CURRICULUM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tok,
         CAST(len(toks) AS DOUBLE) AS n_tokens,
         CAST(len(list_distinct(toks)) AS DOUBLE) AS n_unique,
         CAST(len(list_filter(toks, t -> t IN {{STOPWORDS}})) AS DOUBLE) AS n_stop
  FROM tok
), q AS (
  SELECT doc_id, n_tok,
         ROUND(0.4 * (1.0 - n_stop / n_tokens)
             + 0.4 * (n_unique / n_tokens)
             + 0.2 * LEAST(n_tokens / 100.0, 1.0), 6) AS quality_score
  FROM m
), c AS (
  SELECT doc_id, n_tok, quality_score,
         ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) AS r,
         CAST(SUM(n_tok) OVER (ORDER BY quality_score DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
  FROM q
)
SELECT doc_id, quality_score, CAST(r AS BIGINT) AS r, n_tok,
       cum_end - n_tok AS start_offset,
       (cum_end - n_tok) // {SEQ_LEN} AS chunk_id
FROM c
"""


def _curriculum_oracle() -> str:
    from .textops import _STOPWORDS

    return CURRICULUM_ORACLE.replace("{STOPWORDS}", repr(_STOPWORDS))


@register(
    "pack_curriculum_chunks",
    oracle=_curriculum_oracle(),
    tags=("llm", "packing", "window", "scale"),
)
def pack_curriculum_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-ordered packing: documents laid out by DESCENDING
    quality score (ties by doc_id) before the token stream is cut into
    SEQ_LEN chunks — so early training chunks contain the highest-
    quality text (the curriculum/annealing data-ordering trick; with
    the sort flipped it is the same plan as quality-annealed tails).

    The layout order is no longer doc_id, so the prefix sum buckets by
    the exact two-level distributed RANK over (quality desc, doc_id)
    instead of id ranges: rank → rank-bucket → per-bucket running sum
    + broadcast bucket offsets — the pack_concat_chunks construction
    composed with _with_global_rank, every stage scale-safe."""
    from .analytics import _with_global_rank
    from .textops import _STOPWORDS
    from ..functions.text import tokens

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
    q = doc.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        score.alias("quality_score"),
    )
    ranked = _with_global_rank(q, "quality_score", "doc_id", "r").drop("_n_total")
    d = ranked.withColumn(
        "bkt", F.expr(f"(r - 1) div {PACK_BUCKET_W}")
    )
    cum_in_bkt = F.sum("n_tok").over(Window.partitionBy("bkt").orderBy("r"))
    d = d.withColumn("cum_in_bkt", cum_in_bkt)
    bkt_off = F.coalesce(
        F.sum("bkt_tok").over(
            Window.partitionBy(tiny_frame_key("bkt"))
            .orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    offsets = (
        d.groupBy("bkt")
        .agg(F.sum("n_tok").alias("bkt_tok"))
        .select("bkt", bkt_off.alias("bkt_off"))
    )
    j = d.join(F.broadcast(offsets), "bkt")
    cum_end = F.col("bkt_off") + F.col("cum_in_bkt")
    return j.select(
        "doc_id",
        "quality_score",
        F.col("r").cast("long").alias("r"),
        "n_tok",
        (cum_end - F.col("n_tok")).alias("start_offset"),
        F.floor((cum_end - F.col("n_tok")) / SEQ_LEN).cast("long").alias("chunk_id"),
    )


# --- balanced shard assignment (snake draft over the global size rank) ------

SHARD_N = 8

SHARDS_ORACLE = f"""
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
), ranked AS (
  SELECT doc_id, n_tok,
         ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS r
  FROM d
), assigned AS (
  SELECT n_tok,
         CASE WHEN (r // {SHARD_N}) % 2 = 0 THEN r % {SHARD_N}
              ELSE {SHARD_N - 1} - (r % {SHARD_N}) END AS shard
  FROM ranked
), per AS (
  SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS tok_total
  FROM assigned GROUP BY 1
)
SELECT shard, n_docs, tok_total,
       CAST(tok_total * {SHARD_N} * 1000000 // SUM(tok_total) OVER () AS BIGINT)
         AS load_ppm_of_ideal
FROM per
"""


@register("pack_balanced_shards", oracle=SHARDS_ORACLE, tags=("llm", "packing", "scale"))
def pack_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment for {SHARD_N} training-data
    shards — the write-side twin of pack_concat_chunks: docs are
    ranked globally by token count (descending) and dealt in a SNAKE
    draft (0..7, 7..0, ...), the classic deterministic approximation
    of longest-processing-time scheduling: every shard receives one
    doc per round and alternating direction cancels the within-round
    size gradient, so shard token totals land within a round's spread
    of ideal. A greedy true-LPT is inherently sequential (each
    placement depends on all previous totals); the snake is the
    parallelizable surrogate production packers use, and the
    load_ppm_of_ideal column MEASURES how close it lands
    (1_000_000 = perfectly even).

    Scale shape: the global rank comes from the two-level distributed
    scheme (percentile bounds → per-bucket window + tiny offset table,
    operators/analytics.py — plan-gated elsewhere, no single-partition
    window), the snake arithmetic is pure codegen, and the output is
    one {SHARD_N}-row aggregate."""
    from .analytics import _with_global_rank

    doc = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    ranked = _with_global_rank(doc, "n_tok", "doc_id", "_r")
    r = F.col("_r") - 1
    rnd, idx = (r / SHARD_N).cast("long"), F.pmod(r, SHARD_N)
    shard = F.when(F.pmod(rnd, 2) == 0, idx).otherwise(F.lit(SHARD_N - 1) - idx)
    per = (
        ranked.select(shard.cast("long").alias("shard"), "n_tok")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tok_total"),
        )
    )
    w = Window.partitionBy(tiny_frame_key("n_docs"))
    return per.select(
        "shard",
        "n_docs",
        "tok_total",
        F.expr(f"CAST(tok_total * {SHARD_N} * 1000000 AS BIGINT)")
        .alias("_num"),
    ).select(
        "shard",
        "n_docs",
        "tok_total",
        # decimal floor-division, not double `/`: the double quotient of
        # two ~1e11 longs can land at x.9999…, and cast-to-long would
        # truncate one below DuckDB's integer `//`.
        F.floor(
            F.col("_num").cast("decimal(38,0)")
            / F.sum("tok_total").over(w).cast("decimal(38,0)")
        )
        .cast("long")
        .alias("load_ppm_of_ideal"),
    )
