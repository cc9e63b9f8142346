"""Canary assertions on driver-generated testdata invariants the engine
depends on. The driver REGENERATES the parquet between rounds and has
already changed physical details once (round 2: TIMESTAMP(NANOS) →
naive timestamp[us], absorbed by session.normalize_timestamps). If a
future regen breaks one of these, this file fails with the ROOT CAUSE
instead of dozens of cryptic parity mismatches.

Each assertion is tied to the operators that rely on it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from insurance_claim_data_pipeline_spark.session import load_table

from .conftest import SF_ORACLE


def test_events_invariants(spark):
    ev = load_table(spark, SF_ORACLE, "events")
    row = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("ts").alias("n_ts"),
        F.min("value").alias("vmin"),
        F.count("event_id").alias("n_eid"),
        F.count_distinct("event_id").alias("nd_eid"),
    ).first()
    assert row["n"] > 0
    # normalize_timestamps must yield a usable non-null timestamp column
    # (every event-time operator); unix_micros must work on it
    assert row["n_ts"] == row["n"]
    ev.select(F.unix_micros("ts")).first()
    # event_id is the deterministic tie-break everywhere
    assert row["nd_eid"] == row["n_eid"] == row["n"]
    # positive values: the fixed-point EMA / user-totals floor-division
    # equivalence arguments assume a non-negative domain (the EMA oracle
    # is floor-robust anyway, but a sign flip should be LOUD)
    assert row["vmin"] is not None and row["vmin"] > 0


def test_documents_invariants(spark):
    doc = load_table(spark, SF_ORACLE, "documents")
    row = doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("doc_id").alias("nd"),
        F.min("n_chars").alias("cmin"),
        F.sum((F.length("text") != F.col("n_chars")).cast("int")).alias("n_len_mismatch"),
        F.sum(F.col("text").contains("  ").cast("int")).alias("n_doublespace"),
    ).first()
    assert row["n"] > 0 and row["nd"] == row["n"]  # doc_id is the dedup/split key
    assert row["cmin"] is not None and row["cmin"] > 0
    # n_chars must equal length(text): sampling oracles aggregate n_chars
    # while quality ops recompute from text
    assert row["n_len_mismatch"] == 0
    # whitespace tokenization assumes single-space separation (shingles,
    # chunking, BM25, token stats all split on ' ')
    assert row["n_doublespace"] == 0


def test_embeddings_invariants(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    row = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("vec_id").alias("nd"),
        F.min(F.size("embedding")).alias("dmin"),
        F.max(F.size("embedding")).alias("dmax"),
        F.min("vec_id").alias("idmin"),
        F.max("vec_id").alias("idmax"),
    ).first()
    assert row["n"] > 0 and row["nd"] == row["n"]
    # fixed 64-dim: PQ sub-codebooks (64 = 8 subspaces x 8 dims) and the
    # LSH hyperplane tables are built for exactly this width
    assert row["dmin"] == row["dmax"] == 64
    # vec_id < N_QUERIES selects the demo query set; ids must start low
    assert row["idmin"] == 0
    # the pruning certificate plants twins at vec_id + 1_000_000
    # (operators/dedup.py::_augmented_prod_embeddings) — base ids must
    # stay below the offset or twin ids would collide with real vectors
    assert row["idmax"] < 1_000_000
