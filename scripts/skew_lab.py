"""Skew lab: the scale lab's missing dimension (VERDICT r10 #3), now
with skew×volume and Zipf-head shards (VERDICT r11 #3/#5/#6).

The k×-replica lab (scripts/scale_lab.py) grows the data UNIFORMLY —
every key keeps its per-key depth, so it can never surface the failure
class 100 TB corpora actually have: Zipf token frequencies, hub-heavy
graphs, one user emitting a third of the event stream. Those shapes
break different things than volume does: window partitions serialize on
the hot key (one straggler task), groupBy hot keys spill, inverted-index
and wedge self-joins fan out quadratically IN THE HOT KEY's count while
staying linear overall.

Shards (all deterministic, no RNG; FKs stay valid; schemas are
byte-compatible with the driver's, so ``scripts/strict_parity.py
.scale_lab/<shard> <names>`` gives full Spark-vs-DuckDB VALUE checks
under every shape, not walls alone):

- ``skew1``  — sf0.1 row counts + single hot keys per family (r11).
- ``skew10`` — the SAME hot-key transforms applied to the x10 replica
  shard (scale_lab): hot keys at 10× volume. This is the one shape the
  r11 instruments never measured: the corpus-COUNT-keyed defenses
  (NGRAM_MAX_DF, both sized-bank ladders) engage at x10 counts WHILE a
  hot key/shingle/direction holds 10× its sf0.1 mass — the cap and the
  ladder rung interacting with the hot key they exist for.
- ``skew001`` — sf0.01 row counts + the same hot keys: small enough
  that the O(n²)-by-design eval queries (the scale sweep's exclusion
  list) get strict VALUE parity under skew too, closing VERDICT r11
  #6 (their exclusion was wall-covered but not parity-covered).
- ``zipf1``  — sf0.1 row counts, but instead of ONE hot key per
  family, a Zipf(α≈1) head: event/order/line foreign keys remapped
  through a deterministic inverse-CDF (P(rank r) ∝ 1/r over the
  existing key population), and every document appends THREE phrase
  draws from a Zipf-ranked phrase ladder (df(j) ∝ 1/j — several
  phrases land above NGRAM_MAX_DF, a power-law tail lands below it).
  Exercises AQE skew splitting and the cap's multi-hot-shingle regime
  rather than the single-hot-key corner.

Hot-key transforms (skew1/skew10/skew001), per family:

- ``events``: 30% of events remapped to one hot user (``event_id % 10
  < 3``) — the classic window/sessionize/stateful straggler shape.
- ``orders``: 10% of orders remapped to one hot customer.
- ``lineitem``: 20% of lines remapped to one hot part, 10% to one hot
  supplier — a co-purchase hub and a skewed dimension join.
- ``documents``: a fixed 6-token stop-phrase appended to 40% of docs —
  two hot shingles shared by 40% of the corpus (Zipf head), the
  inverted-index self-join's worst shape.
- ``embeddings``: 10% of vectors replaced by one dense direction plus a
  2% per-vector residue (cast back to float) — a giant near-dup cluster
  AND a hot LSH bucket in one.

All remap selectors are mod-based on keys the x-shards shift by
multiples of 10⁸ (divisible by every modulus used), so the same
builder applies unchanged to any replica shard.

Run:  python scripts/skew_lab.py                     (skew1 sweep)
      python scripts/skew_lab.py --shard skew10      (skew×volume)
      python scripts/skew_lab.py --shard zipf1       (Zipf head)
      python scripts/skew_lab.py --shard skew001 --materialize-only
      python scripts/skew_lab.py --queries a b       (subset)
Interpretation rule: compare the skew/base wall ratio against the
query's OUTPUT growth under skew before calling the plan skew-broken —
pair-producing operators are result-size-bound (hot keys genuinely
have quadratically more pairs); only a wall ratio far above the output
ratio indicates a plan defect (see scale_lab.py's r09 rule).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark, load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
SMALL_SF = "/root/testdata/sf0.01"
LAB = os.path.join(REPO, ".scale_lab")
SKEW_DIR = os.path.join(LAB, "skew1")

HOT_PHRASE = "skewhot alpha beta gamma delta epsilon"
ZIPF_PHRASES = 1000  # phrase-ladder size for zipf1 (df(j) ∝ 1/j)

# Families with a hot-key attack surface: pair-producing self-joins,
# per-key windows, grouped maps, shuffle joins on the skewed key.
DEFAULT_QUERIES = [
    # documents: hot shingles / hot simhash bands / dense near-dup cluster
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_incremental",
    "dedup_semantic_components_lsh",
    # graph: hub part (co-purchase wedges), hub customer
    "graph_triangle_copurchase",
    "graph_link_prediction_topq",
    "graph_pagerank",
    "graph_kcore",
    "graph_degree_distribution",
    "graph_item_cf_topk",
    # events: hot user (30% of the stream in one window partition)
    "events_sessionize",
    "events_session_window_native",
    "events_tumbling_window",
    "events_rolling_distinct_users",
    "events_rolling_median",
    "events_dwell_time",
    "events_markov_transitions",
    "events_lastk_types",
    "window_topk_per_group",
    # joins/aggs on the skewed keys (join_skew_salted exists FOR this)
    "join_skew_salted",
    "agg_salted_two_stage",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_orders",
    # grouped-map pandas over a hot group
    "agg_weighted_median_pandas",
    "emb_kmeans_lloyd_step",
]

# skew10 focus (VERDICT r11 #3): the corpus-count-keyed defenses vs a
# 10×-mass hot key — capped inverted-index family, both sized banks,
# windows/sessionize, components.
SKEW10_QUERIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_containment_ngram",
    "dedup_incremental",
    "dedup_weighted_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_semantic_components_lsh",
    "dedup_components",
    "dedup_components_star",
    "dedup_cluster_sizes",
    "events_sessionize",
    "events_session_window_native",
    "events_tumbling_window",
    "events_rolling_distinct_users",
    "window_topk_per_group",
    "join_skew_salted",
    "agg_salted_two_stage",
]

# zipf1 focus (VERDICT r11 #5): multi-hot-shingle inverted indexes,
# Zipf-keyed joins/aggs/windows, AQE skew splitting.
ZIPF_QUERIES = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_containment_ngram",
    "dedup_incremental",
    "dedup_weighted_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_components",
    "llm_prep_pipeline",
    "text_inverted_index",
    "text_tfidf_topk",
    "text_bm25_topk",
    "text_boilerplate_ngrams",
    "events_sessionize",
    "events_tumbling_window",
    "events_rolling_distinct_users",
    "events_user_totals",
    "events_markov_transitions",
    "window_topk_per_group",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_orders",
    "join_skew_salted",
    "agg_salted_two_stage",
    "graph_degree_distribution",
    "orders_cohort_ltv",
]

# O(n²)-by-design evals (scale_lab.ALL_SWEEP_EXCLUDED): parity-covered
# on skew001, where their quadratic side is sf0.01-sized (VERDICT r11
# #6). graph_link_prediction's Σdeg² side rides the same shard.
EXCLUDED_EVAL_QUERIES = [
    "dedup_semantic_lsh_pruning",
    "dedup_semantic_lsh_recall",
    "dedup_embedding_cosine",
    "graph_link_prediction",
    "emb_knn_eval",
    "dedup_semantic_components",
]


def materialize_skew(spark, src: str = BASE_SF, dest: str = SKEW_DIR) -> str:
    """Apply the deterministic hot-key transforms to ``src`` tables.

    Works on any shard whose keys are the driver's keys shifted by
    multiples of 10⁸ (scale_lab replicas): every selector below is a
    ``% m`` with m ∈ {5, 10}, both of which divide 10⁸, so per-copy
    selection fractions are preserved exactly.
    """
    marker = os.path.join(dest, "_DONE")
    if os.path.exists(marker):
        return dest
    os.makedirs(dest, exist_ok=True)
    for table in ("region", "nation", "customer", "supplier", "part"):
        load_table(spark, src, table).write.mode("overwrite").parquet(
            os.path.join(dest, f"{table}.parquet")
        )
    # hot keys = existing minimum keys (FK-valid, deterministic)
    hot_user = load_table(spark, src, "events").agg(F.min("user_id")).first()[0]
    hot_cust = load_table(spark, src, "customer").agg(F.min("c_custkey")).first()[0]
    hot_part = load_table(spark, src, "part").agg(F.min("p_partkey")).first()[0]
    hot_supp = load_table(spark, src, "supplier").agg(F.min("s_suppkey")).first()[0]

    ev = load_table(spark, src, "events").withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 3, F.lit(hot_user)).otherwise(F.col("user_id")),
    )
    ev.write.mode("overwrite").parquet(os.path.join(dest, "events.parquet"))

    orders = load_table(spark, src, "orders").withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(hot_cust)).otherwise(
            F.col("o_custkey")
        ),
    )
    orders.write.mode("overwrite").parquet(os.path.join(dest, "orders.parquet"))

    li = (
        load_table(spark, src, "lineitem")
        .withColumn(
            "l_partkey",
            F.when(
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")) % 5 == 0,
                F.lit(hot_part),
            ).otherwise(F.col("l_partkey")),
        )
        .withColumn(
            "l_suppkey",
            F.when(
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")) % 10 == 3,
                F.lit(hot_supp),
            ).otherwise(F.col("l_suppkey")),
        )
    )
    li.write.mode("overwrite").parquet(os.path.join(dest, "lineitem.parquet"))

    doc = load_table(spark, src, "documents")
    doc = doc.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 < 2, F.concat_ws(" ", F.col("text"), F.lit(HOT_PHRASE))
        ).otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text").cast(doc.schema["n_chars"].dataType))
    doc.write.mode("overwrite").parquet(os.path.join(dest, "documents.parquet"))

    emb = load_table(spark, src, "embeddings")
    # dense direction: alternating-sign unit-ish pattern (any fixed
    # vector works; members pairwise cos ≈ 1 - O(residue²))
    hot_vec = [1.0 if d % 2 == 0 else -1.0 for d in range(64)]
    hot_lit = F.array(*[F.lit(v) for v in hot_vec])
    clustered = F.zip_with(
        hot_lit, F.col("embedding"), lambda h, x: (h + 0.02 * x).cast("float")
    )
    emb = emb.withColumn(
        "embedding",
        F.when(
            F.col("embedding").isNotNull() & (F.col("vec_id") % 10 == 0), clustered
        ).otherwise(F.col("embedding")),
    )
    emb.write.mode("overwrite").parquet(os.path.join(dest, "embeddings.parquet"))
    open(marker, "w").close()
    return dest


def _zipf_rank(hash_col, n: int):
    """Deterministic Zipf(α≈1) rank in [1, n] via inverse CDF.

    u = (|h| mod 10⁶)/10⁶ is uniform; r = floor(exp(u·ln n)) has
    P(r ≤ x) ≈ ln x / ln n, i.e. P(rank = r) ∝ 1/r — the α=1 head.
    """
    u = (F.abs(hash_col) % 1_000_000).cast("double") / 1_000_000.0
    r = F.floor(F.exp(u * math.log(float(n))))
    return F.least(F.lit(int(n)), F.greatest(F.lit(1), r)).cast("long")


def _zipf_remap(df, key: str, seed_col, rank_source):
    """Remap ``df[key]`` to a Zipf-ranked draw over rank_source's keys.

    rank_source: DataFrame with one column = the existing key
    population. Rank 1 (the hottest) is the smallest key; the join is
    a broadcast of the key population (dimension-sized).
    """
    keys = rank_source.toDF("k").distinct()
    n = keys.count()
    from pyspark.sql import Window

    ranked = keys.withColumn(
        "zipf_rank", F.row_number().over(Window.orderBy("k")).cast("long")
    )
    out = df.withColumn("zipf_rank", _zipf_rank(seed_col, n))
    return (
        out.join(F.broadcast(ranked), "zipf_rank")
        .withColumn(key, F.col("k"))
        .drop("zipf_rank", "k")
        .select(df.columns)
    )


def materialize_zipf(spark, src: str = BASE_SF, dest: str | None = None) -> str:
    """zipf1: same row counts as ``src``, Zipf(α≈1) key distribution.

    Unlike the single-hot-key shards this reshapes the WHOLE key
    frequency spectrum: the hottest user takes ~1/H_n of the stream,
    the second half as much, … — many keys at power-law depths, the
    shape AQE skew splitting and the NGRAM_MAX_DF multi-hot-shingle
    regime actually face. Documents append THREE Zipf phrase draws
    (ladder of ZIPF_PHRASES 6-token phrases, df(j) ∝ 1/j): a handful
    of phrases land above the df cap, a power-law tail lands below it
    and feeds the inverted-index join for real.
    """
    dest = dest or os.path.join(LAB, "zipf1")
    marker = os.path.join(dest, "_DONE")
    if os.path.exists(marker):
        return dest
    os.makedirs(dest, exist_ok=True)
    for table in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        load_table(spark, src, table).write.mode("overwrite").parquet(
            os.path.join(dest, f"{table}.parquet")
        )

    ev = load_table(spark, src, "events")
    ev_users = load_table(spark, src, "events").select("user_id").where(
        F.col("user_id").isNotNull()
    )
    ev = _zipf_remap(ev, "user_id", F.xxhash64(F.col("event_id"), F.lit("zu")), ev_users)
    ev.write.mode("overwrite").parquet(os.path.join(dest, "events.parquet"))

    orders = load_table(spark, src, "orders")
    custs = load_table(spark, src, "customer").select("c_custkey")
    orders = _zipf_remap(
        orders, "o_custkey", F.xxhash64(F.col("o_orderkey"), F.lit("zc")), custs
    )
    orders.write.mode("overwrite").parquet(os.path.join(dest, "orders.parquet"))

    li = load_table(spark, src, "lineitem")
    parts = load_table(spark, src, "part").select("p_partkey")
    li = _zipf_remap(
        li,
        "l_partkey",
        F.xxhash64(F.col("l_orderkey") * 10 + F.col("l_linenumber"), F.lit("zp")),
        parts,
    )
    li.write.mode("overwrite").parquet(os.path.join(dest, "lineitem.parquet"))

    doc = load_table(spark, src, "documents")
    phrases = []
    for d in range(3):  # three independent draws per doc
        j = _zipf_rank(F.xxhash64(F.col("doc_id"), F.lit(f"zd{d}")), ZIPF_PHRASES)
        phrases.append(
            F.concat_ws(
                " ", *[F.concat(F.lit("zh"), j.cast("string"), F.lit(f"t{p}")) for p in range(6)]
            )
        )
    doc = doc.withColumn("text", F.concat_ws(" ", F.col("text"), *phrases)).withColumn(
        "n_chars", F.length("text").cast(doc.schema["n_chars"].dataType)
    )
    doc.write.mode("overwrite").parquet(os.path.join(dest, "documents.parquet"))
    open(marker, "w").close()
    return dest


def _materialize_x10(spark) -> str:
    import scale_lab

    return scale_lab.materialize(spark, 10)


# shard name -> (base_dir builder, shard builder); base_dir is the
# apples-to-apples comparison point (same row counts, no skew).
SHARDS = {
    "skew1": (lambda s: BASE_SF, lambda s: materialize_skew(s, BASE_SF, SKEW_DIR)),
    "skew10": (
        _materialize_x10,
        lambda s: materialize_skew(s, _materialize_x10(s), os.path.join(LAB, "skew10")),
    ),
    "skew001": (
        lambda s: SMALL_SF,
        lambda s: materialize_skew(s, SMALL_SF, os.path.join(LAB, "skew001")),
    ),
    "zipf1": (lambda s: BASE_SF, lambda s: materialize_zipf(s, BASE_SF)),
}

SHARD_DEFAULTS = {
    "skew1": DEFAULT_QUERIES,
    "skew10": SKEW10_QUERIES,
    "skew001": EXCLUDED_EVAL_QUERIES,
    "zipf1": ZIPF_QUERIES,
}


def main() -> int:
    args = sys.argv[1:]
    shard = "skew1"
    if "--shard" in args:
        at = args.index("--shard")
        shard = args[at + 1]
        args = args[:at] + args[at + 2 :]
    names = SHARD_DEFAULTS[shard]
    if "--queries" in args:
        at = args.index("--queries")
        names = args[at + 1 :]
        args = args[:at]
    materialize_only = "--materialize-only" in args
    spark = get_spark("skew-lab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    base_dir = SHARDS[shard][0](spark)
    skew_dir = SHARDS[shard][1](spark)
    print(f"shard {shard}: base={base_dir} skew={skew_dir}", flush=True)
    if materialize_only:
        return 0
    base_tag = os.path.basename(base_dir.rstrip("/"))
    specs = registry.all_specs()
    failures: list[str] = []
    # warm-up on base (codegen compile is per plan shape)
    for name in list(names):
        try:
            specs[name].fn(spark, base_dir).write.mode("overwrite").format("noop").save()
        except Exception as ex:  # noqa: BLE001 — report-and-continue sweep
            failures.append(name)
            names = [n for n in names if n != name]
            print(f"WARM-UP FAIL {name}: {str(ex)[:120]}", flush=True)
    results: dict[str, dict[str, float]] = {}
    # Separate ledger from scale_lab's coverage.jsonl ({query,k,sec} rows):
    # skew rows carry {lab,query,shard,sec} so no consumer misparses them.
    with open(os.path.join(LAB, "skew_coverage.jsonl"), "a") as ledger:
        for tag, d in ((base_tag, base_dir), (shard, skew_dir)):
            for name in names:
                t0 = time.perf_counter()
                try:
                    specs[name].fn(spark, d).write.mode("overwrite").format(
                        "noop"
                    ).save()
                except Exception as ex:  # noqa: BLE001
                    failures.append(name)
                    print(f"{tag:<6s} FAIL {name}: {str(ex)[:160]}", flush=True)
                    continue
                dt = time.perf_counter() - t0
                results.setdefault(name, {})[tag] = dt
                ledger.write(
                    json.dumps(
                        {"lab": "skew", "query": name, "shard": tag, "sec": round(dt, 3)}
                    )
                    + "\n"
                )
                ledger.flush()
                print(f"{tag:<6s} {dt:7.2f}s  {name}", flush=True)
    print(f"\n{'query':<34s}  base/s  skew/s  ratio")
    worst: list[tuple[float, str]] = []
    for name in names:
        r = results.get(name)
        if not r or base_tag not in r or shard not in r:
            continue
        ratio = r[shard] / r[base_tag]
        worst.append((ratio, name))
        print(f"{name:<34s}  {r[base_tag]:6.2f}  {r[shard]:6.2f}  {ratio:5.2f}")
    worst.sort(reverse=True)
    print("\nskew/base wall ratio — check vs OUTPUT growth before flagging:")
    for g, name in worst[:10]:
        print(f"  {g:5.2f}  {name}")
    if failures:
        print(f"FAILURES: {sorted(set(failures))}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
