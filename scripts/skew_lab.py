"""Skew lab: the scale lab's missing dimension (VERDICT r10 #3).

The k×-replica lab (scripts/scale_lab.py) grows the data UNIFORMLY —
every key keeps its per-key depth, so it can never surface the failure
class 100 TB corpora actually have: Zipf token frequencies, hub-heavy
graphs, one user emitting a third of the event stream. Those shapes
break different things than volume does: window partitions serialize on
the hot key (one straggler task), groupBy hot keys spill, inverted-index
and wedge self-joins fan out quadratically IN THE HOT KEY's count while
staying linear overall.

This lab materializes ``.scale_lab/skew1`` — the SAME row counts as
sf0.1 (so base-vs-skew walls are apples-to-apples; any delta is the
skew, not volume) with deterministic hot keys injected per family:

- ``events``: 30% of events remapped to one hot user (``event_id % 10
  < 3``) — the classic window/sessionize/stateful straggler shape.
- ``orders``: 10% of orders remapped to one hot customer.
- ``lineitem``: 20% of lines remapped to one hot part, 10% to one hot
  supplier — a co-purchase hub and a skewed dimension join.
- ``documents``: a fixed 6-token stop-phrase appended to 40% of docs —
  two hot shingles shared by 2000 docs (Zipf head), the inverted-index
  self-join's worst shape.
- ``embeddings``: 10% of vectors replaced by one dense direction plus a
  2% per-vector residue (cast back to float) — a giant near-dup cluster
  AND a hot LSH bucket in one.

All remapped keys are EXISTING keys (FKs stay valid), every transform
is deterministic (no RNG), and the schema is byte-compatible with the
driver's, so ``scripts/strict_parity.py .scale_lab/skew1 <names>``
gives a full Spark-vs-DuckDB correctness check UNDER skew — the lab
measures walls AND values, not walls alone.

Run:  python scripts/skew_lab.py                (sweep, base vs skew)
      python scripts/skew_lab.py --queries a b  (subset)
Interpretation rule: compare the skew/base wall ratio against the
query's OUTPUT growth under skew before calling the plan skew-broken —
pair-producing operators are result-size-bound (hot keys genuinely
have quadratically more pairs); only a wall ratio far above the output
ratio indicates a plan defect (see scale_lab.py's r09 rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from insurance_claim_data_pipeline_spark import registry  # noqa: E402
from insurance_claim_data_pipeline_spark.session import get_spark, load_table  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
LAB = os.path.join(REPO, ".scale_lab")
SKEW_DIR = os.path.join(LAB, "skew1")

HOT_PHRASE = "skewhot alpha beta gamma delta epsilon"

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


def materialize_skew(spark) -> str:
    marker = os.path.join(SKEW_DIR, "_DONE")
    if os.path.exists(marker):
        return SKEW_DIR
    os.makedirs(SKEW_DIR, exist_ok=True)
    for table in ("region", "nation", "customer", "supplier", "part"):
        load_table(spark, BASE_SF, table).write.mode("overwrite").parquet(
            os.path.join(SKEW_DIR, f"{table}.parquet")
        )
    # hot keys = existing minimum keys (FK-valid, deterministic)
    hot_user = load_table(spark, BASE_SF, "events").agg(F.min("user_id")).first()[0]
    hot_cust = load_table(spark, BASE_SF, "customer").agg(F.min("c_custkey")).first()[0]
    hot_part = load_table(spark, BASE_SF, "part").agg(F.min("p_partkey")).first()[0]
    hot_supp = load_table(spark, BASE_SF, "supplier").agg(F.min("s_suppkey")).first()[0]

    ev = load_table(spark, BASE_SF, "events").withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 3, F.lit(hot_user)).otherwise(F.col("user_id")),
    )
    ev.write.mode("overwrite").parquet(os.path.join(SKEW_DIR, "events.parquet"))

    orders = load_table(spark, BASE_SF, "orders").withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(hot_cust)).otherwise(
            F.col("o_custkey")
        ),
    )
    orders.write.mode("overwrite").parquet(os.path.join(SKEW_DIR, "orders.parquet"))

    li = (
        load_table(spark, BASE_SF, "lineitem")
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
    li.write.mode("overwrite").parquet(os.path.join(SKEW_DIR, "lineitem.parquet"))

    doc = load_table(spark, BASE_SF, "documents")
    doc = doc.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 < 2, F.concat_ws(" ", F.col("text"), F.lit(HOT_PHRASE))
        ).otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text").cast(doc.schema["n_chars"].dataType))
    doc.write.mode("overwrite").parquet(os.path.join(SKEW_DIR, "documents.parquet"))

    emb = load_table(spark, BASE_SF, "embeddings")
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
    emb.write.mode("overwrite").parquet(os.path.join(SKEW_DIR, "embeddings.parquet"))
    open(marker, "w").close()
    return SKEW_DIR


def main() -> int:
    args = sys.argv[1:]
    names = DEFAULT_QUERIES
    if "--queries" in args:
        at = args.index("--queries")
        names = args[at + 1 :]
    spark = get_spark("skew-lab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    materialize_skew(spark)
    specs = registry.all_specs()
    failures: list[str] = []
    # warm-up on base (codegen compile is per plan shape)
    for name in list(names):
        try:
            specs[name].fn(spark, BASE_SF).write.mode("overwrite").format("noop").save()
        except Exception as ex:  # noqa: BLE001 — report-and-continue sweep
            failures.append(name)
            names = [n for n in names if n != name]
            print(f"WARM-UP FAIL {name}: {str(ex)[:120]}", flush=True)
    results: dict[str, dict[str, float]] = {}
    # Separate ledger from scale_lab's coverage.jsonl ({query,k,sec} rows):
    # skew rows carry {lab,query,shard,sec} so no consumer misparses them.
    with open(os.path.join(LAB, "skew_coverage.jsonl"), "a") as ledger:
        for shard, d in (("base", BASE_SF), ("skew1", SKEW_DIR)):
            for name in names:
                t0 = time.perf_counter()
                try:
                    specs[name].fn(spark, d).write.mode("overwrite").format(
                        "noop"
                    ).save()
                except Exception as ex:  # noqa: BLE001
                    failures.append(name)
                    print(f"{shard:<6s} FAIL {name}: {str(ex)[:160]}", flush=True)
                    continue
                dt = time.perf_counter() - t0
                results.setdefault(name, {})[shard] = dt
                ledger.write(
                    json.dumps(
                        {"lab": "skew", "query": name, "shard": shard, "sec": round(dt, 3)}
                    )
                    + "\n"
                )
                ledger.flush()
                print(f"{shard:<6s} {dt:7.2f}s  {name}", flush=True)
    print(f"\n{'query':<34s}  base/s  skew/s  ratio")
    worst: list[tuple[float, str]] = []
    for name in names:
        r = results.get(name)
        if not r or "base" not in r or "skew1" not in r:
            continue
        ratio = r["skew1"] / r["base"]
        worst.append((ratio, name))
        print(f"{name:<34s}  {r['base']:6.2f}  {r['skew1']:6.2f}  {ratio:5.2f}")
    worst.sort(reverse=True)
    print("\nskew/base wall ratio — check vs OUTPUT growth before flagging:")
    for g, name in worst[:10]:
        print(f"  {g:5.2f}  {name}")
    if failures:
        print(f"FAILURES: {sorted(set(failures))}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
