"""Warehouse-maintenance operators: MERGE-style upsert and SCD2
(slowly-changing-dimension type 2) history derivation.

The reference pipeline is append-only (it emits one candidates file per
run, ``/root/reference/claim_pipeline.py:213-223``); any production
deployment of the same data needs the two table-maintenance primitives
every warehouse engine ships and Spark-without-a-lakehouse-format has
to express relationally:

- MERGE (upsert + delete): apply a change-set to a dimension — one
  full-outer join on the key. At 100 TB the base side is bucketed by
  the merge key (shuffle-free, see tests/test_bucketing.py) and a
  small change-set broadcasts, so the merge costs one scan of base.
- SCD2: collapse an event log into versioned validity intervals —
  the gaps-and-islands pattern (lag → change flag → running island id
  → per-island bounds), two window passes over one user-partitioned
  shuffle, no self-join.

Both are pure DataFrame compositions — fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.stable import dec_sum_from_parts, dec_sum_parts, dec_sum_sql
from ..registry import register
from ..session import load_table

# ---------------------------------------------------------------------------
# MERGE-style upsert: customer dimension + deterministic change-set
# ---------------------------------------------------------------------------

MERGE_ORACLE = """
WITH changes AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS new_bal,
         CASE WHEN o_custkey % 10 = 0 THEN 'delete' ELSE 'upsert' END AS op
  FROM orders
  GROUP BY o_custkey
  UNION ALL
  SELECT o_custkey + 10000000 AS c_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS new_bal,
         'upsert' AS op
  FROM orders
  WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
)
SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
       COALESCE(b.c_name, 'NEW-' || CAST(c.c_custkey AS VARCHAR)) AS c_name,
       COALESCE(c.new_bal, b.c_acctbal) AS c_acctbal,
       CASE WHEN b.c_custkey IS NULL THEN 'inserted'
            WHEN c.c_custkey IS NULL THEN 'unchanged'
            ELSE 'updated' END AS merge_action
FROM customer b
FULL OUTER JOIN (SELECT * FROM changes WHERE op <> 'delete') c USING (c_custkey)
WHERE NOT EXISTS (
  SELECT 1 FROM changes d
  WHERE d.op = 'delete' AND d.c_custkey = COALESCE(b.c_custkey, c.c_custkey)
)
"""


def merge_changes(base: DataFrame, changes: DataFrame) -> DataFrame:
    """MERGE INTO base USING changes: ``op='delete'`` removes the key,
    ``op='upsert'`` updates a matched row's balance or inserts a new
    row. One full-outer join + one anti join on the key — the
    lakehouse-format-free expression of MERGE."""
    upserts = changes.filter(F.col("op") != "delete")
    deletes = changes.filter(F.col("op") == "delete").select("c_custkey")
    merged = base.join(upserts, ["c_custkey"], "full_outer").select(
        "c_custkey",
        F.coalesce(
            "c_name", F.concat(F.lit("NEW-"), F.col("c_custkey").cast("string"))
        ).alias("c_name"),
        F.coalesce("new_bal", "c_acctbal").alias("c_acctbal"),
        F.when(F.col("c_name").isNull(), "inserted")
        .when(F.col("new_bal").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )
    return merged.join(deletes, ["c_custkey"], "left_anti")


@register("warehouse_merge_upsert", oracle=MERGE_ORACLE, tags=("warehouse", "join"))
def warehouse_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a deterministic change-set (per-customer order totals:
    keys %10==0 delete, urgent-priority keys also insert shifted new
    rows, the rest update the balance) to the customer dimension via
    relational MERGE. Every row is tagged with its merge_action."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    from ..functions.stable import dec_sum

    base_changes = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        dec_sum("o_totalprice").alias("new_bal")
    )
    changes = base_changes.select(
        "c_custkey",
        "new_bal",
        F.when(F.col("c_custkey") % 10 == 0, "delete").otherwise("upsert").alias("op"),
    ).unionByName(
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy((F.col("o_custkey") + 10000000).alias("c_custkey"))
        .agg(dec_sum("o_totalprice").alias("new_bal"))
        .select("c_custkey", "new_bal", F.lit("upsert").alias("op"))
    )
    return merge_changes(customer.select("c_custkey", "c_name", "c_acctbal"), changes)


# ---------------------------------------------------------------------------
# SCD2 history: collapse the event log into validity intervals
# ---------------------------------------------------------------------------

SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS changed
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
  FROM ordered
),
collapsed AS (
  SELECT user_id, event_type, island,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM islands
  GROUP BY user_id, event_type, island
)
SELECT user_id, event_type,
       CAST(epoch_us(valid_from) AS BIGINT) AS valid_from_us,
       CAST(epoch_us(LEAD(valid_from) OVER
            (PARTITION BY user_id ORDER BY island)) AS BIGINT) AS valid_to_us,
       CAST(CASE WHEN LEAD(valid_from) OVER
            (PARTITION BY user_id ORDER BY island) IS NULL
            THEN 1 ELSE 0 END AS INT) AS is_current,
       n_events
FROM collapsed
"""


def scd2_history(events: DataFrame) -> DataFrame:
    """SCD2 derivation: consecutive runs of the same per-user
    ``event_type`` collapse into one versioned row with
    ``[valid_from, valid_to)`` bounds and an ``is_current`` flag.

    Gaps-and-islands: lag-change flag → running sum island id →
    group per island → lead() for the closing bound. Both window
    passes and the aggregate share the user_id partitioning, so the
    whole derivation is ONE shuffle; ties broken by event_id for a
    total order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0).alias("changed"),
    )
    islands = flagged.withColumn(
        "island", F.sum("changed").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    collapsed = islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w2 = Window.partitionBy("user_id").orderBy("island")
    nxt = F.lead("valid_from").over(w2)
    return collapsed.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
        "n_events",
    )


@register("warehouse_scd2_history", oracle=SCD2_ORACLE, tags=("warehouse", "window"))
def warehouse_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned per-user event_type history (SCD2) over the events
    log — the change-data-capture compaction a dimension-history table
    is built from."""
    return scd2_history(load_table(spark, sf_dir, "events"))


INCR_AGG_ORACLE = f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       {dec_sum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("warehouse_incremental_agg", oracle=INCR_AGG_ORACLE, tags=("warehouse", "agg"))
def warehouse_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance, EXACTLY: the table is split
    into a base slice and a delta batch (l_orderkey % 10), each is
    aggregated independently, and the two aggregates are merged by
    plain addition — the result must hash-equal the oracle's one-shot
    full-table aggregate, which is precisely the incremental-
    view-maintenance contract.

    The merge is exact because the sum is carried in its mergeable
    split-accumulator form (two LONG partials per group,
    functions/stable.py::dec_sum_parts): long addition is associative,
    so base+delta partials recombine to the bit-identical total a
    single pass produces. Merging two finished DOUBLE sums instead
    would drift by an ulp per merge — the classic silent error in
    incrementally-maintained dashboards. At 100 TB this is the
    nightly-delta pattern: the base aggregate is a tiny materialized
    table; only the delta batch is scanned."""
    li = load_table(spark, sf_dir, "lineitem")

    def parts_agg(df: DataFrame, tag: str) -> DataFrame:
        q, r = dec_sum_parts("l_quantity")
        return df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            q.alias(f"q_{tag}"),
            r.alias(f"r_{tag}"),
        )

    base = parts_agg(li.filter(F.col("l_orderkey") % 10 != 0), "base")
    delta = parts_agg(li.filter(F.col("l_orderkey") % 10 == 0), "delta")
    z = F.lit(0).cast("long")
    merged = base.join(delta, "l_returnflag", "full_outer").select(
        "l_returnflag",
        (F.coalesce("n_base", z) + F.coalesce("n_delta", z)).alias("n_rows"),
        dec_sum_from_parts(
            F.coalesce("q_base", z) + F.coalesce("q_delta", z),
            F.coalesce("r_base", z) + F.coalesce("r_delta", z),
        ).alias("sum_qty"),
    )
    return merged


# ---------------------------------------------------------------------------
# Point-in-time (temporal) join against the SCD2 dimension
# ---------------------------------------------------------------------------

PIT_ORACLE = f"""
WITH scd AS ({SCD2_ORACLE})
SELECT e.event_id, e.user_id,
       CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
       s.event_type AS state,
       s.valid_from_us AS version_from_us,
       s.n_events AS version_n_events
FROM events e
JOIN scd s
  ON e.user_id = s.user_id
 AND epoch_us(e.ts) >= s.valid_from_us
 AND (s.valid_to_us IS NULL OR epoch_us(e.ts) < s.valid_to_us)
WHERE e.event_type = 'purchase'
"""


@register("warehouse_pit_join", oracle=PIT_ORACLE, tags=("warehouse", "join", "window"))
def warehouse_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase event is joined to the SCD2
    dimension version that was valid AT ITS TIMESTAMP ("what state was
    this user in when they bought?") — the temporal-correctness join
    every feature-store / training-set builder needs to avoid label
    leakage from future dimension versions.

    Scale shape: NOT an interval join. The oracle's BETWEEN join is
    O(facts x versions-per-key) probe work; here version-start rows and
    fact rows are unioned on the shared user_id shuffle and a single
    `last(version_start) ignoreNulls` ordered window resolves each
    fact's version (the as-of pattern of join_asof_last_error), then one
    equi-join on (user_id, version_start) attaches version attributes.
    One shuffle + one equi-join, fanout-free, any version cardinality."""
    ev = load_table(spark, sf_dir, "events")
    dim = scd2_history(ev)
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    starts = dim.select(
        "user_id",
        F.col("valid_from_us").alias("t"),
        F.lit(0).alias("kind"),
        F.col("valid_from_us").alias("version_start"),
        F.lit(None).cast("long").alias("event_id"),
    )
    probes = facts.select(
        "user_id",
        F.col("ts_us").alias("t"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("version_start"),
        "event_id",
    )
    # version rows sort before same-instant facts (kind 0 < 1), so a
    # fact at exactly valid_from lands in that version
    w = Window.partitionBy("user_id").orderBy("t", "kind").rowsBetween(
        Window.unboundedPreceding, 0
    )
    resolved = (
        starts.unionByName(probes)
        .withColumn("v", F.last("version_start", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select("user_id", "event_id", F.col("t").alias("ts_us"), "v")
    )
    return resolved.join(
        dim,
        (resolved.user_id == dim.user_id) & (resolved.v == dim.valid_from_us),
    ).select(
        resolved.event_id,
        resolved.user_id,
        "ts_us",
        F.col("event_type").alias("state"),
        F.col("valid_from_us").alias("version_from_us"),
        F.col("n_events").alias("version_n_events"),
    )


# ---------------------------------------------------------------------------
# Snapshot diff (net CDC between two points in time)
# ---------------------------------------------------------------------------

SNAPSHOT_DIFF_ORACLE = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS t1
  FROM events
), s2 AS (
  SELECT user_id, event_id, event_type, value, CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
), s1 AS (
  SELECT user_id, event_id, event_type, value
  FROM events, b
  WHERE epoch_us(ts) <= b.t1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
)
SELECT s2.user_id,
       CASE WHEN s1.user_id IS NULL THEN 'added' ELSE 'updated' END AS status,
       s1.event_type AS old_state,
       s2.event_type AS new_state,
       s1.value AS old_value,
       s2.value AS new_value,
       s2.ts_us AS new_ts_us
FROM s2 LEFT JOIN s1 USING (user_id)
WHERE s1.user_id IS NULL OR s2.event_id <> s1.event_id
"""


@register("warehouse_snapshot_diff", oracle=SNAPSHOT_DIFF_ORACLE, tags=("warehouse", "cdc", "agg"))
def warehouse_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net change-set between two table snapshots — the lakehouse
    "diff two versions" maintenance op: per-user latest state at the
    midpoint cutoff T1 vs at T2 = now, emitting added/updated rows
    (users untouched between the snapshots produce nothing, which is
    what makes the diff incremental-shippable downstream).

    Scale shape: ONE scan and ONE user_id shuffle computes both
    snapshots simultaneously — per-user ``MAX(struct(ts, event_id,
    ...))`` (lexicographic on a unique leading pair, so deterministic)
    with the T1 snapshot as a conditional aggregate over the same
    groups — where the naive form is two window passes plus a
    self-join. The oracle keeps the naive two-CTE QUALIFY form; both
    resolve the same (ts, event_id)-latest rows."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 2")
        ).alias("t1")
    )
    s = F.struct(
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        "value",
    )
    snap = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.unix_micros("ts") <= F.col("t1"), s)).alias("s1"),
            F.max(s).alias("s2"),
        )
    )
    return (
        snap.filter(
            F.col("s1").isNull() | (F.col("s2.event_id") != F.col("s1.event_id"))
        )
        .select(
            "user_id",
            F.when(F.col("s1").isNull(), "added").otherwise("updated").alias("status"),
            F.col("s1.event_type").alias("old_state"),
            F.col("s2.event_type").alias("new_state"),
            F.col("s1.value").alias("old_value"),
            F.col("s2.value").alias("new_value"),
            F.col("s2.ts_us").alias("new_ts_us"),
        )
    )


# ---------------------------------------------------------------------------
# Right-to-be-forgotten cascade audit.
# ---------------------------------------------------------------------------

FORGET_PCT = 5  # md5(c_custkey) bucket < 5 -> the erasure request set


def _forget_oracle() -> str:
    from .sampling import _bucket_sql

    b = _bucket_sql("c_custkey")
    return f"""
WITH forget AS (
  SELECT c_custkey FROM customer WHERE {b} < {FORGET_PCT}
), c AS (
  SELECT 'customer' AS table_name,
         CAST(COUNT(*) FILTER (c_custkey IN (SELECT c_custkey FROM forget)) AS BIGINT)
           AS n_purged,
         CAST(COUNT(*) FILTER (c_custkey NOT IN (SELECT c_custkey FROM forget)) AS BIGINT)
           AS n_kept
  FROM customer
), o AS (
  SELECT 'orders',
         CAST(COUNT(*) FILTER (o_custkey IN (SELECT c_custkey FROM forget)) AS BIGINT),
         CAST(COUNT(*) FILTER (o_custkey NOT IN (SELECT c_custkey FROM forget)) AS BIGINT)
  FROM orders
), l AS (
  SELECT 'lineitem',
         CAST(COUNT(*) FILTER (l_orderkey IN
           (SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM forget))) AS BIGINT),
         CAST(COUNT(*) FILTER (l_orderkey NOT IN
           (SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM forget))) AS BIGINT)
  FROM lineitem
)
SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l
"""


@register("warehouse_forget_cascade", oracle=_forget_oracle(), tags=("warehouse", "join", "dq"))
def warehouse_forget_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: for a deterministic erasure
    request set (md5 bucket of c_custkey, {FORGET_PCT}% of customers),
    count exactly which rows each table must purge vs keep, following
    the FK chain customer → orders → lineitem. This is the counting
    pass a GDPR/CCPA delete job runs BEFORE rewriting partitions —
    and the same frame re-run after the rewrite must show n_purged=0,
    which makes the audit its own verification.

    Plan shape: the forget set and the affected-orders key set are
    semi/anti-join sides (broadcast when small; the orderkey set of a
    5% customer sample stays broadcastable at warehouse scale because
    it's keys only); each fact table is scanned once with both
    memberships resolved in that single pass via a left join + flag
    aggregation, not one scan per verdict."""
    from .sampling import hash_bucket

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    forget = cust.filter(hash_bucket("c_custkey") < FORGET_PCT).select("c_custkey")

    def audit(table: DataFrame, key: str, purge_keys: DataFrame, name: str) -> DataFrame:
        flagged = table.select(F.col(key)).join(
            F.broadcast(purge_keys.withColumnRenamed(purge_keys.columns[0], "_pk")),
            F.col(key) == F.col("_pk"),
            "left",
        )
        return flagged.agg(
            F.lit(name).alias("table_name"),
            F.sum(F.col("_pk").isNotNull().cast("long")).cast("long").alias("n_purged"),
            F.sum(F.col("_pk").isNull().cast("long")).cast("long").alias("n_kept"),
        )
    affected_orders = orders.join(
        F.broadcast(forget), orders.o_custkey == forget.c_custkey, "left_semi"
    ).select("o_orderkey")
    return (
        audit(cust, "c_custkey", forget, "customer")
        .unionByName(audit(orders, "o_custkey", forget, "orders"))
        .unionByName(audit(li, "l_orderkey", affected_orders, "lineitem"))
    )


# ---------------------------------------------------------------------------
# Order-independent table fingerprints (replica reconciliation).
# ---------------------------------------------------------------------------


def _fp_oracle() -> str:
    def h(expr: str) -> str:
        return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"

    return f"""
SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor({h("CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' || c_mktsegment")}) AS BIGINT) AS fingerprint
FROM customer
UNION ALL
SELECT 'orders', CAST(COUNT(*) AS BIGINT),
       CAST(bit_xor({h("CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' || CAST(ROUND(o_totalprice * 100) AS BIGINT) || '|' || o_orderstatus")}) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
       CAST(bit_xor({h("CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || CAST(ROUND(l_extendedprice * 100) AS BIGINT) || '|' || l_returnflag")}) AS BIGINT)
FROM lineitem
"""


@register("warehouse_table_fingerprint", oracle=_fp_oracle(), tags=("warehouse", "dq", "agg"))
def warehouse_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content fingerprint per table: XOR of per-row
    md5-60bit hashes over the canonical key+payload projection (money
    as exact cents) plus the row count — the cross-replica
    reconciliation primitive (same fingerprint+count ⇒ same rows, any
    partitioning, any order; a single flipped row flips the XOR).
    XOR is commutative/associative and width-preserving, so the
    aggregate is map-side combinable with 8 bytes of state and merges
    across shards/days exactly — the same algebraic-aggregate property
    the engine's HLL/Bloom sketches exploit. One scan per table."""

    def h(col):
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

    def fp(df: DataFrame, name: str, payload) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor(h(payload)).cast("long").alias("fingerprint"),
        )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        fp(
            cust,
            "customer",
            F.concat_ws(
                "|", F.col("c_custkey").cast("string"), "c_name", "c_mktsegment"
            ),
        )
        .unionByName(
            fp(
                orders,
                "orders",
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                    "o_orderstatus",
                ),
            )
        )
        .unionByName(
            fp(
                li,
                "lineitem",
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
                    "l_returnflag",
                ),
            )
        )
    )


# ---------------------------------------------------------------------------
# Time travel: the dimension AS OF a point in time, from SCD2 history.
# ---------------------------------------------------------------------------


def _asof_snapshot_oracle() -> str:
    return f"""
WITH hist AS ({SCD2_ORACLE}),
snap AS (
  SELECT (MIN(valid_from_us) + MAX(valid_from_us)) // 2 AS t FROM hist
)
SELECT h.user_id, h.event_type AS state_at_t, h.valid_from_us, h.n_events,
       a.t AS asof_us
FROM hist h, snap a
WHERE h.valid_from_us <= a.t
  AND (h.valid_to_us IS NULL OR h.valid_to_us > a.t)
"""


@register("warehouse_asof_snapshot", oracle=_asof_snapshot_oracle(), tags=("warehouse", "window"))
def warehouse_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 dimension: each user's state AS OF a
    single instant (the data-derived midpoint of version start times) —
    the query pattern every history table exists to answer ("what did
    the dimension look like when the model trained?"). The predicate
    ``valid_from ≤ t < valid_to`` (open upper bound, NULL = current)
    returns EXACTLY ONE row per user whose history covers t — the
    versioning invariant, asserted in tests. Snapshot selection is a
    pure filter over the history frame: no window, no join beyond the
    broadcast scalar."""
    hist = scd2_history(load_table(spark, sf_dir, "events"))
    asof = hist.agg(
        ((F.min("valid_from_us") + F.max("valid_from_us")) / 2)
        .cast("long")
        .alias("t")
    )
    return (
        hist.crossJoin(F.broadcast(asof))
        .filter(
            (F.col("valid_from_us") <= F.col("t"))
            & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > F.col("t")))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state_at_t"),
            "valid_from_us",
            "n_events",
            F.col("t").alias("asof_us"),
        )
    )


# ---------------------------------------------------------------------------
# Merge-on-read with position deletes (Iceberg v2 deletion vectors)
# ---------------------------------------------------------------------------

DV_FILE_W = 100  # orderkeys per synthetic data file
DV_DEL_MOD = 10  # delete every position whose md5(file:pos) % 10 == 0

DELETION_VECTOR_ORACLE = f"""
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         l_orderkey // {DV_FILE_W} AS file_id,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey // {DV_FILE_W}
                            ORDER BY l_orderkey, l_linenumber, l_quantity,
                                     l_extendedprice) AS pos
  FROM lineitem
), counts AS (
  SELECT file_id, COUNT(*) AS n_rows FROM base GROUP BY 1
), dv AS (
  SELECT file_id, pos FROM counts, unnest(generate_series(1, n_rows)) AS u(pos)
  WHERE (('0x' || substr(md5(CAST(file_id AS VARCHAR) || ':' ||
          CAST(pos AS VARCHAR)), 1, 8))::BIGINT % {DV_DEL_MOD}) = 0
), live AS (
  SELECT b.* FROM base b ANTI JOIN dv
    ON b.file_id = dv.file_id AND b.pos = dv.pos
)
SELECT c.file_id,
       CAST(c.n_rows AS BIGINT) AS n_rows,
       CAST(COUNT(l.pos) AS BIGINT) AS n_live,
       CAST(c.n_rows - COUNT(l.pos) AS BIGINT) AS n_deleted,
       {dec_sum_sql("l.l_quantity")} AS live_qty
FROM counts c LEFT JOIN live l ON l.file_id = c.file_id
GROUP BY c.file_id, c.n_rows
"""


@register(
    "warehouse_deletion_vectors",
    oracle=DELETION_VECTOR_ORACLE,
    tags=("warehouse", "join", "scale"),
)
def warehouse_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read with POSITION deletes, the Iceberg v2 / Delta
    deletion-vector read path: data files are immutable; deletes live
    in a side table of (file, position) and the scan applies them with
    a positional anti-join — no rewrite of the 100 TB base. Emits the
    per-file reconciliation (rows, live, deleted, surviving quantity
    sum) a maintenance job uses to decide when accumulated deletes
    justify compacting a file.

    The synthetic delete vector is built BY POSITION (md5(file:pos)),
    deliberately independent of any row predicate — a filter cannot
    reproduce it; only the positional join can, which is what makes
    this a faithful merge-on-read exercise. Scale shape: positions are
    assigned by a window over PARTITION BY file_id (bounded rows per
    file — never a global sort); the anti-join shuffles on file_id
    + pos with both sides partitioned the same way; in production the
    dv side arrives as a compact bitmap table, smaller still.
    """
    # (l_orderkey, l_linenumber) is NOT unique in the fixture; extend
    # the position order by the payload columns so the file layout is a
    # total order up to rows whose emitted metric (quantity) ties — any
    # residual ambiguity cannot change the per-file sums.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    base = li.withColumn(
        "file_id", F.floor(F.col("l_orderkey") / DV_FILE_W).cast("long")
    ).withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("file_id").orderBy(
                "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
            )
        ),
    )
    counts = base.groupBy("file_id").agg(F.count(F.lit(1)).alias("n_rows"))
    dv = (
        counts.select(
            "file_id", F.explode(F.sequence(F.lit(1), F.col("n_rows"))).alias("pos")
        )
        .filter(
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("file_id").cast("string"),
                                F.lit(":"),
                                F.col("pos").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(DV_DEL_MOD),
            )
            == 0
        )
    )
    live = base.join(dv, ["file_id", "pos"], "left_anti")
    per_file = live.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_live"),
        dec_sum_from_parts(*dec_sum_parts(F.col("l_quantity"))).alias("live_qty"),
    )
    return (
        counts.join(per_file, "file_id", "left")
        .select(
            "file_id",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.coalesce("n_live", F.lit(0)).cast("long").alias("n_live"),
            (F.col("n_rows") - F.coalesce("n_live", F.lit(0)))
            .cast("long")
            .alias("n_deleted"),
            "live_qty",
        )
    )
