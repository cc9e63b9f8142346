"""One-pass data profiling: per-column completeness / cardinality /
range statistics, the "describe my table" primitive every analytics
engine ships (cf. reference's ad-hoc per-field counters,
``/root/reference/claim_pipeline.py:156-176``, generalized to any
table).

Scale shape: ONE aggregation pass emits every per-column statistic as
columns of a single row, which is then exploded driver-free into the
(col_name, stats...) long format — no per-column scan, no driver loop.
The exact COUNT(DISTINCT) set makes Catalyst plan an Expand (one
duplicated stream per distinct-column) feeding a single shuffled
aggregate; at 100 TB you would swap ``F.count_distinct`` for
``F.approx_count_distinct`` (HLL sketch, no Expand) — the projection
below is the only line that changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def profile_table(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Profile ``cols`` of ``df`` in one aggregation pass.

    Returns one row per column: ``col_name, n_rows, n_nonnull,
    n_distinct, min_val, max_val`` (min/max computed in the column's
    native type, then stringified — numeric columns keep numeric
    ordering, not lexicographic).
    """
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__{c}_nn"),
            F.count_distinct(c).alias(f"__{c}_nd"),
            F.min(c).cast("string").alias(f"__{c}_min"),
            F.max(c).cast("string").alias(f"__{c}_max"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__{c}_nn").alias("n_nonnull"),
                F.col(f"__{c}_nd").alias("n_distinct"),
                F.col(f"__{c}_min").alias("min_val"),
                F.col(f"__{c}_max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def _profile_oracle(table: str, cols: tuple[str, ...]) -> str:
    parts = [
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
               COUNT({c}) AS n_nonnull,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_val,
               CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


@register(
    "profile_documents",
    oracle=_profile_oracle("documents", _DOC_COLS),
    tags=("profile", "agg"),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table: completeness, exact
    cardinality, and native-type min/max for every column, one scan."""
    return profile_table(load_table(spark, sf_dir, "documents"), _DOC_COLS)
