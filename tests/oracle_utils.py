"""Local replica of the driver's DuckDB-oracle comparison.

The driver runs each ``queries()[name]`` on Spark and ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row count + schema +
order-insensitive value hash. This harness reimplements that check locally
(slightly stricter on values: full-precision float equality) so every
registered query is pre-validated before the driver ever sees it.
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

NULL = "␀NULL"


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # Spark-written tables (scale/skew lab shards) are DIRECTORIES
        # of part files; the driver's testdata are single files. Glob
        # the directory case so parity runs on either layout.
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def canon_cell(v) -> str:
    """Engine-independent canonical string for one value."""
    if v is None:
        return NULL
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return NULL
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        # unify int/float representation: 950 and 950.0 both -> '950.0'
        return repr(float(int(v))) if abs(int(v)) < 2**53 else str(int(v))
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def _kind(dtype, series: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_numeric_dtype(dtype):
        return "num"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "ts"
    non_null = series.dropna()
    if len(non_null):
        v = non_null.iloc[0]
        if isinstance(v, str):
            return "str"
        if isinstance(v, (datetime.date, datetime.datetime)):
            return "ts"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "list"
        if isinstance(v, (int, float, Decimal)):
            return "num"
    return "obj"


def canon_table(df: pd.DataFrame) -> tuple[list[str], dict[str, str], list[tuple]]:
    """(sorted column names, column kind map, sorted canonical rows)."""
    cols = sorted(df.columns)
    kinds = {c: _kind(df[c].dtype, df[c]) for c in cols}
    rows = [tuple(canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return cols, kinds, rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols, s_kinds, s_rows = canon_table(spark_pdf)
    o_cols, o_kinds, o_rows = canon_table(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"{name}: column names differ: spark={s_cols} oracle={o_cols}")
        return problems
    for c in s_cols:
        if s_kinds[c] != o_kinds[c]:
            problems.append(
                f"{name}: column {c} kind differs: spark={s_kinds[c]} oracle={o_kinds[c]}"
            )
    if len(s_rows) != len(o_rows):
        problems.append(f"{name}: row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    if problems:
        return problems
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in set(o_rows)][:3]
        diff_o = [r for r in o_rows if r not in set(s_rows)][:3]
        problems.append(
            f"{name}: values differ; spark-only rows (≤3): {diff_s}; oracle-only rows (≤3): {diff_o}"
        )
    return problems


def oracle_type_problems(con, oracle: str, spark_schema, name: str) -> list[str]:
    """Flag DuckDB result types that the driver's value hash serializes
    differently from Spark's, even on numerically identical values.

    The local canonicalization in :func:`canon_cell` unifies int/float/
    Decimal representations, which is *stricter on values* but *blinder
    on types* than the driver: DuckDB types ``SUM(BIGINT)`` as HUGEINT
    (int128) and the driver hash distinguishes that from Spark's long
    (r02 failures: events_json_extract / events_user_totals /
    sample_split_hash — all value-equal, all hash-red). This check runs
    ``DESCRIBE`` on the oracle (no data scan) and compares per-column
    type *categories* against the Spark schema:

    - HUGEINT/UHUGEINT anywhere -> flagged (Spark has no int128; fix the
      oracle with ``CAST(SUM(...) AS BIGINT)``).
    - DECIMAL vs Spark long/int/double -> flagged (follow the registry
      convention: ``CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE)``).
    - int-vs-float category mismatch in either direction -> flagged.
    """
    from pyspark.sql import types as T

    problems: list[str] = []
    duck_cols = con.execute(f"DESCRIBE {oracle}").fetchall()
    duck_types = {row[0]: row[1].upper() for row in duck_cols}
    spark_types = {f.name: f.dataType for f in spark_schema.fields}
    if sorted(duck_types) != sorted(spark_types):
        problems.append(
            f"{name}: column names differ: spark={sorted(spark_types)} "
            f"oracle={sorted(duck_types)}"
        )
        return problems

    int_spark = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    float_spark = (T.DoubleType, T.FloatType)
    for col, dt in duck_types.items():
        st = spark_types[col]
        if "HUGEINT" in dt:
            problems.append(
                f"{name}.{col}: oracle type {dt} (int128) — driver hash "
                f"diverges from Spark {st.simpleString()}; wrap in "
                f"CAST(... AS BIGINT)"
            )
        elif dt.startswith("DECIMAL") and isinstance(st, int_spark + float_spark):
            problems.append(
                f"{name}.{col}: oracle DECIMAL vs Spark {st.simpleString()} — "
                f"cast the oracle to match (AS DOUBLE / AS BIGINT)"
            )
        elif dt in ("DOUBLE", "FLOAT", "REAL") and isinstance(st, int_spark):
            problems.append(
                f"{name}.{col}: oracle {dt} vs Spark {st.simpleString()} — "
                f"int/float serialize differently in the driver hash"
            )
        elif dt in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
                    "USMALLINT", "UINTEGER", "UBIGINT") and isinstance(
                        st, float_spark):
            problems.append(
                f"{name}.{col}: oracle {dt} vs Spark {st.simpleString()} — "
                f"int/float serialize differently in the driver hash"
            )
        elif isinstance(st, T.DecimalType) and not dt.startswith("DECIMAL"):
            # the mirror direction of the DECIMAL rule above: Spark
            # Decimal vs oracle DOUBLE/BIGINT also hash-diverges
            # (Decimal('950.0000') vs 950.0)
            problems.append(
                f"{name}.{col}: Spark {st.simpleString()} vs oracle {dt} — "
                f"cast the Spark side (or the oracle) so families match"
            )
    return problems


def run_parity(spark, sf_dir: str, name: str, fn, oracle: str) -> list[str]:
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    con = duckdb_conn(sf_dir)
    try:
        # Type audit FIRST: canon_cell below unifies int/float/Decimal,
        # which is stricter on values but blinder on types than the
        # driver's hash — a value-equal HUGEINT result passed locally in
        # r02 yet failed the driver. Never let that class through again.
        problems = oracle_type_problems(con, oracle, sdf.schema, name)
        oracle_pdf = con.execute(oracle).df()
    finally:
        con.close()
    return problems + compare_frames(spark_pdf, oracle_pdf, name)
