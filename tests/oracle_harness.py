"""Local replica of the driver's DuckDB correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names/dtypes, and
an order-insensitive canonical value set -- strictly (exact equality of
canonicalized cells), which is the conservative approximation of the
driver's value hash.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

from iot_sensor_log_data_pipeline_spark.io_utils import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "<nan>"
        # Do NOT collapse -0.0: the driver's value hash distinguishes
        # the two IEEE zeros, and round 9's only external red row
        # (profile_embedding_covariance) was exactly this divergence --
        # DuckDB round(DOUBLE) preserves -0.0 where Spark F.round emits
        # +0.0 -- masked locally by the collapse that used to live here.
        # repr() keeps the sign: repr(-0.0) == '-0.0'.
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return f"bool:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"int:{int(v)}"
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return "ts:" + ts.isoformat()
    if isinstance(v, date):
        return "date:" + v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "bytes:" + v.hex()
    if pd.isna(v):
        return "<null>"
    return "str:" + str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def _dtype_class(s: pd.Series) -> str:
    """Canonical dtype class for cross-engine schema comparison: width-
    aware for numerics (int32 vs int64 drift should fail here, not only
    in an external schema check), class-level for datetimes (tz/unit
    normalization happens in value canonicalization) and objects (the
    value class -- Decimal vs str vs list -- is compared instead)."""
    kind = s.dtype.kind
    if kind in "iuf":
        return f"{kind}{s.dtype.itemsize}"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    non_null = s.dropna()
    if len(non_null) == 0:
        return "object:empty"
    v = non_null.iloc[0]
    import decimal

    if isinstance(v, decimal.Decimal):
        return "object:decimal"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "object:list"
    if isinstance(v, bytes):
        return "object:bytes"
    if isinstance(v, date) and not isinstance(v, datetime):
        return "object:date"
    return "object"


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} "
            f"oracle={sorted(oracle_df.columns)}"
        )
        return problems
    s_types = {c: _dtype_class(spark_df[c]) for c in spark_df.columns}
    o_types = {c: _dtype_class(oracle_df[c]) for c in oracle_df.columns}
    if s_types != o_types:
        drift = {
            c: (s_types[c], o_types[c])
            for c in s_types
            if s_types[c] != o_types[c]
        }
        problems.append(f"dtypes differ (spark, oracle): {drift}")
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    s_rows = canonical_rows(spark_df)
    o_rows = canonical_rows(oracle_df)
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in set(o_rows)][:5]
        diff_o = [r for r in o_rows if r not in set(s_rows)][:5]
        problems.append(
            f"values differ; spark-only (≤5): {diff_s}; oracle-only (≤5): {diff_o}"
        )
    return problems


def negative_zero_cells(df: pd.DataFrame) -> dict[str, int]:
    """Column -> count of IEEE ``-0.0`` cells.  The engine's policy is
    that NO catalog query and NO oracle emits ``-0.0`` at all: Spark's
    ``F.round`` never produces one (BigDecimal semantics) but DuckDB's
    ``round(DOUBLE)`` and un-rounded expressions on either engine can,
    and the driver's value hash distinguishes the two zeros.  Oracles
    collapse with a trailing ``+ 0.0``; Spark plans that could emit a
    raw ``-0.0`` must normalize too.  Zero tolerance here means the
    flake class cannot re-enter with new data or new queries."""
    bad: dict[str, int] = {}
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            n = int(((s == 0.0) & np.signbit(s.fillna(1.0))).sum())
            if n:
                bad[c] = n
        elif s.dtype == object:
            cnt = sum(
                1
                for v in s.dropna()
                if isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0
            )
            if cnt:
                bad[c] = cnt
    return bad


def driver_unhashable_columns(df: pd.DataFrame) -> list[str]:
    """Columns an external verifier cannot sort/hash: the driver's
    canonicalizer does a plain pandas ``sort_values`` + hash over every
    output column, which raises ``TypeError: unhashable type`` on
    list/ndarray/dict cells (seen in round 2 on an array<double>
    output).  This harness canonicalizes them fine, so without this
    guard the gap is invisible locally -- every catalog query must keep
    its TOP-LEVEL output columns scalar (explode or stringify instead)."""
    bad = []
    for c in df.columns:
        non_null = df[c].dropna()
        if len(non_null) and isinstance(
            non_null.iloc[0], (list, tuple, dict, np.ndarray)
        ):
            bad.append(c)
    return bad


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from iot_sensor_log_data_pipeline_spark.plans import catalog

    entry = catalog.all_entries()[name]
    spark_pdf = entry.fn(spark, sf_dir).toPandas()
    unhashable = driver_unhashable_columns(spark_pdf)
    if unhashable:
        return [f"driver-unhashable top-level columns (explode/stringify): {unhashable}"]
    problems: list[str] = []
    nz = negative_zero_cells(spark_pdf)
    if nz:
        problems.append(f"spark output contains -0.0 cells: {nz}")
    if entry.oracle is None:
        return problems if len(spark_pdf) >= 0 else problems + ["spark query failed"]
    oracle_pdf = run_oracle(entry.oracle, sf_dir)
    nz_o = negative_zero_cells(oracle_pdf)
    if nz_o:
        problems.append(f"oracle output contains -0.0 cells (add '+ 0.0'): {nz_o}")
    return problems + compare_frames(spark_pdf, oracle_pdf)
