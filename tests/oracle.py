"""Local replica of the driver's DuckDB-oracle differential check.

Normalization mirrors the driver contract: sort columns by name, compare row
multisets. Values are compared EXACTLY (floats included) — the query corpus is
designed so both engines produce bit-identical doubles (integer-quantized sums,
per-row deterministic IEEE arithmetic, explicit rounding of libm outputs).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from sheetreader_duckdb_spark.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_value(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm_value(x) for x in v)
    return v


def _norm_rows(columns: list[str], rows) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def run_spark(spark_df):
    cols = spark_df.columns
    rows = [tuple(r) for r in spark_df.collect()]
    return cols, rows


def run_oracle(con, sql: str):
    rel = con.sql(sql)
    return list(rel.columns), rel.fetchall()


def diff(spark_df, con, sql: str, max_report: int = 5) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    s_cols, s_rows = run_spark(spark_df)
    o_cols, o_rows = run_oracle(con, sql)
    problems: list[str] = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")
    sn, on = _norm_rows(s_cols, s_rows), _norm_rows(o_cols, o_rows)
    if sn != on:
        from collections import Counter

        s_extra = Counter(sn) - Counter(on)
        o_extra = Counter(on) - Counter(sn)
        for r, _ in list(s_extra.items())[:max_report]:
            problems.append(f"spark-only row: {r}")
        for r, _ in list(o_extra.items())[:max_report]:
            problems.append(f"oracle-only row: {r}")
        if not s_extra and not o_extra:
            problems.append("multiset equal but ordering of normalization differs (bug in harness)")
    return problems
