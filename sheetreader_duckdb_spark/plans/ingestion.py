"""XLSX ingestion queries — the reference's own capability (SURVEY.md §2.1),
oracle-checked end-to-end.

``s01_xlsx_roundtrip`` proves the whole ingestion path against the DuckDB
oracle without DuckDB needing an XLSX reader: we write a slice of ``lineitem``
to a real XLSX file with our pure-python writer (shared strings + sheet XML,
the exact shape the reference consumes), read it back through the sheetreader
data source, and aggregate; the oracle runs the same aggregate on the original
parquet. Doubles survive the trip bit-exact (repr-formatted serials), so the
hash must match — any parser/type/NULL bug breaks it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.functions import cents, sql_money_sum
from sheetreader_duckdb_spark.plans import query

_CACHE_DIR = "/tmp/sheetreader_ingest_cache"


def _xlsx_for_sf(sf_dir: str) -> str:
    """Materialize (once) an XLSX copy of 3 lineitem columns for this sf."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tag = sf_dir.strip("/").replace("/", "_")
    path = f"{_CACHE_DIR}/lineitem_{tag}.xlsx"
    if not os.path.exists(path):
        import duckdb

        from sheetreader_duckdb_spark.sources.xlsx.writer import write_xlsx

        rows = duckdb.sql(
            f"SELECT l_returnflag, l_quantity, l_extendedprice FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
        header = [["l_returnflag", "l_quantity", "l_extendedprice"]]
        tmp = path + ".tmp"
        write_xlsx(tmp, {"Sheet1": header + [list(r) for r in rows]})
        os.replace(tmp, path)
    return path


@query(
    "s01_xlsx_roundtrip",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty,
           {sql_money_sum('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="End-to-end XLSX ingestion (S1–S16 core path): parquet → xlsx writer → "
    "sheetreader data source → aggregate == same aggregate on the parquet.",
)
def s01_xlsx_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark import register

    register(spark)
    path = _xlsx_for_sf(sf)
    df = spark.read.format("sheetreader").load(path)
    return df.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
        (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_price"),
    )
