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


def _options_fixture() -> str:
    """A deterministic workbook exercising skip_rows / header detection /
    NULL semantics / type-mismatch nulling / pre-1970 date truncation
    (reference semantics, SURVEY.md §1.4–1.5, §2.1 S5–S12)."""
    import datetime as dt

    from sheetreader_duckdb_spark.sources.xlsx.writer import write_xlsx

    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = f"{_CACHE_DIR}/options_fixture.xlsx"
    if not os.path.exists(path):
        rows = [
            ["junk row one"],
            ["junk row two", 99.0],
            ["name", "score", "flag", "born"],
            ["alice", 1.5, True, dt.date(2020, 1, 15)],
            ["bob", None, False, dt.date(1969, 7, 20)],
            [None, 2.25, True, None],
            ["eve", "oops", True, dt.date(2024, 2, 29)],
        ]
        write_xlsx(path + ".tmp", {"Sheet1": rows})
        os.replace(path + ".tmp", path)
    return path


@query(
    "s03_xlsx_option_semantics",
    oracle="""
    SELECT * FROM (VALUES
        ('alice', 1.5,  TRUE,  DATE '2020-01-15'),
        ('bob',   CAST(NULL AS DOUBLE), FALSE, DATE '1969-07-20'),
        (CAST(NULL AS VARCHAR), 2.25, TRUE, CAST(NULL AS DATE)),
        ('eve',   CAST(NULL AS DOUBLE), TRUE, DATE '2024-02-29')
    ) AS t(name, score, flag, born)
    """,
    doc="Reader parameter semantics end-to-end (S5 skip_rows, S6/S7 header, "
    "S11 NULL rules incl. type-mismatch→NULL for the string 'oops' in a "
    "DOUBLE column, S12 pre-1970 date truncation). Oracle is the literal "
    "expected table.",
)
def s03_xlsx_option_semantics(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark import register

    register(spark)
    return (
        spark.read.format("sheetreader")
        .option("skip_rows", 2)
        .option("has_header", True)
        .load(_options_fixture())
    )


@query(
    "s04_xlsx_type_overrides",
    oracle="""
    SELECT * FROM (VALUES
        ('coerce', 'alice', '1.500000', 'TRUE',  '2020-01-15'),
        ('coerce', 'bob',   CAST(NULL AS VARCHAR), 'FALSE', '1969-07-20'),
        ('coerce', CAST(NULL AS VARCHAR), '2.250000', 'TRUE', CAST(NULL AS VARCHAR)),
        ('coerce', 'eve',   'oops', 'TRUE', '2024-02-29'),
        ('force', 'alice', CAST(NULL AS VARCHAR), 'true',  '2020-01-15'),
        ('force', 'bob',   CAST(NULL AS VARCHAR), 'false', '1969-07-20'),
        ('force', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'true', CAST(NULL AS VARCHAR)),
        ('force', 'eve',   'oops', 'true', '2024-02-29')
    ) AS t(mode, name, score, flag, born)
    """,
    doc="User-type overrides (S8/S9), one tagged result over the options "
    "fixture. 'coerce' = coerce_to_string formats: numerics std::to_string "
    "fixed-6, booleans TRUE/FALSE, dates YYYY-MM-DD (reference "
    "src/sheetreader_extension.cpp:182-221). 'force' = force_types "
    "VARCHAR,VARCHAR,BOOLEAN,DATE overriding the detected DOUBLE without "
    "coercion — numeric cells in the forced-VARCHAR column go NULL per the "
    "type-mismatch rule (S11), the one genuine string ('oops') survives; "
    "typed columns are CAST to VARCHAR only to union the two branches.",
)
def s04_xlsx_type_overrides(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark import register

    register(spark)
    coerce = (
        spark.read.format("sheetreader")
        .option("skip_rows", 2)
        .option("has_header", True)
        .option("types", "VARCHAR,VARCHAR,VARCHAR,VARCHAR")
        .option("coerce_to_string", True)
        .load(_options_fixture())
        .select(F.lit("coerce").alias("mode"), "name", "score", "flag", "born")
    )
    force = (
        spark.read.format("sheetreader")
        .option("skip_rows", 2)
        .option("has_header", True)
        .option("types", "VARCHAR,VARCHAR,BOOLEAN,DATE")
        .option("force_types", True)
        .load(_options_fixture())
        .select(
            F.lit("force").alias("mode"),
            "name",
            "score",
            F.col("flag").cast("string").alias("flag"),
            F.col("born").cast("string").alias("born"),
        )
    )
    return coerce.unionAll(force)


def _multisheet_fixture() -> str:
    """Two-sheet workbook for sheet_name / sheet_index selection (S2/S3)."""
    from sheetreader_duckdb_spark.sources.xlsx.writer import write_xlsx

    os.makedirs(_CACHE_DIR, exist_ok=True)
    path = f"{_CACHE_DIR}/multisheet_fixture.xlsx"
    if not os.path.exists(path):
        write_xlsx(
            path + ".tmp",
            {
                "Alpha": [["k", "v"], ["a", 1.0], ["b", 2.0]],
                "Beta": [["k", "v"], ["c", 30.0], ["d", 40.0], ["e", 50.0]],
            },
        )
        os.replace(path + ".tmp", path)
    return path


@query(
    "s05_xlsx_sheet_selection",
    oracle="""
    SELECT * FROM (VALUES
        ('c', 30.0, 'by_name'), ('d', 40.0, 'by_name'), ('e', 50.0, 'by_name'),
        ('a', 1.0,  'by_index'), ('b', 2.0, 'by_index')
    ) AS t(k, v, via)
    """,
    doc="Sheet selection (S2 sheet_index, S3 sheet_name): read sheet 'Beta' "
    "by name and sheet 1 by index from a two-sheet workbook; union tagged.",
)
def s05_xlsx_sheet_selection(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark import register

    register(spark)
    path = _multisheet_fixture()
    by_name = (
        spark.read.format("sheetreader")
        .option("sheet_name", "Beta")
        .option("has_header", True)
        .load(path)
        .withColumn("via", F.lit("by_name"))
    )
    by_index = (
        spark.read.format("sheetreader")
        .option("sheet_index", 1)
        .option("has_header", True)
        .load(path)
        .withColumn("via", F.lit("by_index"))
    )
    return by_name.unionAll(by_index)


@query(
    "s01_xlsx_roundtrip",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty,
           {sql_money_sum('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    UNION ALL
    SELECT 'sink:' || l_returnflag,
           CAST(COUNT(*) AS BIGINT),
           {sql_money_sum('l_quantity')},
           {sql_money_sum('l_extendedprice')}
    FROM lineitem WHERE l_orderkey % 100 = 0
    GROUP BY l_returnflag
    """,
    doc="End-to-end XLSX ingestion (S1–S16 core path): parquet → xlsx writer → "
    "sheetreader data source → aggregate == same aggregate on the parquet. "
    "The 'sink:' branch drives the DISTRIBUTED writer the same way: a "
    "deterministic 1% lineitem slice goes through "
    "df.write.format('sheetreader') (one workbook per partition), is read "
    "back through the source, and must aggregate to the oracle's values — "
    "the full write→read cycle with zero driver-side row handling.",
)
def s01_xlsx_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark import read_xlsx, register

    register(spark)
    path = _xlsx_for_sf(sf)
    # State the projection at the scan (read_xlsx wires it into the
    # reader's columns= pruning): this query consumes all three sheet
    # columns so nothing is dropped here, but the scan documents its needs
    # instead of defaulting to decode-everything — the pattern a wide-sheet
    # caller relies on, since Spark 4.1 won't push required columns into
    # Python sources itself.
    df = read_xlsx(
        spark, path, columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def agg(frame: DataFrame, key) -> DataFrame:
        return frame.groupBy(key.alias("l_returnflag")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
            (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_price"),
        )

    main = agg(df, F.col("l_returnflag"))

    # 'sink:' — distributed write-back: slice → sheetreader sink → source.
    sink_dir = f"{_CACHE_DIR}/sink_wit_{sf.strip('/').replace('/', '_')}"
    (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .repartition(2)
        .write.format("sheetreader")
        .mode("overwrite")
        .save(sink_dir)
    )
    back = spark.read.format("sheetreader").load(f"{sink_dir}/*.xlsx")
    sink_b = agg(back, F.concat(F.lit("sink:"), F.col("l_returnflag")))
    return main.unionAll(sink_b)
