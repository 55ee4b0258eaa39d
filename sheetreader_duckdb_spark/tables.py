"""Testdata table access (TESTDATA.md / FIXTURES.md §B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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

# Dimension tables small enough to broadcast at any scale factor (region/
# nation are fixed-size; supplier/part grow but stay tiny relative to fact
# tables — at 100 TB the facts are lineitem/orders/events/documents).
BROADCASTABLE = {"region", "nation"}


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Parquet scan → columnar, pruned, pushdown-capable.

    ``events.ts`` has shipped as both timestamp[ns] and timestamp[us] across
    testdata generations. ns-typed files surface as long (nanos) under
    ``spark.sql.legacy.parquet.nanosAsLong`` — convert to a microsecond
    timestamp with integer division (``div``; double math would lose
    precision at 1e18 ns, and truncation matches DuckDB's ns→µs narrowing).
    µs-typed files read as a native timestamp and pass through unchanged.
    The streaming side resolves the same choice from the parquet footer
    (streaming/events.py events_ts_is_long).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of one testdata table from parquet FOOTER metadata
    (pyarrow, driver-side, no Spark job) — for plan-BUILD-time sizing
    parameters (e.g. k-means cell counts) that would otherwise schedule
    an eager count() job while the query is still being constructed
    (VERDICT r12 carried item). Identical to ``count(*)``: the footer's
    num_rows is authoritative for parquet. Cost is O(files) footer reads;
    at fleet scale a million-file table should pass an explicit n (every
    consumer here exposes one) or a catalog statistic instead."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        # Spark ignores hidden path components (_temporary staging,
        # _SUCCESS markers, dot-files) — mirror that, or a crashed
        # concurrent write would desync this count from count(*)
        files = sorted(
            f
            for f in _glob.glob(
                # escape the dir part: an sf_dir with glob metachars
                # ('runs[2024]') must not silently match nothing and
                # desync this count from count(*)
                os.path.join(_glob.escape(path), "**", "*.parquet"),
                recursive=True,
            )
            if not any(
                part.startswith(("_", "."))
                for part in os.path.relpath(f, path).split(os.sep)
            )
        )
    else:
        files = [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        T(spark, sf_dir, t).createOrReplaceTempView(t)
