"""Streaming query corpus (SURVEY.md §2.3 N6, §7 PR6).

Each entry executes a genuine Structured Streaming query (file-arrival
source → watermark/window/stateful op → memory sink) to completion with
Trigger.AvailableNow, then returns the materialized result. Because
AvailableNow replays the entire staged input deterministically, the final
result equals the batch aggregation — so, beyond SURVEY §2's rows-only
plan for streaming, these can carry full DuckDB oracles (integer-cents
sums keep floats bit-exact).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.functions import sql_money_sum
from sheetreader_duckdb_spark.plans import query
from sheetreader_duckdb_spark.streaming import events as SE


@query(
    "n14_stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Structured Streaming tumbling-window aggregation (watermark 2h) over "
    "a file-arrival events stream, run to completion with AvailableNow; "
    "deterministic replay ⇒ equals the batch aggregate (N6).",
)
def n14_stream_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    stream = SE.read_events_stream(spark, sf)
    return SE.run_available_now(SE.tumbling_counts(stream), output_mode="complete")


@query(
    "n14b_stream_sliding",
    oracle="""
    WITH panes AS (SELECT unnest(range(4)) AS i)
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) - i * INTERVAL 15 MINUTE AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events CROSS JOIN panes
    GROUP BY 1, 2
    UNION ALL
    SELECT date_trunc('hour', c.ts) AS window_start,
           'click_purchase_pair' AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    GROUP BY 1
    """,
    doc="Structured Streaming sliding windows (1h window, 15m slide): every "
    "event lands in 4 panes; oracle replays the pane assignment with "
    "time_bucket arithmetic (N6). The 'click_purchase_pair' branch is a "
    "STREAM-STREAM interval join (streaming/events.py interval_join: "
    "per-side watermarks + time-range condition → state-bounded symmetric "
    "hash join on user_id): click events paired with same-user purchases "
    "within 30 minutes, run to completion in append mode (inner matches "
    "emit exactly once under AvailableNow replay), then shaped to hourly "
    "counts batch-side; the oracle replays the join as a SQL range "
    "predicate.",
)
def n14b_stream_sliding(spark: SparkSession, sf: str) -> DataFrame:
    stream = SE.read_events_stream(spark, sf)
    slide = SE.run_available_now(SE.sliding_counts(stream), output_mode="complete")
    clicks = stream.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    pairs = SE.run_available_now(
        SE.interval_join(
            clicks, purchases, on="user_id", lower="0 seconds", upper="30 minutes"
        ),
        output_mode="append",
    )
    ivj = (
        pairs.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "window_start",
            F.lit("click_purchase_pair").alias("event_type"),
            "n_events",
        )
    )
    return slide.select("window_start", "event_type", "n_events").unionAll(ivj)


@query(
    "n15_stream_session",
    oracle="""
    WITH m AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="Structured Streaming session windows (30-minute gap) per user; "
    "session_window end = last event + gap, mirrored by the gaps-and-islands "
    "oracle (N6).",
)
def n15_stream_session(spark: SparkSession, sf: str) -> DataFrame:
    stream = SE.read_events_stream(spark, sf)
    return SE.run_available_now(SE.session_counts(stream), output_mode="complete")


@query(
    "n16_stream_stateful_totals",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_money_sum('value')} AS total_value
    FROM events
    GROUP BY user_id
    """,
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user running totals with integer-cents state; AvailableNow replay "
    "equals the batch group-by (N6).",
)
def n16_stream_stateful_totals(spark: SparkSession, sf: str) -> DataFrame:
    stream = SE.read_events_stream(spark, sf)
    return SE.run_available_now(SE.user_running_totals(stream), output_mode="update")


@query(
    "s02_xlsx_stream_ingest",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="File-arrival streaming ingest of spreadsheets: two XLSX shards of "
    "lineitem land in a watched directory, the sheetreader stream source "
    "reads them as microbatches, and the aggregate over the stream equals "
    "the batch aggregate over the original parquet (N6 × S1).",
)
def s02_xlsx_stream_ingest(spark: SparkSession, sf: str) -> DataFrame:
    from sheetreader_duckdb_spark import register

    register(spark)
    watch_dir = _xlsx_shards_for_sf(sf)
    stream = spark.readStream.format("sheetreader").load(f"{watch_dir}/*.xlsx")
    agg = stream.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100.0).alias("sum_qty"),
    )
    return SE.run_available_now(agg, output_mode="complete")


_SHARD_CACHE = "/tmp/sheetreader_stream_xlsx"


def _xlsx_shards_for_sf(sf_dir: str) -> str:
    """Materialize (once) two XLSX shards of lineitem(l_returnflag, l_quantity)
    for this sf — the staged 'arriving files' for the streaming ingest test."""
    tag = sf_dir.strip("/").replace("/", "_")
    out = f"{_SHARD_CACHE}/{tag}"
    done = f"{out}/.done"
    if not os.path.exists(done):
        import duckdb

        from sheetreader_duckdb_spark.sources.xlsx.writer import write_xlsx

        os.makedirs(out, exist_ok=True)
        rows = duckdb.sql(
            f"SELECT l_orderkey, l_returnflag, l_quantity FROM '{sf_dir}/lineitem.parquet'"
        ).fetchall()
        header = ["l_returnflag", "l_quantity"]
        shards = ([header], [header])
        for k, flag, qty in rows:
            shards[int(k) % 2].append([flag, qty])
        for i, shard in enumerate(shards):
            write_xlsx(f"{out}/shard{i}.xlsx.tmp", {"Sheet1": shard})
            os.replace(f"{out}/shard{i}.xlsx.tmp", f"{out}/shard{i}.xlsx")
        with open(done, "w") as f:
            f.write("ok")
    return out
