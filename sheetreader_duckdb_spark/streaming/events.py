"""Streaming operators over the events table (SURVEY.md §2.3 N6).

Design rule: every aggregation here is ONE function that accepts either a
batch or a streaming DataFrame — the batch run IS the replay oracle for the
streaming run (SURVEY.md §5: streaming rows are verified against batch-mode
replay, not DuckDB). Watermarks are attached only on streaming inputs;
state size at scale is bounded by (watermark horizon × key cardinality),
and the shuffle key is the window/session grouping key exactly as in batch.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from sheetreader_duckdb_spark.functions import cents


def _raw_events_schema(ts_is_long: bool) -> StructType:
    """A streaming read needs an explicit schema (no file listing at plan
    time). ``ts`` is LongType when the parquet stores TIMESTAMP(NANOS) —
    surfaced as raw int64 nanos under ``nanosAsLong`` — and TimestampType
    for µs/ms-typed files, which Spark reads natively."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType() if ts_is_long else TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


_STAGE_ROOT = "/tmp/sheetreader_stream_stage"


def stage_events_dir(sf_dir: str) -> str:
    """Copy events.parquet into a dedicated directory (a file-stream source
    watches a directory; the testdata dir mixes all tables)."""
    tag = sf_dir.strip("/").replace("/", "_")
    out = f"{_STAGE_ROOT}/{tag}"
    os.makedirs(out, exist_ok=True)
    dst = f"{out}/events.parquet"
    if not os.path.exists(dst):
        shutil.copy(f"{sf_dir}/events.parquet", dst + ".tmp")
        os.replace(dst + ".tmp", dst)
    return out


def events_ts_is_long(path_or_dir: str) -> bool:
    """True when the events parquet physically stores ts as int64/ns (read
    as long under ``nanosAsLong``); False for µs/ms timestamp columns, which
    Spark reads as a native timestamp. One footer read — resolved at plan
    time from the file, never assumed, so the same code runs against either
    generation of the testdata fixtures."""
    import pyarrow.parquet as pq

    p = path_or_dir
    if os.path.isdir(p):
        p = os.path.join(p, "events.parquet")
    t = str(pq.read_schema(p).field("ts").type)
    return t in ("timestamp[ns]", "int64")


def normalize_ts(df: DataFrame, ts_is_long: bool) -> DataFrame:
    """ns-long → µs timestamp with integer division (double math loses
    precision at 1e18 ns; truncation matches DuckDB's ns→µs narrowing).
    Native-timestamp inputs pass through unchanged."""
    if ts_is_long:
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-arrival stream of events with a proper event-time ts column."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stage = stage_events_dir(sf_dir)
    ts_long = events_ts_is_long(stage)
    reader = spark.readStream.schema(_raw_events_schema(ts_long))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return normalize_ts(reader.parquet(stage), ts_long)


def read_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of the staged stream input — same staging dir, same
    schema resolution, same ts normalization as ``read_events_stream``; the
    batch run over this frame is the oracle for the streaming run."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stage = stage_events_dir(sf_dir)
    ts_long = events_ts_is_long(stage)
    df = spark.read.schema(_raw_events_schema(ts_long)).parquet(stage)
    return normalize_ts(df, ts_long)


def _with_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    if events.isStreaming and watermark:
        return events.withWatermark("ts", watermark)
    return events


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str | None = "2 hours"
) -> DataFrame:
    """Tumbling-window counts + cents-exact value sums per event_type."""
    return (
        _with_watermark(events, watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents("value")) / 100.0).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide panes)."""
    return (
        _with_watermark(events, watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "2 hours"
) -> DataFrame:
    """Session windows per user with a fixed inactivity gap — the streaming
    native form of the gaps-and-islands batch query (plans/northstar n12)."""
    return (
        _with_watermark(events, watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events(
    events: DataFrame, id_col: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """Exact in-flight deduplication: at-least-once delivery (replayed
    files, retried producers) becomes exactly-once rows. On a stream,
    ``dropDuplicatesWithinWatermark`` ties state eviction to the event-time
    watermark even though the dedup key is just the id — state size is
    (horizon × arrival rate), independent of stream lifetime. (Plain
    ``dropDuplicates([id])`` would keep every id forever: Spark only evicts
    dedup state when the watermark column is part of the subset.) On a
    batch frame the same call is a plain distinct-by-key. The id shuffle
    is the only shuffle, and it is the same key the downstream per-key
    aggregations use."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            [id_col]
        )
    return events.dropDuplicates([id_col])


def enrich_events(
    events: DataFrame, dim: DataFrame, on: str = "user_id", how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes (user →
    segment, document → license, …) to each event as it flows.

    The dim side is a bounded DataFrame; Spark re-plans it per micro-batch,
    and the explicit broadcast keeps the stream side shuffle-free — each
    executor enriches its own partitions at scan speed. This is the
    standard shape for enrichment at 100 TB/day: the stream never shuffles,
    only the (small) dim moves. Works identically on a batch frame (the
    same broadcast hash join), which is what the replay oracle compares.
    """
    return events.join(F.broadcast(dim), on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    lower: str = "10 minutes",
    upper: str = "10 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with right events
    for the same key whose ``ts`` lies in ``[left.ts - lower, left.ts +
    upper]`` — the correlation join of event pipelines (click ↔ impression,
    request ↔ response).

    Streaming state stays bounded because BOTH requirements Spark needs are
    in the plan: each side carries an event-time watermark, and the join
    condition bounds the two event times against each other — so either
    side's buffered rows are dropped once the other side's watermark passes
    their interval. State ≈ (watermark horizon + interval width) × arrival
    rate per side, independent of stream lifetime. The key equality makes
    it a state-store hash join on ``on`` — both sides shuffle once on the
    key, never a cross product.

    The same call on two batch frames is a plain range-predicate equi-join
    (the watermarks are no-ops), which is what the replay oracle compares.
    Right-side columns come back suffixed ``_r`` (both inputs share the
    events schema; Spark requires unambiguous names post-join).
    """
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"{c}_r")
    lw = _with_watermark(left, watermark)
    rw = r.withWatermark("ts_r", watermark) if r.isStreaming and watermark else r
    cond = (
        (F.col(on) == F.col(f"{on}_r"))
        & (F.col("ts_r") >= F.col("ts") - F.expr(f"INTERVAL {lower}"))
        & (F.col("ts_r") <= F.col("ts") + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


# -- custom stateful operator (applyInPandasWithState) ----------------------
_STATE_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total_cents long"


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event count, exact value total) — a custom stateful
    streaming operator; arbitrary state via applyInPandasWithState. On a
    batch DataFrame the same state machine runs once over all data, which is
    exactly the replay semantics used for verification."""

    # Defined as a closure so cloudpickle serializes it BY VALUE — streaming
    # state workers must not depend on the package being importable.
    def running_totals_fn(key, pdf_iter, state):
        import pandas as pd

        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # Integer-cents accumulation: deterministic regardless of batch
            # slicing, so streaming output equals batch replay exactly.
            total_cents += int((pdf["value"] * 100).round().sum())
        state.update((n, total_cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total_cents / 100.0]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        running_totals_fn,
        outputStructType=_STATE_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
    checkpoint: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over all currently
    available input (Trigger.AvailableNow) and return the materialized
    result from the in-memory sink."""
    last_err: Exception | None = None
    for _attempt in range(2):  # one retry: stream planning spawns helper
        name = query_name or f"q_{uuid.uuid4().hex[:12]}"  # processes that can
        try:  # transiently fail under load; the replay is deterministic
            writer = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
            )
            if checkpoint:
                writer = writer.option("checkpointLocation", checkpoint)
            q = writer.start()
            q.awaitTermination()
            return sdf.sparkSession.table(name)
        except Exception as e:  # noqa: BLE001
            last_err = e
    raise last_err


# -- modern stateful API (Spark 4 transformWithStateInPandas) ----------------
#
# Same running-totals state machine as user_running_totals, expressed in the
# transformWithState processor API (typed state handles, timers, TTL — the
# successor to applyInPandasWithState). Requires the RocksDB state store
# provider (run_available_now_tws sets it for the query) AND the
# google.protobuf package in the worker Python (the processor API's state
# protocol) — absent here, so tws_available() gates it and the test skips,
# the same environment-imposed pattern as the multimodal codecs. The
# applyInPandasWithState form (user_running_totals) is the always-available
# declared operator; this parallel form exists for the richer state surface
# (list/map state, event timers) where the environment provides protobuf.


def tws_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

def user_running_totals_tws(events: DataFrame) -> DataFrame:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, total_cents long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total_cents = (
                self._totals.get() if self._totals.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                total_cents += int((pdf["value"] * 100).round().sum())
            self._totals.update((n, total_cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total_cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotals(),
            outputStructType=_STATE_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_available_now_tws(sdf: DataFrame, **kwargs) -> DataFrame:
    """run_available_now with the RocksDB state store provider
    transformWithState requires (restored afterwards)."""
    spark = sdf.sparkSession
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        return run_available_now(sdf, **kwargs)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
