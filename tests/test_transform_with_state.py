"""transformWithStateInPandas running totals (streaming/events.py
user_running_totals_tws): the Spark 4 stateful-processor form must produce
exactly the applyInPandasWithState op's results, which in turn equal the
batch groupBy replay — same integer-cents state machine, new API."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.streaming.events import (
    run_available_now_tws,
    tws_available,
    user_running_totals_tws,
)

pytestmark = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithState needs google.protobuf in the worker Python "
    "(environment-imposed; the applyInPandasWithState form is the declared "
    "operator)",
)


@pytest.fixture(scope="module")
def stream_events(spark, sf_dir, tmp_path_factory):
    # Small deterministic slice of events as a file stream.
    from sheetreader_duckdb_spark.tables import T

    src = T(spark, sf_dir, "events").select("user_id", "value").limit(2000)
    d = str(tmp_path_factory.mktemp("tws") / "in")
    src.coalesce(2).write.parquet(d)
    return d, src


def test_matches_batch_replay(spark, stream_events):
    d, src = stream_events
    sdf = spark.readStream.schema("user_id long, value double").parquet(d)
    out = run_available_now_tws(user_running_totals_tws(sdf), output_mode="update")
    # Update mode emits one row per key per batch; the last row per key is
    # the final state. AvailableNow over static files = one batch here.
    got = {
        r["user_id"]: (r["n_events"], r["total_value"]) for r in out.collect()
    }
    expect = {
        r["user_id"]: (r["n"], r["t"])
        for r in src.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("t"),
        )
        .collect()
    }
    assert got == expect
    assert got  # non-vacuous


def test_state_carries_across_batches(spark, tmp_path):
    # Two files drained as separate micro-batches (maxFilesPerTrigger=1):
    # the second batch's output must include the first batch's state.
    d = str(tmp_path / "in")
    spark.createDataFrame([(1, 10.0), (1, 5.0)], "user_id long, value double").coalesce(
        1
    ).write.mode("append").parquet(d)
    spark.createDataFrame([(1, 2.5)], "user_id long, value double").coalesce(
        1
    ).write.mode("append").parquet(d)
    sdf = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = run_available_now_tws(
        user_running_totals_tws(sdf),
        output_mode="update",
        checkpoint=str(tmp_path / "ckpt"),
    )
    rows = sorted(
        ((r["n_events"], r["total_value"]) for r in out.collect())
    )
    # One update row per drained batch; the final one accumulates all three
    # events regardless of which file each landed in.
    assert rows[-1] == (3, 17.5)
