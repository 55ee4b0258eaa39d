"""Structured Streaming surface (SURVEY.md §2.3 N6 + §7 PR6).

The reference is strictly batch (SURVEY.md §1.1); streaming is a
Spark-native addition: windowed/sessionized aggregation over the events
stream, a custom stateful operator via applyInPandasWithState, and
file-arrival streaming ingest of spreadsheets through the sheetreader
data source's SimpleDataSourceStreamReader.
"""

from sheetreader_duckdb_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    stage_events_dir,
    tumbling_counts,
    user_running_totals,
)
