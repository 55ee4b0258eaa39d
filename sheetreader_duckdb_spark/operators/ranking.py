"""Distributed global ranking — row_number / ntile over a total order
WITHOUT a single-partition window.

Spark's native ``Window.orderBy(...)`` with no ``partitionBy`` collapses all
rows into one partition ("No Partition Defined for Window Operation") — a
driver-sized bottleneck at scale. The reference's host engine (DuckDB) can
stream a global window single-node; on a 1000-executor cluster we need the
two-pass form instead:

1. Range-partition the input on the sort keys (partitions are ordered:
   partition i holds strictly smaller keys than partition i+1).
2. Count rows per partition (a tiny per-partition aggregate).
3. Cumulative counts of the preceding partitions become broadcast offsets;
   global rank = local ``row_number`` within the partition + offset.
4. ``ntile(t)`` is then pure arithmetic on (rank, total): the first
   ``total % t`` tiles get ``total div t + 1`` rows, the rest ``total div t``
   — the SQL-standard bucketing DuckDB/Spark both implement.

The range-shuffled projection is persisted (memory-and-disk) so the counts
pass and the rank pass see IDENTICAL partition boundaries: RangePartitioner
samples with a lineage-dependent seed, so two independent re-executions of
the exchange are not guaranteed the same boundaries. Project the input down
to (sort keys + carried columns) before calling at large scale; the persisted
footprint is that projection, spilled to disk as needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.session import defer_unpersist


def _range_partitioned(
    df: DataFrame,
    order_cols: list[str | Column],
    num_partitions: int | None,
    agg: Column,
) -> tuple[DataFrame, DataFrame, list[Column]]:
    """The shared two-pass scaffolding: persisted range shuffle on the sort
    keys plus a per-partition aggregate ``(_pid, _cnt)`` of ``agg`` (row
    count for ranking, value sum for cumulative sums — ``_offsets`` sums
    whatever ``_cnt`` holds). The persist is load-bearing: RangePartitioner
    samples with a lineage-dependent seed, so the aggregate pass and the
    per-row pass MUST read the same materialized boundaries. Callers
    register the returned frame with session.defer_unpersist."""
    sess = df.sparkSession
    n_part = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions"))
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    keyed = df.repartitionByRange(n_part, *cols).persist()
    per_part = keyed.groupBy(F.spark_partition_id().alias("_pid")).agg(
        agg.alias("_cnt")
    )
    return keyed, per_part, cols


def _range_ranked(
    df: DataFrame, order_cols: list[str | Column], num_partitions: int | None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (rows with _pid/_lrn columns, per-partition counts _pid/_cnt,
    and the persisted range-shuffled frame itself — callers register it
    with session.defer_unpersist so it is released at the next declared
    query's construction).

    Both returned frames derive from one persisted range-shuffle, so the
    partition ids they mention are consistent.
    """
    keyed, counts, cols = _range_partitioned(
        df, order_cols, num_partitions, F.count(F.lit(1))
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    ranked = keyed.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lrn", F.row_number().over(w)
    )
    return ranked, counts, keyed


def _offsets(counts: DataFrame) -> DataFrame:
    """(_pid, _off = rows in all preceding partitions). Triangular join over
    the tiny counts table — deliberately not a window, so the physical plan
    contains no partition-less WindowExec at all."""
    ca = counts.select(F.col("_pid").alias("_pa"))
    cb = counts.select(F.col("_pid").alias("_pb"), F.col("_cnt").alias("_cb"))
    return (
        ca.join(cb, F.col("_pb") < F.col("_pa"), "left")
        .groupBy("_pa")
        .agg(F.coalesce(F.sum("_cb"), F.lit(0)).alias("_off"))
        .select(F.col("_pa").alias("_pid"), "_off")
    )


def with_global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a global ``row_number() OVER (ORDER BY order_cols)`` column.

    Include a unique tiebreak key in ``order_cols`` for a deterministic
    result. Two data passes over the persisted range shuffle; no
    single-partition window anywhere in the plan.

    The persisted range shuffle is registered for deferred release
    (session.defer_unpersist): it stays alive while the returned lazy
    result is consumed and is unpersisted when the next declared query is
    constructed (or on an explicit session.release_deferred()) — full lazy
    speed, bounded cache across a corpus run. STANDALONE CALLERS (outside
    a declared-corpus run, where no next query ever constructs): call
    session.release_deferred() after materializing the result, or the
    range shuffle stays cached until session end.
    """
    ranked, counts, keyed = _range_ranked(df, order_cols, num_partitions)
    defer_unpersist(keyed)
    return (
        ranked.join(F.broadcast(_offsets(counts)), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    cum_col: str = "cum_value",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a global running ``SUM(value_col) OVER (ORDER BY order_cols)``
    column (inclusive of the current row) — the same two-pass shape as
    ``with_global_rank``: range-partition on the sort keys, per-partition
    VALUE sums become broadcast offsets, the within-partition running sum
    is an ordinary keyed window. No single-partition WindowExec anywhere.

    Include a unique tiebreak key in ``order_cols`` for a deterministic
    result. Cache lifetime: see ``with_global_rank`` (deferred release).
    """
    keyed, sums, cols = _range_partitioned(
        df, order_cols, num_partitions, F.sum(F.col(value_col))
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    defer_unpersist(keyed)
    return (
        keyed.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lcum", F.sum(F.col(value_col)).over(w))
        .join(F.broadcast(_offsets(sums)), "_pid")
        .withColumn(cum_col, F.col("_off") + F.col("_lcum"))
        .drop("_pid", "_lcum", "_off")
    )


def with_global_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    n_tiles: int = 4,
    tile_col: str = "tile",
    rank_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append global rank + ``ntile(n_tiles)`` columns, computed distributed.

    ntile follows the SQL standard: with ``n`` rows, the first ``n % t``
    tiles hold ``n div t + 1`` rows, the remaining tiles ``n div t`` — the
    tile of rank ``r`` is closed-form arithmetic, evaluated lazily so the
    ``n < t`` edge (base = 0) never divides by zero.

    Cache lifetime: see ``with_global_rank`` (deferred release).
    """
    ranked, counts, keyed = _range_ranked(df, order_cols, num_partitions)
    totals = counts.agg(F.sum("_cnt").cast("long").alias("_n"))
    out = (
        ranked.join(F.broadcast(_offsets(counts)), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .crossJoin(F.broadcast(totals))
    )
    r, t = rank_col, n_tiles
    big = f"(_n div {t}) + 1"  # size of the first (_n % t) tiles
    tile = (
        f"CASE WHEN {r} <= (_n % {t}) * ({big}) "
        f"THEN ({r} - 1) div ({big}) + 1 "
        f"ELSE (_n % {t}) + (({r} - (_n % {t}) * ({big}) - 1) div (_n div {t})) + 1 END"
    )
    defer_unpersist(keyed)
    return out.withColumn(tile_col, F.expr(tile).cast("long")).drop(
        "_pid", "_lrn", "_off", "_n"
    )
