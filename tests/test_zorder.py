"""Z-order clustering (operators/zorder.py): Morton interleave arithmetic,
multi-column locality of the sorted layout (quantified), and row-group
skipping on BOTH dimensions of a z-sorted parquet file."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.zorder import interleave_bits, zorder_sort
from sheetreader_duckdb_spark.tables import T


def test_interleave_known_values(spark):
    # x=0b11, y=0b01 at 2 bits → z bits (y1 x1 y0 x0) = 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    z = df.select(
        interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()[0]["z"]
    assert z == 0b0111
    # identity on one column: interleave of a single column is the column
    one = df.select(interleave_bits([F.col("x")], bits=8).alias("z")).collect()[0]["z"]
    assert one == 3


def test_interleave_rejects_overflow(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError):
        df.select(interleave_bits([F.col("x"), F.col("y")], bits=32))


def _block_spans(rows, block=200):
    """Mean per-block span of each coordinate when rows are read in order."""
    spans = [0.0, 0.0]
    n_blocks = 0
    for i in range(0, len(rows) - block, block):
        chunk = rows[i : i + block]
        n_blocks += 1
        for d in range(2):
            vs = [r[d] for r in chunk]
            spans[d] += max(vs) - min(vs)
    return [s / n_blocks for s in spans]


def test_zorder_gives_locality_on_both_columns(spark, sf_dir):
    """Blocks of the z-sorted order must span a small fraction of BOTH
    columns' global ranges — a 1-column sort can't do that."""
    e = T(spark, sf_dir, "events").select(
        F.col("user_id").cast("double").alias("u"), F.col("value").alias("v")
    )
    zsorted = zorder_sort(e, ["u", "v"], bits=8).coalesce(1)
    rows = [(r["u"], r["v"]) for r in zsorted.collect()]
    gu = max(r[0] for r in rows) - min(r[0] for r in rows)
    gv = max(r[1] for r in rows) - min(r[1] for r in rows)
    su, sv = _block_spans(rows)
    # z-sorted: each 200-row block covers a bounded window of both dims
    # (user_id has only ~15 distinct values at sf0.001, so its blocks are
    # coarse — the meaningful contrast is vs the 1-column sort below).
    assert su / gu < 0.5, f"user span ratio {su / gu:.2f}"
    assert sv / gv < 0.5, f"value span ratio {sv / gv:.2f}"
    # contrast: sorting by u alone leaves v blocks spanning a much larger
    # window than the z-sort does
    plain = sorted(rows)
    _, sv_plain = _block_spans(plain)
    assert sv_plain > 2 * sv


def test_zorder_preserves_rows(spark, sf_dir):
    e = T(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = zorder_sort(e, ["user_id", "value"], bits=8)
    assert out.columns == ["event_id", "user_id", "value"]
    assert out.count() == e.count()
    assert out.select(F.sum("event_id")).collect()[0][0] == e.select(
        F.sum("event_id")
    ).collect()[0][0]


def test_zorder_skips_row_groups_on_both_dims(spark, sf_dir, tmp_path):
    """Selective filters on EITHER column of the z-sorted file must read a
    strict subset of row groups (parquet min/max pruning)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    e = T(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("u"), F.col("value").alias("v")
    )
    rows = zorder_sort(e, ["u", "v"], bits=8).coalesce(1).collect()
    table = pa.table(
        {"u": [r["u"] for r in rows], "v": [r["v"] for r in rows]}
    )
    f = str(tmp_path / "z.parquet")
    # row_group_size pinned so the (small) test table has enough groups for
    # min/max pruning to be observable; Spark's writer does the same split
    # by parquet.block.size at real scale.
    pq.write_table(table, f, row_group_size=100)
    meta = pq.ParquetFile(f).metadata
    assert meta.num_row_groups >= 4  # enough groups for pruning to mean anything

    def groups_overlapping(col_idx, lo, hi):
        n = 0
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(col_idx).statistics
            if st.max >= lo and st.min <= hi:
                n += 1
        return n

    total = meta.num_row_groups
    # a narrow slice of each dimension must not touch every row group
    u_hit = groups_overlapping(0, 0, 5)
    v_stats = e.agg(F.min("v").alias("mn"), F.max("v").alias("mx")).collect()[0]
    v_lo = v_stats["mn"]
    v_hi = v_stats["mn"] + (v_stats["mx"] - v_stats["mn"]) * 0.05
    v_hit = groups_overlapping(1, v_lo, v_hi)
    assert u_hit < total, f"user slice hit all {total} row groups"
    assert v_hit < total, f"value slice hit all {total} row groups"
