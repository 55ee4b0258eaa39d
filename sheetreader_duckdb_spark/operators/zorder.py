"""Z-order (Morton) clustering: multi-column data skipping for the lakehouse
layout.

Parquet row-group pruning works off per-column min/max statistics; sorting
by one column gives perfect skipping on that column and none on the others.
Interleaving the bits of several columns (the Z-order curve) gives every
participating column *partial* locality, so selective filters on ANY of
them prune row groups — the standard layout trick for multi-dimensional
scan-heavy tables (events by (user, time), documents by (source, length)).

Shape: one tiny min/max aggregate (1 row, broadcast by the cross join), a
scan-speed bit-interleave projection, then ``repartitionByRange`` + sort on
the key — exactly the cost of any global sort, which a write-time layout
pass pays once. All arithmetic is integer (floor-binned to 2^bits ranks),
deterministic, and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interleave_bits", "zorder_sort"]


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit j of column i lands at position j·n + i.

    Inputs must already be integer ranks in [0, 2^bits). Result is a long;
    n·bits must be ≤ 63.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} columns × {bits} bits exceeds a long (≤63)")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long")
        for j in range(bits):
            out = out + F.shiftleft(
                F.shiftright(v, j).bitwiseAND(F.lit(1)), j * n + i
            )
    return out


def zorder_sort(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Return ``df`` globally ordered along the Z-curve of ``cols``.

    Write the result with ``.write.parquet`` (or feed ``export_shards``) to
    get multi-column row-group skipping. Range partitioning balances the
    sort; adjacent rows are adjacent on the curve, so every participating
    column's values are locally clustered (pinned quantitatively in
    tests/test_zorder.py).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    scale = (1 << bits) - 1
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    ranks = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = mx - mn
        rank = F.when(span > 0, F.floor((F.col(c).cast("double") - mn) / span * scale)).otherwise(
            F.lit(0)
        )
        ranks.append(rank.cast("long"))
    keyed = with_bounds.withColumn("__z", interleave_bits(ranks, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )
    return keyed.repartitionByRange(F.col("__z")).sortWithinPartitions("__z").drop("__z")
