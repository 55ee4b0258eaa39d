"""Temporal operators: as-of join (SURVEY.md §2.3-adjacent; the classic
time-series primitive Spark lacks as a built-in).

``as_of_join`` matches each probe row with the most recent quote row at or
before the probe's timestamp, per key. The naive form is a range join
(``q.ts <= p.ts`` + argmax) — a BroadcastNestedLoop or an exploding
range-bucket join at scale. This implementation is the scale-safe
union-and-carry form:

1. Tag and union probes and quotes into one frame (map-side).
2. One shuffle: window partitioned by key, ordered by (ts, side) — quotes
   sort before probes at equal timestamps, so an exact-tie quote matches.
3. ``last(quote_col, ignorenulls=True)`` over the unbounded-preceding frame
   carries the latest quote forward; keep probe rows.

Cost: ONE shuffle on the join key — the same partitioning a groupBy(key)
would use — and a per-partition sort; no pair explosion regardless of the
quote/probe ratio. Skewed keys fall under AQE like any other window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    probes: DataFrame,
    quotes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    quote_cols: list[str],
    quote_ts_as: str = "quote_ts",
    tolerance: Column | None = None,
) -> DataFrame:
    """probes ⟕ latest-quote-at-or-before, per key.

    Returns every probe row with ``quote_cols`` (and ``quote_ts_as``, the
    matched quote's timestamp) appended; NULLs when no quote precedes the
    probe (or the match is older than ``tolerance``, an interval/long
    Column compared against ``probe.ts - quote_ts``). ``quote_cols`` must
    not collide with probe column names; ties among quotes at one (key, ts)
    resolve arbitrarily unless quotes are unique per (key, ts).
    """
    probe_cols = [c for c in probes.columns if c not in key_cols]
    clash = set(quote_cols) & set(probe_cols)
    if clash:
        raise ValueError(f"as_of_join: quote columns collide with probe columns: {clash}")
    p = probes.select(
        *key_cols,
        *[F.col(c) for c in probe_cols],
        *[F.lit(None).cast(quotes.schema[c].dataType).alias(f"_q_{c}") for c in quote_cols],
        F.lit(None).cast(quotes.schema[ts_col].dataType).alias("_q_ts"),
        F.lit(1).alias("_side"),
    )
    q = quotes.select(
        *key_cols,
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probe_cols],
        *[F.col(c).alias(f"_q_{c}") for c in quote_cols],
        F.col(ts_col).alias("_q_ts"),
        F.lit(0).alias("_side"),
    ).withColumn(ts_col, F.col("_q_ts"))
    both = p.unionByName(q)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        *key_cols,
        *probe_cols,
        "_side",
        F.col(ts_col).alias("_p_ts"),
        *[
            F.last(f"_q_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in quote_cols
        ],
        F.last("_q_ts", ignorenulls=True).over(w).alias(quote_ts_as),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side", "_p_ts")
    if tolerance is not None:
        stale = (F.col(ts_col) - F.col(quote_ts_as)) > tolerance
        out = out.select(
            *key_cols,
            *probe_cols,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"_c_{c}")).alias(f"_c_{c}")
                for c in quote_cols
            ],
            F.when(stale, F.lit(None)).otherwise(F.col(quote_ts_as)).alias(quote_ts_as),
        )
    return out.select(
        *key_cols,
        *probe_cols,
        *[F.col(f"_c_{c}").alias(c) for c in quote_cols],
        quote_ts_as,
    )
