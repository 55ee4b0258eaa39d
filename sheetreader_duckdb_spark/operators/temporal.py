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
quote/probe ratio. AQE cannot split a window partition, so ONE pathological
hot key (one symbol carrying most of the tape) serializes on one task —
``as_of_join_salted`` is the hedge: probes of a hot key spread over
``n_salts`` sub-partitions by a row-position salt while that key's quotes
replicate to every sub-partition (same trick as operators/skew.py's salted
aggregation, adapted to an order-dependent carry: replication is what keeps
every sub-partition's carry history complete, so results are pinned
identical to the plain form). Quote replication costs n_salts× the hot
key's QUOTE volume only — the classic regime (few quotes, a flood of
probes) is exactly where that is cheap.
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


def as_of_join_salted(
    probes: DataFrame,
    quotes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    quote_cols: list[str],
    quote_ts_as: str = "quote_ts",
    tolerance: Column | None = None,
    n_salts: int = 16,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Skew-hedged ``as_of_join``: identical results, hot keys parallelized.

    Probes take a row-position salt (``pmod(monotonically_increasing_id(),
    n_salts)`` — content-derived salts would send identical hot rows to one
    sub-partition and mitigate nothing, same reasoning as salted_agg) and
    quotes are replicated to every salt, so each (key, salt) window holds
    the key's FULL quote history plus 1/n_salts of its probes — the carry
    is computed from the same ordered quote sequence as the plain form,
    hence bit-identical output (pinned in tests/test_temporal.py on an
    adversarial 99%-one-key fixture).

    ``hot_keys`` (a DataFrame with ``key_cols``, e.g. the output of a
    heavy-hitter count) restricts salting to those keys: hot rows go
    through the salted path, the rest through the plain single-shuffle
    path, and the union preserves the semantics. Without it every key is
    salted — correct but pays quote replication n_salts× across the board.
    """
    if n_salts <= 0:
        raise ValueError(f"n_salts must be positive, got {n_salts}")
    if hot_keys is not None:
        hk = F.broadcast(hot_keys.select(*key_cols).distinct())
        hot_out = as_of_join_salted(
            probes.join(hk, key_cols, "left_semi"),
            quotes.join(hk, key_cols, "left_semi"),
            key_cols, ts_col, quote_cols, quote_ts_as, tolerance, n_salts,
        )
        cold_out = as_of_join(
            probes.join(hk, key_cols, "left_anti"),
            quotes.join(hk, key_cols, "left_anti"),
            key_cols, ts_col, quote_cols, quote_ts_as, tolerance,
        )
        return hot_out.unionByName(cold_out)

    salt_col = "__asof_salt"
    for df_cols in (probes.columns, quotes.columns):
        if salt_col in df_cols:
            raise ValueError(f"column {salt_col!r} collides with the salt")
    p = probes.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    q = quotes.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = as_of_join(
        p, q, [*key_cols, salt_col], ts_col, quote_cols, quote_ts_as, tolerance
    )
    return out.drop(salt_col)
