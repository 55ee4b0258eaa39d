"""Skew-resistant aggregation: two-phase (salted) groupBy for heavy hitters.

A groupBy shuffles every row of a key to one reducer. At 100 TB a single
heavy-hitter key (one hot user, one template document) can put billions of
rows on one task while the rest of the cluster idles — AQE's skew handling
covers joins, but a skewed *aggregation* key needs salting: group first by
(key, salt) so the hot key's rows spread over ``n_salts`` reducers, then
re-aggregate the ``n_salts`` partial rows per key.

Only decomposable aggregates survive two-phase re-aggregation; this helper
supports the standard algebra — sum/count/min/max re-aggregate trivially,
avg is carried as (sum, count) and finalized in the second phase. The row
count of phase 2's input is bounded by distinct_keys × n_salts regardless
of skew, which is the whole point.

The salt is ``pmod(monotonically_increasing_id(), n_salts)`` — a per-row
counter, so even byte-identical duplicate rows (the template-document skew
case that motivates the operator) spread across all salts; content-derived
salts would send every copy of the hot row to ONE reducer and mitigate
nothing. The salt only routes rows, so results are identical to the
unsalted aggregate for every supported function; equivalence is pinned in
tests/test_skew.py including adversarial 99%-one-key and all-rows-identical
fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg"]

_SUPPORTED = ("sum", "count", "min", "max", "avg")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Skew-proof ``df.groupBy(keys).agg(...)``.

    ``aggs`` maps output column name -> (function, input column), with
    function in {sum, count, min, max, avg}; use input column "*" with
    count for COUNT(*). Two shuffles, but the second is over at most
    distinct_keys × n_salts rows — the hot key's data never converges on a
    single task.
    """
    if n_salts <= 0:
        raise ValueError(f"n_salts must be positive, got {n_salts}")
    for name, (fn, _col) in aggs.items():
        if fn not in _SUPPORTED:
            raise ValueError(f"{name}: unsupported agg {fn!r} (use {_SUPPORTED})")

    # Row-position salt, NOT content-derived: identical duplicate rows must
    # land on different salts or the hot key still funnels to one reducer.
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    salted = df.withColumn("__salt", salt)

    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            src = F.lit(1) if col == "*" else F.col(col)
            partial_exprs.append(F.count(src).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{name}"))
            final_exprs.append(F.min(f"__p_{name}").alias(name))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{name}"))
            final_exprs.append(F.max(f"__p_{name}").alias(name))
        elif fn == "avg":
            # carried as (sum, count); finalized exactly in phase 2
            partial_exprs.append(F.sum(col).alias(f"__ps_{name}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{name}"))
            final_exprs.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name)
            )

    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
