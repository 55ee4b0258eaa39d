"""Deterministic sampling and dataset-splitting operators for training-data
pipelines.

Every keep/assign decision is a pure function of ``(seed, key)`` through md5:
reproducible across runs, engines, partition counts, and cluster sizes — the
property a 100 TB corpus split must have, because re-running the pipeline
after adding data must not move any existing document between train and val
(that would leak training examples into evaluation sets).

Scale shape: all three operators are embarrassingly parallel column
expressions — ``hash_split`` and ``hash_sample`` add ZERO shuffles (each
executor decides its rows independently at scan speed; predicate evaluation
happens inside whole-stage codegen); ``stratified_sample`` shuffles once on
the strata key, the minimum possible for a per-stratum guarantee.

Portability: md5 hex is bit-identical in Spark and DuckDB, and hex strings
compare identically under ASCII ordering in both engines, so every operator
here is oracle-checkable with no tolerance. Fractions are quantized to
1/16^nchars (1/65536 by default) — documented, deterministic behavior, same
rounding on both sides via round-half-even in ``_hex_threshold``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "bucket_hex",
    "hash_split",
    "hash_sample",
    "stratified_sample",
    "mix_sources",
    "sqrt_temperature_sample",
    "split_case_sql",
    "sample_predicate_sql",
    "temperature_predicate_sql",
]

# Default hash-space resolution: first 4 md5 hex chars = 65536 buckets.
_DEFAULT_NCHARS = 4


def _key_col(key: Column | str) -> Column:
    return F.col(key) if isinstance(key, str) else key


def bucket_hex(key: Column | str, seed: str, nchars: int = _DEFAULT_NCHARS) -> Column:
    """First ``nchars`` hex chars of ``md5(seed || ':' || key)``.

    A uniform draw from 16^nchars buckets, keyed so different seeds give
    independent assignments over the same keys.
    """
    return F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"), _key_col(key).cast("string"))),
        1,
        nchars,
    )


def _hex_threshold(fraction: float, nchars: int = _DEFAULT_NCHARS) -> str:
    """Hex literal t such that ``bucket < t`` covers round(fraction·16^n)
    buckets under LEXICOGRAPHIC comparison of the nchars-wide bucket.

    Full coverage needs a sentinel: 16^n in hex is one char wider and would
    compare smaller than letter-leading buckets, so use "g", which sorts
    above every hex string of any content in both Spark and DuckDB (ASCII).
    """
    space = 16**nchars
    n = min(space, max(0, round(fraction * space)))
    if n == space:
        return "g"
    return format(n, f"0{nchars}x")


def hash_split(
    key: Column | str,
    weights: Sequence[tuple[str, float]],
    seed: str = "split",
    nchars: int = _DEFAULT_NCHARS,
) -> Column:
    """Assign each row to a named split ('train'/'val'/'test'/...) by hash.

    ``weights`` is an ordered list of (name, weight); weights must sum to ~1
    (the last split absorbs quantization remainder). Returns a string column —
    compose with ``df.withColumn("split", ...)`` or use directly in a filter.
    No shuffle: the assignment is a scan-speed expression.
    """
    _check_weights(weights)
    b = bucket_hex(key, seed, nchars)
    expr: Column | None = None
    cum = 0.0
    for name, w in weights[:-1]:
        cum += w
        cond = b < F.lit(_hex_threshold(cum, nchars))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(weights[-1][0])
    return last if expr is None else expr.otherwise(last)


def hash_sample(
    df: DataFrame,
    key: Column | str,
    fraction: float,
    seed: str = "sample",
    nchars: int = _DEFAULT_NCHARS,
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample: keep rows whose bucket falls
    below the fraction threshold.

    Monotone in ``fraction`` for a fixed seed: the 10% sample is a strict
    subset of the 20% sample, which makes progressive scale-up runs
    (1% smoke → 10% dev → 100% prod) see nested data.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(bucket_hex(key, seed, nchars) < F.lit(_hex_threshold(fraction, nchars)))


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    key: Column | str,
    seed: str = "strat",
) -> DataFrame:
    """Exactly ``min(n, stratum size)`` rows per stratum, chosen by hash order.

    Deterministic reservoir-style sample: rank rows within each stratum by
    ``md5(seed:key)`` (full 32-hex digest; ties broken by the key itself, so
    the order is total) and keep the first n. One shuffle on the strata
    columns — the minimum for a per-stratum guarantee; skewed strata are
    bounded by the window's sort, not a collect.
    """
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive, got {n_per_stratum}")
    k = _key_col(key)
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), k.cast("string")))
    w = Window.partitionBy(*strata).orderBy(h, k)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def budget_select(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    token_col: str,
    budget: int,
) -> DataFrame:
    """Greedy per-group selection under a token budget: within each group,
    walk rows in ``order_cols`` order (best first — put the quality rank
    here, with a unique tiebreak key last) and keep a row while the running
    token total INCLUDING it stays ≤ ``budget``.

    This is the dataset-assembly step after quality scoring: "take the best
    documents from each source until its token allowance is spent". One
    shuffle on the group columns — the per-group running sum is an ordinary
    keyed window, bounded by the group's size; a pathologically hot group
    is a sort within one partition, not a driver collect. For a GLOBAL
    budget over a total order use ``operators.ranking.with_global_cumsum``
    (two-pass range shuffle, no single-partition window) and filter on its
    running sum the same way.

    Exact integer semantics (no floats), so the keep-set is
    oracle-checkable: SUM(tokens) OVER (PARTITION BY group ORDER BY ...
    ROWS UNBOUNDED PRECEDING) <= budget.
    """
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__cum", F.sum(F.col(token_col)).over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )


def budget_select_global(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    token_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global-budget form of ``budget_select``: one total order across the
    whole corpus, keep rows while the global running token total stays
    ≤ ``budget``. Distributed via ranking.with_global_cumsum (range
    partition + broadcast per-partition offsets) — no single-partition
    window. Include a unique tiebreak key in ``order_cols``."""
    from sheetreader_duckdb_spark.operators.ranking import with_global_cumsum

    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    out = with_global_cumsum(
        df, list(order_cols), token_col, cum_col="__cum",
        num_partitions=num_partitions,
    )
    return out.filter(F.col("__cum") <= budget).drop("__cum")


def _check_weights(weights: Sequence[tuple[str, float]]) -> None:
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"weights must sum to 1, got {total}")
    names = [n for n, _ in weights]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")


def mix_sources(
    df: DataFrame,
    source_col: str,
    fractions: dict[str, float],
    key: Column | str,
    seed: str = "mix",
    nchars: int = _DEFAULT_NCHARS,
) -> DataFrame:
    """Materialize a training mixture: keep a per-source hash fraction of
    rows ("80% web, 15% code, 5% books" made concrete and reproducible).

    Sources absent from ``fractions`` are dropped; fraction 1.0 keeps a
    source whole. Zero shuffles — one scan-speed predicate combining the
    source match with the keyed hash draw; per-source keep-sets are nested
    under fraction growth (same seed ⇒ a 10% mixture is a subset of the
    20% one), so mixture re-weighting between runs reuses data rather than
    resampling it.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
    b = bucket_hex(key, seed, nchars)
    keep = None
    for s, f in fractions.items():
        cond = (F.col(source_col) == F.lit(s)) & (b < F.lit(_hex_threshold(f, nchars)))
        keep = cond if keep is None else keep | cond
    if keep is None:
        raise ValueError("fractions must be non-empty")
    return df.filter(keep)


def sqrt_temperature_sample(
    df: DataFrame,
    source_col: str,
    key: Column | str,
    seed: str = "temp",
    nchars: int = _DEFAULT_NCHARS,
) -> DataFrame:
    """α=0.5 temperature resampling of a multi-source corpus (the GPT-3 /
    multilingual-LM source-reweighting recipe): after sampling, each
    source's expected row count is ∝ sqrt(its original count), flattening
    megasource dominance while keeping every row of the smallest source
    (its keep probability is 1).

    Per-source keep probability p_s = sqrt(n_min / n_s) is never computed
    as a float: a row survives iff ``bucket² · n_s < (16^nchars)² · n_min``
    — exact integer cross-multiplication of the squared hash draw (bucket
    < t_s ⟺ bucket² < t_s², all in DECIMAL(38,0) so 100 TB-scale counts
    cannot overflow), deterministic and bit-identical on both engines.
    Only α = 1/2 admits this radical-free exact form; other temperatures
    would need float thresholds (quantize via ``mix_sources`` instead).

    Scale shape: one count aggregate over the source key (tiny result),
    broadcast back; the keep decision is a scan-speed predicate. Same
    seed+key ⇒ same draw as the other hash samplers, so nested-sample
    monotonicity across operators holds per source.
    """
    cnt = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__tn"))
    nmin = cnt.agg(F.min("__tn").alias("__tnmin"))
    rates = cnt.crossJoin(F.broadcast(nmin))
    b = F.conv(bucket_hex(key, seed, nchars), 16, 10).cast("decimal(38,0)")
    space2 = F.lit(16 ** (2 * nchars)).cast("decimal(38,0)")
    keep = (b * b * F.col("__tn").cast("decimal(38,0)")) < (
        space2 * F.col("__tnmin").cast("decimal(38,0)")
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(keep)
        .drop("__tn", "__tnmin")
    )


# -- oracle-SQL builders (DuckDB), mirroring the expressions above ----------

def split_case_sql(
    key_sql: str,
    weights: Sequence[tuple[str, float]],
    seed: str = "split",
    nchars: int = _DEFAULT_NCHARS,
) -> str:
    """DuckDB CASE expression computing the same assignment as hash_split."""
    _check_weights(weights)
    b = f"substr(md5('{seed}:' || {key_sql}), 1, {nchars})"
    parts = ["CASE"]
    cum = 0.0
    for name, w in weights[:-1]:
        cum += w
        parts.append(f"WHEN {b} < '{_hex_threshold(cum, nchars)}' THEN '{name}'")
    parts.append(f"ELSE '{weights[-1][0]}' END")
    return " ".join(parts)


def sample_predicate_sql(
    key_sql: str,
    fraction: float,
    seed: str = "sample",
    nchars: int = _DEFAULT_NCHARS,
) -> str:
    """DuckDB WHERE predicate computing the same keep-set as hash_sample."""
    b = f"substr(md5('{seed}:' || {key_sql}), 1, {nchars})"
    return f"{b} < '{_hex_threshold(fraction, nchars)}'"


def temperature_predicate_sql(
    key_sql: str,
    n_sql: str,
    nmin_sql: str,
    seed: str = "temp",
    nchars: int = _DEFAULT_NCHARS,
) -> str:
    """DuckDB WHERE predicate computing the same keep-set as
    sqrt_temperature_sample, given SQL expressions for the row's source
    count and the corpus-wide minimum source count (the caller supplies
    them from its own CTEs). HUGEINT mirrors Spark's DECIMAL(38,0) —
    both exact beyond 64-bit at full scale."""
    b = f"CAST(('0x' || substr(md5('{seed}:' || CAST({key_sql} AS VARCHAR)), 1, {nchars})) AS BIGINT)"
    space2 = 16 ** (2 * nchars)
    return (
        f"CAST({b} AS HUGEINT) * {b} * ({n_sql})"
        f" < CAST({space2} AS HUGEINT) * ({nmin_sql})"
    )
