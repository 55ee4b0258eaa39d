"""Column-expression helpers shared across the query corpus.

Cross-engine float discipline: double aggregation is summation-order-dependent,
so SUM/AVG over money-like doubles can differ between Spark and DuckDB in the
last ulps and break hash-matching. ``money_sum`` quantizes each row to integer
cents (exact for < 2^53), sums exactly in int64 on both engines, and scales
back — bit-identical results regardless of partitioning/parallelism. This also
scales: integer partial aggregation is cheaper than float compensated sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Row-level exact quantization to integer cents."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def money_sum(col: Column | str) -> Column:
    """Exact cross-engine SUM over a 2-decimal double column (result double)."""
    return F.sum(cents(col)) / 100.0


def money_avg(col: Column | str) -> Column:
    """Exact cross-engine AVG over a 2-decimal double column (result double)."""
    return F.sum(cents(col)) / 100.0 / F.count(F.lit(1))


def round_fixed(col: Column | str, d: int) -> Column:
    """Cross-engine deterministic rounding to d decimals (result double).

    Spark's ROUND(x, d) for d>0 rounds the shortest *decimal string* repr
    (BigDecimal HALF_UP) while DuckDB rounds the *binary* value, so they split
    on values like 37704.575 (binary 37704.57499…). floor(x*10^d + 0.5) uses
    identical IEEE arithmetic in both engines. Round-to-integer (cents) is
    immune: N.5 is exactly representable, so both engines agree there.
    """
    scale = 10**d
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * scale + F.lit(0.5)) / scale


# SQL fragments mirroring the helpers (DuckDB dialect). SUM of BIGINT in
# DuckDB widens to HUGEINT, so cast back before the float division.
def sql_money_sum(col: str) -> str:
    return f"CAST(SUM(CAST(ROUND({col} * 100) AS BIGINT)) AS BIGINT) / 100.0"


def sql_money_avg(col: str) -> str:
    return f"CAST(SUM(CAST(ROUND({col} * 100) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(*)"


def sql_round_fixed(expr: str, d: int) -> str:
    scale = 10**d
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT) / {scale}.0"


def md5_prefix_long(col: Column | str) -> Column:
    """32-bit md5-prefix of a string column as BIGINT — the repo's
    cross-engine content fingerprint (sums of ~500k of them stay inside
    exact BIGINT range on both engines). DuckDB twin:
    ``sql_md5_prefix_long``; the two are defined side by side so a
    width change cannot desync the engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 8), 16, 10).cast("long")


def sql_md5_prefix_long(expr: str) -> str:
    """DuckDB twin of ``md5_prefix_long`` (DuckDB's md5 hashes the
    VARCHAR's utf-8 bytes, matching Spark's binary cast)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"
