"""Rolling-hash document fingerprinting — winnowing (Schleimer, Wilkerson
& Aiken 2003, the MOSS algorithm).

Per document: hash every character k-gram (rolling window), then slide a
window of ``w`` consecutive hashes and keep the RIGHTMOST MINIMUM of each
window. The selected (position, hash) pairs are the document's
fingerprints: any shared substring of length ≥ w + k - 1 between two
documents is guaranteed to surface as at least one shared fingerprint
(the winnowing guarantee), while storage is ~2/(w+1) of the k-gram count.

Everything is built-in column expressions — the k-gram hash is the
repo's cross-engine 32-bit md5-prefix (so a DuckDB twin reproduces every
selected hash bit-for-bit), selection is array arithmetic inside
whole-stage codegen, and pair detection is an equi-join on the
fingerprint hash (bucketed by construction — no cross product; the same
shape as every other candidate-generation join in this engine).

At 100 TB: fingerprinting is scan-speed per document (zero shuffle);
``winnow_pairs`` shuffles once on the fingerprint hash, with candidate
volume governed by the winnowing density 2/(w+1) rather than raw text
size, and a hot-hash cap mirroring the LSH bucket cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kgram_hashes_expr",
    "winnow_selected_expr",
    "winnow_encoded_expr",
    "winnow_fingerprints",
    "winnow_pairs",
    "winnow_encoded_sql",
]

# Injective-enough scalar encoding of (position, hash32): p·1000003 + h
# stays exact in BIGINT for p < 2^33, then mod 2^31-1 keeps per-source
# SUMS of hundreds of thousands of fingerprints inside exact BIGINT
# range on both engines. Dedup-by-position is unaffected (same p ⇒ same
# encoding), which is all winnowing's dedup rule needs.
_ENC_MUL = 1000003
_ENC_MOD = 2147483647


# Shared with the PQ witness encode (exprutil.bind_once): Catalyst
# inlines a producing subtree at every reference site — unbound, the
# per-window references turned winnowing into O(m²·w) md5 calls per
# document (measured 82 s for 50 docs; ~0.5 s bound). The DuckDB twin
# gets the same sharing from its ``SELECT ... AS hh`` subquery.
from sheetreader_duckdb_spark.operators.exprutil import bind_once as _bind


def kgram_hashes_expr(text: Column, k: int, hash: str = "md5") -> Column:
    """``array<long>`` of k-gram hashes, one per character k-gram of
    ``lower(text)`` (position i covers chars i..i+k-1, 1-based).

    ``hash='md5'`` (default): 32-bit md5-prefix — the repo's
    cross-engine hash, bit-reproducible in DuckDB for the oracle
    witness. ``hash='xxhash64'``: the scale path — one JVM hash call
    per gram instead of the md5→hex→conv chain (measured ~25% cheaper
    end-to-end at sf0.1; window selection, not hashing, dominates the
    remainder); Spark-only, for production winnowing where no DuckDB
    twin is needed. Selection/pair semantics are hash-agnostic.

    Empty array when the text is shorter than k — guarded explicitly
    because Spark's ``sequence(1, 0)`` would DESCEND, unlike DuckDB's
    empty ``range``. The lowered text is lambda-bound so each gram
    substrings a variable, not a fresh ``lower(text)``."""
    if hash not in ("md5", "xxhash64"):
        raise ValueError(f"hash must be 'md5' or 'xxhash64', got {hash!r}")

    def hashes_of(t: Column) -> Column:
        n = F.length(t)
        if hash == "md5":
            one = lambda i: F.conv(  # noqa: E731
                F.substring(F.md5(t.substr(i, F.lit(k)).cast("binary")), 1, 8),
                16,
                10,
            ).cast("long")
        else:
            one = lambda i: F.xxhash64(t.substr(i, F.lit(k)))  # noqa: E731
        hashes = F.transform(F.sequence(F.lit(1), n - (k - 1)), one)
        return F.when(n >= k, hashes).otherwise(F.array().cast("array<bigint>"))

    return _bind(F.lower(text), hashes_of)


def winnow_selected_expr(
    text: Column, k: int = 5, w: int = 4, hash: str = "md5"
) -> Column:
    """``array<struct<p:int, h:bigint>>`` of winnowing fingerprints:
    rightmost minimum of every w-hash window, deduplicated by position.
    Documents shorter than k fingerprint to the empty array; documents
    with 1 ≤ m < w hashes yield the single global minimum (one window
    over the whole array — the guarantee still holds). The hash array is
    lambda-bound: every per-window slice reads the SAME evaluated array."""

    def select_from(h: Column) -> Column:
        m = F.size(h)

        def pick(j: Column) -> Column:
            def from_window(s: Column) -> Column:
                lw = F.size(s)
                mn = F.array_min(s)
                # rightmost occurrence of the min inside the window
                rp = F.array_position(F.reverse(s), mn)  # 1-based, from right
                pos = (j + (lw - rp)).cast("int")
                return F.struct(pos.alias("p"), mn.alias("h"))

            return _bind(F.slice(h, j, w), from_window)

        sel = F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.lit(1), m - (w - 1))), pick
            )
        )
        return F.when(m > 0, sel).otherwise(
            F.array().cast("array<struct<p:int,h:bigint>>")
        )

    return _bind(kgram_hashes_expr(text, k, hash), select_from)


def winnow_encoded_expr(
    text: Column, k: int = 5, w: int = 4, hash: str = "md5"
) -> Column:
    """``array<long>`` of fingerprints encoded as (p·1000003 + h) mod
    (2^31 - 1) — the scalar form the cross-engine witness sums. Distinct
    is applied AFTER encoding on both engines, so a (vanishingly rare)
    post-mod collision between different positions dedups identically
    on both sides.

    md5-only by contract: the encoding's exact-BIGINT claim holds
    because the 32-bit md5-prefix keeps p·1000003 + h below 2^63; a
    full-signed-range xxhash64 value would wrap int64 (deterministic in
    Spark but outside the witness contract, and the DuckDB twin is
    md5-only regardless). The xxhash64 scale path keeps the struct form
    (winnow_selected_expr / winnow_fingerprints), which never encodes."""
    if hash != "md5":
        raise ValueError(
            "winnow_encoded_expr is md5-only (the exact-BIGINT encoding "
            f"contract); got hash={hash!r} — use winnow_selected_expr / "
            "winnow_fingerprints for the xxhash64 scale path"
        )
    return F.array_distinct(
        F.transform(
            winnow_selected_expr(text, k, w, hash),
            lambda s: F.pmod(
                s["p"].cast("long") * F.lit(_ENC_MUL) + s["h"], F.lit(_ENC_MOD)
            ),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    hash: str = "md5",
) -> DataFrame:
    """Exploded fingerprint relation ``(id, pos, fp)`` — one row per
    selected fingerprint. Scan-speed (zero shuffle); the downstream
    join/aggregate shape is the caller's."""
    return df.select(
        F.col(id_col),
        F.explode(winnow_selected_expr(F.col(text_col), k, w, hash)).alias("__s"),
    ).select(id_col, F.col("__s.p").alias("pos"), F.col("__s.h").alias("fp"))


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_hash_freq: int | None = 1000,
    hash: str = "md5",
) -> DataFrame:
    """MOSS-style overlap candidates: document pairs sharing at least
    ``min_shared`` winnowing fingerprints, with the shared count.

    One shuffle on the fingerprint hash (equi-join — candidate volume is
    per-hash n·(n-1)/2, NOT corpus-quadratic). ``max_hash_freq`` drops
    hashes appearing in more than that many documents (boilerplate the
    way the LSH bucket cap treats template bands) before pairing —
    audit them via the returned frame's lineage if needed.
    """
    fp = winnow_fingerprints(df, id_col, text_col, k, w, hash).select(
        F.col(id_col).alias("__id"), "fp"
    ).distinct()
    if max_hash_freq is not None:
        keep = (
            fp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_hash_freq)
            .select("fp")
        )
        fp = fp.join(keep, "fp", "left_semi")
    a = fp.select(F.col("__id").alias("id_a"), "fp")
    b = fp.select(F.col("__id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def winnow_encoded_sql(text_sql: str, k: int = 5, w: int = 4) -> str:
    """DuckDB twin of ``winnow_encoded_expr`` — generated from the same
    constants (k, w, encoding multiplier/modulus) so the engines cannot
    desync. Mirrors the guards: empty below k chars, single whole-array
    window when m < w, rightmost-minimum tie rule, position dedup.
    Element SET is identical across engines; element ORDER is not
    (DuckDB's list_distinct reorders) — witnesses over this column must
    be order-invariant (counts/sums), as n10's 'winnow' branch is."""
    t = f"lower({text_sql})"
    hashes = (
        f"list_transform(range(1, length({t}) - {k} + 2), "
        f"i -> CAST(('0x' || substr(md5(substr({t}, CAST(i AS INTEGER), {k})), 1, 8)) AS BIGINT))"
    )
    h = f"(CASE WHEN length({t}) >= {k} THEN {hashes} ELSE [] END)"
    # DuckDB list_slice takes (list, begin, end) inclusive; list_position
    # finds the FIRST match, so reverse for the rightmost rule.
    s = f"list_slice(hh, CAST(j AS INTEGER), CAST(j + {w} - 1 AS INTEGER))"
    lw = f"least({w}, len(hh) - j + 1)"
    pick = (
        f"(j + ({lw} - list_position(list_reverse({s}), list_min({s}))))"
        f" * {_ENC_MUL} + list_min({s})"
    )
    sel = (
        f"list_distinct(list_transform("
        f"range(1, greatest(1, len(hh) - {w} + 1) + 1), "
        f"j -> CAST(({pick}) % {_ENC_MOD} AS BIGINT)))"
    )
    return (
        f"(SELECT CASE WHEN len(hh) = 0 THEN [] ELSE {sel} END "
        f"FROM (SELECT {h} AS hh) __wn)"
    )
