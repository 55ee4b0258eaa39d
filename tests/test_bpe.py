"""BPE tokenizer fitting + encoding (operators/bpe.py): the classic
worked example, distributed-vs-reference training parity, encode
equivalence to the symbol-level reference, determinism, and the word
boundary / whitespace edge cases the spaced representation must hold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import bpe as B
from sheetreader_duckdb_spark.tables import T


def _encode_reference(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """String-chain reference encoder — the OPERATOR'S defined semantics
    (one left-to-right non-overlapping str.replace pass per merge over
    the spaced representation; Python's str.replace shares the pass
    semantics of Spark's replace and DuckDB's replace), so this parity
    holds for EVERY input, not just corpora without adjacent same-pair
    instances. The divergence from the classic symbol-level greedy merge
    is pinned separately in test_chain_semantics_vs_symbol_greedy."""
    import re

    norm = re.sub(r"[ \t\n\r\x0b\f]+", " ", text.lower())
    s = "".join(f" {c}" for c in norm) + " "
    for a, b in merges:
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return [t for t in s.split(" ") if t]


def _encode_symbol_greedy(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """The classic symbol-level greedy encoder, kept to DOCUMENT where
    the string chain diverges (adjacent instances of the same pair)."""
    out: list[str] = []
    for word in text.lower().split():
        syms = tuple(word)
        for pair in merges:
            syms = B._merge_word(syms, pair)
        out.extend(syms)
    return out


def test_classic_worked_example():
    # Sennrich-style toy corpus: hug x10, pug x5, pun x12, bun x4, hugs x5.
    wc = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)]
    merges = B.bpe_train_reference(wc, n_merges=3)
    # Pair masses: ('u','g')=20, ('u','n')=16, ('h','u')=15, ...
    assert merges[0] == ("u", "g")
    assert merges[1] == ("u", "n")
    assert merges[2] == ("h", "ug")


def test_tie_break_is_deterministic():
    # Two pairs with equal mass: lexicographically smaller wins.
    wc = [("ab", 3), ("cd", 3)]
    merges = B.bpe_train_reference(wc, n_merges=2)
    assert merges == [("a", "b"), ("c", "d")]


def test_early_stop_below_two():
    # No pair occurs twice -> no merge is learnable.
    assert B.bpe_train_reference([("ab", 1), ("cd", 1)], n_merges=5) == []


def test_distributed_train_matches_reference(spark, sf_dir):
    docs = T(spark, sf_dir, "documents").limit(200)
    wc_df = B.word_counts(docs)
    got = B.bpe_train(wc_df, n_merges=12, top_k=50_000)
    wc = [(r["word"], r["c"]) for r in wc_df.collect()]
    # Reference needs the same deterministic input order-independence:
    # bpe_train_reference is order-independent because pair counts are.
    want = B.bpe_train_reference(wc, n_merges=12)
    assert got == want
    # Partitioning invariance of the whole fit.
    again = B.bpe_train(B.word_counts(docs.repartition(7)), n_merges=12)
    assert again == got


def test_top_k_cap_bounds_driver_state(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb zz")], "doc_id long, text string"
    )
    # top_k=2 keeps only the two heaviest words (aa, bb) — 'zz' never
    # contributes a pair, so ('z','z') must not be learned.
    merges = B.bpe_train(B.word_counts(docs), n_merges=4, top_k=2)
    assert ("z", "z") not in merges
    assert ("a", "a") in merges and ("b", "b") in merges


def test_encode_expr_matches_symbol_reference(spark, sf_dir):
    docs = T(spark, sf_dir, "documents").limit(80)
    wc = B.word_counts(docs)
    merges = B.bpe_train(wc, n_merges=16)
    got = {
        r["doc_id"]: r["toks"]
        for r in docs.select(
            "doc_id", B.bpe_tokens_expr(F.col("text"), merges).alias("toks")
        ).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == _encode_reference(r["text"], merges), r["doc_id"]


def test_merges_never_cross_word_boundary(spark):
    # 'b a' adjacency exists ONLY across the word gap; a ('b','a') merge
    # must not fire there even if frozen into the table.
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    toks = df.select(
        B.bpe_tokens_expr(F.col("text"), [("b", "a")]).alias("t")
    ).collect()[0]["t"]
    assert toks == ["a", "b", "a", "b"]
    # Within-word it does fire.
    df2 = spark.createDataFrame([(1, "aba")], "doc_id long, text string")
    toks2 = df2.select(
        B.bpe_tokens_expr(F.col("text"), [("b", "a")]).alias("t")
    ).collect()[0]["t"]
    assert toks2 == ["a", "ba"]


def test_overlapping_pair_is_greedy_left_to_right(spark):
    df = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    toks = df.select(
        B.bpe_tokens_expr(F.col("text"), [("a", "a")]).alias("t")
    ).collect()[0]["t"]
    assert toks == ["aa", "a"]  # BPE merges the leftmost pair first


def test_empty_and_whitespace_only(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "x")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", B.bpe_token_count_expr(F.col("text"), [("a", "b")]).alias("n")
        ).collect()
    }
    assert rows == {1: 0, 2: 0, 3: 1}


def test_sql_twin_generated_from_same_merges(spark):
    """The DuckDB twin (used by the n07 oracle) byte-matches the Spark
    encoding on adversarial strings — quotes, unicode, repeated pairs."""
    import duckdb

    merges = [("a", "b"), ("ab", "c"), ("'", "'")]
    texts = ["abcabc", "a b c", "''''", "héllo wörld", "ab'ab", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["e"]
        for r in df.select(
            "i", B.bpe_encode_expr(F.col("text"), merges).alias("e")
        ).collect()
    }
    con = duckdb.connect()
    sql_expr = B.bpe_encode_sql("t", merges)
    for i, t in enumerate(texts):
        want = con.execute(f"SELECT {sql_expr} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        assert got[i] == want, (i, t, got[i], want)


@pytest.mark.parametrize("n_parts", [1, 7])
def test_word_counts_partition_invariant(spark, sf_dir, n_parts):
    docs = T(spark, sf_dir, "documents").limit(100).repartition(n_parts)
    wc = {(r["word"], r["c"]) for r in B.word_counts(docs).collect()}
    base = {
        (r["word"], r["c"])
        for r in B.word_counts(T(spark, sf_dir, "documents").limit(100)).collect()
    }
    assert wc == base


def test_chain_semantics_vs_symbol_greedy(spark):
    """Pin the DEFINED divergence: on immediately-adjacent instances of
    the same pair the one-pass string chain under-merges relative to the
    classic symbol-level greedy encoder; everywhere else they agree."""
    cases = [
        ("abab", [("a", "b")], ["ab", "a", "b"], ["ab", "ab"]),
        ("aaaa", [("a", "a")], ["aa", "a", "a"], ["aa", "aa"]),
        ("abcabc", [("a", "b"), ("ab", "c")], ["abc", "ab", "c"], ["abc", "abc"]),
        ("hug pug", [("u", "g"), ("h", "ug")], ["hug", "p", "ug"], ["hug", "p", "ug"]),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_rest) in enumerate(cases)], "doc_id long, text string"
    )
    for i, (text, merges, want_chain, want_greedy) in enumerate(cases):
        toks = df.filter(F.col("doc_id") == i).select(
            B.bpe_tokens_expr(F.col("text"), merges).alias("t")
        ).collect()[0]["t"]
        assert toks == want_chain == _encode_reference(text, merges), text
        assert _encode_symbol_greedy(text, merges) == want_greedy, text


def test_hostile_whitespace_cross_engine(spark):
    """CR/TAB/FF/VT/newline must encode identically on Spark, DuckDB,
    and the Python reference (the carriage-return case diverged before
    whitespace normalization + the (?s) flag)."""
    import duckdb

    texts = [
        "a\rb", "a\nb", "a\tb", "a\x0bb", "a\fb", "a\r\n b", "ab", "a b",
    ]
    merges = [("a", "b")]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id", B.bpe_encode_expr(F.col("text"), merges).alias("e")
        ).collect()
    }
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT id, {B.bpe_encode_sql('t', merges)} FROM "
        "(SELECT unnest(range(?)) AS id, unnest(?) AS t)",
        [len(texts), texts],
    ).fetchall()
    for i, e in duck:
        assert e == got[i] == _strchain_encode(texts[i], merges), repr(texts[i])
    # ASCII whitespace collapses to a word gap, matching word_counts'
    # tokenization; "ab" merges, separated "a b" does not.
    toks = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", B.bpe_tokens_expr(F.col("text"), merges).alias("t")
        ).collect()
    }
    for i in (0, 1, 2, 3, 4, 5, 7):
        assert toks[i] == ["a", "b"], repr(texts[i])
    assert toks[6] == ["ab"]


def _strchain_encode(text, merges):
    """Raw encoded STRING via the reference chain (not just tokens)."""
    import re

    norm = re.sub(r"[ \t\n\r\x0b\f]+", " ", text.lower())
    s = "".join(f" {c}" for c in norm) + " "
    for a, b in merges:
        s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return s
