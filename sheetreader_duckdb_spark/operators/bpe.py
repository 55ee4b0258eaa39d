"""Byte-pair-encoding tokenizer fitting + encoding (training-data op).

The tokenizer-fitting loop every LLM corpus pipeline runs, split along
the line that scales:

* **Corpus-scale work = ONE shuffle.** ``word_counts`` aggregates the
  corpus to its distinct-word frequency table — the only operation that
  touches every byte. Standard BPE (Sennrich et al. 2016; the
  HuggingFace/SentencePiece trainers do the same) fits merges over that
  table, not over the raw corpus, because pair statistics only depend on
  (word, count).
* **Merge learning = bounded driver loop.** ``bpe_train`` caps the table
  to ``top_k`` words by mass and runs the classic greedy pair-merge loop
  in plain Python — the same "bounded driver state" split as
  quality_model.py (K+1 doubles) and pq_codebooks (dim·n_codes floats):
  top_k·avg_word_len chars, NOT corpus-proportional. Ties break
  deterministically (count desc, pair lexicographic asc) so training is
  reproducible bit-for-bit across partitionings and runs.
* **Encoding = zero-UDF column expression.** ``bpe_encode_expr`` applies
  a frozen merge list as a chain of built-in ``replace`` calls over a
  spaced-char representation (every char space-delimited, words
  separated by ≥2 spaces so merges can never cross a word boundary).
  One left-to-right non-overlapping replace pass per merge is the
  DEFINED encode semantics (see the block comment above
  ``bpe_spaced_expr`` for the precise relationship to symbol-level
  greedy BPE), so N merges compile to N nested
  ``StringReplace``s inside whole-stage codegen — no Python worker, and
  the identical chain is SQL-expressible for the DuckDB oracle
  (generated from the SAME merge list by ``bpe_encode_sql`` — the
  scrub_pii can't-desync pattern).

At 100 TB: word_counts is a hash aggregate on the word (uniform keys);
everything downstream of it is either driver-bounded (train) or
scan-speed per-document expressions (encode/token-count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_counts",
    "bpe_train",
    "bpe_train_reference",
    "bpe_spaced_expr",
    "bpe_encode_expr",
    "bpe_tokens_expr",
    "bpe_token_count_expr",
    "bpe_encode_sql",
    "bpe_token_count_sql",
]


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table ``(word, c)`` — the one corpus-scale
    shuffle of tokenizer fitting. Lowercased whitespace words (the
    repo-wide tokenization; swap the splitter for a byte-level regime)."""
    return (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pc: dict[tuple[str, str], int] = {}
    for syms, c in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pc[p] = pc.get(p, 0) + c
    return pc


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train_reference(
    wc: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Pure-Python BPE trainer over a (word, count) list — the reference
    implementation the distributed entry point delegates to and the tests
    pin against. Greedy: each step merges the pair with the highest
    occurrence mass; ties break (count desc, pair lex asc). Stops early
    when no pair occurs twice."""
    vocab = {tuple(w): c for w, c in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {_merge_word(s, pair): c for s, c in vocab.items()}
    return merges


def bpe_train(
    wc: DataFrame,
    n_merges: int = 32,
    top_k: int = 100_000,
    word_col: str = "word",
    count_col: str = "c",
) -> list[tuple[str, str]]:
    """Fit ``n_merges`` BPE merges from a distributed word-count table.

    Collects only the ``top_k`` highest-count words (deterministic
    count-desc/word-asc order) — the bounded driver state this operator
    is allowed (tail words contribute negligible pair mass; raise
    ``top_k`` to taste, the collect is top_k·avg_word_len chars). The
    loop itself is ``bpe_train_reference``.
    """
    rows = (
        wc.select(F.col(word_col).alias("w"), F.col(count_col).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(top_k)
        .collect()
    )
    return bpe_train_reference([(r["w"], r["n"]) for r in rows], n_merges)


# --------------------------------------------------------------------------
# Encoding with a frozen merge list — built-in expressions only.
#
# Representation: whitespace is first normalized to single spaces (the
# same separator class word_counts tokenizes on — spelled as an explicit
# character class because Java's \s and RE2's \s disagree on \x0B), then
# every character becomes " " + char, plus one trailing space — so a
# word is " h u g " (single spaces INSIDE, and the inter-word space
# expands to "  ", leaving >= 3 spaces between words). The per-char
# regex carries (?s) because Java's '.' skips line terminators
# (CR, NEL U+0085, LS U+2028, PS U+2029) that RE2's '.' matches
# -- without the flag the two engines space exotic separators
# differently.
#
# A merge (a, b) is the literal replacement " a b " -> " ab ": ONE
# left-to-right non-overlapping replace pass per merge, structurally
# unable to fire across word boundaries (no single-space path crosses
# one). DEFINED SEMANTICS, deterministic and identical on Spark, DuckDB,
# and the Python reference (str.replace has the same pass semantics):
# equal to the classic symbol-level greedy merge everywhere EXCEPT at
# immediately-adjacent instances of the same pair, where the pass
# consumes the shared delimiter and skips the next instance —
# 'abab' under ('a','b') encodes [ab, a, b] (symbol-greedy: [ab, ab]),
# 'aaaa' under ('a','a') encodes [aa, a, a] after any number of passes
# of this chain. tests/test_bpe.py pins both the equality on ordinary
# words and the divergence cases explicitly; the TRAINING loop
# (bpe_train_reference) remains the canonical symbol-level algorithm.
# --------------------------------------------------------------------------
_WS_CLASS = "[ \\t\\n\\r\\x0B\\f]+"


def bpe_spaced_expr(col: Column) -> Column:
    """Lowercased, whitespace-normalized text to the spaced-symbol
    representation."""
    norm = F.regexp_replace(F.lower(col), _WS_CLASS, " ")
    return F.concat(F.regexp_replace(norm, "(?s)(.)", " $1"), F.lit(" "))


def bpe_encode_expr(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Spaced-symbol encoding of ``col`` under a frozen merge list — a
    chain of built-in replaces (whole-stage codegen, zero Python)."""
    expr = bpe_spaced_expr(col)
    for a, b in merges:
        expr = F.replace(expr, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return expr


def bpe_tokens_expr(col: Column, merges: list[tuple[str, str]]) -> Column:
    """``array<string>`` of BPE tokens (split the encoding, drop the
    empty strings the multi-space word gaps produce)."""
    return F.filter(
        F.split(bpe_encode_expr(col, merges), " "), lambda t: t != F.lit("")
    )


def bpe_token_count_expr(col: Column, merges: list[tuple[str, str]]) -> Column:
    return F.size(bpe_tokens_expr(col, merges)).cast("long")


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def bpe_encode_sql(text_sql: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB twin of ``bpe_encode_expr``, generated from the SAME merge
    list so Spark and oracle can never desync (scrub_pii pattern)."""
    norm = f"regexp_replace(lower({text_sql}), '[ \\t\\n\\r\\x0B\\f]+', ' ', 'g')"
    expr = f"regexp_replace({norm}, '(?s)(.)', ' \\1', 'g') || ' '"
    for a, b in merges:
        expr = f"replace({expr}, ' {_sql_quote(a)} {_sql_quote(b)} ', ' {_sql_quote(a + b)} ')"
    return expr


def bpe_token_count_sql(text_sql: str, merges: list[tuple[str, str]]) -> str:
    enc = bpe_encode_sql(text_sql, merges)
    return (
        f"CAST(len(list_filter(string_split({enc}, ' '), x -> x <> ''))"
        " AS BIGINT)"
    )
