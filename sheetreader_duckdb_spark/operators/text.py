"""Text-analysis operators for training-data pipelines (SURVEY.md §2.3 N4):
language-ID, quality scoring, token counting, document fingerprinting.

Everything is built-in column expressions (JVM, codegen'd) — these run at
full scan speed and are embarrassingly parallel: no shuffles at all for
per-document outputs. All arithmetic is integer-exact or deterministic IEEE,
so every operator here is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword markers per language for the n-gram/marker language-ID heuristic.
# Count of marker occurrences is computed with exact substring arithmetic
# ((len(text) - len(replace(text, m, ''))) / len(m)), identical in any engine.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " de ", " que "],
    "fr": [" le ", " et ", " les "],
    "zh": ["的", "是", "了"],
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# BPE-ish tokenizer: runs of alphanumerics OR single non-alnum non-space
# (RE2 and Java regex agree on this class syntax).
BPE_TOKEN_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

PUNCT_CLASS = "[.,!?;:]"


def whitespace_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def n_tokens(text: Column | str) -> Column:
    return F.size(whitespace_tokens(text)).cast("long")


def bpe_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_PATTERN), F.lit(0))).cast("long")


def marker_count(text: Column, marker: str) -> Column:
    """Exact occurrence count of a literal substring."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum((marker_count(text, m) for m in markers), F.lit(0).cast("long"))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: Column) -> Column:
    """argmax over marker scores; first-listed language wins ties (the
    declaration order of LANG_MARKERS is the deterministic tiebreak)."""
    scores = lang_scores(text)
    m = F.greatest(*scores.values())
    langs = list(scores)
    out = F.when(scores[langs[0]] == m, F.lit(langs[0]))
    for lang in langs[1:]:
        out = out.when(scores[lang] == m, F.lit(lang))
    return out


def punct_count(text: Column) -> Column:
    return (F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))).cast("long")


def stopword_hits(text: Column) -> Column:
    return F.size(
        F.filter(whitespace_tokens(F.lower(text)), lambda w: w.isin(*STOPWORDS))
    ).cast("long")


def normalized_text(text: Column) -> Column:
    """lower + whitespace collapse — the canonical form for fingerprinting."""
    return F.regexp_replace(F.lower(text), "\\s+", " ")


def fingerprint(text: Column) -> Column:
    """Content fingerprint of the normalized text (hex md5)."""
    return F.md5(normalized_text(text).cast("binary"))


# -- repetition signals (Gopher's duplicate-n-gram family) -------------------
#
# Boilerplate and templated spam repeat themselves; Gopher (Rae et al. 2021,
# table A1) filters on the fraction of the document occupied by repeated
# n-grams. Computed with one explode + per-(doc, gram) count — a single
# shuffle keyed by doc, embarrassingly parallel across docs.

def repetition_signals(df, id_col: str, text_col: str, n: int = 2):
    """Per-document repetition metrics over word ``n``-grams:

    - ``top_gram_frac``: occurrences of the most frequent gram / total grams;
    - ``dup_gram_frac``: fraction of gram occurrences whose gram appears
      more than once.

    Exact integer counts and rational divisions — oracle-checkable.
    Documents with fewer than ``n`` words produce no row (no grams).
    """
    from pyspark.sql import DataFrame  # local: keep module import surface flat

    assert isinstance(df, DataFrame)
    from sheetreader_duckdb_spark.operators.dedup import gram_expr

    words = F.split(F.lower(F.col(text_col)), " ")
    grams = (
        df.select(F.col(id_col), words.alias("_w"))
        .filter(F.size("_w") >= n)
        .select(id_col, F.explode(F.expr(gram_expr(n))).alias("g"))
    )
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        (F.max("c") / F.sum("c")).alias("top_gram_frac"),
        (F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))) / F.sum("c")).alias(
            "dup_gram_frac"
        ),
    )


# -- document chunking (fixed windows with overlap) --------------------------
#
# Long documents are split into fixed-size overlapping windows before
# embedding or training (context budget; retrieval granularity). The window
# plan is a pure function of (size, stride, doc length): offsets 0, stride,
# 2·stride, … with n_chunks = max(1, ceil((len - overlap) / stride)), so the
# final window starts before ``len`` and windows cover the whole document.
# Scan-speed sequence+explode — zero shuffles, and every output (offsets,
# lengths, multiplicity) is exact integer arithmetic, oracle-checkable.

def chunk_documents(
    df, id_col: str, text_col: str, size: int = 500, stride: int = 400
):
    """Explode each document into overlapping character windows.

    Returns every input column except ``text_col`` (the chunk replaces the
    full payload) plus (chunk_ord, chunk_start, chunk_text, n_chunk_chars);
    a document no longer than ``size`` yields exactly one chunk. ``stride``
    must be in (0, size] — ``size - stride`` is the overlap carried between
    consecutive chunks. Token-based chunking is the same plan over a
    token-count column with substring replaced by array slicing.
    """
    from pyspark.sql import DataFrame  # local: keep module import surface flat

    assert isinstance(df, DataFrame)
    if not 0 < stride <= size:
        raise ValueError(f"stride must be in (0, size], got {stride} vs {size}")
    overlap = size - stride
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.length(F.col(text_col)) - overlap) / F.lit(stride))
    ).cast("int")
    carried = [c for c in df.columns if c != text_col]
    chunked = df.select(
        *carried,
        F.col(text_col),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_ord"),
    )
    start = F.col("chunk_ord") * stride
    text = F.substring(F.col(text_col), start + 1, size)
    return chunked.select(
        *carried,
        "chunk_ord",
        start.alias("chunk_start"),
        text.alias("chunk_text"),
        F.length(text).alias("n_chunk_chars"),
    )


# -- PII scrubbing (pre-training text hygiene) -------------------------------
#
# Mask personally-identifying spans with stable placeholder tokens before a
# corpus ships to training. Patterns are deliberately restricted to syntax
# RE2 and Java regex interpret identically (no lookaround, no backrefs), so
# the scrub is engine-portable and oracle-checkable; scan-speed chained
# regexp_replace, zero shuffles. Ordering matters: URLs first (they may
# embed @), then emails, then phone-like digit runs.

SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "[URL]"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # two alternatives: +international digit-run; NANP 3-3-4 with separators
    ("phone", r"\+[0-9][-. ()0-9]{5,18}[0-9]|\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}", "[PHONE]"),
]


def scrub_pii(text: Column) -> Column:
    """Replace URL/email/phone spans with placeholder tokens."""
    out = text
    for _name, pattern, token in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


# -- corpus quality filtering (Gopher/C4-style keep rules) -------------------
#
# Default thresholds follow the published Gopher rules (Rae et al. 2021,
# table A1) where our signals overlap: document length bounds, mean word
# length bounds, and a minimum stopword presence (C4's "terminal punctuation
# / stopword" family). Everything is integer/rational arithmetic over the
# signals above — scan-speed, zero-shuffle, and oracle-checkable exactly.

QUALITY_RULES: dict[str, tuple[float, float]] = {
    # rule name -> (min, max) inclusive bounds on the signal
    "n_ws_tokens": (50, 100_000),
    "mean_word_len": (3, 10),
    "stop_ratio": (0.01, 1.0),
}


def mean_word_len(text: Column) -> Column:
    """Exact rational: non-space chars / whitespace tokens (both BIGINT)."""
    non_space = F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("long")
    return non_space / n_tokens(text)


def quality_signals(text: Column) -> dict[str, Column]:
    n_ws = n_tokens(text)
    return {
        "n_ws_tokens": n_ws,
        "mean_word_len": mean_word_len(text),
        "stop_ratio": stopword_hits(text) / n_ws,
    }


def quality_keep_sql(
    text_sql: str = "text", rules: dict[str, tuple[float, float]] | None = None
) -> str:
    """DuckDB expression computing the same keep decision as quality_keep —
    generated from the SAME rules dict so Spark and oracle can never desync."""
    rules = QUALITY_RULES if rules is None else rules
    stop_set = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_ws = f"CAST(len(string_split({text_sql}, ' ')) AS BIGINT)"
    signals = {
        "n_ws_tokens": n_ws,
        "mean_word_len": f"(CAST(length(replace({text_sql}, ' ', '')) AS BIGINT) / {n_ws})",
        "stop_ratio": (
            f"(CAST(len(list_filter(string_split(lower({text_sql}), ' '), "
            f"x -> x IN ({stop_set}))) AS BIGINT) / {n_ws})"
        ),
    }
    parts = [f"({signals[name]} BETWEEN {lo} AND {hi})" for name, (lo, hi) in rules.items()]
    return "(" + " AND ".join(parts) + ")"


def quality_keep(
    text: Column, rules: dict[str, tuple[float, float]] | None = None
) -> Column:
    """Boolean keep decision: every signal inside its [min, max] bounds.

    AND of per-rule range predicates — one codegen'd expression, no shuffle;
    at 100 TB this filters at scan speed before any downstream dedup joins,
    which is exactly where a corpus pipeline wants its cheapest filter.
    """
    rules = QUALITY_RULES if rules is None else rules
    signals = quality_signals(text)
    keep = F.lit(True)
    for name, (lo, hi) in rules.items():
        s = signals[name]
        keep = keep & (s >= F.lit(lo)) & (s <= F.lit(hi))
    return keep


# --------------------------------------------------------------------------
# Exact heavy hitters: bounded-memory candidate sketch + exact recount
# --------------------------------------------------------------------------
def heavy_hitter_candidates(
    tokens: DataFrame, token_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra–Gries candidate tokens, ``(token)`` distinct.

    Guarantee (the reason this scales): a Misra–Gries sketch of capacity c
    over a partition of N_p tokens retains every token whose count in that
    partition exceeds N_p/c. Summing over partitions, any token with GLOBAL
    count > N/c must exceed its partition threshold somewhere (pigeonhole),
    so the union of per-partition candidates is a superset of all global
    heavy hitters — regardless of how rows are partitioned.
    """
    sk = _mg_sketch(tokens, token_col, capacity)
    return sk.filter(F.col("token").isNotNull()).select("token").distinct()


def _mg_sketch(tokens: DataFrame, token_col: str, capacity: int) -> DataFrame:
    """One mapInPandas pass: Misra–Gries candidate rows ``(token, NULL)``
    plus a single ``(NULL, partition_token_count)`` sentinel per partition —
    so downstream gets candidates AND the global total from the same scan.

    State per partition is ≤ ``capacity`` counters (the one justified
    Python-side path: a bounded-memory mergeable sketch has no DataFrame
    expression form). Batches fold in vectorized via value_counts; the
    overflow step subtracts the (capacity+1)-th largest count from all
    counters and drops non-positives — the mergeable-summaries form of the
    MG decrement, same retention bound. Input tokens must be non-NULL
    (NULL marks the sentinel rows).
    """

    def mg(batches):
        import pandas as pd
        from collections import Counter

        counts: Counter = Counter()
        n = 0
        for pdf in batches:
            n += len(pdf)
            vc = pdf[token_col].value_counts()
            for tok, c in vc.items():
                counts[tok] += int(c)
            if len(counts) > capacity:
                kth = sorted(counts.values(), reverse=True)[capacity]
                counts = Counter(
                    {t: c - kth for t, c in counts.items() if c - kth > 0}
                )
        yield pd.DataFrame(
            {
                "token": pd.Series(list(counts.keys()) + [None], dtype="object"),
                "pcount": pd.Series([None] * len(counts) + [n], dtype="Int64"),
            }
        )

    return tokens.mapInPandas(mg, "token string, pcount long")


def exact_heavy_hitters(
    tokens: DataFrame, token_col: str, denom: int
) -> DataFrame:
    """Tokens whose count ``cnt`` satisfies ``cnt * denom >= N`` (N = total
    token count), with exact counts: ``(token, cnt)``.

    Two full scans of the token stream, both bounded: (1) the Misra–Gries
    sketch pass with capacity denom+1, which emits candidates — a superset
    of every qualifying token by the retention bound (cnt ≥ N/denom >
    N/(denom+1)) — AND per-partition token counts as sentinel rows, so the
    global total N needs no extra scan; (2) exact recount of candidates
    only (broadcast semi join — the candidate set is ≤
    (denom+1)·partitions rows), then the integer-exact threshold filter.
    The tiny sketch output is localCheckpoint()ed so its two consumers
    (candidates, total) don't re-run the scan. Output is independent of
    partitioning: the sketch only proposes, the recount decides.

    This is how you take a token-frequency vocabulary off a 100 TB corpus
    without shuffling every distinct token: the full groupBy ships the
    whole long tail; this ships candidate counts only.
    """
    # Lazy checkpoint (r14): eager ran the full MG token scan as a SERIAL
    # job at plan-construction time; lazy defers it to the caller's action,
    # where it executes inside the concurrent stage graph (and a caller
    # composing this into a larger union never pays a surprise scan before
    # acting). In the usual single-action case the first consumer computes
    # and the second reads the cached blocks; two CONCURRENT first actions
    # (e.g. thread-pooled construction) can in principle both compute the
    # uncached sketch partitions — output stays correct either way (any MG
    # run is a candidate superset and the exact recount decides), the
    # single-scan property is best-effort, not guaranteed (ADVICE r14).
    sk = _mg_sketch(tokens, token_col, capacity=denom + 1).localCheckpoint(
        eager=False
    )
    cands = sk.filter(F.col("token").isNotNull()).select("token").distinct()
    total = sk.agg(F.sum("pcount").alias("n"))
    counted = (
        tokens.join(F.broadcast(cands), tokens[token_col] == cands.token, "left_semi")
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * denom >= F.col("n"))
        .select(F.col(token_col).alias("token"), "cnt")
    )
