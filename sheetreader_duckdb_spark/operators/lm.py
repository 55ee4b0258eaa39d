"""Distribution-based data valuation: n-gram LM scoring and DSIR-style
importance-weighted selection.

``operators.text.quality_keep`` judges a document by its OWN surface
statistics (lengths, ratios).  The two operators here judge it against
DISTRIBUTIONS — the standard next rung of a pre-training data-selection
pipeline:

1. **Bigram language-model scoring** (the CCNet recipe — Wenzek et al.
   2020 train a KenLM on a trusted corpus and bucket documents by
   perplexity).  ``lm_tables`` aggregates unigram/bigram count tables from
   a reference split; ``lm_doc_stats`` / ``lm_loglik`` score documents
   against them.  The smoothed log-likelihood / perplexity live in
   ``lm_loglik``; ``lm_doc_stats`` additionally exposes EXACT integer /
   rational witnesses (gram hit-mass sums, OOV occurrence counts) that are
   bit-identical across engines and partitionings — those are what the
   declared oracle branch pins (transcendental ln/exp are only
   tolerance-checkable, see the determinism note below).

2. **Hashed n-gram importance weights** (DSIR — Xie et al. 2023 select
   raw documents whose hashed-n-gram profile looks like a target domain).
   ``dsir_scores`` buckets each document's unigrams+bigrams into
   ``16^nchars`` md5 buckets, aggregates corpus-wide bucket masses for the
   target and raw distributions, and scores each document by the exact
   rational ratio  Σ c·(t_b+1) / Σ c·(r_b+1)  of expected target-mass to
   raw-mass over its own feature multiset.  DSIR proper uses the sum of
   per-feature log-ratios; the ratio-of-sums form here keeps every score a
   BIGINT/BIGINT rational — bit-identical in Spark and DuckDB, so the
   full selection (scores AND the top-k membership) is oracle-checkable.
   The log form is a one-line swap (`ln(t_b+1) - ln(r_b+1)` per bucket)
   and inherits the same shuffle topology.  ``dsir_select`` takes the
   deterministic top-n (score desc, id asc) via TakeOrderedAndProject.

Scale shape (the 100 TB contract):
- LM tables are ONE gram-keyed hash aggregate each over the reference
  split (uniform keys, map-side partials).  Scoring joins per-doc DISTINCT
  gram counts (deduped per doc before the join, so join volume is unique
  grams per doc, not token mass) against the tables on the gram string —
  uniform-key shuffle joins; AQE broadcasts the tables when they fit.
- DSIR's distribution tables are at most ``16^nchars`` rows (4096 at the
  default) — broadcast by construction; the per-doc side is one
  bucket-keyed map-side-combined aggregate and the scoring join adds NO
  shuffle on the doc side.  Selection is TakeOrderedAndProject (per
  partition top-n + driver merge of n rows), never a global sort.
- Nothing here collects unbounded data to the driver.

Determinism note: integer sums are associative, and BIGINT/BIGINT → DOUBLE
division is a single correctly-rounded IEEE operation, so every column of
``lm_doc_stats`` and ``dsir_scores`` is exactly reproducible across
engines, partition counts, and row orders.  ``lm_loglik``'s ``ll``/``ppl``
sum ln() terms in partition order — deterministic only to ~1 ulp per
term; tests pin them against a pure-Python reference with a relative
tolerance instead of a hash.

Reference scope note: the reference engine (sheetreader-duckdb,
src/sheetreader_extension.cpp) has no data-valuation surface; these
operators are part of the beyond-reference training-data pipeline layer
(SURVEY.md §2.3 N4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators.dedup import gram_expr
from sheetreader_duckdb_spark.operators.sampling import bucket_hex

__all__ = [
    "lm_tables",
    "lm_doc_stats",
    "lm_loglik",
    "dsir_scores",
    "dsir_select",
]


def _tokens(text_col: str) -> Column:
    # THE shared tokenization (dedup.word_shingles, text.whitespace_tokens):
    # lower + single-space split, identical to DuckDB string_split(lower()).
    return F.split(F.lower(F.col(text_col)), " ")


def _bigrams_or_empty() -> Column:
    # gram_expr(2) evaluates sequence(0, size-2), which for a 1-token doc is
    # the DECREASING sequence [0, -1] — guard short docs to an empty array.
    return F.when(F.size("_w") >= 2, F.expr(gram_expr(2))).otherwise(
        F.array().cast("array<string>")
    )


# --------------------------------------------------------------------------
# 1. Bigram LM
# --------------------------------------------------------------------------
def lm_tables(ref: DataFrame, text_col: str = "text") -> tuple[DataFrame, DataFrame]:
    """Unigram and bigram count tables from a reference corpus.

    Returns ``(uni, bi)``: ``uni(tok, c1)`` counts token occurrences,
    ``bi(g, c12)`` counts bigram occurrences of the space-joined gram
    ``"w1 w2"`` (the corpus-wide gram definition, ``dedup.gram_expr``).
    One hash-aggregate shuffle each; both are plain DataFrames the caller
    can persist / write as the LM artifact and reuse across scoring runs.
    """
    toks = ref.select(_tokens(text_col).alias("_w"))
    uni = (
        toks.select(F.explode("_w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        toks.select(F.explode(_bigrams_or_empty()).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    return uni, bi


def _doc_bigram_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document bigram occurrence counts: (id, g, w1, c).

    Grouping per (doc, gram) BEFORE the LM join means join volume is the
    number of DISTINCT grams per doc, not raw token mass.
    """
    return (
        docs.select(F.col(id_col), _tokens(text_col).alias("_w"))
        .select(id_col, F.explode(_bigrams_or_empty()).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("w1", F.split("g", " ")[0])
    )


def lm_doc_stats(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact per-document LM-table statistics (all engine-bit-identical).

    Columns: ``n_bigrams`` (occurrences), ``oov_bigrams`` (occurrences of
    grams absent from ``bi`` — nonzero exactly when the doc was not in the
    LM reference split), ``sum_c12`` / ``sum_ctx`` (occurrence-weighted
    gram / context hit mass), ``mean_c12`` / ``mean_ctx`` (the exact
    rationals sum/n as doubles).  A doc scoring high ``mean_c12`` is made
    of bigrams the reference corpus uses often — the integer skeleton of
    the smoothed log-likelihood ``lm_loglik`` computes.

    Docs with fewer than 2 tokens have no bigrams and drop out (same
    filter on the oracle side).
    """
    dbc = _doc_bigram_counts(docs, id_col, text_col)
    joined = dbc.join(bi, "g", "left").join(
        uni.withColumnRenamed("tok", "w1"), "w1", "left"
    )
    n = F.sum("c").cast("long")
    return joined.groupBy(id_col).agg(
        n.alias("n_bigrams"),
        F.sum(F.when(F.col("c12").isNull(), F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("oov_bigrams"),
        F.sum(F.col("c") * F.coalesce("c12", F.lit(0))).cast("long").alias("sum_c12"),
        F.sum(F.col("c") * F.coalesce("c1", F.lit(0))).cast("long").alias("sum_ctx"),
        (F.sum(F.col("c") * F.coalesce("c12", F.lit(0))).cast("double") / n).alias(
            "mean_c12"
        ),
        (F.sum(F.col("c") * F.coalesce("c1", F.lit(0))).cast("double") / n).alias(
            "mean_ctx"
        ),
    )


def lm_loglik(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Add-α smoothed bigram log-likelihood and perplexity per document.

    ``logp(w2|w1) = ln((c12 + α) / (c1 + α·V))`` with ``V`` = unigram
    vocabulary size + 1 (the unseen type), computed in-plan as a 1-row
    aggregate cross-joined in (broadcast of one row — no driver action).
    ``ll`` is the occurrence-weighted sum over the doc's bigrams,
    ``ppl = exp(-ll / n_bigrams)``.

    Context-denominator note (CCNet-style approximation): ``c1`` is the
    TOTAL unigram occurrence count of ``w1``, which includes
    document-final occurrences that never open a bigram, so
    ``Σ_w2 p(w2|w1)`` sums to slightly less than 1 — the conditional is
    deliberately unnormalized. The standard MLE would use bigram-prefix
    counts (``Σ c12 over grams starting with w1``, one extra aggregate
    over the ``bi`` table); the unigram form is kept because it needs no
    second pass and the deficiency is a per-``w1`` constant factor that
    cancels in cross-document comparisons against the same LM tables.
    tests/test_lm.py pins the identical formula in pure Python.

    Floating caveat: see the module docstring — pin these with a
    tolerance, hash the ``lm_doc_stats`` integers instead.
    """
    dbc = _doc_bigram_counts(docs, id_col, text_col)
    vocab = uni.agg((F.count(F.lit(1)) + F.lit(1)).alias("_v"))
    joined = (
        dbc.join(bi, "g", "left")
        .join(uni.withColumnRenamed("tok", "w1"), "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.coalesce("c12", F.lit(0)) + F.lit(alpha))
        / (F.coalesce("c1", F.lit(0)) + F.lit(alpha) * F.col("_v"))
    )
    out = joined.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.sum(F.col("c") * logp).alias("ll"),
    )
    return out.withColumn("ppl", F.exp(-F.col("ll") / F.col("n_bigrams")))


# --------------------------------------------------------------------------
# 2. DSIR-style hashed n-gram importance
# --------------------------------------------------------------------------
def _doc_bucket_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    seed: str,
    nchars: int,
    carry: list[str],
    extra: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-doc hashed-feature bucket counts: (id, *carry, *extra, b, c).

    Features are the doc's unigrams AND bigrams WITH multiplicity; the
    bucket is the first ``nchars`` md5 hex chars of ``seed:feature``
    (``sampling.bucket_hex`` — the corpus' portable hash idiom).
    ``extra`` maps output name → expression over ``docs``; the columns
    ride along through the explode and the aggregate key — doc-level
    attributes the caller needs downstream without a join back to
    ``docs``.
    """
    extra = extra or {}
    extra_names = list(extra)
    feats = (
        docs.select(
            F.col(id_col),
            *carry,
            *[c.alias(n) for n, c in extra.items()],
            _tokens(text_col).alias("_w"),
        )
        .select(
            id_col,
            *carry,
            *extra_names,
            F.explode(F.concat(F.col("_w"), _bigrams_or_empty())).alias("feat"),
        )
        .select(
            id_col,
            *carry,
            *extra_names,
            bucket_hex(F.col("feat"), seed, nchars).alias("b"),
        )
    )
    return feats.groupBy(id_col, *carry, *extra_names, "b").agg(
        F.count(F.lit(1)).alias("c")
    )


def dsir_scores(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "dsir",
    nchars: int = 3,
    carry: list[str] | None = None,
) -> DataFrame:
    """Importance score of every document against a target domain.

    ``target_pred`` is a boolean Column over ``docs`` selecting the target
    sample (e.g. ``F.col("source") == "wiki"``); the raw distribution is
    the whole of ``docs``.  Output per doc: ``num = Σ c·(t_b + 1)``,
    ``den = Σ c·(r_b + 1)`` (BIGINT, +1-smoothed bucket masses), and
    ``score = num / den`` — high when the doc's hashed-n-gram profile
    concentrates where the target distribution does.  Exact-rational form;
    see the module docstring for the relation to DSIR's log-ratio.

    One bucket-keyed aggregate over the corpus (bounded output:
    ``16^nchars`` rows per table) + one doc-keyed aggregate; the
    distribution joins are broadcast by construction.
    """
    carry = carry or []
    # The target predicate is an expression over ``docs``, so it rides
    # through the feature explode as a column — no join back to docs to
    # tag rows. The bucket-count relation still feeds three consumers
    # (target mass, raw mass, per-doc scoring): persist it once so the
    # feature explode + md5 hashing runs a single time, released at the
    # next declared query's construction (standalone callers: call
    # session.release_deferred() after materializing — see session.py).
    from sheetreader_duckdb_spark import session as SESS

    fb = SESS.defer_unpersist(
        _doc_bucket_counts(
            docs, id_col, text_col, seed, nchars, carry,
            extra={"_is_tgt": target_pred},
        ).persist()
    )
    tgt = fb.filter("_is_tgt").groupBy("b").agg(F.sum("c").cast("long").alias("t"))
    raw = fb.groupBy("b").agg(F.sum("c").cast("long").alias("r"))
    num = F.sum(F.col("c") * (F.coalesce("t", F.lit(0)) + F.lit(1))).cast("long")
    den = F.sum(F.col("c") * (F.coalesce("r", F.lit(0)) + F.lit(1))).cast("long")
    return (
        fb.join(F.broadcast(tgt), "b", "left")
        .join(F.broadcast(raw), "b", "left")
        .groupBy(id_col, *carry)
        .agg(
            num.alias("num"),
            den.alias("den"),
            (num.cast("double") / den).alias("score"),
        )
    )


def dsir_select(scored: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic top-``n`` by (score desc, id asc).

    ``orderBy().limit()`` plans as TakeOrderedAndProject — per-partition
    top-n then an n-row driver merge, never a global sort — and the id
    tiebreak makes the selected SET a pure function of the data (identical
    scores, e.g. exact-duplicate documents, cannot flip membership between
    runs or engines).
    """
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(n)
