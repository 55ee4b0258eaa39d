"""BM25 relevance scoring — the standard retrieval scorer, used in
training-data pipelines to pull query-relevant documents out of a large
corpus (targeted-subset selection; the retrieval sibling of DSIR's
importance weighting in operators/lm.py).

Okapi BM25 with the +1 idf form (Lucene's, always positive):

    idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d) = Σ_t idf(t) · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))

Cross-engine determinism, the module's real design constraint:

- Every COUNT input (tf, df, dl, N, total_dl) is an exact BIGINT;
  dl/avgdl is computed as the exact rational dl·N/total_dl before the
  one float division.
- The per-term contributions are summed in the FIXED literal order of
  ``query_terms`` via one pivoted column per term — never a float SUM
  aggregate, whose addition order varies per run and per engine. A
  document has at most one pivoted value per term, so each pivot is
  exact and the final chain is the same left-associated IEEE sequence
  on both engines.
- ``ln`` may differ by 1 ulp between the JVM and libm, so the
  hash-checkable witness is the floor-quantized integer score
  (``score_q = floor(score · 10^4)``) — the quality-model (mlq)
  precedent; drift can flip the witness only when a true score sits
  within ~1e-12 of a quantization boundary (documented, not observed).

Scale shape: one token aggregate restricted to the query terms (the
corpus-wide explode is filtered BEFORE the shuffle, so gram volume is
per-term, not per-token), a per-doc length aggregate, three broadcast
joins (stats row, df table ≤ |terms| rows), and a TakeOrderedAndProject
top-k. No per-row Python anywhere.

Tokenization contract: ``split(lower(text), ' ')`` — a SINGLE literal
space, deliberately. BM25's dl/avgdl must count exactly what the tf
explode emits, and the single-space split is the repo's canonical-space
convention (dedup.word_shingles, duplicate_ngram_*, the n10 witnesses)
— NOT bpe.word_counts' ``\\s+`` class. Consecutive spaces therefore
yield empty tokens that count toward dl (consistently on both engines,
and they can never match a query term, which is validated non-empty);
text with tabs/newlines should be normalized upstream
(text.normalized_text) if whitespace-class tokenization is wanted.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "bm25_topk", "BM25_QUANT"]

BM25_QUANT = 10_000  # witness quantization: floor(score * 1e4)


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 for one query: ``(id, matched, dl, score,
    score_q)`` — only documents matching at least one query term appear
    (everything else scores exactly 0). ``query_terms`` order defines
    the summation order; duplicate terms are rejected (they would
    double-count)."""
    terms = list(query_terms)
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("query_terms must be distinct")
    if any(t == "" for t in terms):
        raise ValueError("query_terms must be non-empty strings")

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    stats = toks.agg(
        F.count_distinct(F.col(id_col)).alias("__n"),
        F.count(F.lit(1)).alias("__tdl"),
    )
    qt = toks.filter(F.col("tok").isin(*terms))
    tf = qt.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("__tf"))
    dft = qt.groupBy("tok").agg(F.count_distinct(F.col(id_col)).alias("__df"))

    contrib = (
        F.log(
            F.lit(1.0)
            + (F.col("__n").cast("double") - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        )
        * (F.col("__tf") * F.lit(k1 + 1.0))
        / (
            F.col("__tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b)
                * (F.col("__dl") * F.col("__n")).cast("double")
                / F.col("__tdl")
            )
        )
    )
    per_term = (
        tf.join(F.broadcast(dft), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), "tok", "__dl", contrib.alias("__c"))
    )
    # One pivoted column per query term (each doc has ≤ 1 row per term, so
    # the pivot "sum" is exact), then a fixed left-associated chain.
    pivots = [
        F.sum(F.when(F.col("tok") == F.lit(t), F.col("__c"))).alias(f"__c{i}")
        for i, t in enumerate(terms)
    ]
    agg = per_term.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("matched"), F.max("__dl").alias("dl"), *pivots
    )
    score = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    return agg.select(
        F.col(id_col),
        "matched",
        "dl",
        score.alias("score"),
        F.floor(score * F.lit(float(BM25_QUANT))).cast("long").alias("score_q"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Deterministic top-k by (quantized score desc, id asc) — ties at
    the witness resolution break on the id, so the selected SET is
    engine-stable. Spark plans this as TakeOrderedAndProject (no global
    sort materialization)."""
    s = bm25_scores(df, id_col, text_col, query_terms, k1=k1, b=b)
    return s.orderBy(F.col("score_q").desc(), F.col(id_col)).limit(k)


def bm25_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of bm25_scores — generated from the same terms list,
    constants, and summation order. Term literals are SQL-escaped (the
    bpe._sql_quote pattern) so a term containing an apostrophe cannot
    break or inject into the oracle query."""
    from sheetreader_duckdb_spark.operators.bpe import _sql_quote

    terms = list(query_terms)
    in_list = ", ".join(f"'{_sql_quote(t)}'" for t in terms)
    cases = ", ".join(
        f"SUM(CASE WHEN tok = '{_sql_quote(t)}' THEN __c END) AS __c{i}"
        for i, t in enumerate(terms)
    )
    score = "COALESCE(__c0, 0.0)"
    for i in range(1, len(terms)):
        score = f"({score} + COALESCE(__c{i}, 0.0))"
    return f"""
    (WITH __bt AS (
        SELECT {id_col} AS __id, unnest(string_split(lower({text_col}), ' ')) AS tok
        FROM {table}
    ),
    __bdl AS (SELECT __id, CAST(COUNT(*) AS BIGINT) AS __dl FROM __bt GROUP BY __id),
    __bst AS (SELECT CAST(COUNT(DISTINCT __id) AS BIGINT) AS __n,
                     CAST(COUNT(*) AS BIGINT) AS __tdl FROM __bt),
    __bq AS (SELECT __id, tok FROM __bt WHERE tok IN ({in_list})),
    __btf AS (SELECT __id, tok, CAST(COUNT(*) AS BIGINT) AS __tf
              FROM __bq GROUP BY __id, tok),
    __bdf AS (SELECT tok, CAST(COUNT(DISTINCT __id) AS BIGINT) AS __df
              FROM __bq GROUP BY tok),
    __bc AS (
        SELECT f.__id, f.tok, d.__dl,
               ln(1.0 + (CAST(s.__n AS DOUBLE) - x.__df + 0.5) / (x.__df + 0.5))
               * (f.__tf * {k1 + 1.0!r})
               / (f.__tf + {k1!r} * ({1.0 - b!r} + {b!r}
                  * CAST(d.__dl * s.__n AS DOUBLE) / s.__tdl)) AS __c
        FROM __btf f JOIN __bdf x USING (tok)
                     JOIN __bdl d USING (__id)
                     CROSS JOIN __bst s
    ),
    __bp AS (SELECT __id, CAST(COUNT(*) AS BIGINT) AS matched,
                    CAST(MAX(__dl) AS BIGINT) AS dl, {cases}
             FROM __bc GROUP BY __id)
    SELECT __id AS {id_col}, matched, dl, {score} AS score,
           CAST(floor({score} * {float(BM25_QUANT)!r}) AS BIGINT) AS score_q
    FROM __bp)
    """
