"""Trainable model-based quality classifier over the text signals.

The fastText-style quality-filter recipe (e.g. the Common-Crawl-vs-
reference-corpus classifier of Brown et al. 2020 §A, and CCNet's
quality buckets): weak positive labels come from a trusted reference
slice, negatives from the raw pool, and a linear model over cheap
per-document signals replaces the hand-tuned threshold rules of
``text.quality_keep`` with learned weights.

Division of labor — built for the 100 TB shape:

* **Training** (`train_quality_model`): `pyspark.ml` LogisticRegression —
  JVM-distributed LBFGS over however many labeled rows exist. The fitted
  model is K coefficients + an intercept (K = len(features), single-digit),
  collected driver-side; nothing else leaves the cluster.
* **Inference** (`margin_expr` / `score_expr`): the model is re-expressed
  as ONE built-in column expression, `b + Σ wᵢ·fᵢ` (optionally through
  the sigmoid). Corpus scoring therefore runs inside whole-stage codegen
  at scan speed — no ml runtime on the scoring path, no UDF, no shuffle,
  exactly like `text.quality_keep`. A 100 TB corpus pays K fused
  multiply-adds per row.
* **Oracle** (`margin_quantized_sql`): the feature signals are exact
  rationals (bit-identical across engines), and Spark evaluates the
  margin as strict left-associated IEEE arithmetic — but DuckDB may
  contract the multiply-add chain into FMAs (measured 1-ulp drift), so
  the hash witness is the floor-quantized integer margin, not the raw
  double (the sigmoid is transcendental and also stays out). All SQL is
  generated from the SAME coefficient dict as the Spark expressions, so
  Spark and oracle can never desync.

Feature signals reuse operators/text.py (reference semantics:
SURVEY.md §2.3 N4 — the reference's host engine computes per-document
quality stats; the trainable filter is a beyond-reference extension).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.operators import text as X

__all__ = [
    "QUALITY_FEATURES",
    "quality_feature_exprs",
    "quality_feature_sqls",
    "add_quality_features",
    "train_quality_model",
    "margin_expr",
    "margin_sql",
    "margin_quantized_expr",
    "margin_quantized_sql",
    "score_expr",
]

# Ordered feature set: the margin sums in THIS order on both engines.
QUALITY_FEATURES = ("stop_ratio", "punct_ratio", "mean_word_len", "log_n_ws")


def quality_feature_exprs(text: Column, n_chars: Column) -> dict[str, Column]:
    """The model's feature columns (all double), from built-in functions.

    ``log_n_ws`` uses log1p so the empty-ish document maps to a finite
    value; the ratios inherit text.py's exact-rational construction.
    """
    n_ws = X.n_tokens(text)
    return {
        "stop_ratio": (X.stopword_hits(text) / n_ws).cast("double"),
        "punct_ratio": (X.punct_count(text) / n_chars).cast("double"),
        "mean_word_len": X.mean_word_len(text).cast("double"),
        "log_n_ws": F.log1p(n_ws.cast("double")),
    }


def quality_feature_sqls(text_sql: str = "text", n_chars_sql: str = "n_chars") -> dict[str, str]:
    """DuckDB expressions computing the same features, generated against
    the same text.py constants (stopword set, punct class)."""
    stop_set = ", ".join(f"'{w}'" for w in X.STOPWORDS)
    n_ws = f"CAST(len(string_split({text_sql}, ' ')) AS BIGINT)"
    n_stop = (
        f"CAST(len(list_filter(string_split(lower({text_sql}), ' '), "
        f"x -> x IN ({stop_set}))) AS BIGINT)"
    )
    n_punct = (
        f"CAST(length({text_sql}) - length(regexp_replace({text_sql}, "
        f"'{X.PUNCT_CLASS}', '', 'g')) AS BIGINT)"
    )
    mwl = f"(CAST(length(replace({text_sql}, ' ', '')) AS BIGINT) / {n_ws})"
    return {
        "stop_ratio": f"CAST({n_stop} / {n_ws} AS DOUBLE)",
        "punct_ratio": f"CAST({n_punct} / {n_chars_sql} AS DOUBLE)",
        "mean_word_len": f"CAST({mwl} AS DOUBLE)",
        "log_n_ws": f"ln(1 + CAST({n_ws} AS DOUBLE))",
    }


def add_quality_features(
    df: DataFrame, text_col: str = "text", n_chars_col: str = "n_chars"
) -> DataFrame:
    """``df`` plus one double column per QUALITY_FEATURES entry."""
    exprs = quality_feature_exprs(F.col(text_col), F.col(n_chars_col))
    return df.withColumns({name: exprs[name] for name in QUALITY_FEATURES})


def train_quality_model(
    labeled: DataFrame,
    label_col: str = "label",
    features: tuple[str, ...] = QUALITY_FEATURES,
    reg_param: float = 0.0,
    max_iter: int = 100,
) -> dict:
    """Fit the linear quality model; returns {features, weights, intercept}.

    ``labeled`` must carry the feature columns (``add_quality_features``)
    and a 0/1 double/int ``label_col``. Training is pyspark.ml
    LogisticRegression (distributed LBFGS, deterministic for a fixed
    input); coefficients come back in ORIGINAL feature space (Spark
    de-standardizes them), so they drop straight into ``margin_expr``.
    Only K+1 doubles are collected to the driver.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(inputCols=list(features), outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    model = lr.fit(assembler.transform(labeled))
    weights = [float(w) for w in model.coefficients.toArray()]
    return {
        "features": list(features),
        "weights": weights,
        "intercept": float(model.intercept),
    }


def _pairs(model: Mapping) -> list[tuple[str, float]]:
    return list(zip(model["features"], model["weights"], strict=True))


def margin_expr(model: Mapping, feature_cols: Mapping[str, Column]) -> Column:
    """``b + Σ wᵢ·fᵢ`` as one built-in expression, fixed summation order."""
    acc = F.lit(float(model["intercept"]))
    for name, w in _pairs(model):
        acc = acc + F.lit(float(w)) * feature_cols[name]
    return acc


def margin_sql(model: Mapping, feature_sqls: Mapping[str, str]) -> str:
    """DuckDB expression for the same margin — same literals, same order.

    Float literals are rendered with repr (shortest round-trip form), which
    both engines parse to the identical IEEE-754 double. The RESULT can
    still drift by an ulp (DuckDB FMA contraction) — hash-compare through
    ``margin_quantized_sql`` instead of this raw form.
    """
    parts = [repr(float(model["intercept"]))]
    for name, w in _pairs(model):
        parts.append(f"{w!r} * ({feature_sqls[name]})")
    return "(" + " + ".join(parts) + ")"


def margin_quantized_expr(
    model: Mapping, feature_cols: Mapping[str, Column], scale: int = 1_000_000
) -> Column:
    """``floor(margin·scale)`` as BIGINT — the cross-engine hash witness.

    The raw margin is NOT reliably bit-identical across engines: DuckDB's
    expression engine may contract ``a + w·f`` chains into fused
    multiply-adds (measured: a 1-ulp divergence from strict left-assoc
    IEEE, which Spark follows). Floor-quantizing to ``scale`` absorbs
    ulp-level drift while ``|margin|·scale·2⁻⁵² ≪ 1`` — i.e. |margin| up
    to ~1e3 at the default scale, far above any calibrated model's margin
    (the n07 frozen model's are O(10)); beyond that a 1-ulp input drift
    can cross a quantization boundary (pinned with a pathological 1e8
    weight in tests). House integer-quantization convention for float
    witnesses in the declared corpus.
    """
    return F.floor(margin_expr(model, feature_cols) * F.lit(float(scale))).cast("long")


def margin_quantized_sql(
    model: Mapping, feature_sqls: Mapping[str, str], scale: int = 1_000_000
) -> str:
    """DuckDB twin of ``margin_quantized_expr``."""
    return (
        f"CAST(floor({margin_sql(model, feature_sqls)} * {float(scale)!r}) AS BIGINT)"
    )


def score_expr(model: Mapping, feature_cols: Mapping[str, Column]) -> Column:
    """Sigmoid of the margin — the calibrated quality probability.

    Matches ``pyspark.ml``'s LogisticRegressionModel probability output
    (pinned in tests); transcendental, so it stays out of the cross-engine
    oracle and ``margin_sql`` is the witness instead.
    """
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin_expr(model, feature_cols)))
