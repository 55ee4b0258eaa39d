"""Expression-level utilities shared by the operator library."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["bind_once"]


def bind_once(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and reference it many times: wrap it in a
    1-element array and apply ``body`` through a ``transform`` lambda, so
    downstream references are a NamedLambdaVariable — not copies of the
    producing subtree.

    Catalyst inlines a producing expression at EVERY reference site; when
    the producer is heavy (a per-element hash chain, an integer-quantize
    transform) and the references live inside per-window or per-codebook
    lambdas, evaluation goes superlinear in the reference count. Measured
    on winnowing fingerprints: 82 s for 50 docs unbound, ~0.5 s bound
    (operators/fingerprint.py); the PQ witness encode had the same shape
    (the quantized vector referenced once per codebook entry). The DuckDB
    oracle twins get the identical sharing from a ``SELECT … AS x``
    subquery, which is why only the Spark side needs this helper.
    """
    return F.get(F.transform(F.array(value), body), 0)
