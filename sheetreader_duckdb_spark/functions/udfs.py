"""Vectorized (Arrow-batched) pandas UDFs.

NOTE: deliberately NO ``from __future__ import annotations`` here — pandas_udf
infers the eval type from *resolved* type hints, and postponed annotations
(strings) break that inference in PySpark 4.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def whitespace_token_count(text: pd.Series) -> pd.Series:
    """Number of single-space-split tokens — matches DuckDB
    ``len(string_split(text, ' '))`` (empty string → 1, like SQL)."""
    return text.str.split(" ").str.len().astype("int64")
