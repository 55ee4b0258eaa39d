"""SQL table-function form ``sheetreader(path, ...)`` (sources/xlsx/udtf.py):
invocation parity with the reference's one public interface
(sheetreader_extension.cpp:950-967; demo_community.sql:13), semantics
identical to the format reader by construction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sheetreader_duckdb_spark.sources.xlsx.writer import write_xlsx


@pytest.fixture(scope="module")
def demo_xlsx(tmp_path_factory):
    # The reference's docker-demo/test.xlsx content (golden output at
    # docker-demo/README.md:46-56: Alice 30.0 New York / Bob 25.0 London).
    p = str(tmp_path_factory.mktemp("udtf") / "demo.xlsx")
    write_xlsx(
        p,
        {
            "Sheet1": [
                ["Name", "Age", "City"],
                ["Alice", 30.0, "New York"],
                ["Bob", 25.0, "London"],
            ]
        },
    )
    return p


@pytest.fixture(scope="module")
def registered(spark):
    import sheetreader_duckdb_spark as sr

    sr.register(spark)
    return spark


def test_demo_golden_output(registered, demo_xlsx):
    rows = registered.sql(
        f"SELECT * FROM sheetreader('{demo_xlsx}')"
    ).collect()
    assert [tuple(r) for r in rows] == [
        ("Alice", 30.0, "New York"),
        ("Bob", 25.0, "London"),
    ]
    # Schema parity with the documented golden output: varchar, double, varchar.
    df = registered.sql(f"SELECT * FROM sheetreader('{demo_xlsx}')")
    assert df.schema.simpleString() == "struct<Name:string,Age:double,City:string>"


def test_count_star(registered, demo_xlsx):
    # demo_community.sql:18's second query.
    n = registered.sql(
        f"SELECT COUNT(*) AS n FROM sheetreader('{demo_xlsx}')"
    ).collect()[0]["n"]
    assert n == 2


def test_named_arguments_match_format_reader(registered, demo_xlsx):
    sql_df = registered.sql(
        f"SELECT * FROM sheetreader('{demo_xlsx}', skip_rows => 1, "
        "types => 'VARCHAR,VARCHAR,VARCHAR', force_types => true)"
    )
    fmt_df = (
        registered.read.format("sheetreader")
        .options(skip_rows="1", types="VARCHAR,VARCHAR,VARCHAR", force_types="true")
        .load(demo_xlsx)
    )
    assert sql_df.schema == fmt_df.schema
    assert sorted(map(tuple, sql_df.collect())) == sorted(map(tuple, fmt_df.collect()))


def test_sheet_selection_conflict_errors(registered, demo_xlsx):
    # The reference's mutual-exclusion error (sheetreader_extension.cpp:683-685)
    # surfaces through the SQL form too.
    with pytest.raises(Exception, match="at the same time"):
        registered.sql(
            f"SELECT * FROM sheetreader('{demo_xlsx}', "
            "sheet_index => 1, sheet_name => 'Sheet1')"
        ).collect()


def test_non_literal_path_rejected(registered, demo_xlsx):
    # Schema needs the file at plan time (the reference's bind step).
    with pytest.raises(Exception, match="literal"):
        registered.sql(
            "SELECT * FROM sheetreader(concat('/no/', rand()::string))"
        ).collect()


def test_unknown_named_argument_rejected(registered, demo_xlsx):
    # The reference's table function errors on unknown named parameters;
    # a typo must not silently read with defaults.
    with pytest.raises(Exception, match="unknown named argument"):
        registered.sql(
            f"SELECT * FROM sheetreader('{demo_xlsx}', shet_index => 2)"
        ).collect()
