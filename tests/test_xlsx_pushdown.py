"""Filter pushdown into the XLSX source (SURVEY §7 PR4 reader-side pruning,
Spark 4.1 Python DataSource pushFilters). OPT-IN via filter_pushdown=true:
Spark caches the planned scan per relation and skips re-planning for
filterless queries, so absorbed filters would leak into later unfiltered
reuse of the same DataFrame — default off. Pins: source-level pruning by
Arrow compute before the Python→JVM boundary, end-to-end correctness for
the per-query read shape, no-leak behavior with the default, and the
unsupported-filter passthrough."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNull, StringStartsWith

from sheetreader_duckdb_spark.sources.xlsx.datasource import SheetReaderReader
from sheetreader_duckdb_spark.sources.xlsx.writer import write_xlsx

N_ROWS = 100


@pytest.fixture(scope="module")
def fixture_xlsx(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pd") / "t.xlsx")
    rows = [["name", "qty", "flag"]]
    for i in range(N_ROWS):
        rows.append([f"item{i:03d}", float(i), i % 2 == 0])
    rows.append(["ghost", None, None])
    write_xlsx(p, {"Sheet1": rows})
    return p


def _load(spark, fixture_xlsx, pushdown: bool):
    from sheetreader_duckdb_spark import register

    register(spark)
    r = spark.read.format("sheetreader")
    if pushdown:
        r = r.option("filter_pushdown", "true")
    return r.load(fixture_xlsx)


def _reader(fixture_xlsx, spark, pushdown: bool):
    df = _load(spark, fixture_xlsx, pushdown)
    opts = {"path": fixture_xlsx}
    if pushdown:
        opts["filter_pushdown"] = "true"
    return SheetReaderReader(opts, df.schema)


def test_source_level_filtering(fixture_xlsx, spark):
    """With the option on, rows are dropped inside read(): batches the JVM
    would receive contain only matching rows."""
    reader = _reader(fixture_xlsx, spark, pushdown=True)
    remaining = list(reader.pushFilters([GreaterThan(("qty",), 90.0)]))
    assert remaining == []  # supported → absorbed
    total = sum(b.num_rows for part in reader.partitions() for b in reader.read(part))
    assert total == 9  # qty in (91..99); null row dropped by SQL semantics


def test_partitions_consume_staged_filters(fixture_xlsx, spark):
    """Filters travel plan→partitions once; the next plan starts clean."""
    reader = _reader(fixture_xlsx, spark, pushdown=True)
    list(reader.pushFilters([IsNull(("qty",))]))
    first = reader.partitions()
    assert all(p.filters for p in first)
    second = reader.partitions()  # a later filterless planning pass
    assert all(not p.filters for p in second)
    total = sum(b.num_rows for part in second for b in reader.read(part))
    assert total == N_ROWS + 1  # unfiltered


def test_default_returns_all_filters(fixture_xlsx, spark):
    """Default (option off): nothing absorbed, nothing staged."""
    reader = _reader(fixture_xlsx, spark, pushdown=False)
    fs = [GreaterThan(("qty",), 90.0), IsNull(("qty",))]
    assert list(reader.pushFilters(fs)) == fs
    total = sum(b.num_rows for part in reader.partitions() for b in reader.read(part))
    assert total == N_ROWS + 1


def test_unsupported_filters_returned(fixture_xlsx, spark):
    reader = _reader(fixture_xlsx, spark, pushdown=True)
    unsupported = EqualTo(("nope",), 1)  # unknown column
    out = list(reader.pushFilters([unsupported, IsNull(("qty",))]))
    assert out == [unsupported]
    total = sum(b.num_rows for part in reader.partitions() for b in reader.read(part))
    assert total == 1  # only the ghost row has null qty


def test_end_to_end_per_query_reads(fixture_xlsx, spark):
    """The per-query read shape (fresh load per query) is exact with
    pushdown on: results equal the default-path results."""
    cases = [
        F.col("qty") > 50.0,
        F.col("name").startswith("item00"),
        F.col("flag") & (F.col("qty") < 10.0),
        F.col("qty").isin(1.0, 2.0, 3.0),
        F.col("qty").isNull(),
        F.col("qty").isNotNull() & (F.col("qty") <= 5.0),
        # three-valued-logic traps: NULL NOT IN (...) is NULL → dropped
        ~F.col("qty").isin(1.0, 2.0),
        ~(F.col("qty") > 50.0),
        F.col("qty").isin(1.0, None),  # IN with NULL literal: not absorbed
    ]
    for cond in cases:
        got = sorted(
            tuple(r) for r in _load(spark, fixture_xlsx, True).filter(cond).collect()
        )
        ref = sorted(
            tuple(r) for r in _load(spark, fixture_xlsx, False).filter(cond).collect()
        )
        assert got == ref, f"mismatch for {cond}"


def test_default_no_leak_on_dataframe_reuse(fixture_xlsx, spark):
    """The documented Spark sharp edge: filtered then unfiltered actions on
    ONE loaded DataFrame. With the default (no pushdown) counts are exact."""
    df = _load(spark, fixture_xlsx, False)
    assert df.count() == N_ROWS + 1
    assert df.filter(F.col("qty") > 90.0).count() == 9
    assert df.count() == N_ROWS + 1  # unchanged — no scan-state leak


def test_relation_reuse_boundary_pins_the_optin_rationale(fixture_xlsx, spark):
    """VERDICT r2 item 6: the exact boundary of the Spark 4.1 relation-reuse
    footgun, measured end-to-end. With pushdown ON and ONE loaded DataFrame:

    - distinct filter predicates re-plan correctly (each calls pushFilters);
    - a FILTERLESS query after a filtered one reuses the filtered scan and
      silently returns the filtered row set — which is why the option stays
      opt-in (default off is tested below to never do this).

    If a Spark upgrade makes the filterless reuse return all rows, the
    second assertion here fails — the signal to flip the default on.
    """
    df = _load(spark, fixture_xlsx, pushdown=True)
    assert df.filter(F.col("qty") >= 95.0).count() == 5  # pred 1
    assert df.filter(F.col("qty") < 5.0).count() == 5    # pred 2: re-planned
    # The footgun: filterless reuse of the same DataFrame after a filtered
    # query does NOT re-plan — it reuses pred 2's filtered scan.
    assert df.count() == 5  # would be N_ROWS + 1 if Spark re-planned

    # Fresh read chains are always safe (each builds its own relation).
    assert _load(spark, fixture_xlsx, pushdown=True).count() == N_ROWS + 1

    # Default (off): filtered then filterless reuse returns every row.
    df_off = _load(spark, fixture_xlsx, pushdown=False)
    assert df_off.filter(F.col("qty") >= 95.0).count() == 5
    assert df_off.count() == N_ROWS + 1


def test_read_xlsx_where_is_safe_by_construction(spark, fixture_xlsx):
    """read_xlsx(where=...) binds the filter into the scan definition:
    correct rows, no cross-contamination between two scans of the same
    path with different predicates, and composable with columns=."""
    from sheetreader_duckdb_spark import read_xlsx

    hi = read_xlsx(spark, fixture_xlsx, where="qty > 95.0")
    lo = read_xlsx(spark, fixture_xlsx, where="qty < 3.0")
    assert sorted(r.name for r in hi.collect()) == [
        f"item{i:03d}" for i in range(96, N_ROWS)
    ]
    assert sorted(r.name for r in lo.collect()) == ["item000", "item001", "item002"]
    # the unfiltered scan of the same path remains complete (the reuse
    # hazard the raw option has cannot occur through this API)
    assert read_xlsx(spark, fixture_xlsx).count() == N_ROWS + 1
    pruned = read_xlsx(
        spark, fixture_xlsx, columns=["qty"], where="qty > 95.0"
    )
    assert pruned.columns == ["qty"]
    assert pruned.count() == N_ROWS - 96
