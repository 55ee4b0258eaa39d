"""Excel date-system edge semantics (SURVEY.md §7 hard-part (a)):
the 1900 leap-year bug (phantom 1900-02-29 at serial 60, ECMA-376
§18.17.4.1) and the 1904 date system (``<workbookPr date1904="1"/>``),
plus the <dimension>-served row-count fast path.
"""

from __future__ import annotations

import datetime as dt
import re
import zipfile

import pytest

from sheetreader_duckdb_spark.sources.xlsx import parser as P
from sheetreader_duckdb_spark.sources.xlsx.datasource import row_count
from sheetreader_duckdb_spark.sources.xlsx.writer import write_xlsx

FIXDIR = "/tmp/sheetreader_fixtures"


@pytest.fixture(scope="session")
def sr(spark):
    from sheetreader_duckdb_spark import register

    register(spark)
    return spark


def _read(spark, path, **options):
    r = spark.read.format("sheetreader")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def _raw_serial_xlsx(path: str, serials: list[float], date1904: bool) -> str:
    """Workbook whose column A holds the given RAW date serials (a writer
    can't produce the phantom serial 60 from a real date, so the date style
    is patched onto plain numeric cells after the fact)."""
    rows = [["d", "tag"]] + [[float(s), f"s{i}"] for i, s in enumerate(serials)]
    write_xlsx(path, {"S": rows}, date1904=date1904)
    with zipfile.ZipFile(path) as src:
        items = {n: src.read(n) for n in src.namelist()}
    xml = items["xl/worksheets/sheet1.xml"]
    xml = re.sub(
        rb'<c r="A(\d+)"><v>',
        lambda m: (
            b'<c r="A' + m.group(1) + b'" s="1"><v>'
            if int(m.group(1)) > 1
            else m.group(0)
        ),
        xml,
    )
    items["xl/worksheets/sheet1.xml"] = xml
    with zipfile.ZipFile(path, "w") as zf:
        for n, b in items.items():
            zf.writestr(n, b)
    return path


# -- 1900 system: serials around the phantom leap day ----------------------
SERIALS_1900 = [1, 59, 60, 61, 100, 25569, 36526]
EXPECTED_1900 = [
    dt.date(1900, 1, 1),  # serial 1
    dt.date(1900, 2, 28),  # serial 59
    dt.date(1900, 2, 28),  # serial 60 — phantom 1900-02-29 clamps to Feb 28
    dt.date(1900, 3, 1),  # serial 61 — first serial on the naive mapping
    dt.date(1900, 4, 9),
    dt.date(1970, 1, 1),
    dt.date(2000, 1, 1),
]


def test_1900_leap_bug_serials(sr, tmp_path):
    path = _raw_serial_xlsx(str(tmp_path / "d1900.xlsx"), SERIALS_1900, False)
    got = {r["tag"]: r["d"] for r in _read(sr, path).collect()}
    for i, exp in enumerate(EXPECTED_1900):
        assert got[f"s{i}"] == exp, f"serial {SERIALS_1900[i]}"


def test_1904_system_serials(sr, tmp_path):
    serials = [0, 1, 366, 24107, 35063]
    expected = [
        dt.date(1904, 1, 1) + dt.timedelta(days=s) for s in serials
    ]
    assert expected[3] == dt.date(1970, 1, 1)
    path = _raw_serial_xlsx(str(tmp_path / "d1904.xlsx"), serials, True)
    got = {r["tag"]: r["d"] for r in _read(sr, path).collect()}
    for i, exp in enumerate(expected):
        assert got[f"s{i}"] == exp, f"1904 serial {serials[i]}"


def test_scalar_serial_conversion_matches_both_systems():
    # Unit-level pin of serial_to_epoch_secs, independent of Spark.
    def to_date(serial, date1904):
        secs = P.serial_to_epoch_secs(serial, date1904)
        return dt.date(1970, 1, 1) + dt.timedelta(days=int(secs / 86400.0))

    for s, exp in zip(SERIALS_1900, EXPECTED_1900):
        assert to_date(s, False) == exp
    assert to_date(0, True) == dt.date(1904, 1, 1)
    assert to_date(24107, True) == dt.date(1970, 1, 1)


@pytest.mark.parametrize("date1904", [False, True])
def test_writer_reader_roundtrip_all_eras(sr, tmp_path, date1904):
    dates = [
        dt.date(1900, 1, 1),
        dt.date(1900, 2, 28),
        dt.date(1900, 3, 1),
        dt.date(1904, 1, 1),
        dt.date(1969, 7, 20),
        dt.date(2024, 2, 29),
    ]
    if date1904:
        dates = [d for d in dates if d >= dt.date(1904, 1, 1)]
    path = str(tmp_path / f"rt{int(date1904)}.xlsx")
    rows = [["d", "i"]] + [[d, float(i)] for i, d in enumerate(dates)]
    write_xlsx(path, {"S": rows}, date1904=date1904)
    got = {int(r["i"]): r["d"] for r in _read(sr, path).collect()}
    for i, d in enumerate(dates):
        assert got[i] == d


# -- <dimension> row-count fast path ---------------------------------------
def test_row_count_from_dimension(tmp_path):
    path = str(tmp_path / "dim.xlsx")
    rows = [["k", "v"]] + [[f"r{i}", float(i)] for i in range(250)]
    write_xlsx(path, {"S": rows})
    with P.XlsxWorkbook(path) as wb:
        sheet = wb.resolve_sheet(None, None)
        assert wb.dimension(sheet) == (251, 2)
    # header auto-detected → 250 data rows; metadata and streaming count agree
    # on this dense writer-produced file
    assert row_count(path, trust_dimension=True) == 250
    assert row_count(path) == 250
    # skip_rows consumes the header; the remaining rows are all data
    # (no further header auto-detect fires on a non-string first row)
    assert row_count(path, skip_rows=1) == 250
    assert row_count(path, skip_rows=3, trust_dimension=True) == 248
    assert row_count(path, skip_rows=3) == 248


def test_row_count_without_dimension_falls_back(tmp_path):
    path = str(tmp_path / "nodim.xlsx")
    rows = [["k", "v"]] + [[f"r{i}", float(i)] for i in range(25)]
    write_xlsx(path, {"S": rows})
    with zipfile.ZipFile(path) as src:
        items = {n: src.read(n) for n in src.namelist()}
    items["xl/worksheets/sheet1.xml"] = re.sub(
        rb"<dimension[^/]*/>", b"", items["xl/worksheets/sheet1.xml"]
    )
    with zipfile.ZipFile(path, "w") as zf:
        for n, b in items.items():
            zf.writestr(n, b)
    with P.XlsxWorkbook(path) as wb:
        assert wb.dimension(wb.resolve_sheet(None, None)) is None
    assert row_count(path, trust_dimension=True) == 25
    assert row_count(path) == 25


def test_row_count_sparse_sheet_ignores_stale_dimension(tmp_path):
    """Third-party files can omit empty <row> elements while keeping the
    full <dimension> span; the default (untrusted) count must match what a
    scan actually yields, not the metadata claim (ADVICE r02)."""
    path = str(tmp_path / "sparse.xlsx")
    rows = [["k", "v"]] + [[f"r{i}", float(i)] for i in range(20)]
    write_xlsx(path, {"S": rows})
    with zipfile.ZipFile(path) as src:
        items = {n: src.read(n) for n in src.namelist()}
    sheet_xml = items["xl/worksheets/sheet1.xml"]
    # Drop five data rows but leave the dimension tag untouched → sparse
    # sheet with an over-wide dimension, the untrustworthy-writer shape.
    for victim in range(10, 15):
        sheet_xml = re.sub(
            rb'<row r="%d".*?</row>' % (victim + 2), b"", sheet_xml, flags=re.S
        )
    items["xl/worksheets/sheet1.xml"] = sheet_xml
    with zipfile.ZipFile(path, "w") as zf:
        for n, b in items.items():
            zf.writestr(n, b)
    with P.XlsxWorkbook(path) as wb:
        sheet = wb.resolve_sheet(None, None)
        assert wb.dimension(sheet) == (21, 2)  # stale: claims all rows
        scanned = sum(1 for _ in wb.iter_rows(sheet, skip_rows=1))
    assert scanned == 15
    assert row_count(path) == 15  # default agrees with the scan
    assert row_count(path, trust_dimension=True) == 20  # documented hazard
