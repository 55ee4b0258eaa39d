"""Inline / dynamic string support (beyond reference, opt-in): the reference
errors on t="str" / t="inlineStr" cells (sheetreader_extension.cpp:572-575)
and so does our default; `inline_strings=true` accepts them — third-party
writers (pandas to_excel w/o shared strings, streaming writers) emit these
constantly. Covers the regex fast path (t="str" in <v>), the fragment/expat
fallback (inlineStr <is><t>), rich-text runs, entity unescaping, and header
detection from inline cells."""

from __future__ import annotations

import zipfile

import pytest

from sheetreader_duckdb_spark.sources.xlsx import parser as P

_WORKBOOK = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>"""

_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1"
 Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"
 Target="worksheets/sheet1.xml"/></Relationships>"""

_SHEET = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
<c r="A1" t="inlineStr"><is><t>name</t></is></c>
<c r="B1" t="inlineStr"><is><t>qty</t></is></c>
</row>
<row r="2">
<c r="A2" t="inlineStr"><is><t>alpha &amp; beta</t></is></c>
<c r="B2"><v>3</v></c>
</row>
<row r="3">
<c r="A3" t="str"><v>cached &lt;formula&gt; result</v></c>
<c r="B3"><v>4.5</v></c>
</row>
<row r="4">
<c r="A4" t="inlineStr"><is><r><t>rich </t></r><r><t>text</t></r></is></c>
<c r="B4"><v>5</v></c>
</row>
<row r="5">
<c r="A5" t="inlineStr"><is><t>Tokyo</t><rPh sb="0" eb="2"><t>phonetic</t></rPh><phoneticPr fontId="1"/></is></c>
<c r="B5"><v>6</v></c>
</row>
</sheetData></worksheet>"""


@pytest.fixture()
def inline_xlsx(tmp_path):
    p = str(tmp_path / "inline.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _RELS)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET)
    return p


def test_default_raises_reference_error(inline_xlsx):
    with P.XlsxWorkbook(inline_xlsx) as wb:
        with pytest.raises(ValueError, match="Inline & dynamic String"):
            list(wb.iter_rows(wb.sheets[0]))


def test_inline_rows_parsed(inline_xlsx):
    with P.XlsxWorkbook(inline_xlsx, allow_inline=True) as wb:
        rows = list(wb.iter_rows(wb.sheets[0]))
    assert rows[0] == [(0, P.T_STRING_LIT, "name"), (1, P.T_STRING_LIT, "qty")]
    assert rows[1][0] == (0, P.T_STRING_LIT, "alpha & beta")
    assert rows[2][0] == (0, P.T_STRING_LIT, "cached <formula> result")
    assert rows[3][0] == (0, P.T_STRING_LIT, "rich text")  # rich-text runs joined
    # phonetic (furigana) runs are annotation, not cell text
    assert rows[4][0] == (0, P.T_STRING_LIT, "Tokyo")


def test_spark_read_with_option(spark, inline_xlsx):
    from sheetreader_duckdb_spark import register

    register(spark)
    df = (
        spark.read.format("sheetreader")
        .option("inline_strings", "true")
        .load(inline_xlsx)
    )
    assert df.columns == ["name", "qty"]  # header auto-detected from inline row
    got = {(r["name"], r["qty"]) for r in df.collect()}
    assert got == {
        ("alpha & beta", 3.0),
        ("cached <formula> result", 4.5),
        ("rich text", 5.0),
        ("Tokyo", 6.0),
    }


def test_spark_read_without_option_errors(spark, inline_xlsx):
    from sheetreader_duckdb_spark import register

    register(spark)
    with pytest.raises(Exception, match="Inline & dynamic String"):
        spark.read.format("sheetreader").load(inline_xlsx).collect()


def test_inline_strings_decode_st_xstring(tmp_path):
    """ST_Xstring _xHHHH_ escapes must decode identically whether the writer
    used the sst heap or inline/literal storage (ADVICE r02): a CR encoded
    as _x000D_ reads as '\\r' on the t="str" regex path AND the inlineStr
    fragment path, and _x005F_xHHHH_ stays a literal _xHHHH_."""
    sheet = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
<c r="A1" t="str"><v>a_x000D_b</v></c>
<c r="B1" t="inlineStr"><is><t>c_x000D_d</t></is></c>
<c r="C1" t="str"><v>e_x005F_x000D_f</v></c>
</row>
</sheetData></worksheet>"""
    p = str(tmp_path / "xstr.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    with P.XlsxWorkbook(p, allow_inline=True) as wb:
        [row] = list(wb.iter_rows(wb.sheets[0]))
    assert row == [
        (0, P.T_STRING_LIT, "a\rb"),
        (1, P.T_STRING_LIT, "c\rd"),
        (2, P.T_STRING_LIT, "e_x000D_f"),
    ]
