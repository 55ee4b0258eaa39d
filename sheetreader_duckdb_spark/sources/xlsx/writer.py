"""Minimal XLSX writer — pure stdlib. Serves two roles:

1. Test-fixture generation (FIXTURES.md §A) — openpyxl is not available in
   this environment, and we need real ZIP + sheet XML + sharedStrings files
   in exactly the shape the reference consumes (its demo file
   /root/reference/docker-demo/test.xlsx has this layout).
2. A write-back sink for the Spark data source (beyond-reference extension —
   the reference is read-only).

Strings are written to the shared-strings heap (``t="s"``), never inline —
the reference rejects inline/dynamic strings
(/root/reference/src/sheetreader_extension.cpp:572-575), so fixtures written
here are reference-compatible. Dates are numeric serials styled with the
built-in date format (numFmtId=14); booleans ``t="b"``; numbers plain.

Doubles are serialized with ``repr()`` (shortest round-trip form) so read-back
is bit-exact.
"""

from __future__ import annotations

import datetime as dt
import re
import zipfile
from xml.sax.saxutils import escape

# SpreadsheetML ST_Xstring escaping (ECMA-376 §22.9.2.19): characters that
# cannot appear in XML 1.0 (C0 controls except tab/newline, plus CR, which
# XML parsers would normalize away) are written as _xHHHH_; a literal
# _xHHHH_ in the text gets its underscore escaped as _x005F_xHHHH_.
_XESC_LITERAL = re.compile(r"_x[0-9A-Fa-f]{4}_")
_XESC_INVALID = re.compile("[\x00-\x08\x0b-\x1f]")


def _xstring(s: str) -> str:
    if "_x" in s:
        s = _XESC_LITERAL.sub(lambda m: "_x005F" + m.group(0), s)
    return _XESC_INVALID.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

# Style index 1 (s="1") carries the built-in date format numFmtId=14.
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
<cellXfs count="2">
<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
<xf numFmtId="14" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
</cellXfs>
</styleSheet>"""

_EPOCH = dt.date(1970, 1, 1)


def _date_serial(days_since_epoch: float, date1904: bool) -> float:
    """Days-since-unix-epoch → Excel serial for the chosen date system,
    inverse of parser.serial_to_epoch_secs: 1904 system is a plain offset;
    1900 system serials < 61 sit one day below the naive mapping because of
    the phantom 1900-02-29 (ECMA-376 §18.17.4.1)."""
    if date1904:
        return days_since_epoch + 24107
    serial = days_since_epoch + 25569
    return serial if serial >= 61 else serial - 1


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _fmt_double(v: float) -> str:
    r = repr(float(v))
    return r


def write_xlsx(
    path: str, sheets: dict[str, list[list[object]]], date1904: bool = False
) -> str:
    """Write ``{sheet_name: rows}``; each row is a list of cell values.

    Cell encoding by Python type: str → shared string; bool → t="b";
    int/float → numeric; datetime.date → date serial with date style;
    None → omitted (absent cell → NULL on read, SURVEY.md §1.4).
    ``date1904=True`` writes a 1904-date-system workbook
    (``<workbookPr date1904="1"/>``, classic Mac Excel); either way date
    serials are encoded with the system's epoch and the 1900 system's
    phantom-leap-day adjustment, so read-back is exact for any date.
    Each sheet carries a ``<dimension>`` tag (row/col span) so readers can
    serve row counts from metadata.
    """
    sst: list[str] = []
    sst_index: dict[str, int] = {}

    def intern(s: str) -> int:
        i = sst_index.get(s)
        if i is None:
            i = len(sst)
            sst_index[s] = i
            sst.append(s)
        return i

    sheet_xmls: list[str] = []
    for rows in sheets.values():
        n_rows = len(rows)
        n_cols = max((len(r) for r in rows), default=0)
        dim = (
            f'<dimension ref="A1:{_col_letter(max(0, n_cols - 1))}{max(1, n_rows)}"/>'
            if n_rows and n_cols
            else ""
        )
        parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
                 '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">\n'
                 f"{dim}<sheetData>"]
        for r_idx, row in enumerate(rows, start=1):
            parts.append(f'<row r="{r_idx}">')
            for c_idx, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{_col_letter(c_idx)}{r_idx}"
                if isinstance(v, bool):
                    parts.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
                elif isinstance(v, str):
                    parts.append(f'<c r="{ref}" t="s"><v>{intern(v)}</v></c>')
                elif isinstance(v, dt.datetime):
                    days = (v - dt.datetime(1970, 1, 1)).total_seconds() / 86400.0
                    serial = _date_serial(days, date1904)
                    parts.append(f'<c r="{ref}" s="1"><v>{_fmt_double(serial)}</v></c>')
                elif isinstance(v, dt.date):
                    serial = int(_date_serial((v - _EPOCH).days, date1904))
                    parts.append(f'<c r="{ref}" s="1"><v>{serial}</v></c>')
                elif isinstance(v, int):
                    parts.append(f'<c r="{ref}"><v>{v}</v></c>')
                elif isinstance(v, float):
                    parts.append(f'<c r="{ref}"><v>{_fmt_double(v)}</v></c>')
                else:
                    raise TypeError(f"Unsupported cell value type: {type(v)}")
            parts.append("</row>\n")
        parts.append("</sheetData>\n</worksheet>")
        sheet_xmls.append("".join(parts))

    n = len(sheets)
    sheet_overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        f'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(n)
    )
    wb_sheets = "".join(
        f'<sheet name="{escape(name, {chr(34): "&quot;"})}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(sheets)
    )
    wb_pr = '<workbookPr date1904="1"/>' if date1904 else ""
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"{wb_pr}<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels_items = "".join(
        f'<Relationship Id="rId{i + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(n)
    )
    wb_rels_items += (
        f'<Relationship Id="rId{n + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        f'<Relationship Id="rId{n + 2}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f"{wb_rels_items}</Relationships>"
    )
    sst_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(sst)}" uniqueCount="{len(sst)}">'
        + "".join(f"<si><t xml:space=\"preserve\">{escape(_xstring(s))}</t></si>" for s in sst)
        + "</sst>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=sheet_overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/styles.xml", _STYLES)
        zf.writestr("xl/sharedStrings.xml", sst_xml)
        for i, xml in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
    return path
