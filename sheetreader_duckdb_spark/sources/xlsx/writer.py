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
import os
import re
import zipfile
import zlib
from xml.sax.saxutils import escape

from .splitindex import MAX_POINTS, SPLIT_INTERVAL, encode_split_index

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


def _cell_xml(ref: str, v: object, intern, date1904: bool) -> str:
    """One ``<c>`` element (empty string for None — absent cell → NULL on
    read). ``intern`` maps a str to its shared-string index. bool is checked
    before int (bool subclasses int)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, str):
        return f'<c r="{ref}" t="s"><v>{intern(v)}</v></c>'
    if isinstance(v, dt.datetime):
        days = (v - dt.datetime(1970, 1, 1)).total_seconds() / 86400.0
        serial = _date_serial(days, date1904)
        return f'<c r="{ref}" s="1"><v>{_fmt_double(serial)}</v></c>'
    if isinstance(v, dt.date):
        serial = int(_date_serial((v - _EPOCH).days, date1904))
        return f'<c r="{ref}" s="1"><v>{serial}</v></c>'
    if isinstance(v, int):
        return f'<c r="{ref}"><v>{v}</v></c>'
    if isinstance(v, float):
        return f'<c r="{ref}"><v>{_fmt_double(v)}</v></c>'
    raise TypeError(f"Unsupported cell value type: {type(v)}")


def _flush_point(zwf) -> "int | None":
    """Emit a ``Z_FULL_FLUSH`` into an open ``zf.open(name, "w")`` stream
    and return the member-relative compressed offset after it — the seek
    point a reader can start a fresh inflater at (splitindex module doc).

    Reaches into CPython zipfile's ``_ZipWriteFile`` internals
    (``_compressor``/``_fileobj``/``_compress_size``, stable across 3.8+):
    the flush consumes no uncompressed bytes, so CRC and file_size are
    untouched and only the compressed byte count needs adjusting. Returns
    None when the internals are unavailable (alternate Python) — the
    member is then a perfectly normal unindexed deflate stream. A one-time
    round-trip probe (``_flush_probe``) guards against a future SEMANTIC
    change to how ``_compress_size`` feeds the zip metadata: if the
    interpreter's zipfile no longer behaves as patched, indexing turns
    OFF globally instead of mis-sizing members (ADVICE r10)."""
    global _FLUSH_OK
    if _FLUSH_OK is None:
        _FLUSH_OK = _flush_probe()
    if not _FLUSH_OK:
        return None
    try:
        comp = zwf._compressor
        fobj = zwf._fileobj
        size = zwf._compress_size
    except AttributeError:
        return None
    out = comp.flush(zlib.Z_FULL_FLUSH)
    fobj.write(out)
    zwf._compress_size = size + len(out)
    return zwf._compress_size


_FLUSH_OK: "bool | None" = None  # one-time _flush_probe verdict


def _flush_probe() -> bool:
    """Self-test the ``_ZipWriteFile`` surgery on an in-memory zip before
    the first real flush point: write a member with one mid-stream full
    flush, then verify (a) the central directory's ``compress_size``
    matches the bytes actually occupied in the archive, (b) the member
    round-trips byte-identical through a fresh ``ZipFile.read``, and
    (c) a fresh raw inflater started at the recorded offset reproduces
    the post-flush bytes. Any future CPython change to these internals
    fails the probe and degrades every write to a plain unindexed deflate
    stream — never corrupt zip metadata (ADVICE r10)."""
    import io

    head, tail = b"<probe>" * 64, b"</probe>" * 64
    try:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            with zf.open("p", "w") as out:
                data_start = out._fileobj.tell()
                out.write(head)
                comp = out._compressor
                flushed = comp.flush(zlib.Z_FULL_FLUSH)
                out._fileobj.write(flushed)
                out._compress_size += len(flushed)
                coff = out._compress_size
                out.write(tail)
            if zf.getinfo("p").compress_size != zf.fp.tell() - data_start:
                return False
            csize = zf.getinfo("p").compress_size
        raw = buf.getvalue()
        buf.seek(0)
        with zipfile.ZipFile(buf) as zf:
            if zf.read("p") != head + tail:
                return False
        seg = raw[data_start + coff : data_start + csize]
        return zlib.decompressobj(-15).decompress(seg) == tail
    except Exception:
        return False


# One boundary algorithm, one home (r12 consolidation): the fixed-needle
# stream counter now lives in rowstream with the other stream counters;
# the old name stays importable for its call/test sites. ``.count`` is
# exact at every flush point (the property adds completed matches still
# in the carry), so the indexed-member loop below reads it unchanged.
from .rowstream import NeedleStreamCounter as _StraddleCounter  # noqa: E402


def _write_indexed_member(
    zf, name, chunks, boundary: bytes = b"</row>", needle: bytes = b"<row ",
    neg_needle: "bytes | None" = None, on_piece=None,
) -> "tuple[list | None, int]":
    """Stream a zip member with split points: write ``chunks`` (any byte
    slicing) into the member, emitting a full-flush point at the first
    ``boundary`` past every ``SPLIT_INTERVAL`` uncompressed bytes.
    Returns (points, count) where points is the (member-relative
    compressed offset, cumulative ``needle`` count) list — or None when
    indexing is unavailable or the member never reached one interval.
    Worksheets index rows (``</row>`` / ``<row ``); the shared-strings
    heap indexes entries (``</si>`` / ``<si>``). ``neg_needle`` subtracts
    a prefix-colliding element (``<rowB``) so retrofit counts over
    foreign XML agree with ``parser.count_row_starts``. ``name`` may be a
    ZipInfo to preserve foreign member metadata (retrofit). ``on_piece``,
    when given, observes every written piece plus each flush point's
    ordinal — the hook interval statistics ride on (indexer module).

    Past ``MAX_POINTS`` the recorded points thin 2:1 and the interval
    doubles — any subset of valid flush points is a valid (coarser)
    index, and the comment stays bounded for arbitrarily large members."""
    points: list = []
    indexable = True
    interval = SPLIT_INTERVAL
    blen = len(boundary)
    ctr = _StraddleCounter(needle, neg_needle)
    since = 0  # uncompressed bytes written since the last flush point
    with zf.open(name, "w", force_zip64=True) as out:
        for ch in chunks:
            while indexable and since + len(ch) >= interval:
                # Earliest in-chunk boundary past the interval mark —
                # zero buffering: pieces stream straight to the member.
                # (A boundary straddling two chunks is simply not seen;
                # the point lands at the next whole one — any aligned
                # point set is a valid index.)
                cut = ch.find(boundary, max(0, interval - since - blen))
                if cut == -1:
                    break
                cut += blen
                piece, ch = ch[:cut], ch[cut:]
                out.write(piece)
                ctr.feed(piece)
                if on_piece is not None:
                    on_piece(piece, True)
                coff = _flush_point(out)
                if coff is None:
                    indexable = False
                    break
                points.append((coff, ctr.count))
                since = 0
                if len(points) >= MAX_POINTS:
                    points = points[1::2]
                    interval *= 2
            if ch:
                out.write(ch)
                if indexable:
                    ctr.feed(ch)
                    if on_piece is not None:
                        on_piece(ch, False)
                since += len(ch)
    return (points if (indexable and points) else None), ctr.count


def _write_sheet_member(
    zf, name: str, chunks, on_piece=None
) -> "tuple[list | None, int]":
    return _write_indexed_member(
        zf, name, chunks, b"</row>", b"<row ", on_piece=on_piece
    )


def _publish_index(
    zf, name: str, pts, nrows: int, expected_rows: int,
    spts, n_si: int, expected_si: int, stats: "dict | None" = None,
    extra_sheets: "dict | None" = None, sstats: "dict | None" = None,
    ncounts: "dict | None" = None, bcounts: "dict | None" = None,
) -> None:
    """Set the archive comment for whichever validated sections exist —
    shared by both writers and the retrofit indexer (r10 review: the two
    publication blocks had started to diverge). Never index on a lie: a
    byte-counted total that disagrees with the writer's own count drops
    that section (a row/entry-shaped literal slipped through escaping —
    the file itself is still fine, it just loses the optimization). An
    sst-only comment is valid (heap-dominated workbooks whose tiny sheet
    never reaches one interval still get interval heaps + the planner's
    cap lift); ``extra_sheets`` carry additional worksheets of a
    multi-sheet workbook (r11). Size discipline against the 64 KB comment
    ceiling, most valuable sections last to go: stats STRIDE doubles
    first — one (lo, hi) envelope per 2/4/…/16 intervals, all sheets and
    both kinds in lockstep (r12: the SF10 witness showed column-dropping
    silently killed ALL string pruning at 1038 points; coarser claims
    keep every column pruning at reduced granularity) — then stats
    columns drop largest-first (across all sheets and kinds), then whole
    extra-sheet sections largest-first, then the sst section, and the
    primary worksheet section is kept alone as the floor."""
    import json as _json

    from .splitindex import coarsen_count_groups, coarsen_stat_pairs

    if pts and nrows != expected_rows:
        pts = None
    if spts and n_si != expected_si:
        spts = None
    # Deep-copy every stats dict before the shedding loop below may
    # mutate it (`del tgt[col]`): a shallow `dict(v)` shares the inner
    # stats mapping with the CALLER, so overflow retries would silently
    # edit the dicts the caller passed in (ADVICE r12).
    extra = {
        k: {
            **v,
            "stats": dict(v["stats"]) if v.get("stats") else None,
            "sstats": dict(v["sstats"]) if v.get("sstats") else None,
            "ncounts": dict(v["ncounts"]) if v.get("ncounts") else None,
            "bcounts": dict(v["bcounts"]) if v.get("bcounts") else None,
        }
        for k, v in (extra_sheets or {}).items()
    }
    if not pts and not spts and not extra:
        return
    stats = dict(stats) if (stats and pts) else None
    sstats = dict(sstats) if (sstats and pts) else None
    ncounts = dict(ncounts) if (ncounts and pts) else None
    bcounts = dict(bcounts) if (bcounts and pts) else None
    q = 1  # stats stride, lockstep across every section (format's `q`)
    while True:
        for sec in extra.values():
            if (sec.get("stats") or sec.get("sstats") or sec.get("ncounts")
                    or sec.get("bcounts")):
                sec["q"] = q
        try:
            zf.comment = encode_split_index(
                name, pts or [], nrows if pts else 0,
                sst_points=spts, sst_total=expected_si if spts else 0,
                stats=stats, sstats=sstats, ncounts=ncounts,
                bcounts=bcounts,
                extra_sheets=extra or None,
                stats_stride=q,
            )
            return
        except ValueError:
            sections = []
            if stats:
                sections.append(("", "stats", stats))
            if sstats:
                sections.append(("", "sstats", sstats))
            if ncounts:
                sections.append(("", "ncounts", ncounts))
            if bcounts:
                sections.append(("", "bcounts", bcounts))
            for en, sec in extra.items():
                for kind in ("stats", "sstats", "ncounts", "bcounts"):
                    if sec.get(kind):
                        sections.append((en, kind, sec[kind]))
            if sections and q < 16:
                # halve resolution before amputating columns; counts
                # coarsen by group-sum (their own sound merge), bounds
                # by envelope
                q *= 2
                if stats:
                    stats = {k: coarsen_stat_pairs(v) for k, v in stats.items()}
                if sstats:
                    sstats = {
                        k: coarsen_stat_pairs(v) for k, v in sstats.items()
                    }
                if ncounts:
                    ncounts = {
                        k: coarsen_count_groups(v) for k, v in ncounts.items()
                    }
                if bcounts:
                    bcounts = {
                        k: coarsen_count_groups(v) for k, v in bcounts.items()
                    }
                for sec in extra.values():
                    for kind in ("stats", "sstats"):
                        if sec.get(kind):
                            sec[kind] = {
                                k: coarsen_stat_pairs(v)
                                for k, v in sec[kind].items()
                            }
                    for kind in ("ncounts", "bcounts"):
                        if sec.get(kind):
                            sec[kind] = {
                                k: coarsen_count_groups(v)
                                for k, v in sec[kind].items()
                            }
                continue
            if sections:
                _, en, kind, col = max(
                    (len(_json.dumps(stt[k])), en, kind, k)
                    for en, kind, stt in sections
                    for k in stt
                )
                if en == "":
                    tgt = {"stats": stats, "sstats": sstats,
                           "ncounts": ncounts, "bcounts": bcounts}[kind]
                else:
                    tgt = extra[en][kind]
                del tgt[col]
                if not tgt:
                    if en == "" and kind == "stats":
                        stats = None
                    elif en == "" and kind == "sstats":
                        sstats = None
                    elif en == "" and kind == "ncounts":
                        ncounts = None
                    elif en == "":
                        bcounts = None
                    else:
                        extra[en][kind] = None
                continue
            if extra:
                del extra[max(extra, key=lambda e: len(extra[e]["points"]))]
                continue
            if spts:
                spts = None
                continue
            break
    if pts:
        zf.comment = encode_split_index(name, pts, nrows)


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
                cell = _cell_xml(f"{_col_letter(c_idx)}{r_idx}", v, intern, date1904)
                if cell:
                    parts.append(cell)
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
        # The shared-strings heap writes with entry-boundary split points
        # like the incremental writer's (splitindex module doc).
        spts, n_si = _write_indexed_member(
            zf, "xl/sharedStrings.xml",
            iter([sst_xml.encode("utf-8")]), b"</si>", b"<si>",
        )
        # Every sheet writes with split points (r11: multi-sheet workbooks
        # previously carried an index only for sheet 1 — a reader of
        # sheet 2 lost the splittable property). Sheet 1 publishes as the
        # primary section; the rest ride the `m` section, shed first when
        # the comment would overflow.
        pts = None
        nrows = 0
        extra: dict = {}
        row_counts = [len(rows) for rows in sheets.values()]
        for i, xml in enumerate(sheet_xmls):
            name = f"xl/worksheets/sheet{i + 1}.xml"
            pts_i, nrows_i = _write_sheet_member(
                zf, name, iter([xml.encode("utf-8")])
            )
            if i == 0:
                pts, nrows = pts_i, nrows_i
            elif pts_i and nrows_i == row_counts[i]:
                extra[name] = {"n": nrows_i, "points": pts_i}
        _publish_index(
            zf, "xl/worksheets/sheet1.xml", pts, nrows, row_counts[0],
            spts, n_si, len(sst), extra_sheets=extra or None,
        )
    return path


class IncrementalXlsxWriter:
    """Single-sheet XLSX writer with bounded memory: the sink's hot path.

    ``write_xlsx`` holds every row (and the whole sheet XML) in memory —
    fine for fixtures, multiple GiB for a wide 1M-row sink partition. Here
    rows stream through: each ``write_row`` encodes its cells (the same
    ``_cell_xml`` encoder, so output is cell-identical to ``write_xlsx``)
    and appends to a disk spool file; ``close()`` assembles the workbook by
    streaming the spool into the zip entry in chunks. The ``<dimension>``
    tag needs the final row count before the sheet XML's first byte, which
    is exactly why the spool exists.

    Peak Python memory is O(unique strings) — the shared-strings heap is
    the one structure the format forces us to hold (every ``t="s"`` cell
    references an index into it; the reference rejects inline strings,
    sheetreader_extension.cpp:572-575, so spilling strings inline is not
    an option for reference-compatible output) — plus an O(row) encoding
    buffer. Numeric/date/bool-heavy data streams in O(1).
    """

    def __init__(
        self, path: str, sheet_name: str = "Sheet1", date1904: bool = False,
        stats: bool = False,
    ):
        import tempfile

        self.path = path
        self.sheet_name = sheet_name
        self.date1904 = date1904
        # Opt-in per-interval min/max statistics (r11): the close() pass
        # already streams every sheet byte, so the collector rides the
        # same write — but cell-regex + float-fold per interval is a
        # measurable write-path tax, so the sink exposes it as the
        # `index_stats` option rather than paying it on every export.
        self.stats = stats
        self._sst: list[str] = []
        self._sst_index: dict[str, int] = {}
        # The spool lives next to the output path. The distributed sink
        # points that path inside its job-scoped .staging-<job>/ directory,
        # so a hard-killed task's spool is removed with the directory.
        d = os.path.dirname(os.path.abspath(path)) or "."
        self._spool = tempfile.NamedTemporaryFile(
            mode="w+", encoding="utf-8", dir=d, prefix=".xlsxspool-", delete=False
        )
        self.n_rows = 0
        self._n_cols = 0
        self._closed = False

    def _intern(self, s: str) -> int:
        i = self._sst_index.get(s)
        if i is None:
            i = len(self._sst)
            self._sst_index[s] = i
            self._sst.append(s)
        return i

    def write_row(self, row: list | tuple) -> None:
        self.n_rows += 1
        r_idx = self.n_rows
        if len(row) > self._n_cols:
            self._n_cols = len(row)
        parts = [f'<row r="{r_idx}">']
        for c_idx, v in enumerate(row):
            cell = _cell_xml(
                f"{_col_letter(c_idx)}{r_idx}", v, self._intern, self.date1904
            )
            if cell:
                parts.append(cell)
        parts.append("</row>\n")
        self._spool.write("".join(parts))

    def abandon(self) -> None:
        """Drop the spool without producing a workbook (task failure path)."""
        if not self._closed:
            self._closed = True
            self._spool.close()
            try:
                os.remove(self._spool.name)
            except OSError:
                pass

    def close(self) -> str:
        if self._closed:
            return self.path
        self._closed = True
        self._spool.flush()

        sheet_overrides = (
            '<Override PartName="/xl/worksheets/sheet1.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
        wb_pr = '<workbookPr date1904="1"/>' if self.date1904 else ""
        workbook = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"{wb_pr}<sheets>"
            f'<sheet name="{escape(self.sheet_name, {chr(34): "&quot;"})}" sheetId="1" r:id="rId1"/>'
            "</sheets></workbook>"
        )
        wb_rels = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            'Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId2" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
            '<Relationship Id="rId3" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
            "</Relationships>"
        )
        try:
            with zipfile.ZipFile(self.path, "w", zipfile.ZIP_DEFLATED) as zf:
                zf.writestr(
                    "[Content_Types].xml",
                    _CONTENT_TYPES.format(sheet_overrides=sheet_overrides),
                )
                zf.writestr("_rels/.rels", _ROOT_RELS)
                zf.writestr("xl/workbook.xml", workbook)
                zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
                zf.writestr("xl/styles.xml", _STYLES)
                dim = (
                    f'<dimension ref="A1:{_col_letter(max(0, self._n_cols - 1))}'
                    f'{max(1, self.n_rows)}"/>'
                    if self.n_rows and self._n_cols
                    else ""
                )
                head = (
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
                    '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">\n'
                    f"{dim}<sheetData>"
                ).encode("utf-8")

                def _sheet_chunks():
                    yield head
                    # Re-read the spool binary (it was written utf-8 text);
                    # _write_sheet_member does the row-boundary alignment.
                    with open(self._spool.name, "rb") as sf:
                        while True:
                            c = sf.read(1 << 20)
                            if not c:
                                break
                            yield c
                    yield b"</sheetData>\n</worksheet>"

                coll = None
                if self.stats:
                    from .indexer import _IntervalStatsCollector

                    # the sink's own intern heap doubles as the resolver
                    # for string bounds (r12) — already fully populated:
                    # every row hit the spool before close() runs. The
                    # sink's one date style is cellXfs index 1 (_STYLES),
                    # so the count families split exactly (r13).
                    coll = _IntervalStatsCollector(
                        b"", sst=self._sst, date_styles=frozenset({1})
                    )
                pts, nrows = _write_sheet_member(
                    zf, "xl/worksheets/sheet1.xml", _sheet_chunks(),
                    on_piece=coll.on_piece if coll else None,
                )
                def _sst_chunks():
                    yield (
                        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
                        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
                        f'count="{len(self._sst)}" uniqueCount="{len(self._sst)}">'
                    ).encode("utf-8")
                    batch: list[str] = []
                    size = 0
                    for s in self._sst:
                        e = f'<si><t xml:space="preserve">{escape(_xstring(s))}</t></si>'
                        batch.append(e)
                        size += len(e)
                        if size >= (256 << 10):
                            yield "".join(batch).encode("utf-8")
                            batch, size = [], 0
                    if batch:
                        yield "".join(batch).encode("utf-8")
                    yield b"</sst>"

                # Entry-boundary flush points in the heap too: sharded
                # readers then inflate only the heap intervals their rows
                # reference instead of the whole sst per task (splitindex
                # module doc; the string-heavy partsupp witness pays ~1 s
                # of inflate+offset-scan per shard without this).
                spts, n_si = _write_indexed_member(
                    zf, "xl/sharedStrings.xml", _sst_chunks(), b"</si>", b"<si>"
                )
                st, sv, nc, bv = (
                    coll.aligned(pts, nrows) if coll
                    else (None, None, None, None)
                )
                _publish_index(
                    zf, "xl/worksheets/sheet1.xml",
                    pts, nrows, self.n_rows,
                    spts, n_si, len(self._sst),
                    stats=st, sstats=sv, ncounts=nc, bcounts=bv,
                )
        finally:
            self._spool.close()
            try:
                os.remove(self._spool.name)
            except OSError:
                pass
        return self.path
