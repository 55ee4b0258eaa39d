"""Dense-row fast path (parser.build_dense_row_re + datasource wiring).

The dense path only engages from the second 4 MB chunk of a file, so these
tests build a workbook big enough to span several chunks, plant rows that
deviate from the template shape (absent cells, empty rows) in later chunks,
and pin that (a) results are byte-identical to the row-path implementation
(a fully independent scan: iter_rows + per-cell dispatch), and (b) the
planted irregular rows keep exact NULL semantics. No SparkSession needed —
the reader API is driven directly.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from sheetreader_duckdb_spark.sources.xlsx import datasource as DS
from sheetreader_duckdb_spark.sources.xlsx import parser as P
from sheetreader_duckdb_spark.sources.xlsx.writer import IncrementalXlsxWriter

N_ROWS = 60_000  # ~7 MB of sheet XML -> 2-3 chunks at the 4 MB chunk size
IRREGULAR = {20_000: "absent_b", 40_000: "empty_row"}  # planted, chunk 2+


@pytest.fixture(scope="module")
def big_xlsx(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dense") / "big.xlsx")
    w = IncrementalXlsxWriter(path, "Sheet1")
    w.write_row(["name", "qty", "price"])
    for i in range(N_ROWS):
        kind = IRREGULAR.get(i)
        if kind == "absent_b":
            w.write_row([f"r{i}", None, float(i) + 0.25])
        elif kind == "empty_row":
            w.write_row([None, None, None])
        else:
            w.write_row([f"r{i}", float(i % 50), float(i) + 0.25])
    w.close()
    return path


SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("qty", DoubleType()),
        StructField("price", DoubleType()),
    ]
)


def _collect(options):
    reader = DS.SheetReaderReader(options, SCHEMA)
    rows: list[tuple] = []
    for part in reader.partitions():
        for batch in reader.read(part):
            cols = [c.to_pylist() for c in batch.columns]
            rows.extend(zip(*cols))
    return rows


def test_dense_engages_on_this_shape(big_xlsx):
    # Guard: the fixture's template row must actually compile a dense
    # pattern — otherwise every assertion below silently tests only the
    # generic path.
    built = P.build_dense_row_re(
        b'<c r="A2" t="s"><v>3</v></c><c r="B2"><v>1.0</v></c>'
        b'<c r="C2"><v>2.0</v></c>',
        [0, 1, 2],
        [0, 1, 1],
        frozenset(),
    )
    assert built is not None
    regex, out_slots = built
    assert out_slots == [0, 1, 2]
    assert regex.findall(
        b'<row r="9"><c r="A9" t="s"><v>7</v></c><c r="B9"><v>8.5</v></c>'
        b'<c r="C9"><v>9.5</v></c></row>'
    ) == [(b"7", b"8.5", b"9.5")]


def test_dense_matches_row_path_and_null_semantics(big_xlsx):
    dense = _collect({"path": big_xlsx, "threads": "1"})
    # inline_strings routes through _read_rows (iter_rows + per-cell
    # dispatch) — an independent implementation of the same semantics.
    rowpath = _collect({"path": big_xlsx, "threads": "1", "inline_strings": "true"})
    assert len(dense) == N_ROWS
    assert dense == rowpath
    assert dense[20_000] == ("r20000", None, 20000.25)
    assert dense[40_000] == (None, None, None)
    assert dense[0] == ("r0", 0.0, 0.25)
    assert dense[N_ROWS - 1] == (f"r{N_ROWS - 1}", (N_ROWS - 1) % 50, N_ROWS - 1 + 0.25)


def test_dense_sharded_equals_single(big_xlsx):
    single = _collect({"path": big_xlsx, "threads": "1"})
    sharded = _collect({"path": big_xlsx, "threads": "4"})
    key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    assert sorted(single, key=key) == sorted(sharded, key=key)


def test_dense_pruned_read(big_xlsx):
    reader = DS.SheetReaderReader(
        {"path": big_xlsx, "threads": "1", "columns": "price,name"},
        StructType(
            [StructField("name", StringType()), StructField("price", DoubleType())]
        ),
    )
    rows = []
    for part in reader.partitions():
        for batch in reader.read(part):
            rows.extend(zip(*[c.to_pylist() for c in batch.columns]))
    assert len(rows) == N_ROWS
    assert rows[123] == ("r123", 123.25)
    assert rows[40_000] == (None, None)


def test_template_rejects_type_disagreement():
    # force_types semantics: if the schema expects DOUBLE where the
    # template carries a shared string, dense must refuse (the generic
    # path yields NULL for the mismatch — dense would yield bytes).
    assert (
        P.build_dense_row_re(
            b'<c r="A2" t="s"><v>3</v></c><c r="B2"><v>1.0</v></c>',
            [0, 1],
            [1, 1],  # schema says DOUBLE for the t="s" column
            frozenset(),
        )
        is None
    )


def test_template_rejects_absent_and_unordered():
    assert (
        P.build_dense_row_re(
            b'<c r="A2" t="s"><v>3</v></c><c r="B2"/>', [0, 1], [0, 1], frozenset()
        )
        is None
    )
    # duplicate column letters can't cover the schema
    assert (
        P.build_dense_row_re(
            b'<c r="A2"><v>1</v></c><c r="A2"><v>2</v></c>',
            [0, 1],
            [1, 1],
            frozenset(),
        )
        is None
    )


def test_row_count_primitives_agree_on_xml_whitespace():
    """ADVICE r7: assigned chunks count rows with _ROW_COUNT_RE while
    unassigned chunks use count_row_starts (bytes.count); a writer
    emitting `<row\\n` (legal XML whitespace) must count identically on
    both, or sharded readers desync rows_seen and mis-apply skip_rows."""
    from sheetreader_duckdb_spark.sources.xlsx import parser as P

    body = (
        b'<sheetData><row r="1"><c r="A1"><v>1</v></c></row>'
        b'<row\n r="2"><c r="A2"><v>2</v></c></row>'
        b'<row\t r="3"/><row>\x3c/row>'
        b'<rowBreaks count="1"><brk id="1"/></rowBreaks></sheetData>'
    )
    assert len(P._ROW_COUNT_RE.findall(body)) == P.count_row_starts(body) == 4


def test_shared_string_heap_lazy_matches_expat():
    """SharedStringHeap (the sharded-read lazy heap) decodes every entry
    identically to the expat walk: entities, xml:space, empty forms,
    ST_Xstring; rich-text runs fall back to the full parse."""
    from sheetreader_duckdb_spark.sources.xlsx import parser as P

    doc = (
        b'<?xml version="1.0"?><sst xmlns="x" count="7" uniqueCount="7">'
        b'<si><t>a &amp; b &lt;c&gt; &#233;</t></si>'
        b'<si><t xml:space="preserve"> lead </t></si>'
        b'<si/><si><t/></si><si><t>_x000D_ cr</t></si>'
        b'<si><t></t></si><si><t>tail</t></si></sst>'
    )
    heap = P.SharedStringHeap(doc)
    want = P._parse_sst_expat(doc)
    assert len(heap) == len(want) == 7
    assert [heap[i] for i in range(len(heap))] == want
    assert heap.decode_many([6, 0, 3]) == [want[6], want[0], want[3]]
    # rich-text entry: per-entry regex can't match -> one full-parse
    # fallback, identical results
    rich = b'<sst><si><r><t>a</t></r><r><t>b</t></r></si><si><t>c</t></si></sst>'
    lazy = P.SharedStringHeap(rich)
    assert [lazy[0], lazy[1]] == P._parse_sst_expat(rich) == ["ab", "c"]


def test_string_heavy_sharded_read_equals_single_thread(spark, tmp_path):
    """Auto-sharded read of a unique-string-heavy sheet (the partsupp
    shape, where each shard lazily decodes only its own referenced heap
    entries) returns exactly the single-thread rows."""
    from sheetreader_duckdb_spark.sources.xlsx.writer import IncrementalXlsxWriter
    from sheetreader_duckdb_spark import register

    register(spark)
    path = str(tmp_path / "strings.xlsx")
    w = IncrementalXlsxWriter(path, "Sheet1")
    w.write_row(["k", "comment"])
    for i in range(5000):
        w.write_row([float(i), f"unique comment {i} " + "x" * (i % 37)])
    w.close()
    one = spark.read.format("sheetreader").option("threads", 1).load(path)
    many = spark.read.format("sheetreader").option("threads", 8).load(path)
    r1 = sorted(map(tuple, one.collect()))
    r8 = sorted(map(tuple, many.collect()))
    assert r1 == r8 and len(r1) == 5000


def test_sst_comment_and_cdata_fall_back_to_expat():
    """An XML comment containing a well-formed <si> would BOTH count and
    regex-match (a phantom heap entry no count check catches), and it
    would shift every later lazy-heap offset — both paths must hand such
    documents to expat."""
    from sheetreader_duckdb_spark.sources.xlsx import parser as P

    doc = (
        b'<sst count="2" uniqueCount="2">'
        b'<!-- <si><t>phantom</t></si> -->'
        b'<si><t>real one</t></si><si><t>real two</t></si></sst>'
    )
    want = ["real one", "real two"]
    assert P._parse_sst_fast(doc) is None
    assert P._parse_sst_expat(doc) == want
    heap = P.SharedStringHeap(doc)
    assert [heap[0], heap[1]] == want and len(heap) == 2
    assert heap.decode_many([1, 0]) == ["real two", "real one"]


def test_auto_shard_cap_matrix(spark, tmp_path, monkeypatch):
    """VERDICT r8 task 5: the AUTO shard cap is cluster-aware —
    max(32, defaultParallelism), or the max_shards reader option — over a
    mocked (file size × parallelism) matrix; explicit threads never cap."""
    import os as _os

    from pyspark.sql.types import StructType, StructField, DoubleType

    from sheetreader_duckdb_spark.sources.xlsx import datasource as DS

    path = str(tmp_path / "m.xlsx")
    with open(path, "wb") as f:
        f.write(b"\x00")
    schema = StructType([StructField("x", DoubleType())])

    def reader(parallelism=None, **opts):
        # The REAL plumbing (ADVICE r9): default_parallelism is what
        # register(spark) captures onto the pickled class — no mock of
        # _auto_shard_cap, the cap math itself runs.
        return DS.SheetReaderReader(
            {"path": path, **opts}, schema, default_parallelism=parallelism
        )

    def n_parts(r, size_mb, parallelism=None):
        monkeypatch.setattr(
            _os.path, "getsize", lambda _p: size_mb << 20
        )
        if parallelism is not None:
            r._default_parallelism = parallelism
        return len(r.partitions())

    r = reader()
    # small file: 1 shard per MB regardless of cluster size
    assert n_parts(r, 3, 1000) == 3
    # local[32]-era behavior preserved: big file, small cluster → 32
    assert n_parts(r, 4096, 32) == 32
    # big file + big cluster → parallelism-sized fan-out
    assert n_parts(r, 4096, 1000) == 1000
    # cap still binds by size: 100 MB on 1000 cores → 100 shards
    assert n_parts(r, 100, 1000) == 100
    # explicit max_shards option wins over cluster size
    assert n_parts(reader(max_shards="8"), 4096, 1000) == 8
    # explicit threads is never capped
    assert n_parts(reader(threads="48"), 1, 4) == 48
    # the real _auto_shard_cap honors the option and the 32 floor
    assert DS._auto_shard_cap(7) == 7
    assert DS._auto_shard_cap(None) >= 32


def test_coerce_sharded_read_equals_single_thread(spark, tmp_path):
    """VERDICT r8 task 2: coerce_to_string now shards like any other read
    (chunk round-robin on the row path, lazy per-shard heap) — sharded
    rows must be exactly the single-thread rows, including the fixed-6
    float / TRUE-FALSE / ISO-date coercions."""
    from sheetreader_duckdb_spark.sources.xlsx.writer import IncrementalXlsxWriter
    from sheetreader_duckdb_spark import register

    register(spark)
    path = str(tmp_path / "coerce.xlsx")
    w = IncrementalXlsxWriter(path, "Sheet1")
    w.write_row(["k", "v", "comment"])
    for i in range(4000):
        w.write_row([float(i), float(i) * 1.5 + 0.25, f"text {i} " + "y" * (i % 23)])
    w.close()
    mk = lambda t: (  # noqa: E731
        spark.read.format("sheetreader")
        .option("types", "VARCHAR,VARCHAR,VARCHAR")
        .option("coerce_to_string", True)
        .option("threads", t)
        .load(path)
    )
    one, many = mk(1), mk(8)
    assert [f.dataType.simpleString() for f in many.schema.fields] == [
        "string", "string", "string"
    ]
    r1 = sorted(map(tuple, one.collect()))
    r8 = sorted(map(tuple, many.collect()))
    assert r1 == r8 and len(r1) == 4000
    assert r1[0][0].endswith(".000000")  # fixed-6 coercion intact


def test_row_path_sharded_skip_rows(spark, tmp_path):
    """skip_rows accounting is GLOBAL across row-path shards: unassigned
    chunks are row-counted so every shard agrees on row ordinals."""
    from sheetreader_duckdb_spark.sources.xlsx.writer import IncrementalXlsxWriter
    from sheetreader_duckdb_spark import register

    register(spark)
    path = str(tmp_path / "skip.xlsx")
    w = IncrementalXlsxWriter(path, "Sheet1")
    w.write_row(["a", "b"])
    for i in range(3000):
        w.write_row([float(i), f"s{i}"])
    w.close()
    mk = lambda t: (  # noqa: E731
        spark.read.format("sheetreader")
        .option("types", "VARCHAR,VARCHAR")
        .option("coerce_to_string", True)
        .option("skip_rows", 500)
        .option("threads", t)
        .load(path)
    )
    r1 = sorted(map(tuple, mk(1).collect()))
    r6 = sorted(map(tuple, mk(6).collect()))
    assert r1 == r6 and len(r1) == 2501  # header consumed, 500 skipped


def _prefixed_workbook_parts():
    """The non-worksheet members of a minimal namespace-prefixed package."""
    ct = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb_rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    wb_xml = (
        '<?xml version="1.0"?>'
        '<x:workbook xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<x:sheets><x:sheet name="S" sheetId="1" r:id="rId1"/></x:sheets></x:workbook>'
    )
    return ct, rels, wb_rels, wb_xml


def test_expat_fallback_sharded_parses_once(tmp_path, spark):
    """A namespace-prefixed worksheet scans on the SHARDED fast tier since
    r10 (prefix-parameterized patterns) — previously it defeated to a
    whole-file expat parse pinned to shard 0. Sharded result identical to
    single-thread, no duplicates, and the fast tier provably engages."""
    import zipfile

    from sheetreader_duckdb_spark import register

    register(spark)
    path = str(tmp_path / "prefixed.xlsx")
    ct, rels, wb_rels, wb_xml = _prefixed_workbook_parts()
    rows = "".join(
        f'<x:row r="{i + 2}"><x:c r="A{i + 2}"><x:v>{i}</x:v></x:c>'
        f'<x:c r="B{i + 2}"><x:v>{i * 2}</x:v></x:c></x:row>'
        for i in range(200)
    )
    sheet = (
        '<?xml version="1.0"?>'
        '<x:worksheet xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<x:sheetData><x:row r="1"><x:c r="A1"><x:v>10</x:v></x:c>'
        f"<x:c r=\"B1\"><x:v>20</x:v></x:c></x:row>{rows}</x:sheetData></x:worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    mk = lambda t: (  # noqa: E731
        spark.read.format("sheetreader")
        .option("has_header", False)
        .option("threads", t)
        .load(path)
    )
    r1 = sorted(map(tuple, mk(1).collect()))
    r4 = sorted(map(tuple, mk(4).collect()))
    assert r1 == r4 and len(r1) == 201

    # The fast tier provably engages AND genuinely shards: with a tiny
    # chunk size, every one of 3 shards yields rows (pre-r10 the whole
    # document parsed on shard 0 and shards 1-2 yielded nothing).
    per_shard = []
    with P.XlsxWorkbook(path) as wb:
        sheet = wb.resolve_sheet(None, None)
        for s in range(3):
            per_shard.append(
                sum(
                    1
                    for _ in wb.iter_rows(
                        sheet, chunk_bytes=1024, shard=s, n_shards=3
                    )
                )
            )
    assert all(c > 0 for c in per_shard), per_shard
    assert sum(per_shard) == 201


def test_prefixed_doc_full_type_matrix_sharded(tmp_path, spark):
    """Prefixed worksheet with shared strings (prefixed sst heap),
    booleans, an irregular row (reordered attrs → the ns-aware fragment
    parser) and an empty row: sharded read bit-equal to single-thread."""
    import zipfile

    from sheetreader_duckdb_spark import register

    register(spark)
    path = str(tmp_path / "prefixed_typed.xlsx")
    ct, rels, wb_rels, wb_xml = _prefixed_workbook_parts()
    sst = (
        '<?xml version="1.0"?>'
        '<x:sst xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
        "<x:si><x:t>alpha</x:t></x:si><x:si><x:t>beta &amp; co</x:t></x:si>"
        "<x:si><x:t>gamma</x:t></x:si></x:sst>"
    )
    body = []
    for i in range(2, 402):
        if i == 200:
            # irregular: t before r defeats the cell regex -> fragment
            # parser (needs the synthetic xmlns declarations mid-file)
            body.append(
                f'<x:row r="{i}"><x:c t="s" r="A{i}"><x:v>{i % 3}</x:v></x:c>'
                f'<x:c r="B{i}"><x:v>{i}.5</x:v></x:c>'
                f'<x:c r="C{i}" t="b"><x:v>1</x:v></x:c></x:row>'
            )
        elif i == 300:
            body.append(f'<x:row r="{i}"/>')  # empty row -> all NULL
        else:
            body.append(
                f'<x:row r="{i}"><x:c r="A{i}" t="s"><x:v>{i % 3}</x:v></x:c>'
                f'<x:c r="B{i}"><x:v>{i}.5</x:v></x:c>'
                f'<x:c r="C{i}" t="b"><x:v>{i % 2}</x:v></x:c></x:row>'
            )
    sheet = (
        '<?xml version="1.0"?>'
        '<x:worksheet xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<x:sheetData><x:row r="1">'
        '<x:c r="A1" t="s"><x:v>0</x:v></x:c>'
        '<x:c r="B1"><x:v>1.5</x:v></x:c>'
        '<x:c r="C1" t="b"><x:v>0</x:v></x:c></x:row>'
        + "".join(body)
        + "</x:sheetData></x:worksheet>"
    )
    wb_rels = wb_rels.replace(
        "</Relationships>",
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>',
    )
    ct = ct.replace(
        "</Types>",
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>',
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    mk = lambda t: (  # noqa: E731
        spark.read.format("sheetreader")
        .option("has_header", False)
        .option("types", "VARCHAR,DOUBLE,BOOLEAN")
        .option("threads", t)
        .load(path)
    )
    r1 = sorted(map(tuple, mk(1).collect()), key=str)
    r4 = sorted(map(tuple, mk(4).collect()), key=str)
    assert r1 == r4
    assert len(r1) == 401
    assert ("gamma", 200.5, True) in r1  # the irregular row, decoded
    assert any(r[0] == "beta & co" for r in r1)  # entity through the heap
    assert (None, None, None) in r1  # the empty row

    # row_count statistic on the prefixed document (regex row counting
    # with the detected prefix — used to see zero '<row' tags).
    assert DS.row_count(path) == 401


def test_prefixed_dense_row_template(tmp_path):
    """build_dense_row_re compiles a prefixed template and matches
    prefixed rows (the dense single-findall tier works on <x:...> docs)."""
    built = P.build_dense_row_re(
        b'<x:c r="A2" t="s"><x:v>3</x:v></x:c><x:c r="B2"><x:v>1.0</x:v></x:c>',
        [0, 1],
        [0, 1],
        frozenset(),
        pfx=b"x:",
    )
    assert built is not None
    regex, out_slots = built
    assert out_slots == [0, 1]
    assert regex.findall(
        b'<x:row r="9"><x:c r="A9" t="s"><x:v>7</x:v></x:c>'
        b'<x:c r="B9"><x:v>8.5</x:v></x:c></x:row>'
    ) == [(b"7", b"8.5")]
    # count_row_starts with the prefix
    assert P.count_row_starts(b'<x:row r="1"/><x:rowBreaks/><x:row>', b"x:") == 2


def test_sst_si_with_whitespace_or_attribute_falls_back():
    """ADVICE r9 (high): an <si start tag carrying XML whitespace or an
    attribute ('<si >', '<si\\n>', '<si ph="x">') is counted by NEITHER
    the literal n_si count NOR the fast regex — the match-count check
    alone still passes while the entry is silently OMITTED, shifting
    every later string ref. Both fast paths must hand such documents to
    expat."""
    from sheetreader_duckdb_spark.sources.xlsx import parser as P

    for opener in (b"<si >", b"<si\n>", b'<si ph="x">'):
        doc = (
            b'<sst count="3" uniqueCount="3">'
            b"<si><t>first</t></si>"
            + opener
            + b"<t>hidden</t></si>"
            b"<si><t>last</t></si></sst>"
        )
        want = ["first", "hidden", "last"]
        assert P._parse_sst_expat(doc) == want
        assert P._parse_sst_fast(doc) is None, opener
        heap = P.SharedStringHeap(doc)
        assert len(heap) == 3
        assert [heap[0], heap[1], heap[2]] == want, opener


def test_sst_namespace_prefixed_rides_fast_machinery():
    """A namespace-prefixed heap (<x:sst><x:si><x:t>) rides the same fast
    per-entry machinery since r10 (ADVICE r9 made it defeat-to-expat; now
    the prefix resolves from the sst opener): the fast parse decodes it,
    the lazy heap builds a REAL offset index (per-shard cost stays
    O(entries referenced), not O(heap)), the Arrow bulk path works, and
    defeat shapes (attributes on the prefixed <si>) still fall back."""
    import pyarrow as pa

    from sheetreader_duckdb_spark.sources.xlsx import parser as P

    doc = (
        b'<x:sst xmlns:x="s" count="3" uniqueCount="3">'
        b"<x:si><x:t>alpha</x:t></x:si>"
        b"<x:si><x:t>beta</x:t></x:si>"
        b'<x:si><x:t xml:space="preserve"> g </x:t></x:si></x:sst>'
    )
    want = ["alpha", "beta", " g "]
    assert P._parse_sst_expat(doc) == want
    assert P._parse_sst_fast(doc) == want
    heap = P.SharedStringHeap(doc)
    assert heap._full is None  # lazy: the offset index, not eager expat
    assert len(heap) == 3
    assert [heap[0], heap[1], heap[2]] == want
    assert heap.decode_many([1, 0]) == ["beta", "alpha"]
    bulk = heap.decode_many_arrow([0, 1, 2])
    assert bulk is not None and bulk.to_pylist() == want
    # rich-text prefixed entry: per-entry fallback to ONE expat parse
    rich = (
        b'<x:sst xmlns:x="s"><x:si><x:r><x:t>a</x:t></x:r>'
        b"<x:r><x:t>b</x:t></x:r></x:si>"
        b"<x:si><x:t>c</x:t></x:si></x:sst>"
    )
    lazy = P.SharedStringHeap(rich)
    assert [lazy[0], lazy[1]] == P._parse_sst_expat(rich) == ["ab", "c"]
    # defeat shape: attribute on the prefixed <si> start tag
    bad = (
        b'<x:sst xmlns:x="s"><x:si ph="y"><x:t>h</x:t></x:si>'
        b"<x:si><x:t>i</x:t></x:si></x:sst>"
    )
    assert P._parse_sst_fast(bad) is None
    hb = P.SharedStringHeap(bad)
    assert [hb[0], hb[1]] == ["h", "i"]  # eager expat fallback
    # Genuinely empty heap: cheap expat, no phantom entries.
    empty = b'<sst count="0" uniqueCount="0"></sst>'
    assert P._parse_sst_fast(empty) is None
    assert len(P.SharedStringHeap(empty)) == 0


def test_irregular_formula_rows_sharded_equals_single(spark, tmp_path):
    """Mid-file irregular rows (formula <f> children defeat the cell
    regex → per-chunk expat fragments) must read identically sharded and
    single-stream — the fragment path's shard accounting, not just the
    dense path's."""
    import zipfile

    from sheetreader_duckdb_spark import register

    register(spark)
    path = str(tmp_path / "formulas.xlsx")
    rows = []
    rows.append('<row r="1"><c r="A1"><v>1</v></c><c r="B1"><v>10</v></c></row>')
    for i in range(2, 2002):
        if i % 7 == 0:
            # formula cell: <f> child → irregular row → fragment parse
            rows.append(
                f'<row r="{i}"><c r="A{i}"><f>SUM(1,2)</f><v>{i}</v></c>'
                f'<c r="B{i}"><v>{i * 10}</v></c></row>'
            )
        else:
            rows.append(
                f'<row r="{i}"><c r="A{i}"><v>{i}</v></c>'
                f'<c r="B{i}"><v>{i * 10}</v></c></row>'
            )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows)}</sheetData></worksheet>"
    )
    ct = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        "</Types>"
    )
    rels = '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"/>'
    wb_rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t/worksheet" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    wb_xml = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    mk = lambda t: (  # noqa: E731
        spark.read.format("sheetreader")
        .option("has_header", False)
        .option("threads", t)
        .load(path)
    )
    r1 = sorted(map(tuple, mk(1).collect()))
    r5 = sorted(map(tuple, mk(5).collect()))
    assert r1 == r5 and len(r1) == 2001
    assert (7.0, 70.0) in r1  # a formula row's cached value decoded


def test_sst_multi_t_entry_falls_back():
    """A schema-invalid multi-<t> si (no <r> wrapper) must decode like
    expat ('ab' — runs concatenate), never as raw XML text: the fast
    pattern's [^<]* text class fails on it, forcing the fallback on
    every path (r9)."""
    from sheetreader_duckdb_spark.sources.xlsx import parser as P

    doc = (
        b'<sst count="2" uniqueCount="2">'
        b"<si><t>a</t><t>b</t></si><si><t>c</t></si></sst>"
    )
    want = ["ab", "c"]
    assert P._parse_sst_expat(doc) == want
    assert P._parse_sst_fast(doc) is None
    heap = P.SharedStringHeap(doc)
    assert [heap[0], heap[1]] == want
    assert heap.decode_many_arrow([0, 1]) is None


def test_decode_many_arrow_matches_scalar():
    """decode_many_arrow (bulk run-findall → one Arrow array) returns
    exactly decode_many's strings on every shape it accepts, and declines
    (None) on shapes needing per-entry handling — escapes, ST_Xstring,
    rich text."""
    from sheetreader_duckdb_spark.sources.xlsx import parser as P

    doc = (
        b'<sst count="6" uniqueCount="6">'
        b"<si><t>alpha</t></si>"
        b'<si><t xml:space="preserve"> b </t></si>'
        b"<si/><si><t/></si><si><t></t></si>"
        b"<si><t>zeta</t></si></sst>"
    )
    heap = P.SharedStringHeap(doc)
    want = P._parse_sst_expat(doc)
    # full ascending run
    got = heap.decode_many_arrow(list(range(6)))
    assert got is not None and got.to_pylist() == want
    # out-of-order / gapped indices (degrades to 1-entry runs)
    for idxs in ([5, 0, 3], [2, 2, 4], [1], []):
        got = heap.decode_many_arrow(idxs)
        assert got is not None
        assert got.to_pylist() == heap.decode_many(idxs) == [want[i] for i in idxs]
    # entity escape in range → decline, scalar path identical to expat
    esc = b"<sst><si><t>a &amp; b</t></si><si><t>c</t></si></sst>"
    h2 = P.SharedStringHeap(esc)
    assert h2.decode_many_arrow([0, 1]) is None
    assert h2.decode_many([0, 1]) == P._parse_sst_expat(esc)
    # ST_Xstring in range → decline
    xs = b"<sst><si><t>_x000D_ cr</t></si></sst>"
    h3 = P.SharedStringHeap(xs)
    assert h3.decode_many_arrow([0]) is None
    assert h3.decode_many([0]) == P._parse_sst_expat(xs)
    # rich-text entry inside the run → decline (count mismatch)
    rich = b"<sst><si><t>a</t></si><si><r><t>b</t></r><r><t>c</t></r></si></sst>"
    h4 = P.SharedStringHeap(rich)
    assert h4.decode_many_arrow([0, 1]) is None
    assert h4.decode_many([0, 1]) == ["a", "bc"]
    # out of range raises like the scalar path
    import pytest as _pytest

    with _pytest.raises(IndexError):
        heap.decode_many_arrow([99])


def test_sst_fast_paths_roundtrip_hostile_strings():
    """Property sweep (hypothesis): arbitrary text through the writer's
    exact sst emission (ST_Xstring control-char escapes, XML entity
    escaping, xml:space) must decode identically via the regex fast
    parse, the expat walk, and the lazy SharedStringHeap."""
    from hypothesis import given, settings, strategies as st

    from sheetreader_duckdb_spark.sources.xlsx import parser as P
    from sheetreader_duckdb_spark.sources.xlsx.writer import _xstring as wx
    from xml.sax.saxutils import escape

    def sst_xml(strings):
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
            f'<sst xmlns="x" count="{len(strings)}" uniqueCount="{len(strings)}">'
            + "".join(
                f"<si><t xml:space=\"preserve\">{escape(wx(s))}</t></si>"
                for s in strings
            )
            + "</sst>"
        ).encode("utf-8")

    texts = st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\r"
            ),
            max_size=40,
        ),
        min_size=0,
        max_size=12,
    )

    @settings(max_examples=150, deadline=None)
    @given(texts)
    def check(strings):
        # XML normalizes bare \r away; the writer escapes it to _x000D_
        # and the parser restores it — include some explicitly.
        strings = strings + ["a_x0041_b", "tab\ttab", "cr\rcr", ""]
        data = sst_xml(strings)
        want = P._parse_sst_expat(data)
        assert want == strings  # writer→expat roundtrip is the contract
        fast = P._parse_sst_fast(data)
        assert fast == strings
        heap = P.SharedStringHeap(data)
        assert [heap[i] for i in range(len(heap))] == strings
        bulk = heap.decode_many_arrow(list(range(len(heap))))
        if bulk is not None:  # bulk path accepts → must agree exactly
            assert bulk.to_pylist() == strings

    check()


def test_cluster_cap_travels_through_real_spark_read(spark, tmp_path):
    """ADVICE r9 (medium): the cluster-aware auto shard cap must survive the
    trip into the planning worker — partitions() runs in a separate
    driver-side Python process with NO active SparkSession, so the cap has
    to ride the class pickled at register() time. This is the non-mocked
    proof: the class attribute is set (exactly what register() does, with a
    simulated 48-core width since local mode can't exceed its own core
    count), the class is re-registered, and a REAL spark.read on a 50 MB
    file must plan 48 shards — not the 32 the dead getActiveSession()
    fallback would give."""
    import zipfile

    from sheetreader_duckdb_spark import register
    from sheetreader_duckdb_spark.sources.xlsx.datasource import (
        SheetReaderDataSource,
    )
    from sheetreader_duckdb_spark.sources.xlsx.writer import IncrementalXlsxWriter

    register(spark)
    # register() captures the driver's real width onto the class.
    assert (
        SheetReaderDataSource._cluster_default_parallelism
        == spark.sparkContext.defaultParallelism
    )

    path = str(tmp_path / "padded.xlsx")
    w = IncrementalXlsxWriter(path, "Sheet1")
    w.write_row(["a", "b"])
    for i in range(2000):
        w.write_row([float(i), float(i) * 0.5])
    w.close()
    # Pad the archive to 50 MB with a STORED non-worksheet member: the auto
    # shard count keys on os.path.getsize, so this buys a big "file"
    # without a slow fixture write (the sheet itself stays tiny and every
    # shard's parse is cheap).
    with zipfile.ZipFile(path, "a") as z:
        z.writestr(
            zipfile.ZipInfo("docProps/pad.bin"), b"\x00" * (50 << 20),
            compress_type=zipfile.ZIP_STORED,
        )
    assert (50 << 20) <= __import__("os").path.getsize(path) < (52 << 20)

    SheetReaderDataSource._cluster_default_parallelism = 48
    try:
        spark.dataSource.register(SheetReaderDataSource)
        df = spark.read.format("sheetreader").load(path)
        # min(max(32, 48), 50 MB) = 48 shards — the 48 proves the value
        # crossed into the planning worker; rows prove shard correctness.
        assert df.rdd.getNumPartitions() == 48
        assert df.count() == 2000
    finally:
        register(spark)  # restore the real width for the rest of the suite


def test_fragment_parses_prefixed_attributes_without_scope():
    """Excel writes `x14ac:dyDescent` on <row>; a mid-file irregular
    fragment loses the root's xmlns declarations, which used to hit
    expat's unbound-prefix error. The synthetic wrapper declares every
    prefix the fragment carries (r10), so such rows parse; colon-bearing
    cell text must not confuse the prefix harvest."""
    frag = (
        b'<row r="5" spans="1:2" x14ac:dyDescent="0.25">'
        b'<c r="A5"><v>1.5</v></c><c r="B5" t="b"><v>1</v></c></row>'
    )
    assert P._fragment_rows(frag, {}, frozenset()) == [
        [(0, P.T_NUMERIC, 1.5), (1, P.T_BOOLEAN, True)]
    ]
    frag2 = b'<row r="6"><c r="A6"><f>SUM(A1:A5)</f><v>7.5</v></c></row>'
    assert P._fragment_rows(frag2, {}, frozenset()) == [[(0, P.T_NUMERIC, 7.5)]]


# ---- split-index (splittable-XLSX) path -----------------------------------


def test_split_index_present_and_sharded_read_uses_it(big_xlsx):
    """Guard: the module fixture is big enough to carry a split index, so
    the sharded assertions in this file genuinely exercise the seek-and-
    inflate acquisition (not silently the sequential one)."""
    import zipfile

    from sheetreader_duckdb_spark.sources.xlsx import splitindex as SI

    with zipfile.ZipFile(big_xlsx) as zf:
        pts = SI.decode_split_index(zf, "xl/worksheets/sheet1.xml")
        assert pts is not None and len(pts) >= 2
        # terminal point == (member csize, total physical rows incl header)
        info = zf.getinfo("xl/worksheets/sheet1.xml")
        assert pts[-1] == (info.compress_size, N_ROWS + 1)


def test_split_index_stripped_comment_is_equal(big_xlsx, tmp_path):
    """No comment -> sequential acquisition; results identical (the index
    is pure acceleration, never semantics)."""
    import shutil
    import zipfile

    noc = str(tmp_path / "nocomment.xlsx")
    shutil.copy(big_xlsx, noc)
    with zipfile.ZipFile(noc, "a") as zf:
        zf.comment = b""
    a = _collect({"path": big_xlsx, "threads": "4"})
    b = _collect({"path": noc, "threads": "4"})
    key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    assert sorted(a, key=key) == sorted(
        _collect({"path": big_xlsx, "threads": "1"}), key=key
    )


def test_split_index_garbage_comment_ignored(big_xlsx, tmp_path):
    """A comment that fails structural validation (wrong magic, wrong
    entry, non-monotonic offsets) is ignored — sequential scan, same
    rows."""
    import json
    import shutil
    import zipfile

    from sheetreader_duckdb_spark.sources.xlsx import splitindex as SI

    base = _collect({"path": big_xlsx, "threads": "4"})
    key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    for comment in (
        b"not an index at all",
        SI.MAGIC + b"{broken json",
        SI.MAGIC + json.dumps(
            {"e": "xl/worksheets/other.xml", "n": 1, "c": [1], "r": [1]}
        ).encode(),
        SI.MAGIC + json.dumps(
            # non-monotonic compressed offsets
            {"e": "xl/worksheets/sheet1.xml", "n": 10, "c": [5, -2], "r": [1, 1]}
        ).encode(),
    ):
        p = str(tmp_path / "garbage.xlsx")
        shutil.copy(big_xlsx, p)
        with zipfile.ZipFile(p, "a") as zf:
            zf.comment = comment
        got = _collect({"path": p, "threads": "4"})
        assert sorted(got, key=key) == sorted(base, key=key)


def test_split_index_lying_rowcount_fails_loudly(big_xlsx, tmp_path):
    """A well-formed index whose row counts disagree with the actual sheet
    must raise, never return silently wrong data: every materialized
    interval's parsed count is checked against the recorded one."""
    import shutil
    import zipfile

    from sheetreader_duckdb_spark.sources.xlsx import splitindex as SI

    p = str(tmp_path / "lying.xlsx")
    shutil.copy(big_xlsx, p)
    with zipfile.ZipFile(p) as zf:
        pts = SI.decode_split_index(zf, "xl/worksheets/sheet1.xml")
        total = pts[-1][1]
    bad = [(c, r + 1) for c, r in pts[:-1]]
    with zipfile.ZipFile(p, "a") as zf:
        zf.comment = SI.encode_split_index("xl/worksheets/sheet1.xml", bad, total)
    with pytest.raises(ValueError, match="split-index row count mismatch"):
        _collect({"path": p, "threads": "4"})


def test_split_index_row_path_coerce_sharded_equals_single(big_xlsx):
    """The coerce/user-typed tier reads through iter_rows, whose sharded
    acquisition also rides the split index — same rows as single-thread,
    and as the stripped-comment scan (covered by the reader suites)."""
    schema = StructType(
        [
            StructField("name", StringType()),
            StructField("qty", StringType()),
            StructField("price", StringType()),
        ]
    )

    def rd(threads):
        reader = DS.SheetReaderReader(
            {"path": big_xlsx, "threads": threads, "coerce_to_string": "true"},
            schema,
        )
        rows = []
        for part in reader.partitions():
            for batch in reader.read(part):
                rows.extend(zip(*[c.to_pylist() for c in batch.columns]))
        return rows

    single, sharded = rd("1"), rd("4")
    key = lambda r: tuple((v is None, v) for v in r)  # noqa: E731
    assert len(sharded) == N_ROWS
    assert sorted(single, key=key) == sorted(sharded, key=key)


def test_split_index_misaligned_offsets_fail_descriptively(big_xlsx, tmp_path):
    """ADVICE r10: a structurally valid index whose offsets don't land on
    flush points (stale comment on a recompressed archive) must surface as
    the descriptive 'stale or corrupt' ValueError, not a bare zlib.error."""
    import shutil
    import zipfile

    from sheetreader_duckdb_spark.sources.xlsx import splitindex as SI

    p = str(tmp_path / "misaligned.xlsx")
    shutil.copy(big_xlsx, p)
    with zipfile.ZipFile(p) as zf:
        pts = SI.decode_split_index(zf, "xl/worksheets/sheet1.xml")
        total = pts[-1][1]
    # Shift every offset off its flush boundary: still monotonic, still
    # inside the member, so structural validation passes — only the
    # inflate can discover the lie.
    bad = [(c + 1, r) for c, r in pts[:-1]]
    with zipfile.ZipFile(p, "a") as zf:
        zf.comment = SI.encode_split_index("xl/worksheets/sheet1.xml", bad, total)
    with pytest.raises(ValueError, match="stale or corrupt"):
        _collect({"path": p, "threads": "4"})


def test_flush_probe_gates_indexing(tmp_path):
    """ADVICE r10: the writer's zipfile-internals surgery self-tests once
    per process; on this interpreter the probe passes, and a failing probe
    degrades writes to plain unindexed (but valid) workbooks instead of
    risking mis-sized zip metadata."""
    import zipfile

    from sheetreader_duckdb_spark.sources.xlsx import writer as W
    from sheetreader_duckdb_spark.sources.xlsx.writer import write_xlsx

    assert W._flush_probe() is True

    p = str(tmp_path / "gated.xlsx")
    saved = W._FLUSH_OK
    try:
        W._FLUSH_OK = False
        write_xlsx(p, {"S": [["a", "b"], ["x", 1.0], ["y", 2.0]]})
    finally:
        W._FLUSH_OK = saved
    with zipfile.ZipFile(p) as zf:
        assert zf.comment == b""  # no index published
        assert zf.testzip() is None  # archive metadata intact
    reader = DS.SheetReaderReader(
        {"path": p, "threads": "1"},
        StructType([StructField("a", StringType()), StructField("b", DoubleType())]),
    )
    got = []
    for part in reader.partitions():
        for batch in reader.read(part):
            got.extend(zip(*[c.to_pylist() for c in batch.columns]))
    assert got == [("x", 1.0), ("y", 2.0)]


# ---- mixed-prefix rows (r11: silent-loss fix + sharded tier 3) ------------


def _mixed_prefix_xlsx(path: str, n: int, mix_from: int = 0) -> int:
    """A worksheet whose rows ALTERNATE <row> and <x:row> from row
    ``mix_from`` on (every 3rd row prefixed). Returns the expected row
    count. Before r11 the prefixed rows were silently DROPPED by the fast
    tiers (the r9 guard only fires when ZERO rows match the detected
    prefix)."""
    import zipfile

    ct, rels, wb_rels, _ = _prefixed_workbook_parts()
    wb_xml = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    body = []
    for i in range(1, n + 1):
        if i > mix_from and i % 3 == 0:
            body.append(
                f'<x:row r="{i}"><x:c r="A{i}"><x:v>{i}</x:v></x:c>'
                f'<x:c r="B{i}"><x:v>{i * 2}</x:v></x:c></x:row>'
            )
        else:
            body.append(
                f'<row r="{i}"><c r="A{i}"><v>{i}</v></c>'
                f'<c r="B{i}"><v>{i * 2}</v></c></row>'
            )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return n


MIXED_SCHEMA = StructType(
    [StructField("a", DoubleType()), StructField("b", DoubleType())]
)


def _collect_mixed(path, threads, **extra):
    reader = DS.SheetReaderReader(
        {"path": path, "threads": threads, "has_header": "false", **extra},
        MIXED_SCHEMA,
    )
    rows = []
    for part in reader.partitions():
        for batch in reader.read(part):
            rows.extend(zip(*[c.to_pylist() for c in batch.columns]))
    return rows


def test_mixed_prefix_rows_not_dropped(tmp_path):
    """The r11 repro: rows alternating <row>/<x:row> must ALL be read —
    previously 267 of 400 came back with no error."""
    p = str(tmp_path / "mixed.xlsx")
    n = _mixed_prefix_xlsx(p, 400)
    got = _collect_mixed(p, "1")
    assert len(got) == n
    assert (3.0, 6.0) in got and (399.0, 798.0) in got  # prefixed rows
    assert (1.0, 2.0) in got  # unprefixed rows
    assert sorted(got) == [(float(i), float(2 * i)) for i in range(1, n + 1)]


def test_mixed_prefix_sharded_equals_single_tier3(tmp_path):
    """Mixed rows IN CHUNK 0 defeat the fast tiers -> the r11 SHARDED
    tier-3 walk: every shard yields rows (not just shard 0), union equals
    the single-thread read."""
    p = str(tmp_path / "mixed_t3.xlsx")
    n = _mixed_prefix_xlsx(p, 4000)
    single = sorted(_collect_mixed(p, "1"))
    sharded = sorted(_collect_mixed(p, "4"))
    assert len(single) == n
    assert single == sharded

    from sheetreader_duckdb_spark.sources.xlsx import parser as P2

    per_shard = []
    with P2.XlsxWorkbook(p) as wb:
        sheet = wb.resolve_sheet(None, None)
        for s in range(3):
            per_shard.append(
                sum(1 for _ in wb.iter_rows(sheet, chunk_bytes=4096, shard=s, n_shards=3))
            )
    assert all(c > 0 for c in per_shard), per_shard
    assert sum(per_shard) == n


def test_mixed_prefix_midfile_stays_on_fast_tier_with_fragments(tmp_path):
    """Mixed rows appearing only AFTER a clean chunk 0: the fast tier has
    already yielded, so the evidence check routes just those chunks to the
    namespace-aware fragment parser — all rows read, sharded == single."""
    p = str(tmp_path / "mixed_mid.xlsx")
    # chunk size in iter_rows is 4MB; at ~60 bytes/row, 4000 rows ~ 240KB
    # fits one chunk — drive iter_rows with a small chunk_bytes directly.
    n = _mixed_prefix_xlsx(p, 4000, mix_from=2000)

    from sheetreader_duckdb_spark.sources.xlsx import parser as P2

    with P2.XlsxWorkbook(p) as wb:
        sheet = wb.resolve_sheet(None, None)
        single = [
            cells for cells in wb.iter_rows(sheet, chunk_bytes=1 << 20)
        ]
        totals = []
        for s in range(3):
            totals.append(
                sum(1 for _ in wb.iter_rows(sheet, chunk_bytes=16384, shard=s, n_shards=3))
            )
    assert len(single) == n
    assert sum(totals) == n
    # every shard participated: mid-file mixing must not re-route the
    # document to a single-shard path
    assert all(c > 0 for c in totals), totals


def test_mixed_prefix_skip_rows_and_row_count(tmp_path):
    """skip_rows ordinals stay consistent across shards on mixed docs
    (unassigned chunks must count foreign-prefix rows too), and the
    row_count statistic sees every row."""
    p = str(tmp_path / "mixed_skip.xlsx")
    n = _mixed_prefix_xlsx(p, 4000)
    got1 = sorted(_collect_mixed(p, "1", skip_rows="100"))
    got4 = sorted(_collect_mixed(p, "4", skip_rows="100"))
    assert len(got1) == n - 100
    assert got1 == got4
    assert DS.row_count(p) == n


def test_retrofit_refuses_mixed_prefix_worksheet(tmp_path):
    """index_xlsx must not publish a worksheet section whose counts the
    reader's any-prefix parse would contradict."""
    from sheetreader_duckdb_spark.sources.xlsx import splitindex as SI
    from sheetreader_duckdb_spark.sources.xlsx.indexer import index_xlsx

    import zipfile

    p = str(tmp_path / "mixed_retro.xlsx")
    n = _mixed_prefix_xlsx(p, 120_000)  # > one split interval of XML
    out = index_xlsx(p)
    assert not out["indexed"]
    assert "mixes row prefixes" in out["reason"]
    with zipfile.ZipFile(p) as zf:
        assert SI.decode_split_index(zf, "xl/worksheets/sheet1.xml") is None
    # and the file still reads completely
    assert len(_collect_mixed(p, "4")) == n


def test_trailing_foreign_rows_in_final_chunk_read_not_crash(tmp_path):
    """r11 review: a well-formed sheet whose LAST rows (just before
    </sheetData>) use a foreign prefix routed its trailer-bearing final
    chunk to the fragment parser, which crashed on the unopened
    </sheetData></worksheet> close tags. The trailer now strips inside
    _fragment_rows, so every call site reads such files completely."""
    import zipfile

    ct, rels, wb_rels, _ = _prefixed_workbook_parts()
    wb_xml = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    n = 40_000
    body = []
    for i in range(1, n + 1):
        if i > n - 5:  # ONLY the last rows are foreign-prefixed
            body.append(
                f'<x:row r="{i}"><x:c r="A{i}"><x:v>{i}</x:v></x:c></x:row>'
            )
        else:
            body.append(f'<row r="{i}"><c r="A{i}"><v>{i}</v></c></row>')
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(body) + "</sheetData>"
        '<pageMargins left="0.7" right="0.7"/></worksheet>'
    )
    p = str(tmp_path / "trail.xlsx")
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/worksheets/sheet1.xml", sheet)

    schema = StructType([StructField("a", DoubleType())])
    got1 = sorted(
        _collect_mixed_schema(p, "1", schema)
    )
    got4 = sorted(_collect_mixed_schema(p, "4", schema))
    assert len(got1) == n
    assert got1 == got4
    assert (float(n),) in got1 and (float(n - 4),) in got1  # the x: rows
    # and iter_rows (row path) under small chunks — the other call site
    from sheetreader_duckdb_spark.sources.xlsx import parser as P3

    with P3.XlsxWorkbook(p) as wb:
        sheet_i = wb.resolve_sheet(None, None)
        total = sum(
            1
            for s in range(3)
            for _ in wb.iter_rows(sheet_i, chunk_bytes=65536, shard=s, n_shards=3)
        )
    assert total == n


def _collect_mixed_schema(path, threads, schema):
    reader = DS.SheetReaderReader(
        {"path": path, "threads": threads, "has_header": "false"}, schema
    )
    rows = []
    for part in reader.partitions():
        for batch in reader.read(part):
            rows.extend(zip(*[c.to_pylist() for c in batch.columns]))
    return rows


def test_mixed_prefix_full_type_matrix_sharded(tmp_path, spark):
    """Mixed-prefix rows carrying the FULL cell-type matrix — shared
    strings (both prefixes referencing one heap), booleans, date-styled
    serials, self-closing foreign empty rows — read bit-equal sharded vs
    single through the real Spark path."""
    import zipfile

    from sheetreader_duckdb_spark import register

    register(spark)
    ct, rels, wb_rels, _ = _prefixed_workbook_parts()
    wb_xml = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = wb_rels.replace(
        "</Relationships>",
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        '<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/></Relationships>',
    )
    sst = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
        "<si><t>alpha</t></si><si><t>beta</t></si><si><t>gamma</t></si></sst>"
    )
    styles = (
        '<?xml version="1.0"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs>'
        "</styleSheet>"
    )
    n = 3000
    body = []
    for i in range(1, n + 1):
        if i % 7 == 0:
            body.append(f'<x:row r="{i}"/>')  # self-closing FOREIGN empty row
        elif i % 3 == 0:
            body.append(
                f'<x:row r="{i}"><x:c r="A{i}" t="s"><x:v>{i % 3}</x:v></x:c>'
                f'<x:c r="B{i}"><x:v>{i}.5</x:v></x:c>'
                f'<x:c r="C{i}" t="b"><x:v>{i % 2}</x:v></x:c>'
                f'<x:c r="D{i}" s="1"><x:v>44200</x:v></x:c></x:row>'
            )
        else:
            body.append(
                f'<row r="{i}"><c r="A{i}" t="s"><v>{i % 3}</v></c>'
                f'<c r="B{i}"><v>{i}.5</v></c>'
                f'<c r="C{i}" t="b"><v>{i % 2}</v></c>'
                f'<c r="D{i}" s="1"><v>44200</v></c></row>'
            )
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
    )
    p = str(tmp_path / "mixed_matrix.xlsx")
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/workbook.xml", wb_xml)
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)

    mk = lambda t: (  # noqa: E731
        spark.read.format("sheetreader")
        .option("has_header", False)
        .option("types", "VARCHAR,DOUBLE,BOOLEAN,DATE")
        .option("threads", t)
        .load(p)
    )
    r1 = sorted(map(tuple, mk(1).collect()), key=str)
    r4 = sorted(map(tuple, mk(4).collect()), key=str)
    assert r1 == r4
    assert len(r1) == n
    import datetime as dt

    d = dt.date(2021, 1, 4)  # serial 44200
    assert ("alpha", 3.5, True, d) in r1  # a prefixed data row (i=3, 3%3=0)
    assert ("gamma", 2.5, False, d) in r1  # an unprefixed one (i=2, 2%3=2)
    assert (None, None, None, None) in r1  # the self-closing foreign rows
    assert sum(1 for r in r1 if r[0] is None) == n // 7
