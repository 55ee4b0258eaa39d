"""Boolean value pruning via the ``bt`` section (r15 — VERDICT r13
task 2 / r14 task 5): per-interval (n_true, n_false) counts over t="b"
cells let ``EqualTo``/``In`` on BOOLEAN columns skip intervals provably
empty of the requested value(s). Pinned here: authoring exactness,
bit-equal pruned reads with the interval-walk spy proving skips,
untrusted-section validation (forged counts drop the section, results
unchanged), stride coarsening soundness, and the sink author path.
"""

from __future__ import annotations

import zipfile

import pytest

from pyspark.sql.datasource import EqualTo, In, IsNotNull
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from sheetreader_duckdb_spark.sources.xlsx import datasource as DS
from sheetreader_duckdb_spark.sources.xlsx import splitindex as SI
from sheetreader_duckdb_spark.sources.xlsx.indexer import (
    describe_index,
    index_xlsx,
)
from sheetreader_duckdb_spark.sources.xlsx.writer import IncrementalXlsxWriter

N = 120_000
SHEET = "xl/worksheets/sheet1.xml"

SCHEMA = StructType(
    [
        StructField("id", DoubleType()),
        StructField("flag", BooleanType()),
        StructField("name", StringType()),
    ]
)


def _foreignize(src: str, dst: str) -> str:
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(
        dst, "w", zipfile.ZIP_DEFLATED
    ) as zout:
        for info in zin.infolist():
            zout.writestr(info.filename, zin.read(info.filename))
    return dst


def _flag(i: int):
    """Block layout: NULL every 10_000th row, first half False, second
    half True — EqualTo(True) can prove the first half's intervals empty
    and vice versa."""
    if i % 10_000 == 5_000:
        return None
    return i >= N // 2


@pytest.fixture(scope="module")
def bool_xlsx(tmp_path_factory):
    d = tmp_path_factory.mktemp("bvstats")
    src = str(d / "src.xlsx")
    w = IncrementalXlsxWriter(src, "Sheet1")
    w.write_row(["id", "flag", "name"])
    for i in range(N):
        w.write_row([float(i), _flag(i), f"row-{i}"])
    w.close()
    p = _foreignize(src, str(d / "foreign.xlsx"))
    out = index_xlsx(p)
    assert out["indexed"] and out["worksheet_points"] >= 2
    return p


class _Spy:
    def __init__(self, monkeypatch):
        self.materialized = 0
        self.skipped = 0
        orig = SI.iter_intervals

        def wrapped(*a, **k):
            for i, work, cin in orig(*a, **k):
                if work is None:
                    self.skipped += 1
                else:
                    self.materialized += 1
                yield i, work, cin

        monkeypatch.setattr(DS.SI, "iter_intervals", wrapped)


def _collect(path, filters, threads=4, schema=SCHEMA):
    reader = DS.SheetReaderReader(
        {"path": path, "threads": str(threads)}, schema
    )
    rows = []
    for s in range(threads):
        part = DS._SheetPartition(
            path, shard=s, n_shards=threads, filters=tuple(filters)
        )
        for batch in reader.read(part):
            rows.extend(zip(*[c.to_pylist() for c in batch.columns]))
    return rows


def test_bt_section_present_and_exact(bool_xlsx):
    with zipfile.ZipFile(bool_xlsx) as zf:
        pts = SI.decode_split_index(zf, SHEET)
        bv = SI.decode_interval_bool_counts(zf, SHEET, pts)
    assert bv is not None and "B" in bv
    assert "A" not in bv and "C" not in bv  # non-boolean columns
    assert len(bv["B"]) == len(pts)
    # exact totals across intervals (stride may replicate group values,
    # so sum unique groups: stride q means consecutive q entries repeat)
    with zipfile.ZipFile(bool_xlsx) as zf:
        payload = SI._payload(zf)
    q = (SI._section_for(payload, SHEET) or {}).get("q", 1)
    groups = [bv["B"][j] for j in range(0, len(pts), q)]
    n_true = sum(g[0] for g in groups if g is not None)
    n_false = sum(g[1] for g in groups if g is not None)
    want_true = sum(1 for i in range(N) if _flag(i) is True)
    want_false = sum(1 for i in range(N) if _flag(i) is False)
    assert (n_true, n_false) == (want_true, want_false)


def test_bool_pruned_reads_bit_equal_and_actually_skip(
    bool_xlsx, monkeypatch
):
    unfiltered = _collect(bool_xlsx, [])
    assert len(unfiltered) == N
    cases = [
        ([EqualTo(("flag",), True)], lambda r: r[1] is True),
        ([EqualTo(("flag",), False)], lambda r: r[1] is False),
        ([In(("flag",), (True,))], lambda r: r[1] is True),
    ]
    for filters, pred in cases:
        spy = _Spy(monkeypatch)
        got = sorted(_collect(bool_xlsx, filters), key=str)
        want = sorted((r for r in unfiltered if pred(r)), key=str)
        assert got == want, filters
        assert len(want) > 0
        # half the file is provably the other value: intervals skip
        assert spy.skipped > 0, (filters, vars(spy))


def test_in_both_values_prunes_nothing_but_stays_correct(bool_xlsx):
    got = sorted(
        _collect(bool_xlsx, [In(("flag",), (True, False))]), key=str
    )
    want = sorted(
        (r for r in _collect(bool_xlsx, []) if r[1] is not None), key=str
    )
    assert got == want


def test_isnotnull_on_bool_still_prunes_via_nc_not_bt(bool_xlsx):
    # IsNotNull consults nc (family counts), not bt — nulls are planted
    # in every block so nothing skips, and every non-null row returns.
    got = _collect(bool_xlsx, [IsNotNull(("flag",))])
    assert len(got) == N - N // 10_000


def test_forged_bt_counts_are_dropped_not_trusted(bool_xlsx, tmp_path):
    import json
    import shutil

    p = str(tmp_path / "forged.xlsx")
    shutil.copy(bool_xlsx, p)
    with zipfile.ZipFile(p, "a") as zf:
        payload = json.loads(zf.comment[len(SI.MAGIC):])
        sec = payload if payload.get("e") == SHEET else payload["m"][SHEET]
        # counts exceeding the group's rows: provably forged
        sec["bt"] = {"B": [[10**9, 10**9]] * len(sec["bt"]["B"])}
        zf.comment = SI.MAGIC + json.dumps(
            payload, separators=(",", ":")
        ).encode("ascii")
    with zipfile.ZipFile(p) as zf:
        pts = SI.decode_split_index(zf, SHEET)
        assert SI.decode_interval_bool_counts(zf, SHEET, pts) is None
    got = sorted(_collect(p, [EqualTo(("flag",), True)]), key=str)
    want = sorted(
        (r for r in _collect(bool_xlsx, []) if r[1] is True), key=str
    )
    assert got == want


def test_bt_coarsening_sums_groups():
    from sheetreader_duckdb_spark.sources.xlsx.splitindex import (
        coarsen_count_groups,
    )

    arr = [[3, 4], [1], None, [0, 2], [5, 5]]
    out = coarsen_count_groups(arr)
    # [3,4]+[1,0] = [4,4]; None absorbs; odd last carried
    assert out == [[4, 4], None, [5, 5]]


def test_planner_unit_bool_matrix():
    """_plan_interval_skips over a hand-built bt table: the zero-count
    test per requested value, interval 0 never skippable, None claims
    nothing, non-bool / NULL literals claim nothing."""
    ivbv = {
        "B": [
            (0, 10),   # interval 0: all false — still never skipped
            (0, 10),   # all false
            (10, 0),   # all true
            (4, 6),    # mixed
            None,      # no claim
            (0, 0),    # no boolean cells at all
        ]
    }
    names = ["id", "flag", "name"]

    def plan(f):
        return DS._plan_interval_skips(
            [f], SCHEMA, names, None, False, ivbv=ivbv
        )

    assert plan(EqualTo(("flag",), True)) == frozenset({1, 5})
    assert plan(EqualTo(("flag",), False)) == frozenset({2, 5})
    assert plan(In(("flag",), (True,))) == frozenset({1, 5})
    assert plan(In(("flag",), (True, False))) == frozenset({5})
    assert plan(EqualTo(("flag",), None)) == frozenset()
    assert plan(EqualTo(("flag",), 1)) == frozenset()
    assert plan(In(("flag",), ())) == frozenset()
    assert plan(In(("flag",), (True, None))) == frozenset()


def test_sink_author_writes_bt(spark, tmp_path):
    """The distributed sink's own stats author (index_stats=True) emits
    the bt section too, and the read-back prunes on it."""
    import glob

    from pyspark.sql import functions as F

    from sheetreader_duckdb_spark import register

    register(spark)
    out = str(tmp_path / "sink_bt")
    (
        spark.range(150_000)
        .select(
            F.col("id").cast("double").alias("id"),
            # block layout: first half false, second half true
            (F.col("id") >= 75_000).alias("flag"),
            F.concat(
                F.lit("s"), F.col("id").cast("string"), F.lit("-" + "z" * 30)
            ).alias("txt"),
        )
        .repartition(1)
        .write.format("sheetreader")
        .option("index_stats", "true")
        .mode("overwrite")
        .save(out)
    )
    part = glob.glob(out + "/*.xlsx")[0]
    rec = describe_index(part)
    sheet_rec = rec["sheets"][SHEET]
    assert sheet_rec.get("bool_stat_cols") == ["B"], sheet_rec
    schema = StructType(
        [
            StructField("id", DoubleType()),
            StructField("flag", BooleanType()),
            StructField("txt", StringType()),
        ]
    )
    got = _collect(part, [EqualTo(("flag",), True)], schema=schema)
    assert len(got) == 75_000 and all(r[1] is True for r in got)
