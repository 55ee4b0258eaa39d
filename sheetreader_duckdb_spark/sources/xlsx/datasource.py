"""``sheetreader`` Spark Python Data Source (V2) — the Spark-native equivalent
of the reference's DuckDB table function (SURVEY.md §2.1 S1–S16; registration
/root/reference/src/sheetreader_extension.cpp:950-967).

Usage::

    spark.dataSource.register(SheetReaderDataSource)
    df = (spark.read.format("sheetreader")
          .option("sheet_name", "Alpha")      # or sheet_index (1-based)
          .option("skip_rows", 2)
          .option("has_header", True)
          .option("types", "VARCHAR,DOUBLE")  # ⊆ {VARCHAR, DOUBLE, BOOLEAN, DATE}
          .option("force_types", False)
          .option("coerce_to_string", False)
          .option("inline_strings", False)   # opt-in: accept t="str"/"inlineStr"
          .option("filter_pushdown", False)  # opt-in: absorb filters (see pushFilters)
          .option("columns", "a,b")          # reader-side column pruning
          .load("/data/*.xlsx"))

    # Distributed write (one workbook per non-empty partition):
    (df.write.format("sheetreader")
       .option("max_rows_per_file", 1000000)  # ≤ 1048575 (sheet row cap)
       .option("date1904", False)             # workbook date system
       .mode("overwrite")                     # clears *.xlsx in the dir
       .save("/out/dir"))

Architecture (deliberately NOT the reference's): schema() is a lazy two-row
probe of the first file; the full parse happens at task time, one partition
per (file, sheet) — on a cluster, thousands of spreadsheets parse in
parallel. Output is Arrow RecordBatches (the Spark analog of the reference's
2048-row DataChunks), consumed by Spark's vectorized columnar path.

Beyond-reference extension: multi-file globs are accepted (the reference
rejects >1 file at bind, :648-651); partition = file.
"""

from __future__ import annotations

import glob as _glob
import operator as _op
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from sheetreader_duckdb_spark.sources.xlsx import parser as P
from sheetreader_duckdb_spark.sources.xlsx import splitindex as SI
from sheetreader_duckdb_spark.sources.xlsx.inference import SheetSchema, infer_schema

_SQL_TO_SPARK = {
    "VARCHAR": StringType(),
    "DOUBLE": DoubleType(),
    "BOOLEAN": BooleanType(),
    "DATE": DateType(),
}
_SPARK_TO_SQL = {
    "string": "VARCHAR",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "date": "DATE",
}

# 64k rows/batch: the dense fast path appends ~54k rows per 4 MB chunk,
# so at 8k the rolling raw_cols tail was re-sliced ~7× per chunk (an
# O(rows·batches-per-chunk) list copy) and every batch paid pa.array/cast
# fixed overhead 8× more often. 64k keeps batches a few MB (3-col sf1:
# ~5 MB of raw bytes) — still far under Arrow/Spark batch comfort.
DEFAULT_BATCH_SIZE = 65536


def _filter_mask_builder(filters, schema: StructType):
    """Compile pushed-down filters to a RecordBatch → mask function using
    vectorized Arrow compute (AND of all filters, SQL WHERE null semantics:
    null comparisons drop the row). Returns None when there is nothing to
    apply."""
    if not filters:
        return None
    import pyarrow.compute as pc
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
        Not,
        StringContains,
        StringEndsWith,
        StringStartsWith,
    )

    names = {f.name for f in schema.fields}

    def compile_one(f):
        """Return column-name + mask fn, or None if unsupported."""
        if isinstance(f, Not):
            inner = compile_one(f.child)
            if inner is None:
                return None
            col, fn = inner
            return col, lambda arr: pc.invert(fn(arr))
        attr = getattr(f, "attribute", None)
        if attr is None or len(attr) != 1 or attr[0] not in names:
            return None
        col = attr[0]
        if isinstance(f, EqualTo):
            return col, lambda arr, v=f.value: pc.equal(arr, v)
        if isinstance(f, GreaterThan):
            return col, lambda arr, v=f.value: pc.greater(arr, v)
        if isinstance(f, GreaterThanOrEqual):
            return col, lambda arr, v=f.value: pc.greater_equal(arr, v)
        if isinstance(f, LessThan):
            return col, lambda arr, v=f.value: pc.less(arr, v)
        if isinstance(f, LessThanOrEqual):
            return col, lambda arr, v=f.value: pc.less_equal(arr, v)
        if isinstance(f, In):
            import pyarrow as pa

            vs = list(f.value)
            if any(v is None for v in vs):
                # SQL three-valued IN with a NULL literal can only be
                # true-or-null — leave it to Spark rather than emulate.
                return None

            def in_mask(arr, vs=vs):
                # pc.is_in yields VALID false for null inputs; SQL gives
                # NULL (so Not(In) must not resurrect null rows). Restore
                # null-propagation explicitly.
                m = pc.is_in(arr, value_set=pa.array(vs, type=arr.type))
                return pc.if_else(pc.is_valid(arr), m, pa.scalar(None, pa.bool_()))

            return col, in_mask
        if isinstance(f, IsNull):
            return col, lambda arr: pc.is_null(arr)
        if isinstance(f, IsNotNull):
            return col, lambda arr: pc.is_valid(arr)
        if isinstance(f, StringStartsWith):
            return col, lambda arr, v=f.value: pc.starts_with(arr, pattern=v)
        if isinstance(f, StringEndsWith):
            return col, lambda arr, v=f.value: pc.ends_with(arr, pattern=v)
        if isinstance(f, StringContains):
            return col, lambda arr, v=f.value: pc.match_substring(arr, pattern=v)
        return None

    compiled = []
    for f in filters:
        c = compile_one(f)
        if c is None:  # pushFilters only stored supported ones; be safe
            continue
        compiled.append(c)
    if not compiled:
        return None

    def apply(batch):
        mask = None
        for col, fn in compiled:
            m = fn(batch.column(batch.schema.get_field_index(col)))
            mask = m if mask is None else pc.and_kleene(mask, m)
        # SQL WHERE semantics: null mask entries drop the row.
        return batch.filter(pc.fill_null(mask, False))

    return apply


def supported_pushdown_filter(f, schema: StructType) -> bool:
    """True when the filter can be evaluated exactly by the Arrow mask."""
    return _filter_mask_builder([f], schema) is not None


def _has_null_filter(filters) -> bool:
    """True when the pushed set contains IsNull/IsNotNull — the only
    consumers of the nc section; planning skips its decode otherwise
    (r13 review: the validation walk is per-column work every task
    would pay for nothing on plain comparison filters)."""
    from pyspark.sql.datasource import IsNotNull, IsNull

    return any(isinstance(f, (IsNull, IsNotNull)) for f in filters)


def _has_bool_eq_filter(filters) -> bool:
    """True when the pushed set contains an EqualTo/In over BOOLEAN
    literal value(s) — the only consumers of the bt section (r15); same
    decode-gating rationale as ``_has_null_filter``."""
    from pyspark.sql.datasource import EqualTo, In

    for f in filters:
        if isinstance(f, EqualTo) and isinstance(f.value, bool):
            return True
        if isinstance(f, In) and any(isinstance(v, bool) for v in f.value):
            return True
    return False


def _plan_interval_skips(filters, schema, file_names, ivstats, date1904,
                         ivstr=None, ivnc=None, ivbv=None):
    """Interval ordinals provably EMPTY of matching rows under the ANDed
    pushed filters, per the split index's per-interval min/max stats
    (r11 — the parquet row-group-pruning pattern for XLSX: a selective
    filter skips whole intervals before inflating a byte).

    Comparison/equality/In filters on DOUBLE and DATE columns prune
    against the numeric ``st`` section; the same shapes plus
    StringStartsWith on STRING columns prune against the truncated
    (lo, hi) bounds of the ``sv`` section (r12 — ``ivstr``). String
    bounds are BOUNDS, not exact extrema (lo <= min, hi >= max by the
    over-keep-only truncation rule), and every predicate below is stated
    against bounds, so truncation can only cost pruning opportunities,
    never rows; comparisons are Python str = code-point order = the
    UTF-8/binary collation Spark and DuckDB sort by. Everything else
    claims nothing. NULL-safe by construction: those
    predicates never match NULL cells, so a disjoint numeric range proves
    row-emptiness even when the interval also holds NULLs or mismatched
    types (which decode to NULL). DATE filter values convert to WIDENED
    serial envelopes (±2 days absorbs the workbook date system and the
    1900 phantom-day quirk), so date pruning can only over-keep, never
    over-skip. Interval 0 is never skippable — every shard scans it for
    the cross-shard fallback decision and the loud staleness check.

    ``IsNull`` / ``IsNotNull`` (r13 — the predicate class Spark pushes
    around every comparison) prune against the value-count ``nc``
    section (``ivnc``): per interval, the stride GROUP's non-null cell
    count for the column's type FAMILY (plain numeric feeds DOUBLE,
    date-styled numeric feeds DATE — split because decode NULLs across
    the style boundary — string feeds VARCHAR, boolean feeds BOOLEAN;
    any other cell shape decodes to NULL in every scan tier) plus the
    group's row count.
    ``IsNotNull`` skips when the family count is 0 (no interval in the
    group holds a decodable value); ``IsNull`` skips when it equals the
    group's rows (every raw row holds one — rows the read drops, like
    headers/skip_rows, only shrink the output, so "no null raw rows"
    implies "no null output rows"). Both tests are group-exact under
    the stride's summation. Count claims additionally assume ECMA-376
    cell-ref uniqueness (the author withholds intervals whose per-column
    totals exceed their row count, and the decoder rejects group totals
    exceeding group rows, but exactly-compensating duplicate+absent refs
    in one malformed interval are undetectable from counts alone — the
    same honest-writer trust boundary as the bounds sections).

    ``EqualTo`` / ``In`` over BOOLEAN literals (r15 — VERDICT r13
    task 2) prune against the boolean value-count ``bt`` section
    (``ivbv``): per interval, the stride group's (n_true, n_false) over
    the column's ``t="b"`` cells, truth decided exactly as the reader
    decodes. The group skips when EVERY requested value's count is 0 —
    sound because non-boolean cells decode NULL for a BOOLEAN column and
    an equality/IN predicate never matches NULL. Counts share the nc
    section's duplicate-ref trust boundary; inflation can only prevent
    a skip.

    Error-semantics trust model (ADVICE r12): a pruned interval is never
    inflated, so a parse error lurking inside it (most notably the
    UNSUPPORTED_STRING_ERROR on ``t="str"``/``t="inlineStr"`` cells)
    would not fire on a filtered read even though the unfiltered read of
    the same file raises — the parquet row-group trust model, where
    skipping is decided by stats alone. Our own stats AUTHOR closes the
    gap at the source: ``_IntervalStatsCollector`` withholds every claim
    for intervals containing such cells, so honestly-indexed files error
    identically with and without pruning; only a hand-forged comment can
    create the divergence, and forged comments are already documented as
    silently-wrong-by-design (see the lying-stats trust boundary test)."""
    import datetime as dt

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
        StringStartsWith,
    )

    from sheetreader_duckdb_spark.sources.xlsx.splitindex import increment_str
    from sheetreader_duckdb_spark.sources.xlsx.writer import (
        _col_letter,
        _date_serial,
    )

    out_type = {f.name: f.dataType.typeName() for f in schema.fields}
    n_iv = len(next(
        next(iter(src.values()))
        for src in (ivstats, ivstr, ivnc, ivbv)
        if src
    ))
    skips: set = set()

    def envelope(v, t):
        """Closed serial/value range that covers every cell decoding to
        ``v`` — raises TypeError on anything we refuse to reason about."""
        if t == "string":
            if not isinstance(v, str):
                raise TypeError(v)
            return (v, v)
        if t == "date":
            if isinstance(v, dt.datetime) or not isinstance(v, dt.date):
                raise TypeError(v)
            days = (v - dt.date(1970, 1, 1)).days
            s = _date_serial(days, date1904)
            return (s - 2.0, s + 3.0)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise TypeError(v)
        return (float(v), float(v))

    for f in filters:
        attr = getattr(f, "attribute", None)
        if attr is None or len(attr) != 1:
            continue
        name = attr[0]
        t = out_type.get(name)
        try:
            letters = _col_letter(file_names.index(name))
        except ValueError:
            continue
        if isinstance(f, (IsNull, IsNotNull)):
            fam = {"double": 0, "string": 1, "boolean": 2, "date": 3}.get(t)
            col = ivnc.get(letters) if (ivnc and fam is not None) else None
            if col is None:
                continue
            notnull = isinstance(f, IsNotNull)
            for i in range(1, n_iv):
                # (n_num, n_str, n_bool, n_date, rows_in_group) | None
                e = col[i]
                if e is None:
                    continue
                # IsNotNull: the group holds ZERO decodable values of
                # this family → every row decodes NULL → no matches.
                # IsNull: the family count equals the group's rows →
                # every raw row holds a value of THIS family (the
                # decoder enforced family sums <= rows, so the others
                # are zero) → no NULL rows to match.
                if (e[fam] == 0) if notnull else (e[fam] == e[4]):
                    skips.add(i)
            continue
        if t == "boolean":
            # EqualTo/In over boolean literals prune via the bt section
            # (r15): skip when every requested value's group count is 0.
            # NULL literals never match; non-bool literals on a BOOLEAN
            # column are not reasoned about (claim nothing).
            if not isinstance(f, (EqualTo, In)) or ivbv is None:
                continue
            col = ivbv.get(letters)
            if col is None:
                continue
            vals = list(f.value) if isinstance(f, In) else [f.value]
            if not vals or any(not isinstance(v, bool) for v in vals):
                continue
            want_true = True in vals
            want_false = False in vals
            for i in range(1, n_iv):
                e = col[i]  # (n_true, n_false) | None
                if e is None:
                    continue
                if (not want_true or e[0] == 0) and (
                    not want_false or e[1] == 0
                ):
                    skips.add(i)
            continue
        if t not in ("double", "date", "string"):
            continue
        src = ivstr if t == "string" else ivstats
        col = src.get(letters) if src else None
        if col is None:
            continue
        try:
            if isinstance(f, (EqualTo, In)):
                vals = list(f.value) if isinstance(f, In) else [f.value]
                if not vals or any(v is None for v in vals):
                    continue
                envs = [envelope(v, t) for v in vals]
                lo = min(e[0] for e in envs)
                hi = max(e[1] for e in envs)

                def empty(mn, mx, lo=lo, hi=hi):
                    return hi < mn or lo > mx
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                lo, hi = envelope(f.value, t)
                if t == "date" or isinstance(f, GreaterThanOrEqual):
                    # dates: any matching serial is >= the widened lower
                    # edge; doubles GTE: matching values are >= v exactly
                    def empty(mn, mx, b=lo):
                        return mx < b
                else:

                    def empty(mn, mx, b=lo):
                        return mx <= b
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                lo, hi = envelope(f.value, t)
                if t == "date" or isinstance(f, LessThanOrEqual):
                    def empty(mn, mx, b=hi):
                        return mn > b
                else:

                    def empty(mn, mx, b=hi):
                        return mn >= b
            elif isinstance(f, StringStartsWith) and t == "string":
                p0 = f.value
                if not isinstance(p0, str) or not p0:
                    continue
                up = increment_str(p0)  # strict upper bound on p0-prefixed
                # strings; None (all-U+10FFFF prefix) keeps only the
                # lower-side test

                def empty(mn, mx, p=p0, up=up):
                    return mx < p or (up is not None and mn >= up)
            else:
                continue
        except (TypeError, ValueError):
            continue
        for i in range(1, n_iv):
            st = col[i]
            if st is not None and empty(st[0], st[1]):
                skips.add(i)
    return frozenset(skips)


def _parse_bool(v: str | None, default: bool = False) -> bool:
    if v is None:
        return default
    return str(v).strip().lower() in ("true", "1", "yes")


@dataclass
class _Options:
    paths: list[str]
    sheet_name: str | None
    sheet_index: int | None
    skip_rows: int
    has_header: bool
    user_types: list[str] | None
    force_types: bool
    coerce_to_string: bool
    threads: int
    batch_size: int
    inline_strings: bool
    filter_pushdown: bool
    columns: tuple[str, ...] | None
    max_shards: int | None = None

    @classmethod
    def from_options(cls, options) -> "_Options":
        path = options.get("path")
        if not path:
            raise ValueError("sheetreader: 'path' is required")
        if _glob.has_magic(path):
            paths = sorted(_glob.glob(path))
            if not paths:
                # A literal path that merely LOOKS like a glob —
                # 'report[2024].xlsx' / 'batch[7]/' are real names
                # (r13: same metachar family as the retrofit temp-leak
                # fix); glob semantics keep priority, the literal
                # file-or-directory is the fallback when the pattern
                # matches nothing.
                if os.path.isdir(path):
                    paths = sorted(_glob.glob(
                        os.path.join(_glob.escape(path), "*.xlsx")
                    ))
                elif os.path.isfile(path):
                    paths = [path]
        elif os.path.isdir(path):
            # A directory reads every workbook in it — the symmetric
            # inverse of the sink (one .xlsx per partition under `save(dir)`),
            # matching the streaming source's directory semantics above.
            paths = sorted(_glob.glob(os.path.join(_glob.escape(path), "*.xlsx")))
        else:
            paths = [path]
        if not paths:
            raise ValueError("No files found in path")  # reference :648-649
        for p in paths:
            if not os.path.exists(p):
                raise ValueError(f"sheetreader: file not found: {p}")
        sheet_name = options.get("sheet_name") or None
        sheet_index = options.get("sheet_index")
        if sheet_name and sheet_index is not None:
            # reference :683-685
            raise ValueError("Sheet index & sheet name cannot be set at the same time.")
        # threads: intra-file parse parallelism (reference S4, default
        # hardware/2 there). Spark-idiomatically this is the number of
        # SHARD PARTITIONS per large file — unset ⇒ auto (size-scaled).
        threads_opt = options.get("threads")
        threads = int(threads_opt) if threads_opt is not None else 0
        if threads_opt is not None and threads <= 0:
            raise ValueError("Number of threads must be greater than 0")  # reference :712-714
        types_opt = options.get("types")
        user_types = [t.strip() for t in types_opt.split(",")] if types_opt else None
        # Reader-side column pruning (SURVEY §4.1): parse only these columns.
        # Spark 4.1 does not push required columns into Python data sources
        # (the Project sits above the BatchScan), so the pruning contract is
        # an explicit option — the ETL caller states the projection once and
        # the source skips cell decode + Arrow build for everything else.
        cols_opt = options.get("columns")
        columns = (
            tuple(c.strip() for c in cols_opt.split(",") if c.strip())
            if cols_opt
            else None
        )
        if cols_opt is not None and not columns:
            raise ValueError("sheetreader: 'columns' must name at least one column")
        # Ceiling on AUTO shard count per file (explicit `threads` is never
        # capped). Unset ⇒ cluster-aware default at planning time (see
        # _auto_shard_cap): a 10 GB sheet on a 1000-core cluster wants more
        # than a local[32] box's 32 shards.
        ms_opt = options.get("max_shards")
        max_shards = int(ms_opt) if ms_opt is not None else None
        if ms_opt is not None and max_shards <= 0:
            raise ValueError("sheetreader: 'max_shards' must be positive")
        return cls(
            paths=paths,
            sheet_name=sheet_name,
            sheet_index=int(sheet_index) if sheet_index is not None else None,
            skip_rows=int(options.get("skip_rows", "0")),
            has_header=_parse_bool(options.get("has_header")),
            user_types=user_types,
            force_types=_parse_bool(options.get("force_types")),
            coerce_to_string=_parse_bool(options.get("coerce_to_string")),
            threads=threads,
            batch_size=int(options.get("batch_size", str(DEFAULT_BATCH_SIZE))),
            inline_strings=_parse_bool(options.get("inline_strings")),
            filter_pushdown=_parse_bool(options.get("filter_pushdown")),
            columns=columns,
            max_shards=max_shards,
        )


def _auto_shard_cap(
    max_shards: int | None, default_parallelism: int | None = None
) -> int:
    """Ceiling for the size-scaled AUTO shard count of one file.

    ``max_shards`` (reader option) wins when set. Otherwise
    ``max(32, defaultParallelism)``: 32 keeps every local[32] plan
    byte-stable with rounds 1-8, while a real cluster (1000 cores ⇒
    defaultParallelism ≥ 1000) lets one 10 GB sheet feed a whole stage
    instead of 32 tasks (VERDICT r8 task 5).

    ``default_parallelism`` is captured at ``register(spark)`` time as a
    class attribute on SheetReaderDataSource and rides the pickled class
    into the planning worker (ADVICE r9: partitions() executes in a
    separate driver-side Python worker with NO active session, so the old
    getActiveSession() resolution was inert on a real cluster — it is kept
    only as a harmless fallback for unpickled direct use)."""
    if max_shards is not None:
        return max_shards
    if default_parallelism is not None:
        return max(32, int(default_parallelism))
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            return max(32, s.sparkContext.defaultParallelism)
    except Exception:
        pass
    return 32


def _infer_for_file(path: str, opts: _Options) -> SheetSchema:
    with P.XlsxWorkbook(path, allow_inline=opts.inline_strings) as wb:
        sheet = wb.resolve_sheet(opts.sheet_name, opts.sheet_index)
        return infer_schema(
            wb,
            sheet,
            skip_rows=opts.skip_rows,
            has_header=opts.has_header,
            user_types=opts.user_types,
            force_types=opts.force_types,
            coerce_to_string=opts.coerce_to_string,
        )


# The two-row probe's insufficiency errors (reference parity: ConvertCellTypes
# :560-599 default branch; probe :796-829). ONLY these fall back to the
# declared schema — validation errors (bad user types, non-string header under
# has_header, …) must still surface.
_PROBE_INSUFFICIENT = (
    "Unknown cell type in column",
    "Need minimum of two rows",
    "Sheet appears to be empty",
)


def _infer_or_declared(
    path: str, opts: _Options, names: list[str], types: list[str]
) -> SheetSchema:
    """Per-file inference with a declared-schema fallback — a documented
    extension BEYOND reference parity (like multi-file globs): the
    reference errors when the two-row probe can't type a file (an absent
    cell in the first two data rows, a header-only workbook from an empty
    sink partition, fewer than two rows). In a directory/multi-file read
    the relation already HAS a schema — from the first file or the user —
    and the sink's contract is one layout for every file, so a file whose
    own probe is insufficient is read with the declared (names, types);
    its header row is detected by exact string-equality with the declared
    names. Single-file reads without a user schema are unaffected: their
    planning-time probe is the same call that raises here."""
    try:
        return _infer_for_file(path, opts)
    except ValueError as err:
        if not any(s in str(err) for s in _PROBE_INSUFFICIENT):
            raise
        with P.XlsxWorkbook(path, allow_inline=opts.inline_strings) as wb:
            sheet = wb.resolve_sheet(opts.sheet_name, opts.sheet_index)
            first = next(
                iter(
                    wb.iter_rows(
                        sheet, skip_rows=opts.skip_rows, chunk_bytes=256 << 10
                    )
                ),
                [],
            )
            decoded: list | None = []
            for col, ctype, val in first:
                if ctype == P.T_STRING_REF:
                    decoded.append((col, wb.shared_strings_lazy()[val]))
                elif ctype == P.T_STRING_LIT:
                    decoded.append((col, val))
                else:
                    decoded = None
                    break
            header = decoded is not None and [
                v for _, v in sorted(decoded)
            ] == list(names)
        return SheetSchema(
            names=list(names),
            types=list(types),
            skip_rows=opts.skip_rows + (1 if header else 0),
            n_detected_columns=len(names),
            header_detected=header,
        )


class SheetReaderDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sheetreader"

    def schema(self):
        opts = _Options.from_options(self.options)
        # Multi-file reads probe files IN ORDER until one has two typeable
        # rows — any member can carry the relation's schema (all share one
        # layout by the sink's contract), and the files it skips are read
        # under the declared-schema fallback (_infer_or_declared). A
        # single-file read keeps the reference-parity error as-is.
        inferred = None
        first_err: ValueError | None = None
        for p in opts.paths:
            try:
                inferred = _infer_for_file(p, opts)
                break
            except ValueError as err:
                if len(opts.paths) == 1 or not any(
                    s in str(err) for s in _PROBE_INSUFFICIENT
                ):
                    raise
                first_err = first_err or err
        if inferred is None:
            raise first_err  # every member failed its probe
        fields = {
            n: StructField(n, _SQL_TO_SPARK[t], nullable=True)
            for n, t in zip(inferred.names, inferred.types)
        }
        if opts.columns is not None:
            missing = [c for c in opts.columns if c not in fields]
            if missing:
                raise ValueError(
                    f"sheetreader: 'columns' not in the sheet: {missing} "
                    f"(available: {list(fields)})"
                )
            return StructType([fields[c] for c in opts.columns])
        return StructType(list(fields.values()))

    # Set by register(spark) BEFORE spark.dataSource.register pickles this
    # class, so the planning worker sees the real cluster width (ADVICE r9).
    _cluster_default_parallelism: int | None = None

    def reader(self, schema: StructType) -> "SheetReaderReader":
        return SheetReaderReader(
            self.options, schema,
            default_parallelism=type(self)._cluster_default_parallelism,
        )

    def simpleStreamReader(self, schema: StructType) -> "SheetReaderStreamReader":
        return SheetReaderStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "SheetReaderWriter":
        # Distributed XLSX sink: df.write.format("sheetreader").save(dir)
        # writes one workbook per non-empty partition (part-<pid>[-k].xlsx),
        # each readable by this source — the write-side mirror of the
        # partition-per-file scan (no reference analog: the reference only
        # reads, sheetreader_extension.cpp:233-350).
        path = self.options.get("path")
        if not path:
            raise ValueError("sheetreader write requires a directory path")
        supported = (StringType, DoubleType, BooleanType, DateType)
        for f in schema.fields:
            if not isinstance(f.dataType, supported) and not f.dataType.typeName() in (
                "integer", "long", "float",
            ):
                raise ValueError(
                    f"sheetreader write: column {f.name!r} has unsupported type "
                    f"{f.dataType.simpleString()} (XLSX cells are "
                    "string/double/boolean/date; cast first)"
                )
        max_rows = int(self.options.get("max_rows_per_file", "1000000"))
        if not 0 < max_rows <= 1_048_575:
            raise ValueError("max_rows_per_file must be in (0, 1048575]")
        if overwrite and os.path.isdir(path):
            for fn in os.listdir(path):
                if fn.endswith(".xlsx"):
                    os.remove(os.path.join(path, fn))
        os.makedirs(path, exist_ok=True)
        import uuid

        token = uuid.uuid4().hex[:12]  # job token: scopes the staging dir
        os.makedirs(os.path.join(path, f".staging-{token}"), exist_ok=True)
        return SheetReaderWriter(
            path,
            [f.name for f in schema.fields],
            self.options.get("sheet_name", "Sheet1"),
            max_rows,
            _parse_bool(self.options.get("date1904")),
            token,
            index_stats=_parse_bool(self.options.get("index_stats")),
        )


@dataclass
class _WriteCommit(WriterCommitMessage):
    # (staged tmp name, final part name) pairs published at commit time.
    renames: tuple = ()
    rows: int = 0


class SheetReaderWriter(DataSourceWriter):
    """Executor-side XLSX writer: each partition streams its rows into
    fixed-size workbooks through IncrementalXlsxWriter (shared strings,
    <dimension> row-count tag, both date systems — cell encoding shared
    with the fixture writer), so everything this sink writes the source
    reads back exactly. Memory per task is O(unique strings) + one row:
    rows spool to disk and stream into the zip at file close, never
    accumulating ``max_rows_per_file`` rows in a Python list.

    Commit protocol: tasks stage files (and their row spools) inside a
    job-scoped staging DIRECTORY ``.staging-<job>/`` (dot-prefixed —
    invisible to ``load(dir/*.xlsx)``), named ``<attempt>-part-*`` so
    concurrent speculative attempts never collide; the driver's
    ``commit(messages)`` publishes exactly the winning attempts' files via
    rename out of staging, then removes the whole staging directory;
    ``abort()`` removes the directory outright. Removing the DIRECTORY is
    what makes cleanup race-free: a straggler task that finishes after the
    job already failed tries to assemble its workbook inside a path that
    no longer exists and errors out in its own worker — it cannot leak a
    file into the table directory. A failed or aborted job therefore
    leaves no visible workbook and no staged bytes behind."""

    def __init__(
        self, path, names, sheet_name, max_rows, date1904, token,
        index_stats: bool = False,
    ):
        self.path = path
        self.names = list(names)
        self.sheet_name = sheet_name
        self.max_rows = max_rows
        self.date1904 = date1904
        self.token = token
        # Opt-in (`index_stats`): per-interval min/max stats in each
        # part's split index, enabling filter-driven interval pruning on
        # read-back without a retrofit pass. Off by default — the
        # collector's cell-regex + float-fold is a write-path tax.
        self.index_stats = index_stats

    def _staging_dir(self) -> str:
        return os.path.join(self.path, f".staging-{self.token}")

    def _tmp_name(self, attempt: int, final: str) -> str:
        return os.path.join(f".staging-{self.token}", f"{attempt}-{final}")

    def write(self, iterator) -> _WriteCommit:
        from pyspark import TaskContext

        from sheetreader_duckdb_spark.sources.xlsx.writer import IncrementalXlsxWriter

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        renames: list[tuple[str, str]] = []
        total = 0
        w: IncrementalXlsxWriter | None = None
        w_tmp = w_final = ""
        rows_in_file = 0
        n_cols = len(self.names)

        def open_file() -> None:
            nonlocal w, w_tmp, w_final, rows_in_file
            w_final = f"part-{pid:05d}-{len(renames):03d}.xlsx"
            w_tmp = self._tmp_name(attempt, w_final)
            # Staged workbook AND its spool live inside the staging dir —
            # created ONCE driver-side (writer()); tasks never recreate it,
            # so after commit/abort removes it a straggler's open fails in
            # its own worker instead of resurrecting the directory.
            w = IncrementalXlsxWriter(
                os.path.join(self.path, w_tmp),
                self.sheet_name,
                self.date1904,
                stats=self.index_stats,
            )
            w.write_row(list(self.names))
            rows_in_file = 0

        try:
            for row in iterator:
                if w is None:
                    open_file()
                w.write_row([row[i] for i in range(n_cols)])
                rows_in_file += 1
                total += 1
                if rows_in_file >= self.max_rows:
                    w.close()
                    renames.append((w_tmp, w_final))
                    w = None
            if w is not None:
                w.close()
                renames.append((w_tmp, w_final))
                w = None
        except BaseException:
            if w is not None:
                w.abandon()
            raise
        return _WriteCommit(renames=tuple(renames), rows=total)

    def _sweep_staged(self) -> None:
        # Remove the whole job staging directory: winning files were already
        # renamed out; everything left (losing attempts, hard-killed tasks'
        # spools) goes with the directory, and any straggler still writing
        # in it errors in its own worker instead of leaking into the table.
        import shutil

        shutil.rmtree(self._staging_dir(), ignore_errors=True)

    def commit(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, final in m.renames:
                os.replace(os.path.join(self.path, tmp), os.path.join(self.path, final))
        self._sweep_staged()

    def abort(self, messages) -> None:
        self._sweep_staged()


@dataclass
class _SheetPartition(InputPartition):
    path: str
    shard: int = 0
    n_shards: int = 1
    # Filters pushed during THIS query's planning, embedded per partition so
    # execution state never outlives the plan that produced it (the reader
    # instance is shared across every query on the relation).
    filters: tuple = ()


class SheetReaderReader(DataSourceReader):
    def __init__(self, options, schema: StructType, default_parallelism=None):
        self.opts = _Options.from_options(options)
        self.schema = schema
        # Cluster fan-out captured at register() time (ADVICE r9: this
        # reader plans inside a driver-side Python worker where NO active
        # SparkSession exists, so resolving defaultParallelism here always
        # fell back to 32 on a real cluster — the value must be plumbed in).
        self._default_parallelism = default_parallelism
        self._staged_filters: tuple = ()
        self.col_types = []
        for f in schema.fields:
            sql_t = _SPARK_TO_SQL.get(f.dataType.typeName())
            if sql_t is None:
                raise ValueError(
                    f"sheetreader supports only VARCHAR/DOUBLE/BOOLEAN/DATE columns, "
                    f"got {f.dataType.simpleString()} for column '{f.name}'"
                )
            self.col_types.append(sql_t)

    def pushFilters(self, filters):
        """Absorb the comparison/In/null/string filters we can evaluate
        exactly (SURVEY.md §7 PR4 — reader-side pruning): matching rows are
        selected by vectorized Arrow compute BEFORE batches cross the
        Python→JVM boundary, which is where a Python data source pays.
        Everything else is returned for Spark to evaluate.

        OPT-IN (``filter_pushdown=true``), off by default: Spark 4.1 caches
        the planned scan per relation and only re-plans (pushFilters →
        partitions) when the new query carries filters. Measured boundary
        (pinned end-to-end in tests/test_xlsx_pushdown.py
        test_relation_reuse_boundary_pins_the_optin_rationale):

        - fresh ``spark.read...load(...)`` chains: always safe (each builds
          its own relation — the normal ETL shape, and this repo's corpus);
        - distinct filter predicates on ONE loaded DataFrame: safe (every
          filtered query calls pushFilters and re-plans);
        - a FILTERLESS query on a DataFrame whose relation previously
          absorbed filters: REUSES the filtered scan — silently missing
          rows. This is the sole unsafe shape, it cannot be detected from
          inside the source (Spark gives no callback on a filterless
          re-use), and it is why the default stays off. The pinned test
          flips the moment a Spark upgrade re-plans that case — the signal
          that the default can flip to on.

        With the option off, every filter is returned untouched and no
        state exists. The accepted set is staged here and consumed by the
        next partitions() call, which embeds it into this plan's partition
        objects; read() takes filters from the partition, never the reader."""
        # A planned-but-unexecuted query can leave a staged set behind
        # (pushFilters ran, partitions() never did). Reset on every push so
        # stale filters from an abandoned plan can't leak into this one.
        self._staged_filters = ()
        if not self.opts.filter_pushdown:
            return filters
        accepted, remaining = [], []
        for f in filters:
            if supported_pushdown_filter(f, self.schema):
                accepted.append(f)
            else:
                remaining.append(f)
        self._staged_filters = tuple(accepted)
        return remaining

    def partitions(self):
        """One partition per (file, shard). Large files are split into chunk
        round-robin shards — the Spark answer to the reference's interleaved
        parse threads (S4/S14): every shard streams the same decompressed
        bytes (zlib is C-speed and cheap) but cell-parses only its assigned
        </row>-aligned chunks, so the expensive scan divides across executor
        cores. Result-invariant: shard assignment is deterministic and the
        union of shards is exactly the file's rows.
        """
        parts = []
        for p in self.opts.paths:
            if self.opts.threads > 0:
                n = self.opts.threads  # explicit, like the reference's S4
            else:
                try:
                    size_mb = os.path.getsize(p) >> 20
                except OSError:
                    size_mb = 0
                # Auto: ~1 shard per compressed MB, capped cluster-aware
                # (max(32, defaultParallelism), or the max_shards option)
                # so a single big file can feed every core of the executor
                # fleet, not just a local[32] box's 32 tasks.
                n = max(1, min(
                    _auto_shard_cap(
                        self.opts.max_shards, self._default_parallelism
                    ),
                    size_mb,
                ))
                # String-heavy refinement: every shard pays an O(sst) fixed
                # cost (decompress + offset-index the shared-string heap),
                # while the row scan divides by n — so when the heap rivals
                # the sheet in bytes, more shards just multiply overhead.
                # Cap n at ~8 shards per sheet/sst byte ratio (zip central
                # directory read only — no decompression at planning).
                # Measured on the 800k-unique-string partsupp witness
                # (sheet 139 MB, sst 123 MB → cap 9): 6-10 shards 4.7 s,
                # 16 → 8.0 s, 24 → 9.2 s. Numeric/deduped sheets have
                # tiny heaps and keep the size-based count. Probed only
                # when sharding would actually happen (n > 4): a
                # many-small-file directory read never pays per-file zip
                # metadata reads at planning.
                if n <= 4:
                    parts.extend(
                        _SheetPartition(
                            p, shard=i, n_shards=n,
                            filters=self._staged_filters,
                        )
                        for i in range(n)
                    )
                    continue
                # One metadata open serves both planning probes (r11
                # review: the sst probe and the prune block used to open
                # the same zip twice per filtered file).
                try:
                    with P.XlsxWorkbook(p) as wb:
                        info = {
                            i.filename: i.file_size
                            for i in wb.zf.infolist()
                        }
                        # A split-indexed heap removes the per-shard sst
                        # fixed cost entirely (each shard inflates only
                        # the intervals its rows reference), so the cap
                        # below would just throttle a cost that no longer
                        # exists — keep the size-based fan-out.
                        sst_indexed = SI.decode_sst_index(wb.zf) is not None
                        sst_u = info.get("xl/sharedStrings.xml", 0)
                        sheet_u = max(
                            (
                                v
                                for k, v in info.items()
                                if k.startswith("xl/worksheets/")
                            ),
                            default=0,
                        )
                        if sst_u > 0 and sheet_u > 0 and not sst_indexed:
                            n = max(1, min(n, round(8 * sheet_u / sst_u)))
                        # Prune-aware fan-out (r11): a selective filter
                        # on a stats-indexed file should not schedule a
                        # task per interval it will never inflate — at
                        # fleet scale a point lookup must not fan out
                        # 1000 no-op tasks. Planning-time only (read-time
                        # skips are recomputed per partition and own
                        # correctness); applied only without a `columns`
                        # option, where output names map to file columns
                        # by position. Any failure keeps the size-based n.
                        if (
                            self._staged_filters
                            and self.opts.columns is None
                            and not self.opts.coerce_to_string
                            and n > 1
                        ):
                            sheet = wb.resolve_sheet(
                                self.opts.sheet_name, self.opts.sheet_index
                            )
                            pts = SI.decode_split_index(wb.zf, sheet.path)
                            st = (
                                SI.decode_interval_stats(
                                    wb.zf, sheet.path, pts
                                )
                                if pts
                                else None
                            )
                            sv = (
                                SI.decode_interval_string_stats(
                                    wb.zf, sheet.path, pts
                                )
                                if pts
                                else None
                            )
                            nc = (
                                SI.decode_interval_null_counts(
                                    wb.zf, sheet.path, pts
                                )
                                if pts
                                and _has_null_filter(self._staged_filters)
                                else None
                            )
                            bv = (
                                SI.decode_interval_bool_counts(
                                    wb.zf, sheet.path, pts
                                )
                                if pts
                                and _has_bool_eq_filter(self._staged_filters)
                                else None
                            )
                            if st or sv or nc or bv:
                                skips = _plan_interval_skips(
                                    self._staged_filters, self.schema,
                                    [f.name for f in self.schema.fields],
                                    st, wb.date1904, ivstr=sv, ivnc=nc,
                                    ivbv=bv,
                                )
                                n = max(1, min(n, len(pts) - len(skips)))
                except Exception:
                    pass  # unreadable zip fails later with a real error
            parts.extend(
                _SheetPartition(p, shard=i, n_shards=n, filters=self._staged_filters)
                for i in range(n)
            )
        # Consume the staged set: it belongs to this plan only. A later
        # filterless query on the same (shared) reader must see none of it.
        self._staged_filters = ()
        return parts

    def read(self, partition: _SheetPartition):
        # Task boundary on this (possibly reused) worker: let the pinned
        # lazy sst heap drop the previous task's interval cache (r12).
        # Bumped at CALL time, not first iteration (read() itself is not
        # a generator), so a caller that materializes the iterator early
        # doesn't bump mid-way through another task's drain. One-task-
        # at-a-time consumption is still assumed — that is how Spark
        # workers drive partitions; interleaving two live reads in one
        # process would only cost re-inflation, never correctness.
        P.bump_sst_epoch()
        return self._read_masked(partition)

    def _read_masked(self, partition: _SheetPartition):
        mask = _filter_mask_builder(partition.filters, self.schema)
        if mask is None:
            yield from self._read_unfiltered(partition)
            return
        for batch in self._read_unfiltered(partition):
            out = mask(batch)
            if out.num_rows:
                yield out

    def _read_unfiltered(self, partition: _SheetPartition):
        opts = self.opts
        n_cols = len(self.col_types)
        # Per-file probe: header detection / skip accounting is per file; the
        # global schema (names/types) comes from the first file (or the
        # user), and is the fallback when this file's probe is insufficient.
        file_schema = _infer_or_declared(
            partition.path, opts, [f.name for f in self.schema.fields],
            self.col_types,
        )
        if opts.columns is None:
            if file_schema.n_detected_columns > n_cols:
                raise ValueError(
                    f"File {partition.path} has more columns than the schema. "
                    f"Has: {file_schema.n_detected_columns} Expected: {n_cols}"
                )
            # Identity mapping: output column i IS file column i.
            keep = list(range(n_cols))
        else:
            # Pruned read: map each FILE column to its output slot (None →
            # dropped; its cells are never decoded and never reach Arrow).
            out_by_name = {f.name: i for i, f in enumerate(self.schema.fields)}
            keep = [out_by_name.get(n) for n in file_schema.names]
            present = {n for n in file_schema.names if n in out_by_name}
            missing = [c for c in out_by_name if c not in present]
            if missing:
                raise ValueError(
                    f"sheetreader: 'columns' not in {partition.path}: {missing}"
                )
        if not opts.coerce_to_string and not opts.inline_strings:
            # Columnar fast path: raw cell bytes per column, typed by Arrow
            # casts (C-speed) instead of per-cell Python conversion. Falls
            # back to the row path on unscannable document shapes.
            try:
                yield from self._read_columnar(
                    partition.path, file_schema, partition.shard,
                    partition.n_shards, keep, partition.filters,
                )
                return
            except P._FastPathUnsupported:
                pass
        # Row path (expat / coerce / inline strings): chunk round-robin
        # sharded like the columnar path (VERDICT r8 task 2) — each shard
        # cell-parses only its assigned chunks and row-counts the rest.
        # Namespace-prefixed documents shard too since r10 (per-prefix
        # compiled patterns); tier-3 documents shard namespace-
        # agnostically since r11 (see XlsxWorkbook.iter_rows). Interval
        # pruning applies here too (r11): the typed inline-strings read
        # skips stats-proven-empty intervals; coerce reads are
        # all-VARCHAR, where numeric pruning can't apply by construction.
        yield from self._read_rows(
            partition.path, file_schema, keep,
            partition.shard, partition.n_shards, partition.filters,
        )

    def _read_rows(
        self, path: str, file_schema, keep: list,
        shard: int = 0, n_shards: int = 1, filters: tuple = (),
    ):
        import pyarrow as pa

        opts = self.opts
        col_types = self.col_types
        n_cols = len(col_types)
        n_file = len(keep)

        arrow_type = {
            "VARCHAR": pa.string(),
            "DOUBLE": pa.float64(),
            "BOOLEAN": pa.bool_(),
            "DATE": pa.date32(),
        }

        # Integer codes for the hot loop: expected 0=VARCHAR 1=DOUBLE
        # 2=BOOLEAN 3=DATE; cell ctypes are parser constants (T_* ints).
        # Indexed by OUTPUT column; ``keep`` maps file column → output slot
        # (None = pruned: the cell is skipped before any decode work).
        exp_codes = [("VARCHAR", "DOUBLE", "BOOLEAN", "DATE").index(t) for t in col_types]

        with P.XlsxWorkbook(path, allow_inline=opts.inline_strings) as wb:
            sheet = wb.resolve_sheet(opts.sheet_name, opts.sheet_index)
            # Lazy heap when sharded: each shard decodes only the string
            # entries its own rows reference (the columnar path's fix for
            # the O(heap)-per-shard pathology, applied to the row path).
            shared = (
                wb.shared_strings_lazy() if n_shards > 1 else wb.shared_strings
            )
            coerce = opts.coerce_to_string
            columns: list[list] = [[] for _ in range(n_cols)]
            n_buffered = 0
            current_row = 0

            def flush():
                arrays = [pa.array(columns[i], type=arrow_type[col_types[i]]) for i in range(n_cols)]
                return pa.RecordBatch.from_arrays(arrays, names=[f.name for f in self.schema.fields])

            # Smaller chunks when sharded → even round-robin load balance
            # (same policy as _read_columnar). Interval pruning mirrors
            # the columnar path: stats-proven-empty intervals are never
            # inflated (only reachable with typed columns, i.e. the
            # inline-strings read — coerce output is all VARCHAR).
            skip_ivals: frozenset = frozenset()
            # Coerce reads are excluded from pruning entirely (r12):
            # under coerce_to_string NUMERIC/BOOL/DATE cells decode to
            # formatted STRINGS, which the sv bounds (resolved t="s"
            # values only) do not cover — a string filter could then
            # prune an interval whose coerced numerics match. Typed and
            # inline-strings reads stay sound: mismatched types decode
            # to NULL (never match), and intervals containing inline-
            # string cells carry no claims at all (the ADVICE r12
            # withhold rule).
            if filters and not opts.coerce_to_string:
                pts0 = SI.decode_split_index(wb.zf, sheet.path)
                ivstats = (
                    SI.decode_interval_stats(wb.zf, sheet.path, pts0)
                    if pts0
                    else None
                )
                ivstr = (
                    SI.decode_interval_string_stats(wb.zf, sheet.path, pts0)
                    if pts0
                    else None
                )
                ivnc = (
                    SI.decode_interval_null_counts(wb.zf, sheet.path, pts0)
                    if pts0 and _has_null_filter(filters)
                    else None
                )
                ivbv = (
                    SI.decode_interval_bool_counts(wb.zf, sheet.path, pts0)
                    if pts0 and _has_bool_eq_filter(filters)
                    else None
                )
                if ivstats or ivstr or ivnc or ivbv:
                    skip_ivals = _plan_interval_skips(
                        filters, self.schema, file_schema.names, ivstats,
                        wb.date1904, ivstr=ivstr, ivnc=ivnc, ivbv=ivbv,
                    )
            cb = (1 << 20) if n_shards > 1 else (4 << 20)
            for cells in wb.iter_rows(
                sheet, skip_rows=file_schema.skip_rows,
                chunk_bytes=cb, shard=shard, n_shards=n_shards,
                skip_intervals=skip_ivals,
            ):
                current_row += 1
                row = [None] * n_cols
                for col, ctype, val in cells:
                    if col >= n_file:
                        # reference :415-422
                        raise ValueError(
                            f"Row {current_row} has more columns than the first row. "
                            f"Has: {col + 1} Expected: {n_file}"
                        )
                    out = keep[col]
                    if out is None:
                        continue  # pruned column: no decode, no buffer
                    if coerce:
                        row[out] = _convert_cell(col_types[out], ctype, val, shared, coerce)
                        continue
                    # Inlined _convert_cell (type-mismatch / T_NONE / T_ERROR
                    # → NULL, SURVEY.md §1.4) — per-cell function calls are
                    # measurable at millions of cells per partition.
                    e = exp_codes[out]
                    if e == 0:
                        if ctype == P.T_STRING_REF:
                            row[out] = shared[val]
                        elif ctype == P.T_STRING_LIT:
                            row[out] = val
                        else:
                            row[out] = None
                    elif e == 1:
                        row[out] = val if ctype == P.T_NUMERIC else None
                    elif e == 2:
                        row[out] = val if ctype == P.T_BOOLEAN else None
                    else:
                        row[out] = int(val / 86400.0) if ctype == P.T_DATE else None
                for i in range(n_cols):
                    columns[i].append(row[i])
                n_buffered += 1
                if n_buffered >= opts.batch_size:
                    yield flush()
                    columns = [[] for _ in range(n_cols)]
                    n_buffered = 0
            if n_buffered:
                yield flush()


    def _read_columnar(
        self, path: str, file_schema, shard: int = 0, n_shards: int = 1,
        keep: list | None = None, filters: tuple = (),
    ):
        """Regex-scan chunks into per-column raw byte lists; type with Arrow.

        Cell semantics identical to _read_rows (SURVEY.md §1.4): absent /
        T_NONE / T_ERROR / type-mismatched cells → NULL. Irregular chunks
        (formulas, attr reordering) are parsed with the expat fragment
        fallback and converted row-wise, then emitted as their own batch —
        correctness never depends on the fast path matching.

        ``keep`` maps file column index → output slot (None = pruned). A
        pruned column's cells are dropped at the raw-bytes stage: no shared-
        string take, no numeric/date cast, no Arrow array build — the parse
        cost of a 100-column sheet read for 3 columns is the regex row scan
        plus 3 columns of decode, not 100.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        opts = self.opts
        col_types = self.col_types
        n_cols = len(col_types)
        if keep is None:
            keep = list(range(n_cols))
        n_file = len(keep)
        names = [f.name for f in self.schema.fields]
        exp_codes = [("VARCHAR", "DOUBLE", "BOOLEAN", "DATE").index(t) for t in col_types]

        with P.XlsxWorkbook(path) as wb:
            sheet = wb.resolve_sheet(opts.sheet_name, opts.sheet_index)
            # LAZY heap: a shard decodes only the string entries its own
            # rows reference (offset index up front, per-batch selective
            # decode in finalize) — the eager full-heap materialization
            # made every shard pay O(heap) CPU + allocations, which under
            # 32 concurrent workers saturated memory bandwidth and made
            # auto-sharding SLOWER than one thread on string-heavy sheets
            # (the partsupp witness; BENCHNOTES round 8).
            heap = wb.shared_strings_lazy()
            date_styles = wb.date_styles
            is_date_style: dict[bytes, bool] = {b"": False}
            colmap: dict[bytes, int] = {}
            dense = None  # (compiled row regex, out slots) once chunk 0 seen

            def finalize(raw_cols: list[list]):
                """Raw bytes-or-None columns → typed Arrow RecordBatch."""
                arrays = []
                for i, code in enumerate(exp_codes):
                    s = pa.array(raw_cols[i], type=pa.binary()).cast(pa.string())
                    if code == 0:  # VARCHAR ← shared-string index
                        # Selective decode: unique refs in THIS batch →
                        # small local heap → vectorized index_in + take
                        # (null refs map to null positions → null takes,
                        # the same NULL semantics as the full-heap take).
                        idx = s.cast(pa.int32())
                        uniq = pc.unique(idx.drop_null())
                        # Bulk decode first: one findall per consecutive
                        # run + one Arrow cast, no per-entry Python
                        # (SharedStringHeap.decode_many_arrow); scalar
                        # per-entry decode for shapes it declines.
                        small = None
                        if hasattr(heap, "decode_many_arrow") and len(uniq):
                            small = heap.decode_many_arrow(uniq.to_numpy())
                        if small is None:
                            small = pa.array(
                                heap.decode_many(uniq.to_pylist())
                                if hasattr(heap, "decode_many")
                                else [heap[j] for j in uniq.to_pylist()],
                                type=pa.string(),
                            )
                        if idx.null_count == 0 and len(uniq) == len(idx):
                            # All refs distinct and non-null (the unique-
                            # comment shape, e.g. partsupp): uniq preserves
                            # first-occurrence order, so the decoded array
                            # IS the column — skip the index_in + take.
                            arrays.append(small)
                        else:
                            pos = pc.index_in(idx, value_set=uniq)
                            arrays.append(pc.take(small, pos))
                    elif code == 1:  # DOUBLE
                        arrays.append(s.cast(pa.float64()))
                    elif code == 2:  # BOOLEAN (b-cell payload: 1/0/true/false)
                        # is_in maps null→false; if_else restores the nulls.
                        arrays.append(
                            pc.if_else(
                                pc.is_valid(s),
                                pc.is_in(
                                    pc.utf8_trim_whitespace(s),
                                    value_set=pa.array(["1", "true", "TRUE"]),
                                ),
                                pa.scalar(None, type=pa.bool_()),
                            )
                        )
                    else:  # DATE — replicate (int)(serial_to_epoch_secs/86400)
                        serial = s.cast(pa.float64())
                        if wb.date1904:
                            secs = pc.multiply(pc.subtract(serial, 24107.0), 86400.0)
                        else:
                            # 1900 leap quirk (parser.serial_to_epoch_secs):
                            # serials < 61 shift a day; phantom 60 → Feb 28.
                            eff = pc.if_else(
                                pc.less(serial, 61.0),
                                pc.add(pc.min_element_wise(serial, pa.scalar(59.0)), 1.0),
                                serial,
                            )
                            secs = pc.multiply(pc.subtract(eff, 25569.0), 86400.0)
                        days = pc.trunc(pc.divide(secs, 86400.0))
                        arrays.append(days.cast(pa.int32()).cast(pa.date32()))
                return pa.RecordBatch.from_arrays(arrays, names=names)

            def fragment_batch(work: bytes):
                """Slow-path conversion of one irregular chunk."""
                rows = P._fragment_rows(work, colmap, date_styles, wb.date1904)
                typed_cols: list[list] = [[] for _ in range(n_cols)]
                shared = wb.shared_strings
                for cells in rows:
                    row = [None] * n_cols
                    for col, ctype, val in cells:
                        if col >= n_file:
                            raise ValueError(
                                f"Row has more columns than the first row. "
                                f"Has: {col + 1} Expected: {n_file}"
                            )
                        out = keep[col]
                        if out is None:
                            continue
                        row[out] = _convert_cell(col_types[out], ctype, val, shared, False)
                    for i in range(n_cols):
                        typed_cols[i].append(row[i])
                arrow_type = {
                    "VARCHAR": pa.string(),
                    "DOUBLE": pa.float64(),
                    "BOOLEAN": pa.bool_(),
                    "DATE": pa.date32(),
                }
                return pa.RecordBatch.from_arrays(
                    [
                        pa.array(typed_cols[i], type=arrow_type[col_types[i]])
                        for i in range(n_cols)
                    ],
                    names=names,
                ), len(rows)

            skip_n = file_schema.skip_rows
            batch_rows = 0
            raw_cols: list[list] = [[] for _ in range(n_cols)]
            chunk_idx = 0
            rows_seen = 0  # global row ordinal, identical across all shards
            pfx = None  # element prefix, detected from the worksheet opener
            pr = None

            def _process(work: bytes):
                """Parse one row-aligned chunk (identical semantics for the
                sequential and the split-index acquisition below); yields
                finished Arrow batches and mutates the enclosing scan state.
                """
                nonlocal batch_rows, raw_cols, chunk_idx, rows_seen, dense
                assigned = (chunk_idx % n_shards) == shard
                # Dense-row fast path (parser.build_dense_row_re): one
                # findall per chunk, tuples already in column order —
                # no per-row regex, no per-cell Python. Only when the
                # chunk's match count equals its row count (so any row
                # deviating from the template shape falls back to the
                # generic scan below, which produces identical cells).
                if (
                    assigned and dense and chunk_idx > 0
                    and rows_seen >= skip_n
                    and not P.foreign_row_evidence(work, pfx)
                ):
                    # One memchr pass in the steady case: every dense
                    # match starts "<row " / "<row>", which cannot
                    # match "<rowBreaks", so matches ≤ true rows ≤ the
                    # raw "<row" prefix count — equality with the raw
                    # count proves no rowBreaks AND all rows matched.
                    # Only on mismatch pay the second pass to subtract
                    # rowBreaks before deciding fallback. The
                    # foreign_row_evidence guard (r11) keeps rows under
                    # ANOTHER prefix from hiding behind that equality
                    # (they match neither count) — evidence chunks fall
                    # to the generic scan, which recounts exactly and
                    # fragments.
                    n_raw = work.count(pr.row_start)
                    dm = dense[0].findall(work)
                    n_rows_chunk = (
                        n_raw
                        if len(dm) == n_raw
                        else n_raw - work.count(pr.rowb_start)
                    )
                    if len(dm) == n_rows_chunk:
                        chunk_idx += 1
                        rows_seen += n_rows_chunk
                        if len(dense[1]) == 1:
                            raw_cols[dense[1][0]].extend(dm)
                        else:
                            # Column extract via itemgetter, NOT
                            # zip(*dm): unpacking a million-tuple
                            # argument list measured 3.5× slower
                            # than the per-column C-speed map
                            # (partsupp 1T profile, r10).
                            for j, out in enumerate(dense[1]):
                                raw_cols[out].extend(
                                    map(_op.itemgetter(j), dm)
                                )
                        batch_rows += len(dm)
                        while batch_rows >= opts.batch_size:
                            take = opts.batch_size
                            head = [c[:take] for c in raw_cols]
                            raw_cols = [c[take:] for c in raw_cols]
                            batch_rows -= take
                            yield finalize(head)
                        return
                if assigned or chunk_idx == 0:
                    # Chunk 0 is checked by EVERY shard so the whole-file
                    # fallback decision is consistent across shards.
                    row_matches = pr.row_re.findall(work)
                    n_rows_chunk = len(pr.row_count_re.findall(work))
                    if P.foreign_row_evidence(work, pfx):
                        # Mixed-prefix chunk (r11): the exact any-prefix
                        # count routes it to the fragment parser (mid-
                        # file) or tier 3 (chunk 0) instead of silently
                        # dropping the foreign-prefix rows.
                        n_rows_chunk = P.count_any_row_starts(work)
                    if chunk_idx == 0 and (
                        len(row_matches) != n_rows_chunk
                        or (
                            not row_matches
                            and P._ANY_ROW_RE.search(work)
                        )
                    ):
                        # Second arm: row tags exist but the detected
                        # prefix's scanner sees none (mixed/undetected
                        # prefixes) — without the check such documents
                        # silently read as EMPTY (r9 fix, generalized
                        # for prefix support in r10; mirrored in
                        # parser._scan_chunk). Deterministic across
                        # shards: every shard scans chunk 0.
                        raise P._FastPathUnsupported
                    chunk_regular = len(row_matches) == n_rows_chunk
                    if chunk_idx == 0 and chunk_regular:
                        # Template = chunk 0's last non-empty row (every
                        # shard sees chunk 0, so the decision — and the
                        # compiled pattern — is identical across shards).
                        tmpl = next(
                            (b for b in reversed(row_matches) if b), b""
                        )
                        dense = P.build_dense_row_re(
                            tmpl, keep, exp_codes, date_styles, pfx
                        )
                        # Dense-extract chunk 0 itself (only the owning
                        # shard emits it): findall from the first kept
                        # row's byte offset, so the ~chunk-size head of
                        # the file skips the per-row cell regex too.
                        # Guard and fallback are the same as any other
                        # chunk — a non-matching row (e.g. a mid-chunk
                        # irregular one) drops to the per-row loop
                        # below, which produces identical cells.
                        if assigned and dense and skip_n < n_rows_chunk:
                            if skip_n:
                                it = pr.row_count_re.finditer(work)
                                for _ in range(skip_n):
                                    next(it)
                                off = next(it).start()
                            else:
                                off = 0
                            dm = dense[0].findall(work, off)
                            if len(dm) == n_rows_chunk - skip_n:
                                chunk_idx += 1
                                rows_seen += n_rows_chunk
                                if len(dense[1]) == 1:
                                    raw_cols[dense[1][0]].extend(dm)
                                else:
                                    # itemgetter, not zip(*dm) — see
                                    # the steady-state dense site.
                                    for j, out in enumerate(dense[1]):
                                        raw_cols[out].extend(
                                            map(_op.itemgetter(j), dm)
                                        )
                                batch_rows += len(dm)
                                while batch_rows >= opts.batch_size:
                                    take = opts.batch_size
                                    head = [c[:take] for c in raw_cols]
                                    raw_cols = [c[take:] for c in raw_cols]
                                    batch_rows -= take
                                    yield finalize(head)
                                return
                else:
                    if P.foreign_row_evidence(work, pfx):
                        n_rows_chunk = P.count_any_row_starts(work)
                    else:
                        n_rows_chunk = P.count_row_starts(work, pfx)
                    row_matches = []
                    chunk_regular = True
                chunk_idx += 1

                if not assigned:
                    rows_seen += n_rows_chunk
                    return

                if not chunk_regular:
                    # Irregular mid-file chunk owned by this shard.
                    if batch_rows:
                        yield finalize(raw_cols)
                        raw_cols = [[] for _ in range(n_cols)]
                        batch_rows = 0
                    frag, n_frag = fragment_batch(work)
                    drop = min(max(0, skip_n - rows_seen), n_frag)
                    rows_seen += n_rows_chunk
                    part = frag.slice(drop)
                    if part.num_rows:
                        yield part
                    return

                for body in row_matches:
                    ordinal = rows_seen
                    rows_seen += 1
                    if ordinal < skip_n:
                        continue
                    ms = pr.cell_re.findall(body)
                    if len(ms) != len(pr.cell_count_re.findall(body)):
                        # Irregular row: flush and defer the whole chunk's
                        # remainder to the fragment path is overkill —
                        # handle just this row via fragment parse.
                        if batch_rows:
                            yield finalize(raw_cols)
                            raw_cols = [[] for _ in range(n_cols)]
                            batch_rows = 0
                        frag, _n = fragment_batch(
                            b"<" + pfx + b"row>" + body + b"</" + pfx + b"row>"
                        )
                        if frag.num_rows:
                            yield frag
                        continue
                    row = [None] * n_cols
                    for letters, s_attr, t_attr, v in ms:
                        col = colmap.get(letters)
                        if col is None:
                            col = colmap[letters] = P.column_index(letters.decode())
                        if col >= n_file:
                            raise ValueError(
                                f"Row has more columns than the first row. "
                                f"Has: {col + 1} Expected: {n_file}"
                            )
                        out = keep[col]
                        if out is None:
                            continue  # pruned column: raw bytes dropped here
                        if not v:
                            continue  # absent / empty cell → NULL
                        code = exp_codes[out]
                        if not t_attr or t_attr == b"n":
                            dated = is_date_style.get(s_attr)
                            if dated is None:
                                dated = is_date_style[s_attr] = int(s_attr) in date_styles
                            if code == (3 if dated else 1):
                                row[out] = v
                        elif t_attr == b"s":
                            if code == 0:
                                row[out] = v
                        elif t_attr == b"b":
                            if code == 2:
                                row[out] = v
                        elif t_attr in (b"str", b"inlineStr"):
                            raise ValueError(P.UNSUPPORTED_STRING_ERROR)
                        # t="e" / unknown → NULL (stays None)
                    for i in range(n_cols):
                        raw_cols[i].append(row[i])
                    batch_rows += 1
                    if batch_rows >= opts.batch_size:
                        yield finalize(raw_cols)
                        raw_cols = [[] for _ in range(n_cols)]
                        batch_rows = 0

            # Split-index acquisition (splitindex module doc): when our
            # writer left Z_FULL_FLUSH points + the offset/row index in the
            # archive comment, each shard seeks straight to its intervals
            # and inflates ONLY those — total decompression returns to 1x
            # the file instead of n_shards x (the one per-shard fixed cost
            # of the chunk round-robin design that did not divide). The
            # index is untrusted input: decode validates structure, and
            # every materialized interval's parsed row count is checked
            # against the recorded one — a lying index fails loudly, never
            # silently wrong. Single-shard reads keep the sequential scan
            # (same bytes, no seek benefit).
            split_pts = (
                SI.decode_split_index(wb.zf, sheet.path)
                if (n_shards > 1 or filters)
                else None
            )
            # Interval pruning (r11): when the index carries per-interval
            # min/max stats and this query pushed filters, intervals the
            # stats prove empty of matches are never inflated — treated
            # exactly like unassigned intervals (the recorded count keeps
            # the global row ordinal). The downstream Arrow mask would
            # have dropped every row in them anyway; the stats only
            # decide WHERE the dropping happens (before the byte level).
            skip_ivals: frozenset = frozenset()
            if split_pts and filters:
                ivstats = SI.decode_interval_stats(wb.zf, sheet.path, split_pts)
                ivnc = (
                    SI.decode_interval_null_counts(
                        wb.zf, sheet.path, split_pts
                    )
                    if _has_null_filter(filters)
                    else None
                )
                ivstr = SI.decode_interval_string_stats(
                    wb.zf, sheet.path, split_pts
                )
                ivbv = (
                    SI.decode_interval_bool_counts(
                        wb.zf, sheet.path, split_pts
                    )
                    if _has_bool_eq_filter(filters)
                    else None
                )
                if ivstats or ivstr or ivnc or ivbv:
                    skip_ivals = _plan_interval_skips(
                        filters, self.schema, file_schema.names, ivstats,
                        wb.date1904, ivstr=ivstr, ivnc=ivnc, ivbv=ivbv,
                    )
            if split_pts and n_shards == 1 and not skip_ivals:
                # Single-shard with nothing to prune: the sequential scan
                # reads the same bytes without per-interval seeks.
                split_pts = None
            if split_pts:
                for i, work, rows_in in SI.iter_intervals(
                    wb.path, wb.zf, sheet.path, split_pts, shard, n_shards,
                    skip=skip_ivals,
                ):
                    if work is None:
                        # Unassigned interval: bytes untouched — the
                        # recorded count keeps the global row ordinal.
                        rows_seen += rows_in
                        chunk_idx += 1
                        continue
                    if i == 0:
                        pfx = P.detect_row_prefix(work)
                        if pfx is None:
                            raise P._FastPathUnsupported
                        pr = P.prefix_res(pfx)
                    before_seen = rows_seen
                    yield from _process(work)
                    if rows_seen - before_seen != rows_in:
                        raise ValueError(
                            "sheetreader: split-index row count mismatch"
                            f" in {sheet.path} interval {i} (parsed"
                            f" {rows_seen - before_seen}, index says"
                            f" {rows_in}) — the archive comment is stale"
                            " or corrupt; remove it or rewrite the file"
                        )
            else:
                # Smaller chunks when sharded → even round-robin load balance.
                chunk_bytes = (1 << 20) if n_shards > 1 else (4 << 20)
                with wb.zf.open(sheet.path) as f:
                    buf = b""
                    while True:
                        data = f.read(chunk_bytes)
                        if data:
                            buf += data
                            if pfx is None:
                                # Prefixed worksheets (<x:row>) scan and shard
                                # on this same columnar tier (r10; previously
                                # they defeated to the single-stream whole-file
                                # walk — the reference parallelizes every
                                # document shape). Stream-deterministic: every
                                # shard reads the same head bytes.
                                pfx = P.detect_row_prefix(buf)
                                if pfx is None:
                                    if len(buf) < (64 << 20):
                                        continue
                                    raise P._FastPathUnsupported
                                pr = P.prefix_res(pfx)
                            cut = buf.rfind(pr.row_end)
                            if cut == -1:
                                if len(buf) < (64 << 20):
                                    continue
                                if rows_seen:
                                    # Batches may already be downstream; falling
                                    # back would re-parse from the start and
                                    # duplicate rows — hard error instead.
                                    raise ValueError(
                                        "sheetreader: row exceeds 64MB without a "
                                        f"</row> boundary mid-file in {sheet.path}"
                                    )
                                raise P._FastPathUnsupported  # stream-deterministic:
                                # every shard sees the same bytes → same decision
                            end = cut + len(pr.row_end)
                            work, buf = buf[:end], buf[end:]
                        else:
                            if pfx is None:
                                pfx = P.detect_row_prefix(buf) or b""
                                pr = P.prefix_res(pfx)
                            work, buf = buf, b""


                        yield from _process(work)
                        if not data:
                            break
            if batch_rows:
                yield finalize(raw_cols)

class SheetReaderStreamReader(SimpleDataSourceStreamReader):
    """File-arrival streaming ingest of spreadsheets (SURVEY.md §7 PR6).

    Offset = the sorted list of files already processed; each microbatch
    reads every file newly matching the glob. Replay between two committed
    offsets re-parses the file-set difference — parsing is deterministic, so
    recovery is exact. Beyond-reference by construction (the reference is
    batch-only and single-file, src/sheetreader_extension.cpp:644-651).
    """

    def __init__(self, options, schema: StructType):
        self.raw_path = options.get("path") or ""
        self.options = dict(options)
        self.schema = schema
        self.col_types = [
            _SPARK_TO_SQL[f.dataType.typeName()] for f in schema.fields
        ]

    def _current_files(self) -> list[str]:
        if _glob.has_magic(self.raw_path):
            got = sorted(_glob.glob(self.raw_path))
            if not got:  # literal glob-looking file or directory
                if os.path.isdir(self.raw_path):
                    return sorted(_glob.glob(os.path.join(
                        _glob.escape(self.raw_path), "*.xlsx"
                    )))
                if os.path.isfile(self.raw_path):
                    return [self.raw_path]
            return got
        if os.path.isdir(self.raw_path):
            return sorted(
                _glob.glob(os.path.join(_glob.escape(self.raw_path), "*.xlsx"))
            )
        return [self.raw_path] if os.path.exists(self.raw_path) else []

    def initialOffset(self) -> dict:
        return {"processed": []}

    def read(self, start: dict):
        seen = set(start.get("processed", []))
        new = [f for f in self._current_files() if f not in seen]
        end = {"processed": sorted(seen | set(new))}
        # A list, not a generator: pyspark's prefetch cache copy.copy()s the
        # returned value to allow re-reads (datasource_internal.getCache).
        return list(self._rows(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        new = sorted(set(end.get("processed", [])) - set(start.get("processed", [])))
        return list(self._rows(new))

    def _rows(self, paths: list[str]):
        import datetime as dt

        opts_dict = dict(self.options)
        col_types = self.col_types
        n_cols = len(col_types)
        epoch = dt.date(1970, 1, 1)
        for path in paths:
            opts_dict["path"] = path
            opts = _Options.from_options(opts_dict)
            file_schema = _infer_or_declared(
                path, opts, [f.name for f in self.schema.fields], col_types
            )
            with P.XlsxWorkbook(path, allow_inline=opts.inline_strings) as wb:
                sheet = wb.resolve_sheet(opts.sheet_name, opts.sheet_index)
                shared = wb.shared_strings
                for cells in wb.iter_rows(sheet, skip_rows=file_schema.skip_rows):
                    row = [None] * n_cols
                    for col, ctype, val in cells:
                        if col >= n_cols:
                            raise ValueError(
                                f"Row has more columns than the schema. "
                                f"Has: {col + 1} Expected: {n_cols}"
                            )
                        v = _convert_cell(
                            col_types[col], ctype, val, shared, opts.coerce_to_string
                        )
                        if col_types[col] == "DATE" and isinstance(v, int):
                            v = epoch + dt.timedelta(days=v)
                        row[col] = v
                    yield tuple(row)


def row_count(
    path: str,
    sheet_name: str | None = None,
    sheet_index: int | None = None,
    skip_rows: int = 0,
    has_header: bool = False,
    inline_strings: bool = False,
    trust_dimension: bool = False,
) -> int:
    """Data-row count without cell conversion — the ``COUNT(*)`` fast path
    the reference leaves on the table (it knows mDimension at bind,
    sheetreader_extension.cpp:783-786, yet replays the full parse;
    SURVEY.md §3.3).

    Default path: stream the decompressed sheet and regex-count ``<row>``
    tags (``XlsxWorkbook.count_rows``) — no cell parse, no shared-string
    resolution, and exactly equal to what a scan yields even on SPARSE
    sheets (omitted ``<row>`` elements) or files with a stale/over-wide
    ``<dimension>`` tag, both common in third-party writers.

    ``trust_dimension=True`` serves the count from the ``<dimension>`` tag
    alone (row span minus the effective skip; the only parsing is the
    two-row schema probe). PRECONDITION: the sheet must be dense — every
    row in the dimension span present as a ``<row>`` element — and the tag
    accurate. Files written by this package's ``write_xlsx`` satisfy this;
    for unknown writers the tag can over-count, silently disagreeing with
    the scan, so the streaming count is the default.
    """
    with P.XlsxWorkbook(path, allow_inline=inline_strings) as wb:
        sheet = wb.resolve_sheet(sheet_name, sheet_index)
        schema = infer_schema(
            wb, sheet, skip_rows=skip_rows, has_header=has_header
        )
        if trust_dimension:
            dim = wb.dimension(sheet)
            if dim is not None:
                return max(0, dim[0] - schema.skip_rows)
        # Split-indexed files serve the count from the index terminal —
        # near-O(1) instead of streaming the member (a 10 GB sheet's
        # count should not cost a full inflate). Unlike the opt-in
        # <dimension> shortcut, this stays DEFAULT-ON because it
        # self-validates (r11 review: an unvalidated comment could go
        # stale while remaining structurally decodable): interval 0 is
        # inflated and its parsed row count checked against the recorded
        # one — the same check every sharded read applies — and ANY
        # disagreement (count, zlib error, anything) falls back to the
        # exact streaming count.
        pts = SI.decode_split_index(wb.zf, sheet.path)
        if pts is not None:
            try:
                for _i, work, rows_in in SI.iter_intervals(
                    wb.path, wb.zf, sheet.path, pts[:1], 0, 1
                ):
                    if P.count_any_row_starts(work) != rows_in:
                        raise ValueError("interval-0 count mismatch")
                return max(0, pts[-1][1] - schema.skip_rows)
            except Exception:
                pass  # stale/corrupt index: the streaming count is exact
        return max(0, wb.count_rows(sheet) - schema.skip_rows)


def _convert_cell(expected: str, ctype: int, val, shared: list[str], coerce: bool):
    """Reference TypesCompatible + SetCell/SetCellString semantics
    (src/sheetreader_extension.cpp:139-250): type-incompatible / T_NONE /
    T_ERROR cells → NULL silently (SURVEY.md §1.4)."""
    if ctype in (P.T_NONE, P.T_ERROR):
        return None
    if expected == "VARCHAR":
        if coerce:
            return _coerce_to_string(ctype, val, shared)
        if ctype == P.T_STRING_REF:
            return shared[val]
        if ctype == P.T_STRING_LIT:
            return val
        return None
    if expected == "DOUBLE":
        return float(val) if ctype == P.T_NUMERIC else None
    if expected == "BOOLEAN":
        return bool(val) if ctype == P.T_BOOLEAN else None
    if expected == "DATE":
        if ctype != P.T_DATE:
            return None
        return P.epoch_seconds_to_days(val)
    return None


def _coerce_to_string(ctype: int, val, shared: list[str]) -> str | None:
    """SetCellString (:182-221): numerics via std::to_string → fixed 6
    decimals; booleans TRUE/FALSE; dates YYYY-MM-DD."""
    import datetime as dt

    if ctype == P.T_STRING_REF:
        return shared[val]
    if ctype == P.T_STRING_LIT:
        return val
    if ctype == P.T_NUMERIC:
        return f"{float(val):.6f}"
    if ctype == P.T_BOOLEAN:
        return "TRUE" if val else "FALSE"
    if ctype == P.T_DATE:
        days = P.epoch_seconds_to_days(val)
        return (dt.date(1970, 1, 1) + dt.timedelta(days=days)).isoformat()
    return None
