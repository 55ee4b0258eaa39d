"""Retrofit the split index onto FOREIGN xlsx files (VERDICT r11 task 1).

The splittable-read economics (splitindex module doc: sharded reads seek
straight to their own intervals and total decompression returns to 1× the
file) previously applied only to files OUR writer produced — but real
corpora are Excel/openpyxl output, which still paid O(shards × file)
decompression on a sharded read. ``index_xlsx(path)`` closes that gap with
one sequential pass:

* the target worksheet (the one the default scan resolves, or an explicit
  ``sheet_name``/``sheet_index``) and the shared-strings heap are
  RE-DEFLATED with ``Z_FULL_FLUSH`` points at row / entry boundaries every
  ~4 MB of uncompressed XML (the writer's own ``_write_indexed_member``,
  so point placement, thinning, and count discipline are shared code);
* every other member is copied RAW — the compressed bytes land in the new
  archive verbatim, so styles, drawings, pivot caches, macros, anything we
  do not parse survives bit-identical;
* the (offset, cumulative count) index is published on the zip archive
  comment exactly as the writer does, and the output replaces the input
  atomically (``os.replace`` through a sibling temp file) unless
  ``out_path`` says otherwise.

Counting convention: the reader validates every materialized interval's
parsed row count against the recorded one and fails loudly on mismatch, so
the retrofit counts rows EXACTLY as ``parser.count_row_starts`` does —
``<{pfx}row`` occurrences minus ``<{pfx}rowB`` (rowBreaks), prefix detected
from the worksheet opener like the scan tiers. Foreign row shapes
(``<row>``, ``<row r=.. spans=..>``, self-closing, prefixed) all count
correctly because the needle is the same byte pattern the reader counts.

The reference core never needs this: it splits the DECOMPRESSED buffer
in-process (/root/reference/src/sheetreader_extension.cpp:775), an option
distributed executors don't have. The retrofit gives any third-party file
the same property across a fleet.
"""

from __future__ import annotations

import os
import struct
import zipfile

from .parser import (
    _SST_PFX_RE,
    XlsxWorkbook,
    count_row_starts,
    detect_row_prefix,
    prefix_res,
)
from .splitindex import (
    SST_ENTRY,
    member_data_offset,
    strip_count_entry,
    truncated_string_bounds,
)
from .writer import _col_letter, _publish_index, _write_indexed_member


class _IntervalStatsCollector:
    """Per-interval min/max per column letter, collected from the
    retrofit pass's own bytes (VERDICT r11 task 2 — the parquet
    row-group-stats pattern for XLSX): buffers one interval's uncompressed
    XML at a time, parses its cells with the same prefix-compiled cell
    regex the reader scans with, and folds raw ``<v>`` values of untyped /
    ``t="n"`` cells (date serials stay raw — the reader converts filter
    dates to serial envelopes). With an ``sst`` resolver (r12), STRING
    cells (``t="s"``) additionally fold to truncated (lo, hi) bounds over
    the RESOLVED shared-string values — resolution order cannot matter
    because min/max commute, and the stored bounds use the over-keep-only
    truncation rule (splitindex.truncated_string_bounds). Value COUNTS
    per type family (r13, the ``nc`` section — [numeric_plain, string,
    boolean, date_styled], splitindex module comment) ride the same
    pass: they need no heap and no float parse, only the t/s attrs the
    regex already captured, and they feed IsNull/IsNotNull pruning.
    Honesty rules, all conservative toward NOT pruning:

    * an interval whose cell-regex match count disagrees with its raw
      ``<c`` count (irregular cells the regex can't see) records None for
      EVERY column in that interval;
    * so does an interval containing ``t="str"``/``t="inlineStr"`` cells
      the default reader refuses — pruning must not skip the error the
      unfiltered read raises (ADVICE r12);
    * a column whose values fail float parse — or contain NaN — records
      None for that interval; a string cell whose sst reference fails to
      resolve, or whose max admits no honest truncated upper bound,
      likewise drops that column's string claim;
    * fine-grained intervals are realigned to the FINAL (possibly
      2:1-thinned) point list by cumulative row count; any misalignment
      drops all stats;
    * a buffered interval above 64 MB disables collection outright
      (bounded memory beats stats);
    * count-specific: a column whose family totals exceed the interval's
      row count (duplicate cell refs — malformed OOXML that could let
      IsNull-pruning overclaim) withholds ITS counts for the interval,
      and with an unknown date-style mapping any STYLED numeric cell
      does the same (the cell's decode family is undecidable).
    """

    _MAX_BUFFER = 64 << 20
    # Deferred-resolution budget (r13, the big-heap path): stored sst
    # ref indices per column / per collector. 4M int64 refs ≈ 32 MB a
    # column, 8M ≈ 64 MB total — crossing a cap sheds that column's
    # (then the largest columns') STRING claims only; numeric/bool/count
    # claims and the index itself are untouched.
    _DEFER_COL_CAP = 4 << 20
    _DEFER_TOTAL_CAP = 8 << 20

    def __init__(
        self, pfx: bytes, sst: "list[str] | None" = None,
        date_styles: "frozenset[int] | None" = None,
        defer_strings: bool = False,
        pool=None, pool_size: int = 0,
    ):
        pr = prefix_res(pfx)
        self._pfx = pfx
        self._cell_re = pr.cell_re
        self._cell_count_re = pr.cell_count_re
        self._sst = sst
        # Optional fork Pool (r13): interval analysis runs in worker
        # PROCESSES (the regex/fold slices are GIL-bound and were the
        # reason stats=True gained nothing from the r12 thread fan-out);
        # an eager heap rides into the workers via fork COW
        # (_POOL_HEAP). fine[] holds AsyncResults until _drain realizes
        # them head-first, so claim order — and output bytes — are
        # identical to the serial path.
        self._pool = pool
        self._pool_size = pool_size
        self._head = 0
        # Deferred string bounds (r13): instead of resolving t="s" refs
        # against a RESIDENT heap (the r12 design, whose 256 MB gate
        # dropped string stats on big-sst files entirely), record each
        # interval's UNIQUE ref indices and fold bounds later in ONE
        # streaming pass over the heap (_resolve_deferred_strings) —
        # collector memory is O(unique refs, capped) instead of O(heap).
        self._defer = defer_strings
        self._defer_refs: list = []    # (fine_idx, col, np.int64 uniques)
        self._defer_counts: dict = {}  # col -> stored ref total
        self._defer_dead: set = set()  # cols shed by budget/garbage
        self._defer_dead_b: set = set()  # bytes twin for the cell loop
        self._defer_resolved = False
        # Style indices that decode numeric cells as DATE (parser
        # semantics: styled-in-set → T_DATE, else T_NUMERIC). The count
        # section splits the numeric family on this because the READER
        # does (a date-styled cell is NULL to a DOUBLE column and vice
        # versa). None = mapping unknown: a column seeing any STYLED
        # numeric cell then withholds its count claim for that interval
        # (sound both ways); unstyled numerics are always T_NUMERIC.
        self._date_styles = date_styles
        self._buf: list = []
        self._size = 0
        self._cum = 0
        # [(cum_rows_at_interval_end,
        #   {letters: (mn, mx)} | None,          numeric claims
        #   {letters: (lo, hi)} | None,          string-bound claims
        #   {letters: (n,s,b,d) | None} | None,  value-count claims
        #   {letters: (n_true, n_false) | None} | None)]  bool values
        self.fine: list = []
        self.dead = False

    def on_piece(self, piece: bytes, flushed: bool) -> None:
        if self.dead:
            return
        self._buf.append(piece)
        self._size += len(piece)
        if self._size > self._MAX_BUFFER:
            self.dead = True
            self._buf = []
            return
        if flushed:
            self._close()

    def _close(self) -> None:
        data = b"".join(self._buf)
        self._buf = []
        self._size = 0
        if self._pool is not None:
            # GIL-free lane (r13, VERDICT task 4): the regex scan +
            # numpy folds of one interval are pure CPU on immutable
            # bytes — ship them to a forked worker and realize results
            # IN ORDER later. Backpressure caps in-flight work so the
            # (faster) inflate producer can't queue a whole file.
            self.fine.append(self._pool.apply_async(
                _analyze_interval_pooled,
                (data, self._pfx, self._date_styles, self._defer,
                 frozenset(self._defer_dead_b)),
            ))
            self._drain(max_pending=2 * self._pool_size)
        else:
            rec = self._finish_record(
                _analyze_interval(
                    data, self._pfx, self._date_styles, self._sst,
                    self._defer, dead_cols=self._defer_dead_b,
                ),
                len(self.fine),
            )
            if rec is not None:
                self.fine.append(rec)

    def _finish_record(self, r, fi: int):
        """Fold one interval's analysis into collector state, in stream
        order (cum accumulation + deferred-ref bookkeeping live HERE, on
        the parent side, so pooled and serial runs build byte-identical
        claims). Returns the fine tuple for slot ``fi``, or None after
        marking the collector dead."""
        if r is None:
            # a pooled worker failed analysing this interval: claims are
            # an optimization — die quietly, the index itself is fine
            self.dead = True
            self.fine = []
            self._defer_refs = []
            return None
        rows_in, stats, sstats, nc, bv, drefs = r
        self._cum += rows_in
        if drefs:
            for col, arr in drefs.items():
                if col in self._defer_dead:
                    continue
                self._defer_refs.append((fi, col, arr))
                self._defer_counts[col] = (
                    self._defer_counts.get(col, 0) + int(arr.size)
                )
            self._enforce_defer_budget()
        return (self._cum, stats, sstats, nc, bv)

    def _drain(self, max_pending: int) -> None:
        """Realize pooled results from the head of ``fine`` — completed
        ones always, blocking only while more than ``max_pending`` are
        outstanding (0 = realize everything). Head-first realization
        keeps cum accumulation (and with it every claim) in stream
        order regardless of worker completion order."""
        while not self.dead and self._head < len(self.fine):
            rec = self.fine[self._head]
            if isinstance(rec, tuple):
                self._head += 1
                continue
            if len(self.fine) - self._head <= max_pending and not rec.ready():
                break
            made = self._finish_record(rec.get(), self._head)
            if made is None:
                return  # dead: fine already cleared
            self.fine[self._head] = made
            self._head += 1

    def flush_realize(self) -> None:
        """Close any trailing buffer and realize every pooled result —
        required before reading ``fine``/deferred refs (aligned() and
        the deferred resolver call it)."""
        if self._buf:
            self._close()
        self._drain(max_pending=0)

    def _shed_defer_col(self, col: str) -> None:
        self._defer_dead.add(col)
        self._defer_dead_b.add(col.encode())
        self._defer_refs = [r for r in self._defer_refs if r[1] != col]
        self._defer_counts.pop(col, None)

    def _enforce_defer_budget(self) -> None:
        """Cap deferred-ref memory: a column past _DEFER_COL_CAP sheds
        itself; past _DEFER_TOTAL_CAP the largest columns shed until the
        rest fit. Shedding only loses string-bound claims for those
        columns — the documented graceful degradation (the r12 design
        lost ALL string stats on big heaps; this loses only the
        highest-cardinality columns, and only above ~4M uniques)."""
        for col, n in list(self._defer_counts.items()):
            if n > self._DEFER_COL_CAP:
                self._shed_defer_col(col)
        while sum(self._defer_counts.values()) > self._DEFER_TOTAL_CAP:
            self._shed_defer_col(
                max(self._defer_counts, key=self._defer_counts.get)
            )

    @property
    def defer_shed(self) -> list:
        """Columns whose string bounds were shed by the deferred budget
        (observability: index_xlsx reports them)."""
        return sorted(self._defer_dead)

    def aligned(
        self, points: "list | None", total_rows: int
    ) -> "tuple[dict | None, dict | None, dict | None, dict | None]":
        """(numeric, string, counts, bool-values) per-column arrays
        aligned to the SURVIVING points (the encode payload shapes —
        flat [lo, hi, ...] pairs for the bound kinds, one
        ``None | [n, s, b, d]`` entry per interval for the count kind,
        ``None | [n_true, n_false]`` for the bool-value kind); each side
        is None when collection died / misaligned / nothing to claim."""
        if self.dead or points is None:
            return None, None, None, None  # nothing to align
        self.flush_realize()
        if self.dead or points is None:
            return None, None, None, None
        if self._defer and self._defer_refs and not self._defer_resolved:
            raise RuntimeError(
                "deferred string bounds not resolved — run "
                "_resolve_deferred_strings over the heap first"
            )
        bounds = [cum for _, cum in points] + [total_rows]
        outs: list = []
        for kind in (1, 2, 3, 4):  # numeric, string, counts, bool values
            # kinds 3/4 are COUNT kinds (element-wise sum, zero default);
            # 1/2 are BOUND kinds (envelope merge, absence claims nothing)
            zero = (0, 0, 0, 0) if kind == 3 else (0, 0)
            letters_all = sorted(
                {k for rec in self.fine if rec[kind] for k in rec[kind]}
            )
            if not letters_all:
                outs.append(None)
                continue
            out = {k: [] for k in letters_all}
            fi = 0
            ok = True
            for b in bounds:
                merged: "dict | None" = {}
                at = None
                took = False
                while fi < len(self.fine) and self.fine[fi][0] <= b:
                    rec = self.fine[fi]
                    at, st = rec[0], rec[kind]
                    fi += 1
                    took = True
                    if merged is None or st is None:
                        merged = None
                        continue
                    if kind in (3, 4):
                        # element-wise SUM; a letter ABSENT from a valid
                        # record is a true zero (the interval holds no
                        # cells of that column — all-null), unlike the
                        # bound kinds where absence claims nothing. A
                        # per-column None (style-undecidable / duplicate
                        # guard) poisons that column for the group.
                        for k, t in st.items():
                            got = merged.get(k, zero)
                            if t is None or got is None:
                                merged[k] = None
                            else:
                                merged[k] = tuple(
                                    x + y for x, y in zip(got, t)
                                )
                    else:
                        for k, (mn, mx) in st.items():
                            got = merged.get(k)
                            merged[k] = (
                                (mn, mx)
                                if got is None
                                else (min(got[0], mn), max(got[1], mx))
                            )
                if took and at != b:
                    ok = False  # fine/survivor cum mismatch: claim nothing
                    break
                # not took: a ZERO-ROW interval (duplicate cumulative
                # bound — e.g. the final flush landed exactly on the last
                # row and only the trailer followed). Nothing to claim,
                # nothing wrong; the r11 review caught this dropping ALL
                # stats for such files. (For counts an all-zero claim on
                # a zero-row interval is vacuously true.)
                for k in letters_all:
                    if kind in (3, 4):
                        got = (
                            merged.get(k, zero)
                            if merged is not None
                            else None
                        )
                        out[k].append(
                            strip_count_entry(got) if got is not None
                            else None
                        )
                    else:
                        got = (merged or {}).get(k)
                        if got is None:
                            out[k].extend((None, None))
                        else:
                            out[k].extend(got)
            outs.append(out if ok else None)
        return outs[0], outs[1], outs[2], outs[3]


# Eager shared-strings heap for POOLED interval analysis: set in the
# parent immediately before the fork Pool is constructed, inherited by
# every worker via copy-on-write (zero serialization — the reason the
# pool uses the fork context explicitly). None in deferred/no-heap runs.
_POOL_HEAP: "list[str] | None" = None


def _analyze_interval(
    data: bytes, pfx: bytes, date_styles, sst, defer: bool,
    dead_cols: "frozenset | set" = frozenset(),
):
    """Pure per-interval analysis (the collector's old ``_close`` body,
    extracted so a forked worker can run it on raw bytes): returns
    ``(rows_in, stats, sstats, nc, bv, defer_refs)`` where the claim
    slots are None for withheld intervals and ``defer_refs`` maps column
    letters to unique sst ref arrays (deferred mode only). All honesty
    rules documented on _IntervalStatsCollector live here."""
    import numpy as np

    pr = prefix_res(pfx)
    rows_in = count_row_starts(data, pfx)
    withheld = (rows_in, None, None, None, None, None)
    ms = pr.cell_re.findall(data)
    if len(ms) != len(pr.cell_count_re.findall(data)):
        # unseen cells: no claims
        return withheld
    if any(t in (b"str", b"inlineStr") for _l, _s, t, _v in ms):
        # Cells the default reader REFUSES (formula/inline strings →
        # UNSUPPORTED_STRING_ERROR): claiming stats here would let a
        # pruned filtered read silently succeed where the unfiltered
        # read of the same file errors — withhold the whole interval
        # so it always inflates and raises identically (ADVICE r12).
        # (Most such cells already land in the count-mismatch branch
        # above — their <is>/<f> children defeat the cell regex — but
        # a bare `<c t="str"><v>…</v></c>` matches and needs this.)
        return withheld
    per: dict = {}
    per_s: dict = {}
    # Value counts per letter (r13, the `nc` section): how many cells
    # decode NON-NULL per type family — [numeric_plain, string,
    # boolean, date_styled] (splitindex module comment). Counted for
    # every family regardless of sst availability (counts need no
    # heap), so null-pruning works even on files whose string BOUNDS
    # are withheld. Cells of any other shape (t="e", empty <v>,
    # unknown t) decode to NULL in every scan tier and count nowhere,
    # which is exactly the claim.
    ncounts: dict = {}
    # Boolean VALUE counts per letter (r15, the `bt` section):
    # [n_true, n_false] over the interval's t="b" cells, truth decided
    # exactly as the reader decodes: the vectorized path trims UNICODE
    # whitespace (pc.utf8_trim_whitespace) before the {"1","true","TRUE"}
    # test, and Python's str.strip() matches it on every BMP codepoint
    # (swept exhaustively, r15 review — bytes.strip() does NOT: it is
    # ASCII-only, so an NBSP-prefixed "true" counted false here while
    # the reader decoded it True, and an EqualTo(True) probe pruned the
    # row away). An undecodable payload withholds the column's claim.
    bcounts: dict = {}
    for letters, s_attr, t_attr, v in ms:
        if v and (not t_attr or t_attr == b"n"):
            per.setdefault(letters, []).append(v)
            if not s_attr:
                fam = 0
            elif date_styles is None:
                # style mapping unknown: this cell's decode family is
                # undecidable — the column claims no counts here
                ncounts[letters] = None
                continue
            else:
                fam = 3 if int(s_attr) in date_styles else 0
        elif v and t_attr == b"s":
            # collected for EVERY mode — even budget-shed columns and
            # no-heap files — because the parse-check below is an
            # error-parity obligation, not a claims step (r13 review
            # pass 2: a garbage ref in a shed column must still
            # withhold the interval)
            per_s.setdefault(letters, []).append(v)
            fam = 1
        elif v and t_attr == b"b":
            fam = 2
            bt = bcounts.setdefault(letters, [0, 0])
            if bt is not None:
                try:
                    truth = v.decode("utf-8").strip() in ("1", "true", "TRUE")
                except UnicodeDecodeError:
                    bcounts[letters] = None  # unreproducible decode: no claim
                else:
                    bt[0 if truth else 1] += 1
        else:
            continue
        got = ncounts.setdefault(letters, [0, 0, 0, 0])
        if got is not None:
            got[fam] += 1
    # Duplicate-ref guard: ECMA-376 requires unique cell refs per row,
    # but the count claims (unlike min/max, which duplicates cannot
    # widen) could be INFLATED by a malformed file repeating a ref —
    # letting IsNull-pruning skip an interval that still holds a null
    # row. A letter whose family total exceeds the interval's row
    # count is proof of duplication: withhold that column's counts
    # (bounds claims stay — duplication never changes min/max).
    for k, t in list(ncounts.items()):
        if t is not None and sum(t) > rows_in:
            ncounts[k] = None
    # Same duplicate-ref guard for the boolean value counts: inflated
    # counts can never cause an unsound SKIP (the test is count == 0),
    # but a provably-duplicated column claims nothing anyway.
    for k, t in list(bcounts.items()):
        if t is not None and sum(t) > rows_in:
            bcounts[k] = None
    stats: dict = {}
    for letters, vals in per.items():
        try:
            arr = np.array(vals).astype(np.float64)
        except ValueError:
            # An unparseable numeric <v> makes the READER raise
            # (parser float(v)); the t="str" error-parity rule applies
            # (r13 review): claiming ANYTHING for this interval — any
            # column, any section — would let a pruned filtered read
            # silently succeed where the unfiltered read errors.
            # Withhold the whole interval. (Before r13 this was a
            # per-column skip, which left OTHER columns' claims able
            # to prune the error away.)
            return withheld
        if np.isnan(arr).any():
            continue  # NaN parses fine in the reader: column-level skip
        stats[letters.decode()] = (float(arr.min()), float(arr.max()))
    # Pre-parse EVERY string ref for the same reason: the reader does
    # int(v) on each t="s" cell and raises on garbage — error parity
    # demands no claims at all for an interval the read would die in.
    # OverflowError covers refs past int64 (the reader's Arrow cast
    # raises on those too — r13 review pass 2: np.astype raised it
    # UNCAUGHT and crashed serial retrofits).
    ref_arrs: dict = {}
    for letters, vals in per_s.items():
        try:
            ref_arrs[letters] = np.array(vals).astype(np.int64)
        except (ValueError, OverflowError):
            return withheld
    if per_s and sst is None and not defer:
        # string cells but no usable heap (missing or undecodable sst
        # member): the READ of this interval raises — claim nothing
        return withheld
    sstats: dict = {}
    drefs: "dict | None" = None
    if defer:
        # Each column's UNIQUE ref indices for the one-pass heap fold;
        # the sstats dict stays a live placeholder the resolver fills
        # in (aligned() refuses to run before it). Budget/shedding is
        # PARENT-side bookkeeping (_finish_record); shed columns skip
        # only the dedup/ship cost here — their parse check already
        # ran above.
        drefs = {}
        for letters, arr in ref_arrs.items():
            if arr.size and int(arr.min()) < 0:
                # Negative ref under deferral: an IN-RANGE negative wraps
                # in the reader, but whether this one is in range depends
                # on the heap length — unknown until the post-staging
                # stream. An OUT-of-range negative makes the read raise
                # IndexError, so standing claims would prune the error
                # away (ADVICE r13 medium). Deferral cannot range-check
                # cheaply: withhold the whole interval — the conservative
                # superset of the eager path's arr.min() < -len(sst)
                # withhold. (Checked before the dead_cols skip: shedding
                # drops claims, not the error-parity obligation.)
                return withheld
            if letters in dead_cols:
                continue
            drefs[letters.decode()] = np.unique(arr)
    else:
        for letters, arr in ref_arrs.items():
            if arr.size and (arr.max() >= len(sst) or arr.min() < -len(sst)):
                # the reader raises IndexError on an out-of-heap ref —
                # positive past the end OR negative past the wrap range
                # (ADVICE r13: -999999 on a small heap used to raise here
                # at sst[i] serially and drop all claims pooled): error
                # parity — the whole interval claims nothing
                return withheld
            try:
                # single parse: resolve via the checked int64 array
                # (in-range negative refs wrap in BOTH the reader and
                # here, so bounds stay faithful to reader-visible values)
                resolved = [sst[i] for i in arr.tolist()]
                # Encode-check EVERY resolved entry, not just the two
                # bound candidates (ADVICE r13 low): a lone-surrogate
                # entry strictly between the extremes still makes the
                # unfiltered read fail at Arrow conversion, so claims
                # here could prune the error away. The deferred resolver
                # already checks each referenced entry — this restores
                # eager/deferred parity. Per-string encode, NOT one bulk
                # join+encode (r14 review): the join materialized a
                # concatenated copy of the interval's whole string volume
                # (~2x transient) per column just to catch a rare
                # surrogate; the loop detects the same UnicodeEncodeError
                # with no large allocation.
                for _s in resolved:
                    _s.encode("utf-8")
                bounds = truncated_string_bounds(min(resolved), max(resolved))
            except ValueError:
                # UnicodeEncodeError (lone-surrogate heap string): the
                # read of this interval fails at Arrow conversion —
                # error parity again, whole interval withheld
                return withheld
            if bounds is None:
                continue  # no honest upper bound: claim nothing
            sstats[letters.decode()] = bounds
    nc = {
        k.decode(): (tuple(v) if v is not None else None)
        for k, v in ncounts.items()
    }
    bv = {
        k.decode(): (tuple(v) if v is not None else None)
        for k, v in bcounts.items()
    }
    return rows_in, stats, sstats, nc, bv, drefs


def _analyze_interval_pooled(data, pfx, date_styles, defer, dead_cols):
    """Fork-worker wrapper: the eager heap comes from the inherited
    _POOL_HEAP global; ``dead_cols`` is the parent's shed-column
    snapshot at submit time (workers stop collecting refs for them —
    the parent drops late arrivals regardless, so staleness only costs
    cycles). Any failure returns None (the parent then drops ALL claims
    for the member — stats are an optimization, never worth an error
    the serial path wouldn't raise)."""
    try:
        return _analyze_interval(
            data, pfx, date_styles,
            None if defer else _POOL_HEAP, defer, dead_cols=dead_cols,
        )
    except Exception:  # noqa: BLE001 — worker must never poison the pool
        return None


# One boundary algorithm, one home (r12 consolidation): the any-prefix
# stream counter now lives in rowstream with the other stream counters;
# the old name stays importable for its call/test sites.
from .rowstream import AnyRowStreamCounter as _AnyRowStreamCounter  # noqa: E402


def _strip_zip64_extra(extra: bytes) -> bytes:
    """Drop the zip64 record (id 0x0001) from an extra-field blob: its
    sizes describe the SOURCE archive's encoding and zipfile regenerates
    one when the copied member actually needs it; every other record
    (UTF-8 names, NTFS timestamps, ...) passes through untouched."""
    out = b""
    i = 0
    while i + 4 <= len(extra):
        tid, ln = struct.unpack("<HH", extra[i : i + 4])
        if tid != 0x0001:
            out += extra[i : i + 4 + ln]
        i += 4 + ln
    return out


def _raw_copy(zout: zipfile.ZipFile, src_path: str, info: zipfile.ZipInfo) -> None:
    """Copy one member into ``zout`` verbatim at the compressed-byte level
    (no inflate/deflate round trip): local header from the member's real
    metadata, then the raw data span. The data-descriptor bit clears
    because we write true sizes up front; a zip64 local extra is
    regenerated by ``FileHeader`` only when the sizes require it."""
    import copy as _copy

    doff = member_data_offset(src_path, info)
    zi = _copy.copy(info)
    zi.flag_bits &= ~0x08
    zi.extra = _strip_zip64_extra(info.extra or b"")
    zi.header_offset = zout.fp.tell()
    zip64 = (
        zi.file_size > zipfile.ZIP64_LIMIT
        or zi.compress_size > zipfile.ZIP64_LIMIT
    )
    zout._writecheck(zi)
    zout._didModify = True
    zout.fp.write(zi.FileHeader(zip64=zip64))
    with open(src_path, "rb") as f:
        f.seek(doff)
        remaining = info.compress_size
        while remaining:
            chunk = f.read(min(remaining, 1 << 20))
            if not chunk:
                raise ValueError(
                    f"truncated member data for {info.filename} in {src_path}"
                )
            zout.fp.write(chunk)
            remaining -= len(chunk)
    zout.start_dir = zout.fp.tell()
    zout.filelist.append(zi)
    zout.NameToInfo[zi.filename] = zi


def _inflate_chunks(zf: zipfile.ZipFile, name: str, head: bytes = b""):
    """Uncompressed byte chunks of a member, optionally replaying an
    already-peeked head first."""
    if head:
        yield head
    with zf.open(name) as f:
        while True:
            c = f.read(1 << 20)
            if not c:
                return
            yield c


def _peek(zf: zipfile.ZipFile, name: str, n: int) -> bytes:
    with zf.open(name) as f:
        return f.read(n)


def _reencode_member(zout, zinfo, chunks, boundary, needle, neg, on_piece=None):
    """Re-deflate one member with flush points, preserving its metadata
    (zipfile re-computes CRC/sizes from the actual stream)."""
    import copy as _copy

    zi = _copy.copy(zinfo)
    zi.compress_type = zipfile.ZIP_DEFLATED
    zi.flag_bits &= ~0x08
    zi.extra = _strip_zip64_extra(zinfo.extra or b"")
    zi.CRC = 0
    zi.compress_size = 0
    zi.file_size = 0
    return _write_indexed_member(
        zout, zi, chunks, boundary, needle, neg, on_piece=on_piece
    )


def _stage_members(src_path, jobs, base, stats, stats_sst, workers,
                   tmps_out=None, pool=None, pool_size=0):
    """Re-deflate each splittable member into its own single-member temp
    archive, fanning out across threads (VERDICT r12 task 3: zlib
    releases the GIL in both directions, so independent members'
    inflate+deflate overlaps — retrofit wall time trends toward
    max(member) instead of Σ(members) on multi-sheet workbooks; the
    GIL-bound slices — row counting, stats regexes — still serialize,
    which bounds the speedup honestly). Each worker opens its own
    ZipFile handle (zipfile reads are not safely concurrent on one
    object). Returns ``{filename: {"tmp": path, "r": result}}``.

    Byte-determinism: a staged member's bytes depend only on its own
    source stream and the shared deflate settings, and assembly replays
    archive order — so the final file is identical for ANY worker
    count, including 1 (pinned in tests/test_xlsx_indexer.py)."""
    if workers is None:
        workers = min(4, len(jobs)) or 1

    def _one(i, kind, info, kpfx):
        tmpm = f"{base}.m{i}"
        if tmps_out is not None:
            tmps_out.append(tmpm)  # recorded BEFORE work: a worker that
            # dies mid-stage still gets its temp cleaned (list.append is
            # atomic under the GIL)
        with XlsxWorkbook(src_path) as wb2:
            with zipfile.ZipFile(tmpm, "w", zipfile.ZIP_DEFLATED) as ztmp:
                if kind == "sst":
                    r = _reencode_member(
                        ztmp, info,
                        _inflate_chunks(wb2.zf, info.filename),
                        b"</" + kpfx + b"si>", b"<" + kpfx + b"si", None,
                    )
                else:
                    r = _index_one_sheet(
                        ztmp, wb2, src_path, info, kpfx, stats,
                        sst=stats_sst, pool=pool, pool_size=pool_size,
                    )
        return info.filename, {"tmp": tmpm, "r": r}

    staged: dict = {}
    if workers <= 1 or len(jobs) <= 1:
        for i, (kind, info, kpfx) in enumerate(jobs):
            k, v = _one(i, kind, info, kpfx)
            staged[k] = v
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [ex.submit(_one, i, *j) for i, j in enumerate(jobs)]
            for f in futs:
                k, v = f.result()
                staged[k] = v
    return staged


def index_xlsx(
    path: str,
    out_path: "str | None" = None,
    sheet_name: "str | None" = None,
    sheet_index: "int | None" = None,
    replace_comment: bool = False,
    stats: bool = True,
    workers: "int | None" = None,
) -> dict:
    """One-pass retrofit: produce a split-indexed copy of ``path`` (any
    XLSX — Excel, openpyxl, anything) whose sharded reads seek instead of
    re-inflating the whole worksheet per task.

    * ``out_path=None`` replaces the input atomically (temp file +
      ``os.replace`` in the same directory); otherwise the indexed copy
      lands at ``out_path`` and the input is untouched.
    * ``sheet_name``/``sheet_index`` pick the worksheet to index (default:
      the sheet the default scan resolves, index 1) — the comment format
      carries one worksheet section (+ the shared-strings section, which
      benefits every sheet).
    * a foreign (non-index) archive comment is preserved by NOT indexing
      unless ``replace_comment=True``; our own stale index comment is
      always replaced.
    * ``workers`` (r12): fan the per-member re-deflates across threads
      (None = auto, min(4, splittable members)); output bytes are
      identical for every worker count. Multi-sheet workbooks and the
      worksheet+sst pair overlap their zlib work; a single-sheet,
      no-sst file gains nothing.

    Returns ``{"indexed": bool, "reason": str | None, "rows": int,
    "worksheet_points": int, "sst_points": int, "path": str}``. A file
    whose worksheet defeats indexing (undetectable row prefix, encrypted
    members, too small to span one interval) is reported, not modified —
    the sequential read serves it exactly as before.
    """

    def _noop(reason: str) -> dict:
        return {
            "indexed": False, "reason": reason, "rows": 0,
            "worksheet_points": 0, "sst_points": 0, "path": path,
        }

    with XlsxWorkbook(path) as wb:
        comment = wb.zf.comment
        from .splitindex import MAGIC

        if comment and not comment.startswith(MAGIC) and not replace_comment:
            return _noop(
                "archive carries a foreign comment; pass "
                "replace_comment=True to overwrite it"
            )
        sheet = wb.resolve_sheet(sheet_name, sheet_index)
        infos = wb.zf.infolist()
        for info in infos:
            if info.flag_bits & 0x1:
                return _noop(f"encrypted member {info.filename}")
        names = {i.filename for i in infos}
        if sheet.path not in names:
            return _noop(f"worksheet member {sheet.path} missing")
        # Prefix detection from the worksheet head — same convention as
        # the scan tiers (deterministic: the opener precedes any row).
        ws_head = _peek(wb.zf, sheet.path, 4 << 20)
        pfx = detect_row_prefix(ws_head)
        if pfx is None:
            return _noop("no detectable worksheet/sheetData opener")
        sst_pfx = None
        if SST_ENTRY in names:
            m = _SST_PFX_RE.search(_peek(wb.zf, SST_ENTRY, 64 << 10))
            if m is not None:
                sst_pfx = (m.group(1) + b":") if m.group(1) else b""

        dest = out_path or path
        tmp = os.path.join(
            os.path.dirname(os.path.abspath(dest)) or ".",
            f".idx-tmp-{os.getpid()}-{os.path.basename(dest)}",
        )

        staged_tmps: list = []
        stats_pool = None  # assigned in the try; torn down in finally

        def _rm_temps(keep_out: bool = False):
            # exact names, never glob — a destination basename containing
            # glob metacharacters ('report[2024].xlsx') must not leak
            # staging files (r12 review fix)
            for t in ([] if keep_out else [tmp]) + staged_tmps:
                try:
                    os.remove(t)
                except OSError:
                    pass

        try:
            sheet_paths = {s.path for s in wb.sheets}
            stats_sst = _stats_sst(wb) if stats else None
            if stats_sst is _DEFER_SST and sst_pfx is None:
                # no detectable heap prefix to stream-decode with — the
                # r12 behavior (no string bounds) is the honest fallback
                stats_sst = None
            # Plan the splittable members, then STAGE each into its own
            # temp archive — in parallel when there is more than one
            # (r12: per-member-parallel retrofit; each worksheet and the
            # sst are independent re-deflate streams) — and ASSEMBLE the
            # output by raw-copying source order: staged members carry
            # their flush points (member-relative offsets survive
            # relocation), everything else copies verbatim.
            jobs: list = []
            for info in infos:
                if info.filename == sheet.path:
                    jobs.append(("primary", info, pfx))
                elif info.filename in sheet_paths:
                    # Additional worksheets of a multi-sheet workbook
                    # (r11): each gets its own flush points + section
                    # under the `m` key, so a sheet_index/sheet_name
                    # read of ANY big sheet shards with seeks.
                    pfx2 = detect_row_prefix(
                        _peek(wb.zf, info.filename, 4 << 20)
                    )
                    if pfx2 is not None:
                        jobs.append(("extra", info, pfx2))
                elif info.filename == SST_ENTRY and sst_pfx is not None:
                    jobs.append(("sst", info, sst_pfx))
            # Stats pool (r13, VERDICT r12 task 4): the per-member
            # thread fan-out overlaps zlib but the stats slices — cell
            # regex + numpy folds — are GIL-bound Python, so stats=True
            # gained almost nothing from threads (8.79→8.52 s while
            # stats=False went 4.28→2.43 s). Interval analysis now ships
            # to a FORK pool (bytes in, claims out): workers spawn
            # eagerly here — in the main thread, BEFORE the staging
            # threads exist (fork-with-live-threads is the classic
            # deadlock) — and inherit any eager heap via copy-on-write
            # (_POOL_HEAP set just before construction). Single big
            # sheets gain too: consecutive intervals of one stream
            # analyze concurrently. Any pool-setup failure falls back
            # to the serial in-thread path, claims identical.
            global _POOL_HEAP
            eff_workers = (
                workers if workers is not None
                else (min(4, len(jobs)) or 1)
            )
            pool_size = 0
            if stats and eff_workers > 1:
                try:
                    import multiprocessing as _mp

                    _POOL_HEAP = (
                        stats_sst
                        if isinstance(stats_sst, list)
                        else None
                    )
                    stats_pool = _mp.get_context("fork").Pool(
                        processes=eff_workers
                    )
                    pool_size = eff_workers
                except Exception:  # noqa: BLE001 — serial fallback
                    stats_pool = None
                    pool_size = 0
                finally:
                    _POOL_HEAP = None
            staged = _stage_members(
                path, jobs, tmp, stats, stats_sst, workers,
                tmps_out=staged_tmps, pool=stats_pool, pool_size=pool_size,
            )
            pts = spts = None
            nrows = n_si = 0
            mixed = False
            coll_p = None
            extra_raw: list = []
            for kind, info, _kp in jobs:
                r = staged[info.filename]["r"]
                if kind == "primary":
                    pts, nrows, coll_p, mixed = r
                    if mixed:
                        # Rows under other prefixes exist: the
                        # detected-prefix counts would disagree with
                        # the reader's parse — never index on a lie.
                        pts, coll_p = None, None
                elif kind == "extra":
                    pts2, n2, coll2, mixed2 = r
                    if pts2 and not mixed2:
                        extra_raw.append((info.filename, pts2, n2, coll2))
                else:
                    spts, n_si = r
            if pts is None and spts is None and not extra_raw:
                raise _TooSmall
            # Deferred string-bound resolution (r13): collectors on a
            # big-heap workbook stored ref indices during staging — fold
            # bounds in ONE streaming pass over the source heap before
            # aligning. The retrofit's own staged entry count (n_si) is
            # the cross-check: a streamed total disagreeing with it
            # would mean misaligned indices, so everything is withheld.
            all_colls = [coll_p] + [c for _, _, _, c in extra_raw]
            # Filter on the MODE, not on already-realized refs: a
            # collector whose string refs all sit in the unflushed
            # trailing interval (or in pending pooled results) has an
            # empty _defer_refs here — the resolver flushes+realizes
            # each collector itself and early-exits when nothing
            # anywhere needs the heap pass (r13 review fix: the old
            # filter crashed aligned() on tail-only string columns).
            deferred = [
                c for c in all_colls if c is not None and c._defer
            ]
            shed_cols: list = []
            if deferred:
                _resolve_deferred_strings(
                    deferred, _iter_sst_entries(wb.zf, sst_pfx),
                    expected_n=n_si if any(
                        k == "sst" for k, _i, _p in jobs
                    ) else None,
                )
                shed_cols = sorted(
                    {col for c in deferred for col in c.defer_shed}
                )
            ivstats, ivsv, ivnc, ivbv = (
                coll_p.aligned(pts, nrows)
                if coll_p is not None
                else (None, None, None, None)
            )
            extra: dict = {}
            for entry2, pts2, n2, coll2 in extra_raw:
                st2, sv2, nc2, bv2 = (
                    coll2.aligned(pts2, n2)
                    if coll2 is not None
                    else (None, None, None, None)
                )
                extra[entry2] = {
                    "n": n2, "points": pts2, "stats": st2,
                    "sstats": sv2, "ncounts": nc2, "bcounts": bv2,
                }
            with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zout:
                for info in infos:
                    sres = staged.get(info.filename)
                    if sres is not None:
                        with zipfile.ZipFile(sres["tmp"]) as ztmp:
                            zi = ztmp.getinfo(info.filename)
                        _raw_copy(zout, sres["tmp"], zi)
                    else:
                        _raw_copy(zout, path, info)
                # Counted during the staging write with the reader's own
                # needle convention over the same bytes — expected ==
                # counted by construction; _publish_index still owns size
                # limits (stats columns drop largest-first, then extra
                # sheets, if the comment would exceed the 64 KB ceiling).
                _publish_index(
                    zout, sheet.path, pts, nrows, nrows, spts, n_si, n_si,
                    stats=ivstats, sstats=ivsv, ncounts=ivnc, bcounts=ivbv,
                    extra_sheets=extra or None,
                )
                published = bool(zout.comment)
            if not published:
                raise _TooSmall
        except _TooSmall:
            _rm_temps()
            return _noop(
                "worksheet mixes row prefixes — counts would not validate"
                if mixed
                else "member(s) below one split interval — nothing to index"
            )
        except BaseException:
            _rm_temps()
            raise
        else:
            _rm_temps(keep_out=True)
        finally:
            if stats_pool is not None:
                stats_pool.terminate()
                stats_pool.join()
        os.replace(tmp, dest)
        return {
            "indexed": True, "reason": None, "rows": nrows,
            "worksheet_points": len(pts or []), "sst_points": len(spts or []),
            "extra_sheets": len(extra), "path": dest,
            # observability for the deferred big-heap path (r13):
            # columns whose string bounds were shed by the ref budget
            "string_stats_shed": shed_cols,
        }


# Heaps small enough to resolve RESIDENT for eager bounds; bigger heaps
# defer to the one-pass streaming fold (r13 — the r12 design simply shed
# all string stats past this gate). Module constant so tests can force
# the deferred path without 256 MB fixtures.
_SST_STATS_RESIDENT_CAP = 256 << 20

# Sentinel: the heap is too big to hold resident — collect ref indices
# during staging and resolve bounds in one streaming pass afterwards.
_DEFER_SST = object()


def _stats_sst(wb):
    """The resolved shared-strings heap for stats authoring; ``None``
    when string bounds should be skipped (no heap / undecodable heap);
    ``_DEFER_SST`` when the heap exceeds the resident cap — the caller
    then streams it once after staging (_resolve_deferred_strings)
    instead of losing string stats entirely (VERDICT r12 task 3)."""
    try:
        info = wb.zf.getinfo(SST_ENTRY)
    except KeyError:
        return None
    if info.file_size > _SST_STATS_RESIDENT_CAP:
        return _DEFER_SST
    try:
        return wb.shared_strings
    except Exception:
        return None  # undecodable heap: the read will error, not the stats


def _iter_sst_entries(zf, pfx: bytes):
    """Stream the shared-strings heap as decoded entry strings in heap
    order with bounded memory: inflate chunk-wise, cut the buffer at the
    last complete entry terminator, decode each cut span with the
    conventional single-run regex (count-checked exactly like
    _parse_sst_fast), falling back to a namespace-wrapped expat walk for
    spans the pattern cannot own (rich-text runs, attributes, comments).
    Raises ValueError when a span defeats both — the caller sheds string
    claims rather than risking index misalignment."""
    from .parser import (
        _SST_PFX_RE as _PFXRE,
        _XSTRING_RE,
        _parse_sst_expat,
        _si_fast_re,
        _unescape,
    )

    si_re = _si_fast_re(pfx)
    end1 = b"</" + pfx + b"si>"
    end2 = b"<" + pfx + b"si/>"
    open_tag = b"<" + pfx + b"si"
    plain_open = b"<" + pfx + b"si>"
    decl = (
        b'<sst xmlns:' + pfx[:-1] + b'="urn:x">'
        if pfx
        else b"<sst>"
    )

    def _decode_span(span: bytes):
        if b"<!--" not in span and b"<![CDATA[" not in span:
            n_si = span.count(plain_open) + span.count(end2)
            if span.count(open_tag) == n_si:
                ms = si_re.findall(span)
                if len(ms) == n_si:
                    for raw in ms:
                        t = _unescape(raw) if b"&" in raw else raw.decode(
                            "utf-8"
                        )
                        if "_x" in t:
                            t = _XSTRING_RE.sub(
                                lambda m: chr(int(m.group(1), 16)), t
                            )
                        yield t
                    return
        # exotic span: one bounded expat walk over the wrapped fragment
        # (prefixed tags get a placeholder xmlns so expat accepts them);
        # a malformed span raises ExpatError → ValueError for the caller
        try:
            yield from _parse_sst_expat(decl + span + b"</sst>")
        except Exception as e:
            raise ValueError(f"sst span defeats streaming decode: {e}")

    buf = b""
    opened = False
    for chunk in _inflate_chunks(zf, SST_ENTRY):
        buf += chunk
        if not opened:
            m = _PFXRE.search(buf[: 64 << 10])
            if m is None:
                if len(buf) > (64 << 10):
                    raise ValueError("no sst opener in the heap head")
                continue
            gt = buf.find(b">", m.start())
            if gt == -1:
                continue
            buf = buf[gt + 1:]
            opened = True
        cut = max(buf.rfind(end1), buf.rfind(end2))
        if cut == -1:
            continue
        cut += len(end1) if buf.startswith(end1, cut) else len(end2)
        span, buf = buf[:cut], buf[cut:]
        yield from _decode_span(span)
    # the leftover holds only </sst>/whitespace — no complete entry


def _resolve_deferred_strings(collectors, entries, expected_n=None):
    """One streaming pass over the heap folding truncated bounds into
    every deferred (interval, column) group across ALL collectors of a
    workbook (multi-sheet retrofits share the pass).

    Per entry the fold uses bounded candidates only — lo_c =
    16-byte-prefix(s) (<= s) and hi_c = s or increment(prefix(s))
    (>= s) — so lo = min(lo_c) <= true min and hi = max(hi_c) >= true
    max: the same over-keep-only guarantee as the eager
    truncated_string_bounds, possibly a little wider (costs pruning
    opportunity, never rows). Groups touching an unencodable entry
    (lone surrogates), an unclaimable bound (U+10FFFF prefix), or a ref
    beyond the heap claim nothing — eager-path parity. If the stream
    decode is defeated, or ``expected_n`` (the retrofit's own staged
    entry count) disagrees with the streamed total — either would mean
    misaligned indices — EVERY string claim is withheld."""
    import numpy as np

    from .splitindex import STR_STAT_BYTES, increment_str, utf8_char_prefix

    groups: list = []
    arrs: list = []
    for coll in collectors:
        # trailing interval + any in-flight pooled analyses must land
        # BEFORE the one heap pass reads the refs
        coll.flush_realize()
        for fi, col, arr in coll._defer_refs:
            groups.append((coll, fi, col))
            arrs.append(arr)
    n_groups = len(groups)
    if n_groups == 0:
        # nothing deferred anywhere: skip the heap pass entirely
        for coll in collectors:
            coll._defer_resolved = True
        return
    all_idx = np.concatenate(arrs)
    gid = np.repeat(
        np.arange(n_groups, dtype=np.int64),
        [a.size for a in arrs],
    )
    order = np.argsort(all_idx, kind="stable")
    all_idx = all_idx[order]
    gid = gid[order]
    lo: list = [None] * n_groups
    hi: list = [None] * n_groups
    dead = [False] * n_groups   # no honest claim (U+10FFFF bound)
    err = [False] * n_groups    # the READ of that interval would fail
    p, total, n = 0, 0, all_idx.size
    ok = True
    try:
        for s in entries:
            j = total
            total += 1
            if p >= n or all_idx[p] != j:
                continue  # unreferenced entry: keep counting only
            enc_fail = False
            try:
                if len(s.encode("utf-8")) <= STR_STAT_BYTES:
                    lo_c: "str | None" = s
                    hi_c: "str | None" = s
                else:
                    pre = utf8_char_prefix(s)
                    lo_c = pre
                    hi_c = increment_str(pre)
            except ValueError:  # UnicodeEncodeError: lone surrogate —
                # a read materializing this entry fails at Arrow
                # conversion, so referencing intervals are ERRORS, not
                # mere no-claims (error parity, r13 review pass 2)
                lo_c = hi_c = None
                enc_fail = True
            while p < n and all_idx[p] == j:
                g = int(gid[p])
                p += 1
                if enc_fail:
                    err[g] = True
                    continue
                if dead[g] or err[g]:
                    continue
                if hi_c is None:
                    dead[g] = True  # no honest upper bound: claim nothing
                    continue
                if lo[g] is None or lo_c < lo[g]:
                    lo[g] = lo_c
                if hi[g] is None or hi_c > hi[g]:
                    hi[g] = hi_c
    except ValueError:
        ok = False  # stream decode defeated: claim nothing anywhere
    while p < n:
        err[int(gid[p])] = True  # ref beyond the heap: the read raises
        p += 1
    if expected_n is not None and total != expected_n:
        ok = False  # two independent entry counts disagree: misaligned
    if ok:
        for g, (coll, fi, col) in enumerate(groups):
            if err[g]:
                # error parity: the unfiltered read of this interval
                # raises (IndexError / Arrow surrogate), so NO section
                # may keep a claim that could prune the error away
                cum = coll.fine[fi][0]
                coll.fine[fi] = (cum, None, None, None, None)
        for g, (coll, fi, col) in enumerate(groups):
            if not err[g] and not dead[g] and lo[g] is not None:
                sv_slot = coll.fine[fi][2]
                if sv_slot is not None:
                    sv_slot[col] = (lo[g], hi[g])
    for coll in collectors:
        coll._defer_resolved = True


def _index_one_sheet(zout, wb, src_path, info, pfx, want_stats, sst=None,
                     pool=None, pool_size=0):
    """Re-deflate one worksheet member with flush points and the full
    honesty kit: any-prefix stream count (mixed detection) + optional
    interval statistics. Returns (points, n_rows, collector, mixed) —
    the caller aligns the collector AFTER any deferred string-bound
    resolution (r13: big heaps stream once post-staging), so the
    collector rides out of the staging worker instead of its aligned
    arrays."""
    anyctr = _AnyRowStreamCounter()

    def _counted(chunks):
        for c in chunks:
            anyctr.feed(c)
            yield c

    defer = sst is _DEFER_SST
    coll = (
        _IntervalStatsCollector(
            pfx, sst=None if defer else sst,
            date_styles=wb.date_styles, defer_strings=defer,
            pool=pool, pool_size=pool_size,
        )
        if want_stats
        else None
    )
    pts, n = _reencode_member(
        zout, info, _counted(_inflate_chunks(wb.zf, info.filename)),
        b"</" + pfx + b"row>", b"<" + pfx + b"row", b"<" + pfx + b"rowB",
        on_piece=coll.on_piece if coll else None,
    )
    # The mixed verdict only means anything when indexing actually ran:
    # with flush machinery unavailable (pts None, counting stopped early)
    # the needle count is not comparable and every pure-prefix file would
    # misreport as mixed (r11 review).
    if pts is not None and anyctr.close() != n:
        return pts, n, None, True
    return pts, n, coll, False


class _TooSmall(Exception):
    """No member reached one split interval (control flow only)."""


def _resolve_corpus_paths(path_or_glob: str) -> list[str]:
    """Sorted .xlsx paths for a sweep: a directory (its *.xlsx,
    non-recursive — the directory part glob-escaped, so
    'reports[2024]/' works) or a glob pattern taken as written. Raises
    on an empty match (shared by index_xlsx_dir / describe_index_dir —
    r13 review: the two had copied the resolution and would drift)."""
    import glob as _glob

    if os.path.isdir(path_or_glob):
        paths = sorted(
            _glob.glob(os.path.join(_glob.escape(path_or_glob), "*.xlsx"))
        )
    else:
        paths = sorted(_glob.glob(path_or_glob))
        if not paths and os.path.isfile(path_or_glob):
            paths = [path_or_glob]  # literal glob-looking path
    if not paths:
        raise ValueError(f"no .xlsx files match {path_or_glob!r}")
    return paths


def describe_index(path: str) -> dict:
    """Index-health report for one workbook — the ops counterpart of
    ``index_xlsx`` at fleet scale: which members are splittable, at what
    granularity, and which stats sections will actually prune. Decode
    only (zip central directory + archive comment — NO member is
    inflated), so sweeping a million-file corpus costs a metadata read
    per file.

    Returns ``{"indexed": bool, "comment_bytes": int, "sheets": {entry:
    {"rows", "intervals", "stride", "numeric_stat_cols",
    "string_stat_cols", "count_stat_cols", "bool_stat_cols",
    "claim_coverage": {section:
    fraction of (interval, column) slots carrying a usable claim}}},
    "sst": {"entries": int, "points": int} | None, "path": str}``.
    Sections that fail their untrusted-input validation report as
    absent — exactly what the planner will see. ``claim_coverage``
    surfaces authoring withholds (error-parity intervals, shed columns,
    style-unknown numerics): a column that "has stats" but covers 10%
    of intervals explains a read that barely prunes."""
    from . import splitindex as SI

    out: dict = {
        "indexed": False, "comment_bytes": 0, "sheets": {}, "sst": None,
        "path": path,
    }
    with zipfile.ZipFile(path) as zf:
        comment = zf.comment
        if not comment.startswith(SI.MAGIC):
            return out
        out["comment_bytes"] = len(comment)
        payload = SI._payload(zf)
        if payload is None:
            return out
        entries = []
        if isinstance(payload.get("e"), str):
            entries.append(payload["e"])
        m = payload.get("m")
        if isinstance(m, dict):
            entries.extend(k for k in m if isinstance(k, str))
        for entry in entries:
            pts = SI.decode_split_index(zf, entry, payload=payload)
            if pts is None:
                continue
            sec = SI._section_for(payload, entry) or {}
            sq = SI._section_stride(sec, len(pts))
            rec: dict = {
                "rows": pts[-1][1],
                "intervals": len(pts),
                # None = forged/garbage stride (all stats dropped) —
                # distinct from an honest unstrided index's 1
                "stride": sq[0] if sq else None,
            }
            coverage: dict = {}
            for key, decode in (
                ("numeric", SI.decode_interval_stats),
                ("string", SI.decode_interval_string_stats),
                ("count", SI.decode_interval_null_counts),
                ("bool", SI.decode_interval_bool_counts),
            ):
                got = decode(zf, entry, pts, payload=payload)
                cols = sorted(got) if got else []
                rec[f"{key}_stat_cols"] = cols
                if got:
                    slots = sum(len(v) for v in got.values())
                    claims = sum(
                        1 for v in got.values() for e in v if e is not None
                    )
                    coverage[key] = round(claims / slots, 3) if slots else 0.0
            rec["claim_coverage"] = coverage
            out["sheets"][entry] = rec
        spts = SI.decode_sst_index(zf, payload=payload)
        if spts is not None:
            out["sst"] = {"entries": spts[-1][1], "points": len(spts)}
        out["indexed"] = bool(out["sheets"]) or out["sst"] is not None
    return out


def describe_index_dir(spark, path_or_glob: str) -> list[dict]:
    """Distributed index-health sweep: one report per workbook (the
    ``describe_index`` shape, plus ``reason: "error: ..."`` rows for
    unreadable files), one Spark task per file — the audit story for a
    retrofitted corpus: which files still lack an index, which columns
    lost stats to shedding, where claim coverage collapsed."""
    paths = _resolve_corpus_paths(path_or_glob)

    def _one(it):
        from sheetreader_duckdb_spark.sources.xlsx.indexer import (
            describe_index,
        )

        for p in it:
            try:
                yield describe_index(p)
            except Exception as e:  # noqa: BLE001 — sweep survives bad files
                yield {
                    "indexed": False, "reason": f"error: {e}", "path": p,
                    "comment_bytes": 0, "sheets": {}, "sst": None,
                }

    return (
        spark.sparkContext.parallelize(paths, len(paths))
        .mapPartitions(_one)
        .collect()
    )


def index_xlsx_dir(
    spark,
    path_or_glob: str,
    sheet_name: "str | None" = None,
    sheet_index: "int | None" = None,
    replace_comment: bool = False,
    stats: bool = True,
    workers: int = 1,
) -> list[dict]:
    """Distributed retrofit of a whole corpus: one Spark task per
    workbook, each running ``index_xlsx`` IN PLACE (per-file output paths
    don't generalize to a sweep; each file's replace is atomic). This is
    the conversion story at fleet scale — indexing a directory of
    foreign XLSX is embarrassingly parallel per file, and each task's
    work is one sequential inflate+deflate of its own file.

    ``path_or_glob``: a directory (its ``*.xlsx``, non-recursive) or a
    glob pattern. Paths must be visible to the executors (shared
    filesystem — the same constraint as reading them). Per-file failures
    are REPORTED, not fatal: the sweep returns one result dict per file
    (``index_xlsx``'s shape, plus ``reason: "error: ..."`` rows for
    files that raised), so a single corrupt workbook can't kill a
    million-file sweep."""
    paths = _resolve_corpus_paths(path_or_glob)
    # workers defaults to 1 here (unlike index_xlsx's auto): the sweep is
    # already one Spark task per file across the cluster's cores, and
    # per-member threads inside every task would oversubscribe; raise it
    # only for sweeps of few, large, multi-sheet workbooks.
    kwargs = dict(
        sheet_name=sheet_name, sheet_index=sheet_index,
        replace_comment=replace_comment, stats=stats, workers=workers,
    )

    def _one(it):
        from sheetreader_duckdb_spark.sources.xlsx.indexer import index_xlsx

        for p in it:
            try:
                yield index_xlsx(p, **kwargs)
            except Exception as e:  # noqa: BLE001 — sweep survives one bad file
                yield {
                    "indexed": False, "reason": f"error: {e}", "rows": 0,
                    "worksheet_points": 0, "sst_points": 0, "path": p,
                }

    return (
        spark.sparkContext.parallelize(paths, len(paths))
        .mapPartitions(_one)
        .collect()
    )
