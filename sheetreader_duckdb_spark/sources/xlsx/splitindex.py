"""Splittable-XLSX index: the bgzip pattern applied to the worksheet entry.

An XLSX worksheet is one deflate stream inside a zip, so a sharded read
normally re-inflates the WHOLE stream per shard just to reach its own
chunks — O(shards × file) decompression, the one cost of the chunk
round-robin design that does not divide (BENCHNOTES r10: lineitem auto
saturates at ~32 shards because every task pays the full-zlib fixed cost;
at 1000 executors against a 10 GB sheet that waste is 1000×).

Our writer closes the gap the way bgzip/indexed-gzip do for gzip: it
emits ``Z_FULL_FLUSH`` sync points at ``</row>`` boundaries every ~4 MB
of uncompressed sheet XML. A full flush byte-aligns the stream AND resets
the deflate window, so a fresh ``zlib.decompressobj`` can start inflating
at any recorded point — each shard preads only its own intervals' raw
bytes and inflates exactly those. Total decompression returns to 1× the
file, spread across the shards, and sharding scales with I/O.

The index — (compressed offset, cumulative row count) per point — rides
the ZIP ARCHIVE COMMENT: a standard container field every zip tool
preserves and every consumer ignores, so the file stays a plain XLSX
(the flush points are ordinary deflate blocks; Excel, the reference
extension, and our own pre-index reader all read these files unchanged,
just sequentially). The reference core never shards inside one deflate
stream either — its interleaved threads split the DECOMPRESSED buffer
(sheetreader_extension.cpp:775) — so this is beyond-parity scaling, not
parity.

Readers must treat the comment as untrusted input: `decode_split_index`
validates structure/monotonicity and the consuming scan additionally
checks each interval's parsed row count against the recorded one,
failing loudly on any mismatch rather than returning silently wrong
rows (a corrupt-but-well-formed index cannot pass both).
"""

from __future__ import annotations

import json
import struct
import zipfile

MAGIC = b"SRSX1:"

# Uncompressed bytes between flush points. 4 MB matches the reader's
# single-thread chunk size; at the 2048-point cap that indexes ≥8 GB of
# sheet XML before interval doubling kicks in (see writer).
SPLIT_INTERVAL = 4 << 20
MAX_POINTS = 2048


SST_ENTRY = "xl/sharedStrings.xml"

# VARCHAR interval stats (r12): truncated min/max string bounds per
# interval, the parquet row-group pattern for string columns. Bounds are
# UTF-8-prefix-truncated to this many bytes with the over-keep-only rule:
# the stored lo is a prefix of the true min (so lo <= min), the stored hi
# is either the exact max or the truncated prefix with its last code
# point incremented (so hi >= max). Python str comparison is code-point
# order == UTF-8 byte order == Spark/DuckDB binary collation, so the
# planner compares filter values against these bounds directly.
STR_STAT_BYTES = 16
# decode-side structural ceiling: an honest bound is <= 16 chars (one
# char per byte at minimum width; increment never lengthens) — reject
# anything materially beyond it as forged/garbage.
_STR_STAT_MAX_CHARS = STR_STAT_BYTES + 1


def utf8_char_prefix(s: str, limit: int = STR_STAT_BYTES) -> str:
    """Longest char-boundary prefix of ``s`` whose UTF-8 encoding fits in
    ``limit`` bytes — lexicographically <= ``s`` by construction."""
    n = 0
    out = []
    for ch in s:
        k = len(ch.encode("utf-8"))
        if n + k > limit:
            break
        out.append(ch)
        n += k
    return "".join(out)


def increment_str(p: str) -> "str | None":
    """Smallest convenient strict upper bound for ALL strings having char
    prefix ``p``: bump the last code point that can grow and drop the
    tail. None when every char is U+10FFFF (no bound claimable). The
    bumped char may land on a lone surrogate — irrelevant for ordering
    (code-point compare) and JSON-safe (escaped)."""
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c < 0x10FFFF:
            return p[:i] + chr(c + 1)
    return None


def truncated_string_bounds(mn: str, mx: str) -> "tuple[str, str] | None":
    """(lo, hi) bounds for a value set with true min ``mn`` / max ``mx``:
    lo <= mn and hi >= mx under code-point order, each stored in <=
    STR_STAT_BYTES UTF-8 bytes (pre-JSON-escaping). None when no honest
    upper bound fits (absurd U+10FFFF-prefixed max): claim nothing."""
    lo = mn if len(mn.encode("utf-8")) <= STR_STAT_BYTES else utf8_char_prefix(mn)
    if len(mx.encode("utf-8")) <= STR_STAT_BYTES:
        return lo, mx
    hi = increment_str(utf8_char_prefix(mx))
    if hi is None:
        return None
    return lo, hi


# Per-interval value-count stats (r13): the third leg of the parquet
# row-group pattern (min/max + null_count). Stored as VALUE counts per
# type family — [n_numeric_plain, n_string, n_boolean, n_date_styled]
# per interval — because XLSX nullness is type-directed (a mismatched
# cell decodes to NULL, so the null count of a column depends on the
# reader's schema type): the planner derives nulls = rows_in_interval -
# family_count for whichever family the filtered column's schema type
# decodes from. The numeric population SPLITS on date style because
# decode does (parser: a date-styled numeric cell is T_DATE, which a
# DOUBLE column NULLs, and vice versa — one merged family would make
# IsNull pruning unsound on mixed-style columns). Every OTHER cell
# shape (t="e", empty <v>, absent cell, unknown t) decodes to NULL in
# all scan tiers (parser.py: unknown t → T_NONE), so the four families
# are exactly the non-null-producing set.
_NC_FAMILIES = 4


def _pad4(t) -> "tuple[int, int, int, int]":
    return (t[0] if len(t) > 0 else 0,
            t[1] if len(t) > 1 else 0,
            t[2] if len(t) > 2 else 0,
            t[3] if len(t) > 3 else 0)


def strip_count_entry(t) -> list:
    """Encode-side minimal form of one count entry: trailing zeros drop
    ([5,0,0] → [5]; all-zero → [] — a TRUE claim that every row in the
    group is NULL for this column, distinct from null = no claim)."""
    out = list(t)
    while out and out[-1] == 0:
        out.pop()
    return out


def coarsen_count_groups(arr: list) -> list:
    """One stride-doubling step over a per-group count array
    ``[entry0, entry1, ...]`` (entry = None | [n, s, b, d] trailing-
    zero-stripped): adjacent entries merge by ELEMENT-WISE SUM — the
    count analog of the min/max envelope, sound for both null-predicates
    because the planner's tests (family == 0 / family == group rows)
    stay exact under summation. None-absorbing; odd last carried."""
    out: list = []
    for j in range(0, len(arr), 2):
        a = arr[j]
        if j + 1 < len(arr):
            b = arr[j + 1]
            if a is None or b is None:
                out.append(None)
            else:
                pa, pb = _pad4(a), _pad4(b)
                out.append(strip_count_entry(
                    tuple(x + y for x, y in zip(pa, pb))
                ))
        else:
            out.append(a)
    return out


def _deltas(points: list) -> "tuple[list, list]":
    coffs, counts = [], []
    pc = pn = 0
    for c, n in points:
        coffs.append(c - pc)
        counts.append(n - pn)
        pc, pn = c, n
    return coffs, counts


def encode_split_index(
    entry: str,
    points: list[tuple[int, int]],
    total_rows: int,
    sst_points: "list[tuple[int, int]] | None" = None,
    sst_total: int = 0,
    stats: "dict[str, list] | None" = None,
    extra_sheets: "dict[str, dict] | None" = None,
    sstats: "dict[str, list] | None" = None,
    stats_stride: int = 1,
    ncounts: "dict[str, list] | None" = None,
    bcounts: "dict[str, list] | None" = None,
) -> bytes:
    """Comment bytes for one indexed worksheet entry (+ optionally the
    shared-strings heap). ``points`` are (compressed offset relative to
    the member's data start, cumulative rows written before the point);
    sequences are delta-encoded so a 2048-point index stays ~10-20 KB,
    well under the 64 KB comment ceiling. ``sst_points`` carry the same
    shape for ``xl/sharedStrings.xml`` with cumulative ENTRY counts —
    sharded readers then inflate only the heap intervals their own rows
    reference instead of the whole heap per task. ``stats`` (r11) maps a
    column LETTER to a flat per-interval ``[lo0, hi0, lo1, hi1, ...]``
    min/max array over the column's raw numeric cell values (date serials
    included raw) with null pairs for statless intervals — the parquet
    row-group-stats pattern: a selective filter skips whole intervals
    before inflating a byte (interval pruning, datasource side).
    ``sstats`` (r12) is the same shape for STRING columns under the
    ``sv`` key: truncated (lo, hi) bounds over the column's RESOLVED
    shared-string values (see ``truncated_string_bounds`` — lo <= true
    min, hi >= true max, so pruning can only over-keep). A letter may
    appear in both ``st`` and ``sv`` (mixed-type columns): the planner
    consults whichever matches the schema type it is filtering.
    ``ncounts`` (r13) is the per-interval VALUE-COUNT section under the
    ``nc`` key — the null_count leg of the parquet row-group pattern,
    type-family-resolved (module comment at ``_NC_FAMILIES``): a column
    LETTER maps to a list with one entry per interval (or per stride
    group), each entry ``None`` (no claim) or a trailing-zero-stripped
    ``[n_numeric_plain, n_string, n_boolean, n_date_styled]`` over the
    interval's cells. The
    planner prunes ``IsNotNull`` when the filtered type's family count
    is 0 and ``IsNull`` when it equals the group's row count; both tests
    stay exact under the stride's group-summation, so coarsening only
    loses granularity, never soundness.
    ``bcounts`` (r15) is the BOOLEAN VALUE-COUNT section under the ``bt``
    key — the boolean leg of EqualTo/In pruning (VERDICT r13 task 2): a
    column LETTER maps to one entry per interval (or stride group), each
    ``None`` (no claim) or a trailing-zero-stripped ``[n_true, n_false]``
    over the interval's ``t="b"`` cells (truth per the reader's decode:
    UNICODE-whitespace-stripped payload in ``("1", "true", "TRUE")`` —
    str.strip(), which matches pc.utf8_trim_whitespace on every BMP
    codepoint; NOT bytes.strip(), which is ASCII-only). The planner prunes
    ``EqualTo(col, v)`` / ``In`` on a BOOLEAN schema column when every
    requested value's count is 0 in the group (non-boolean cells decode
    NULL and never match EqualTo). Zero-counts stay exact under the
    stride's group-summation, same argument as ``nc``.
    ``stats_stride`` (r12, the ``q`` key when > 1): stats arrays may be
    COARSENED — one (lo, hi) pair per ``q`` consecutive intervals
    (length ``2*ceil(n_iv/q)``), each pair the envelope of its group.
    Publication prefers doubling the stride over dropping whole columns
    against the 64 KB ceiling (the SF10 witness lost ALL string pruning
    to column shedding at 1038 points); the decoder re-expands by
    replication, so consumers stay per-interval and claims only widen —
    conservative by construction.
    ``extra_sheets`` (r11) carries sections for ADDITIONAL worksheet
    members of a multi-sheet workbook under the ``m`` key —
    ``{entry: {"n": total, "points": [...], "stats": {...} | None,
    "sstats": {...} | None}}`` — so every big sheet is splittable, not
    just the one the default scan resolves; the primary sheet stays in
    the top-level keys for compatibility with indexes written before
    this field existed."""
    coffs, rows = _deltas(points)
    payload = {"e": entry, "n": total_rows, "c": coffs, "r": rows}
    if sst_points:
        sc, sr = _deltas(sst_points)
        payload["sc"] = sc
        payload["sr"] = sr
        payload["sn"] = sst_total
    if stats:
        payload["st"] = stats
    if sstats:
        payload["sv"] = sstats
    if ncounts:
        payload["nc"] = ncounts
    if bcounts:
        payload["bt"] = bcounts
    if (stats or sstats or ncounts or bcounts) and stats_stride > 1:
        payload["q"] = stats_stride
    if extra_sheets:
        m = {}
        for entry2, sec in extra_sheets.items():
            c2, r2 = _deltas(sec["points"])
            s2 = {"n": sec["n"], "c": c2, "r": r2}
            if sec.get("stats"):
                s2["st"] = sec["stats"]
            if sec.get("sstats"):
                s2["sv"] = sec["sstats"]
            if sec.get("ncounts"):
                s2["nc"] = sec["ncounts"]
            if sec.get("bcounts"):
                s2["bt"] = sec["bcounts"]
            if (s2.get("st") or s2.get("sv") or s2.get("nc")
                    or s2.get("bt")) and sec.get("q", 1) > 1:
                s2["q"] = sec["q"]
            m[entry2] = s2
        payload["m"] = m
    out = MAGIC + json.dumps(payload, separators=(",", ":")).encode("ascii")
    if len(out) > 0xFFFF:
        raise ValueError("split index exceeds the zip comment limit")
    return out


def _decode_points(
    zf: zipfile.ZipFile, entry: str, payload: dict, ckey: str, nkey: str, tkey: str
) -> "list[tuple[int, int]] | None":
    """Shared delta-walk validation for one indexed member: strictly
    increasing compressed offsets inside the member, counts monotone
    non-decreasing and within the declared total, deflate members only.
    Returns absolute (coff, count_cum) points plus the implicit terminal
    (compress_size, total), or None on any inconsistency."""
    try:
        coffs, counts = payload.get(ckey), payload.get(nkey)
        if not coffs or not counts or len(coffs) != len(counts):
            return None
        total = int(payload[tkey])
        info = zf.getinfo(entry)
        if info.compress_type != zipfile.ZIP_DEFLATED or total < 0:
            return None
        points: list[tuple[int, int]] = []
        c = n = 0
        for dc, dn in zip(coffs, counts):
            c += int(dc)
            n += int(dn)
            if dc <= 0 or dn < 0 or c >= info.compress_size or n > total:
                return None
            points.append((c, n))
        points.append((info.compress_size, total))
        return points
    except (ValueError, KeyError, TypeError, zipfile.BadZipFile):
        return None


def _payload(zf: zipfile.ZipFile) -> "dict | None":
    if not zf.comment.startswith(MAGIC):
        return None
    try:
        payload = json.loads(zf.comment[len(MAGIC):])
        return payload if isinstance(payload, dict) else None
    except ValueError:
        return None


def _section_for(payload: dict, entry: str) -> "dict | None":
    """The index section describing ``entry``: the top-level keys when it
    is the primary sheet, else its ``m`` sub-dict (multi-sheet workbooks,
    r11). None when the comment says nothing about this member."""
    if payload.get("e") == entry:
        return payload
    m = payload.get("m")
    if isinstance(m, dict):
        sec = m.get(entry)
        if isinstance(sec, dict):
            return sec
    return None


def decode_split_index(
    zf: zipfile.ZipFile, entry: str, payload: "dict | None" = None
) -> "list[tuple[int, int]] | None":
    """Validated absolute (coff, rows_cum) points for ``entry``, plus the
    implicit terminal point (compress_size, total_rows) — or None when the
    archive carries no usable index for this entry (no comment, other
    entry, non-deflate member, or any structural inconsistency; the caller
    falls back to the sequential scan, results identical either way).
    Resolves additional-sheet sections (``m``) as well as the primary.
    ``payload`` short-circuits the comment re-parse when the caller
    already holds it (describe_index decodes five sections per sheet —
    one json.loads each was the dominant audit cost on big comments)."""
    if payload is None:
        payload = _payload(zf)
    if payload is None:
        return None
    sec = _section_for(payload, entry)
    if sec is None:
        return None
    return _decode_points(zf, entry, sec, "c", "r", "n")


def decode_sst_index(
    zf: zipfile.ZipFile, payload: "dict | None" = None
) -> "list[tuple[int, int]] | None":
    """Validated absolute (coff, entries_cum) points for the shared-strings
    heap, plus the implicit terminal (compress_size, total_entries) — or
    None when the comment carries no usable sst section (same untrusted-
    input discipline as the worksheet index; the heap reader additionally
    verifies each interval's local entry count and falls back to the full
    heap on any inconsistency)."""
    if payload is None:
        payload = _payload(zf)
    if payload is None:
        return None
    return _decode_points(zf, SST_ENTRY, payload, "sc", "sr", "sn")


def coarsen_stat_pairs(arr: list) -> list:
    """One stride-doubling step over a flat [lo0, hi0, lo1, hi1, ...]
    stats array: merge adjacent (lo, hi) pairs into their envelope —
    None-absorbing (a group containing an unknown claims nothing), last
    odd pair carried as-is (ceil semantics, composing with the decoder's
    ``i // q`` group mapping). Works for numeric and string bounds alike
    (min/max are the Python comparisons both prune with)."""
    out: list = []
    for j in range(0, len(arr), 4):
        lo0, hi0 = arr[j], arr[j + 1]
        if j + 2 < len(arr):
            lo1, hi1 = arr[j + 2], arr[j + 3]
            if lo0 is None or lo1 is None:
                out.extend((None, None))
            else:
                out.extend((min(lo0, lo1), max(hi0, hi1)))
        else:
            out.extend((lo0, hi0))
    return out


def _section_stride(sec: dict, n_iv: int) -> "tuple[int, int] | None":
    """Validated (stride, coarse pair count) for a section's stats arrays
    — q=1 when absent; None on a forged/garbage stride."""
    q = sec.get("q", 1)
    if not isinstance(q, int) or isinstance(q, bool) or not (1 <= q <= 4096):
        return None
    return q, (n_iv + q - 1) // q


def decode_interval_stats(
    zf: zipfile.ZipFile, entry: str, points: list,
    payload: "dict | None" = None,
) -> "dict[str, list] | None":
    """Validated per-interval ``[(lo, hi) | None]`` stats per column
    letter for ``entry`` (the ``st`` section), aligned with the decoded
    ``points`` (terminal included → ``len(points)`` intervals). Untrusted
    like the rest of the comment: wrong array length, non-numeric
    entries, NaN, or lo > hi drops ALL stats — pruning is an
    optimization, the unpruned scan is the semantics. (Unlike the row
    counts, stats on a pruned interval are never re-validated by parsing
    — the same honest-writer trust model as parquet row-group stats;
    interval 0 is always materialized and count-checked, which catches
    whole-file staleness loudly.)"""
    if payload is None:
        payload = _payload(zf)
    if payload is None:
        return None
    sec = _section_for(payload, entry)
    if sec is None:
        return None
    st = sec.get("st")
    if not isinstance(st, dict) or not st:
        return None
    n_iv = len(points)
    sq = _section_stride(sec, n_iv)
    if sq is None:
        return None
    q, m = sq
    out: dict = {}
    try:
        for k, arr in st.items():
            if not isinstance(k, str) or not isinstance(arr, list):
                return None
            if len(arr) != 2 * m:
                return None
            coarse: list = []
            for j in range(m):
                lo, hi = arr[2 * j], arr[2 * j + 1]
                if lo is None or hi is None:
                    coarse.append(None)
                    continue
                lo, hi = float(lo), float(hi)
                if not (lo <= hi):  # also rejects NaN
                    return None
                coarse.append((lo, hi))
            # stride re-expansion (r12): interval i claims its group's
            # envelope — wider than per-interval stats, never narrower
            out[k] = [coarse[i // q] for i in range(n_iv)]
    except (TypeError, ValueError):
        return None
    return out


def decode_interval_string_stats(
    zf: zipfile.ZipFile, entry: str, points: list,
    payload: "dict | None" = None,
) -> "dict[str, list] | None":
    """Validated per-interval ``[(lo, hi) | None]`` STRING bounds per
    column letter for ``entry`` (the ``sv`` section, r12), aligned with
    the decoded ``points``. Same untrusted-input discipline as the
    numeric ``st`` decode: wrong array length, non-string entries,
    half-null pairs, lo > hi, or oversized bounds (an honest bound fits
    in STR_STAT_BYTES UTF-8 bytes) drop the WHOLE section — pruning is
    an optimization, the unpruned scan is the semantics. Validation is
    independent of ``st``: garbage in one section never costs the other.
    Bounds may contain lone surrogates (increment_str can land on one —
    JSON carries them fine); validation therefore never UTF-8-encodes,
    it bounds by char count."""
    if payload is None:
        payload = _payload(zf)
    if payload is None:
        return None
    sec = _section_for(payload, entry)
    if sec is None:
        return None
    sv = sec.get("sv")
    if not isinstance(sv, dict) or not sv:
        return None
    n_iv = len(points)
    sq = _section_stride(sec, n_iv)
    if sq is None:
        return None
    q, m = sq
    out: dict = {}
    for k, arr in sv.items():
        if not isinstance(k, str) or not isinstance(arr, list):
            return None
        if len(arr) != 2 * m:
            return None
        coarse: list = []
        for j in range(m):
            lo, hi = arr[2 * j], arr[2 * j + 1]
            if lo is None and hi is None:
                coarse.append(None)
                continue
            if not isinstance(lo, str) or not isinstance(hi, str):
                return None
            if len(lo) > _STR_STAT_MAX_CHARS or len(hi) > _STR_STAT_MAX_CHARS:
                return None
            if lo > hi:
                return None
            coarse.append((lo, hi))
        out[k] = [coarse[i // q] for i in range(n_iv)]
    return out


def decode_interval_null_counts(
    zf: zipfile.ZipFile, entry: str, points: list,
    payload: "dict | None" = None,
) -> "dict[str, list] | None":
    """Validated per-interval value counts per column letter for
    ``entry`` (the ``nc`` section, r13), aligned with the decoded
    ``points``: each interval maps to ``None`` (no claim) or a tuple
    ``(n_num, n_str, n_bool, n_date, rows_in_group)`` — its stride
    GROUP's family totals plus the group's total row count derived from
    the points themselves. The planner's two tests are stated at group
    granularity (family == 0 → no interval in the group holds a
    non-null; family == rows → no interval holds a null), so replicating
    group values per interval is sound by construction. Untrusted like
    every other section: wrong array length, non-int entries, negatives,
    more than four families, or family totals exceeding the group's row
    count drop the WHOLE section — pruning is an optimization, the
    unpruned scan is the semantics. Validation is independent of
    ``st``/``sv``: garbage in one section never costs the others."""
    if payload is None:
        payload = _payload(zf)
    if payload is None:
        return None
    sec = _section_for(payload, entry)
    if sec is None:
        return None
    nc = sec.get("nc")
    if not isinstance(nc, dict) or not nc:
        return None
    n_iv = len(points)
    sq = _section_stride(sec, n_iv)
    if sq is None:
        return None
    q, m = sq
    # Rows per stride group, from the validated points (terminal
    # included): count_in(i) = cum(i) - cum(i-1), summed over the group.
    rows_g = [0] * m
    prev = 0
    for i in range(n_iv):
        rows_g[i // q] += points[i][1] - prev
        prev = points[i][1]
    out: dict = {}
    for k, arr in nc.items():
        if not isinstance(k, str) or not isinstance(arr, list):
            return None
        if len(arr) != m:
            return None
        coarse: list = []
        for j in range(m):
            e = arr[j]
            if e is None:
                coarse.append(None)
                continue
            if not isinstance(e, list) or len(e) > _NC_FAMILIES:
                return None
            for x in e:
                if not isinstance(x, int) or isinstance(x, bool) or x < 0:
                    return None
            fams = _pad4(e)
            if sum(fams) > rows_g[j]:
                return None  # counts a group's rows can't hold: forged
            coarse.append(fams + (rows_g[j],))
        out[k] = [coarse[i // q] for i in range(n_iv)]
    return out


def decode_interval_bool_counts(
    zf: zipfile.ZipFile, entry: str, points: list,
    payload: "dict | None" = None,
) -> "dict[str, list] | None":
    """Validated per-interval boolean value counts per column letter for
    ``entry`` (the ``bt`` section, r15), aligned with the decoded
    ``points``: each interval maps to ``None`` (no claim) or a tuple
    ``(n_true, n_false)`` — its stride GROUP's counts of ``t="b"`` cells
    decoding true/false. The planner's test is zero-counts only
    (``EqualTo(col, v)`` matches nothing when v's count is 0 in the
    group), which stays exact under the stride's group-summation; forged
    INFLATION can only prevent a skip (conservative), and deflation is
    the same honest-writer trust boundary every section carries.
    Untrusted like the rest: wrong array length, non-int entries,
    negatives, more than two slots, or totals exceeding the group's row
    count drop the WHOLE section — pruning is an optimization, the
    unpruned scan is the semantics. Validation is independent of
    ``st``/``sv``/``nc``: garbage in one section never costs the
    others."""
    if payload is None:
        payload = _payload(zf)
    if payload is None:
        return None
    sec = _section_for(payload, entry)
    if sec is None:
        return None
    bt = sec.get("bt")
    if not isinstance(bt, dict) or not bt:
        return None
    n_iv = len(points)
    sq = _section_stride(sec, n_iv)
    if sq is None:
        return None
    q, m = sq
    rows_g = [0] * m
    prev = 0
    for i in range(n_iv):
        rows_g[i // q] += points[i][1] - prev
        prev = points[i][1]
    out: dict = {}
    for k, arr in bt.items():
        if not isinstance(k, str) or not isinstance(arr, list):
            return None
        if len(arr) != m:
            return None
        coarse: list = []
        for j in range(m):
            e = arr[j]
            if e is None:
                coarse.append(None)
                continue
            if not isinstance(e, list) or len(e) > 2:
                return None
            for x in e:
                if not isinstance(x, int) or isinstance(x, bool) or x < 0:
                    return None
            t = (e[0] if len(e) > 0 else 0, e[1] if len(e) > 1 else 0)
            if t[0] + t[1] > rows_g[j]:
                return None  # counts a group's rows can't hold: forged
            coarse.append(t)
        out[k] = [coarse[i // q] for i in range(n_iv)]
    return out


def iter_intervals(
    path: str, zf: zipfile.ZipFile, entry: str, points: list, shard: int,
    n_shards: int, skip: "frozenset[int] | set[int]" = frozenset(),
):
    """Seek-and-inflate interval walk shared by the columnar and row scan
    tiers: yields ``(i, work_or_None, count_in)`` per interval in order —
    ``work`` is the inflated uncompressed bytes for intervals this shard
    materializes (its own, plus interval 0 which EVERY shard scans so the
    template/fallback decision stays identical across shards), and None
    for skipped intervals (the caller bumps its ordinals by ``count_in``
    without touching a byte — the point of the index). ``skip`` holds
    interval ordinals PRUNED by stats (r11): treated exactly like
    unassigned intervals, except interval 0 is never skippable (every
    shard must scan it for the cross-shard fallback decision and the
    loud staleness check)."""
    import zlib

    doff = member_data_offset(path, zf.getinfo(entry))
    with open(path, "rb") as rf:
        for i in range(len(points)):
            lo = points[i - 1][0] if i else 0
            hi, cum = points[i]
            count_in = cum - (points[i - 1][1] if i else 0)
            if i and ((i % n_shards) != shard or i in skip):
                yield i, None, count_in
                continue
            rf.seek(doff + lo)
            try:
                work = zlib.decompressobj(-15).decompress(rf.read(hi - lo))
            except zlib.error as e:
                # A structurally valid but stale index (the archive was
                # recompressed by a tool that preserved the comment) lands
                # here — same loud, actionable message as the row-count
                # check, never a bare zlib.error (ADVICE r10).
                raise ValueError(
                    f"sheetreader: split-index interval {i} of {entry} "
                    f"failed to inflate ({e}) — the archive comment is "
                    "stale or corrupt; remove it or rewrite the file"
                ) from e
            yield i, work, count_in


def member_data_offset(path: str, info: zipfile.ZipInfo) -> int:
    """Absolute file offset of ``info``'s compressed data: local header
    is 30 fixed bytes + its OWN name/extra lengths (which may differ from
    the central directory's copy — read them from the file)."""
    with open(path, "rb") as f:
        f.seek(info.header_offset)
        hdr = f.read(30)
        if len(hdr) != 30 or hdr[:4] != b"PK\x03\x04":
            raise ValueError(f"bad local header for {info.filename}")
        name_len, extra_len = struct.unpack("<HH", hdr[26:30])
        return info.header_offset + 30 + name_len + extra_len
