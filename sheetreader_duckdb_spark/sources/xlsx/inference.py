"""Schema inference: the reference's bind-time two-row probe, re-expressed as
a lazy metadata probe (SURVEY.md §1.5, §7 — we deliberately do NOT replicate
the eager full-file parse at bind time; reference bind:
/root/reference/src/sheetreader_extension.cpp:796-938).

Rules replicated exactly:
- Types come from the first data row after ``skip_rows``; a two-row minimum is
  required (reference errors otherwise, :803-810).
- Generic names ``String0``/``Numeric1``/``Boolean2``/``Date3``… by column
  position (ConvertCellTypes, :560-599).
- Header auto-detect: row 1 all-strings ∧ row 2 not ⇒ row 1 is the header —
  its strings become names, row 2's types become types, and the row is
  skipped (:840-894). ``has_header=True`` forces this and errors if row 1 is
  not all-strings (:831-833).
- User ``types`` must cover ≥ detected columns (:898-900); each must equal
  the detected type unless ``force_types`` (:909-918) or the target is
  VARCHAR with ``coerce_to_string``; extra types append columns named
  ``"Column N"`` (:922-935).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from sheetreader_duckdb_spark.sources.xlsx import parser as P

VALID_TYPES = ("VARCHAR", "DOUBLE", "BOOLEAN", "DATE")

_CELL_TO_SQL = {
    P.T_STRING_REF: "VARCHAR",
    P.T_STRING_LIT: "VARCHAR",
    P.T_NUMERIC: "DOUBLE",
    P.T_BOOLEAN: "BOOLEAN",
    P.T_DATE: "DATE",
}

_GENERIC_PREFIX = {
    P.T_STRING_REF: "String",
    P.T_STRING_LIT: "String",
    P.T_NUMERIC: "Numeric",
    P.T_BOOLEAN: "Boolean",
    P.T_DATE: "Date",
}

_STRING_TYPES = (P.T_STRING_REF, P.T_STRING_LIT)


@dataclass
class SheetSchema:
    names: list[str]
    types: list[str]  # VARCHAR | DOUBLE | BOOLEAN | DATE, per column
    skip_rows: int  # effective data-row skip (user skip_rows + header row)
    n_detected_columns: int = 0
    header_detected: bool = False
    extra: dict = field(default_factory=dict)


def _dense_row(cells: list[tuple[int, int, object]], n_cols: int) -> list[tuple[int, object]]:
    """(type, value) per column, absent cells as T_NONE."""
    row: list[tuple[int, object]] = [(P.T_NONE, None)] * n_cols
    for col, ctype, val in cells:
        if col < n_cols:
            row[col] = (ctype, val)
    return row


def _convert_cell_types(row: list[tuple[int, object]]) -> tuple[list[str], list[str], bool]:
    """Reference ConvertCellTypes (:560-599): types + generic names +
    first-row-all-string flag. Unknown/absent probe cells error like the
    reference's default branch (:592-593)."""
    types: list[str] = []
    names: list[str] = []
    all_string = True
    for i, (ctype, _) in enumerate(row):
        if ctype not in _CELL_TO_SQL:
            raise ValueError(f"Unknown cell type in column in column {i}")
        types.append(_CELL_TO_SQL[ctype])
        names.append(f"{_GENERIC_PREFIX[ctype]}{i}")
        if ctype not in _STRING_TYPES:
            all_string = False
    return types, names, all_string


def infer_schema(
    wb: P.XlsxWorkbook,
    sheet: P.SheetInfo,
    *,
    skip_rows: int = 0,
    has_header: bool = False,
    user_types: list[str] | None = None,
    force_types: bool = False,
    coerce_to_string: bool = False,
) -> SheetSchema:
    # Lazy probe: read only the first two data rows (vs the reference's eager
    # full parse — architectural decision recorded in SURVEY.md §7).
    # Small probe chunk: iter_rows row-parses its whole first chunk before
    # yielding, so the default 4 MB chunk per-row-parsed ~36k rows (~0.4 s
    # on sf1 lineitem) to answer a 2-row question. 256 KB still spans
    # thousands of typical rows; oversized rows just pull more chunks.
    probe_rows: list[list[tuple[int, int, object]]] = []
    for cells in wb.iter_rows(sheet, skip_rows=skip_rows, chunk_bytes=256 << 10):
        probe_rows.append(cells)
        if len(probe_rows) >= 2:
            break

    if not probe_rows or all(not r for r in probe_rows):
        raise ValueError("Sheet appears to be empty")  # reference :788-790
    n_cols = max((c for r in probe_rows for c, _, _ in r), default=-1) + 1
    if n_cols == 0:
        raise ValueError("Sheet appears to be empty")
    if len(probe_rows) < 2:
        # reference :803-810 — the probe requires two rows
        raise ValueError(
            "Need minimum of two rows in first buffer to determine column types "
            "and auto detect header row"
        )

    first = _dense_row(probe_rows[0], n_cols)
    second = _dense_row(probe_rows[1], n_cols)

    types_first, names_first, first_all_string = _convert_cell_types(first)
    if has_header and not first_all_string:
        raise ValueError("First row must contain only strings when has_header is set to true")
    types_second, _, second_all_string = _convert_cell_types(second)

    header_detected = has_header or (first_all_string and not second_all_string)
    if header_detected:
        names = []
        for ctype, val in first:
            if ctype == P.T_STRING_REF:
                names.append(wb.shared_strings_lazy()[val])
            elif ctype == P.T_STRING_LIT:
                names.append(val)
            else:
                raise ValueError("Header row contains non-string values")
        types = types_second
    else:
        names = names_first
        types = types_first

    effective_skip = skip_rows + (1 if header_detected else 0)

    if user_types:
        user_types = [t.upper() for t in user_types]
        for t in user_types:
            if t not in VALID_TYPES:
                raise ValueError(f'Unsupported type "{t}" for types definition')
        if len(user_types) < n_cols:
            raise ValueError("Number of user defined types is less than number of columns in sheet")
        for idx, detected in enumerate(types):
            user_t = user_types[idx]
            if not force_types and user_t != detected and not (user_t == "VARCHAR" and coerce_to_string):
                raise ValueError(
                    f"User defined type for column with index {idx} is not compatible with actual type"
                )
        names = names + [f"Column {i}" for i in range(n_cols, len(user_types))]
        types = list(user_types)

    return SheetSchema(
        names=names,
        types=types,
        skip_rows=effective_skip,
        n_detected_columns=n_cols,
        header_detected=header_detected,
    )
