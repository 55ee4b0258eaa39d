"""Line-level cross-document dedup (operators/dedup.py
duplicate_line_occurrences / stats / remove_duplicate_lines) — the
RefinedWeb/FineWeb primitive. Pinned against a pure-Python brute force,
with identity preservation for unaffected documents and blank-line /
trim-matching edge cases."""

from __future__ import annotations

import random

from sheetreader_duckdb_spark.operators.dedup import (
    duplicate_line_occurrences,
    duplicate_line_stats,
    remove_duplicate_lines,
)


def _brute(docs: dict[int, str], min_docs: int = 2, min_chars: int = 1):
    """(occurrences, scrubbed) — occurrences as {(id, ln)}, scrubbed as
    {id: text_with_flagged_lines_removed}."""
    norm_docs: dict[str, set[int]] = {}
    for i, t in docs.items():
        for line in t.split("\n"):
            n = line.strip()
            if len(n) >= min_chars:
                norm_docs.setdefault(n, set()).add(i)
    dup = {n for n, ids in norm_docs.items() if len(ids) >= min_docs}
    occ = set()
    scrub = {}
    for i, t in docs.items():
        kept = []
        for ln, line in enumerate(t.split("\n")):
            n = line.strip()
            if len(n) >= min_chars and n in dup:
                occ.add((i, ln))
            else:
                kept.append(line)
        scrub[i] = "\n".join(kept) if any(
            (i, ln) in occ for ln in range(len(t.split("\n")))
        ) else t
    return occ, scrub


def _mk(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )


def test_matches_bruteforce_random(spark):
    rng = random.Random(5)
    pool = [f"shared line {i}" for i in range(6)] + ["   ", ""]
    docs = {}
    for i in range(20):
        lines = []
        for _ in range(rng.randint(1, 8)):
            if rng.random() < 0.4:
                lines.append(rng.choice(pool))
            else:
                lines.append(
                    "unique " + "".join(rng.choice("abcdef") for _ in range(10))
                )
        docs[i] = "\n".join(lines)
    df = _mk(spark, docs)
    want_occ, want_scrub = _brute(docs)
    got_occ = {
        (r.doc_id, r.ln)
        for r in duplicate_line_occurrences(df, "doc_id", "text").collect()
    }
    assert got_occ == want_occ
    got_scrub = {
        r.doc_id: r.line_scrub_text
        for r in remove_duplicate_lines(df, "doc_id", "text").collect()
    }
    assert got_scrub == want_scrub


def test_unaffected_docs_identity(spark):
    # split+join on '\n' is lossless: docs with nothing removed come back
    # byte-identical, including ones with leading/trailing/blank lines.
    docs = {
        0: "alpha\nbeta\ngamma",
        1: "alpha\ndelta",  # 'alpha' duplicated -> removed in 0 and 1
        2: "  spaced  \n\nuntouched doc\n",
        3: "another untouched",
    }
    df = _mk(spark, docs)
    got = {
        r.doc_id: r.line_scrub_text
        for r in remove_duplicate_lines(df, "doc_id", "text").collect()
    }
    assert got[0] == "beta\ngamma"
    assert got[1] == "delta"
    assert got[2] == docs[2]
    assert got[3] == docs[3]


def test_trim_matching_removes_original_line(spark):
    # Matching is on the trimmed form, removal drops the ORIGINAL bytes.
    docs = {0: "  boiler  \nbody a", 1: "boiler\nbody b"}
    df = _mk(spark, docs)
    got = {
        r.doc_id: r.line_scrub_text
        for r in remove_duplicate_lines(df, "doc_id", "text").collect()
    }
    assert got == {0: "body a", 1: "body b"}


def test_blank_lines_never_flagged(spark):
    docs = {0: "\n\na", 1: "\n\nb", 2: "   \nc"}
    df = _mk(spark, docs)
    assert duplicate_line_occurrences(df, "doc_id", "text").count() == 0
    got = {
        r.doc_id: r.line_scrub_text
        for r in remove_duplicate_lines(df, "doc_id", "text").collect()
    }
    assert got == docs  # nothing removed anywhere


def test_fully_flagged_doc_scrubs_to_empty(spark):
    docs = {0: "same", 1: "same", 2: "same\nextra"}
    df = _mk(spark, docs)
    got = {
        r.doc_id: r.line_scrub_text
        for r in remove_duplicate_lines(df, "doc_id", "text").collect()
    }
    assert got == {0: "", 1: "", 2: "extra"}


def test_stats_and_occurrence_reuse(spark):
    docs = {0: "dup line\nxx\ndup line", 1: "dup line\nyy"}
    df = _mk(spark, docs)
    occ = duplicate_line_occurrences(df, "doc_id", "text")
    st = {
        r.doc_id: (r.dup_lines, r.dup_chars)
        for r in duplicate_line_stats(
            df, "doc_id", "text", occurrences=occ
        ).collect()
    }
    assert st == {0: (2, 16), 1: (1, 8)}
    # min_docs respected: raising it to 3 flags nothing ('dup line' is in 2)
    assert (
        duplicate_line_occurrences(df, "doc_id", "text", min_docs=3).count() == 0
    )
