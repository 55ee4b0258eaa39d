"""Cross-document repeated n-gram spans (exact substring dedup, Lee et al.
2022 style) vs a brute-force Python reference: occurrences, merged spans,
coverage stats, and span removal must all match exactly, including the
fully-covered-document and no-duplicates edge cases."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sheetreader_duckdb_spark.operators.dedup import (
    duplicate_ngram_occurrences,
    duplicate_ngram_spans,
    duplicate_ngram_stats,
    remove_duplicate_ngrams,
)


# -- brute-force reference ---------------------------------------------------
def _ref_occurrences(docs: dict[int, str], n: int, min_docs: int):
    grams: dict[str, set[int]] = {}
    pos: dict[int, list[tuple[int, str]]] = {}
    for i, text in docs.items():
        w = text.lower().split(" ")
        pos[i] = []
        for p in range(len(w) - n + 1):
            g = " ".join(w[p : p + n])
            grams.setdefault(g, set()).add(i)
            pos[i].append((p, g))
    dup = {g for g, ids in grams.items() if len(ids) >= min_docs}
    return {i: sorted(p for p, g in ps if g in dup) for i, ps in pos.items()}


def _ref_spans(occ: list[int], n: int) -> list[tuple[int, int]]:
    spans: list[tuple[int, int]] = []
    for p in occ:
        if spans and p <= spans[-1][1]:
            spans[-1] = (spans[-1][0], max(spans[-1][1], p + n))
        else:
            spans.append((p, p + n))
    return spans


def _ref_scrub(text: str, spans: list[tuple[int, int]]) -> str:
    w = text.lower().split(" ")
    covered = {i for s, e in spans for i in range(s, e)}
    return " ".join(t for i, t in enumerate(w) if i not in covered)


def _check_all(spark, docs: dict[int, str], n: int, min_docs: int = 2) -> None:
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    ref_occ = _ref_occurrences(docs, n, min_docs)

    got_occ: dict[int, list[int]] = {i: [] for i in docs}
    for r in duplicate_ngram_occurrences(df, "doc_id", "text", n, min_docs).collect():
        got_occ[r["doc_id"]].append(r["pos"])
    assert {i: sorted(v) for i, v in got_occ.items()} == ref_occ

    ref_spans = {i: _ref_spans(o, n) for i, o in ref_occ.items() if o}
    got_spans: dict[int, list[tuple[int, int]]] = {}
    for r in duplicate_ngram_spans(df, "doc_id", "text", n, min_docs).collect():
        got_spans.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    assert {i: sorted(v) for i, v in got_spans.items()} == ref_spans

    got_stats = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"])
        for r in duplicate_ngram_stats(df, "doc_id", "text", n, min_docs).collect()
    }
    ref_stats = {
        i: (len(sp), sum(e - s for s, e in sp)) for i, sp in ref_spans.items()
    }
    assert got_stats == ref_stats

    got_scrub = {
        r["doc_id"]: r["scrub_text"]
        for r in remove_duplicate_ngrams(df, "doc_id", "text", n, min_docs).collect()
    }
    ref_scrub = {i: _ref_scrub(t, ref_spans.get(i, [])) for i, t in docs.items()}
    assert got_scrub == ref_scrub


# -- targeted cases ----------------------------------------------------------
def test_shared_boilerplate_span(spark):
    # Docs 1 and 2 share a 6-token boilerplate paragraph inside otherwise
    # distinct text; doc 3 is clean. n=3 -> four overlapping shared grams
    # merge into one span of 6 tokens in each carrier.
    boiler = "all rights reserved contact us today"
    docs = {
        1: f"alpha beta gamma {boiler} delta epsilon",
        2: f"one two {boiler} three four five",
        3: "totally unrelated words only here once",
    }
    _check_all(spark, docs, n=3)
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    stats = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"])
        for r in duplicate_ngram_stats(df, "doc_id", "text", 3).collect()
    }
    assert stats == {1: (1, 6), 2: (1, 6)}
    scrub = {
        r["doc_id"]: r["scrub_text"]
        for r in remove_duplicate_ngrams(df, "doc_id", "text", 3).collect()
    }
    assert scrub[1] == "alpha beta gamma delta epsilon"
    assert scrub[2] == "one two three four five"
    assert scrub[3] == docs[3]  # untouched doc keeps its canonical join


def test_identical_docs_fully_covered(spark):
    # Exact duplicates: every gram repeats, the whole doc is one span, and
    # the scrub empties both copies.
    docs = {1: "a b c d e", 2: "a b c d e", 3: "x y z w v"}
    _check_all(spark, docs, n=3)
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    scrub = {
        r["doc_id"]: r["scrub_text"]
        for r in remove_duplicate_ngrams(df, "doc_id", "text", 3).collect()
    }
    assert scrub[1] == "" and scrub[2] == ""


def test_adjacent_and_disjoint_spans_merge_correctly(spark):
    # Two shared trigrams that touch back-to-back in doc 1 (tokens 0-2 and
    # 3-5, adjacent -> merge) but sit far apart in doc 2 (two spans).
    docs = {
        1: "p q r s t u filler filler2 filler3",
        2: "p q r mid1 mid2 mid3 mid4 s t u",
        3: "noise words that appear nowhere else at all",
    }
    _check_all(spark, docs, n=3)


def test_within_doc_repeat_alone_does_not_trigger(spark):
    # A gram repeated inside ONE doc but absent elsewhere: min_docs=2
    # counts distinct documents, so nothing is flagged.
    docs = {1: "x y z x y z x y z", 2: "totally different words here now"}
    occ = _ref_occurrences(docs, 3, 2)
    assert occ == {1: [], 2: []}
    _check_all(spark, docs, n=3)


def test_short_docs_skipped(spark):
    docs = {1: "a b", 2: "a b", 3: "a b c d e", 4: "a b c d e"}
    _check_all(spark, docs, n=3)  # docs 1/2 have no trigram despite matching


def test_min_docs_three(spark):
    docs = {
        1: "shared tri gram plus one",
        2: "shared tri gram plus two",
        3: "shared tri gram plus three",
        4: "pair only here gram four",
        5: "pair only here gram five",
    }
    # min_docs=3: 'shared tri gram' (3 docs) qualifies, 'pair only here' (2) not.
    _check_all(spark, docs, n=3, min_docs=3)


# -- property test -----------------------------------------------------------
@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=3),
)
def test_property_matches_bruteforce(shared_spark_holder, texts, n):
    docs = dict(enumerate(texts))
    _check_all(shared_spark_holder, docs, n=n)


@pytest.fixture(scope="module")
def shared_spark_holder(spark):
    # hypothesis forbids function-scoped fixtures inside @given; re-expose
    # the session-scoped spark under module scope.
    return spark
