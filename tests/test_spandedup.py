"""Cross-document duplicate-span detection/removal (pipeline.spandedup)."""

import pytest

from deepgraph_spark.pipeline import (
    dup_span_stats,
    duplicate_spans,
    strip_duplicate_spans,
)

W = 4
SHARED = "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9"  # 10 tokens


@pytest.fixture()
def planted(spark):
    # unique context around one shared 10-token run; doc 3 repeats a phrase
    # INTRA-doc only; doc 4 is shorter than the window
    rows = [
        (1, f"a0 a1 a2 {SHARED} a3 a4"),
        (2, f"b0 {SHARED} b1 b2 b3"),
        (3, "c0 r0 r1 r2 r3 c1 r0 r1 r2 r3 c2"),
        (4, "d0 d1 d2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_exact_intervals(planted):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(planted, window=W).collect()
    }
    # windows straddling the unique context are never duplicated, so the
    # merged interval covers EXACTLY the shared run: 10 tokens, 7 windows
    assert got == {(1, 3, 13, 7), (2, 1, 11, 7)}


def test_dup_span_stats_counts_and_clean_docs(planted):
    got = {r["doc_id"]: r for r in dup_span_stats(planted, window=W).collect()}
    assert set(got) == {1, 2, 3, 4}  # one row per input doc, always
    assert (got[1]["dup_tokens"], got[1]["n_tokens"]) == (10, 15)
    assert (got[2]["dup_tokens"], got[2]["n_tokens"]) == (10, 14)
    # intra-doc repetition is NOT cross-document duplication
    assert got[3]["dup_tokens"] == 0
    # too short for any window: clean by definition
    assert got[4]["dup_tokens"] == 0 and got[4]["dup_frac"] == 0.0
    assert got[1]["dup_frac"] == pytest.approx(10 / 15)


def test_strip_keeps_canonical_copy_only(planted):
    got = {r["doc_id"]: r["text"] for r in strip_duplicate_spans(planted, window=W).collect()}
    # canonical = min (doc_id, start) -> doc 1 keeps the shared run intact
    assert got[1] == f"a0 a1 a2 {SHARED} a3 a4"
    # doc 2 loses exactly the shared run
    assert got[2] == "b0 b1 b2 b3"
    # untouched docs come back whitespace-canonicalized but token-identical
    assert got[3] == "c0 r0 r1 r2 r3 c1 r0 r1 r2 r3 c2"
    assert got[4] == "d0 d1 d2"


def test_fully_duplicated_doc(spark):
    # doc 2 is a verbatim copy of doc 1: frac 1.0, strip empties the copy
    rows = [(1, "x0 x1 x2 x3 x4 x5"), (2, "x0 x1 x2 x3 x4 x5")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: r for r in dup_span_stats(docs, window=W).collect()}
    assert stats[1]["dup_frac"] == 1.0 and stats[2]["dup_frac"] == 1.0
    got = {r["doc_id"]: r["text"] for r in strip_duplicate_spans(docs, window=W).collect()}
    assert got == {1: "x0 x1 x2 x3 x4 x5", 2: ""}


def test_no_duplicates_is_identity(spark):
    rows = [(1, "p0 p1 p2 p3 p4"), (2, "q0 q1 q2 q3 q4")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert duplicate_spans(docs, window=W).count() == 0
    got = {r["doc_id"]: r["text"] for r in strip_duplicate_spans(docs, window=W).collect()}
    assert got == dict(rows)


def test_null_text_is_empty_doc(spark):
    """Null text follows the package-wide empty-string convention: without
    the coalesce, non-ANSI size(NULL) = -1 gave n_tokens = -1 and a negative
    dup_frac (round-6 advice)."""
    rows = [(1, "x0 x1 x2 x3 x4 x5"), (2, "x0 x1 x2 x3 x4 x5"), (3, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {r["doc_id"]: r for r in dup_span_stats(docs, window=W).collect()}
    # same accounting as an empty string: one empty token, zero dup coverage
    assert (stats[3]["n_tokens"], stats[3]["dup_tokens"]) == (1, 0)
    assert stats[3]["dup_frac"] == 0.0
    # the real duplicates are still found and stripped around the null row
    assert stats[1]["dup_frac"] == 1.0 and stats[2]["dup_frac"] == 1.0
    got = {r["doc_id"]: r["text"] for r in strip_duplicate_spans(docs, window=W).collect()}
    assert got == {1: "x0 x1 x2 x3 x4 x5", 2: "", 3: ""}


def test_strip_mixed_clean_and_dirty_whitespace(spark):
    """The clean fast path's regexp_replace canonicalization must agree with
    the rebuild path's tokenize-and-rejoin on messy whitespace."""
    rows = [
        (1, "  x0 x1   x2 x3\tx4 x5  "),     # dirty, canonical keeper, messy ws
        (2, "x0 x1 x2 x3 x4 x5"),            # dirty, duplicate copy
        (3, "  c0\t c1  c2   "),             # clean, messy ws
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in strip_duplicate_spans(docs, window=W).collect()}
    # canonical = min (doc_id, start) over occurrences of each window hash
    assert got[1] == "x0 x1 x2 x3 x4 x5"
    assert got[2] == ""
    assert got[3] == "c0 c1 c2"
