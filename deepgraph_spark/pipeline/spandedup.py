"""Cross-document duplicate-span detection and removal (ExactSubstr-style
dedup at token-window granularity — the span-level counterpart of
``line_exact_dedup``; Lee et al., "Deduplicating Training Data Makes
Language Models Better" motivates removing long verbatim repeats rather
than whole near-duplicate documents).

Granularity: a *window* is ``window`` consecutive whitespace tokens. A
window is *duplicated* when its text occurs in ≥ 2 distinct documents; a
document's *duplicate spans* are its maximal merged runs of duplicated
windows. Spans shorter than ``window`` tokens are never flagged (that is
the resolution limit, exactly as in suffix-based ExactSubstr with a minimum
match length).

Scale shape (100 TB judgment): tokenize + slide windows per document
(narrow ``(doc_id, start, hash60)`` longs — never window text — ride the
shuffle), one hash-keyed aggregation finds duplicated hashes
(map-side-combined; a pathological boilerplate hash SHRINKS its shuffle
volume), a semi-join marks occurrences, and interval merging is a
per-document window function — so every stage is keyed by hash or by
document, nothing global. All-native Column plans end to end: no UDF
anywhere, every operator here holds a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


from deepgraph_spark.pipeline.util import reparallelize_small_scan


def _window_occurrences(
    docs: DataFrame, *, text_col: str, id_col: str, window: int
) -> DataFrame:
    """(id, start, gh): every length-``window`` token window of every
    document, as 60-bit hashes (shared ``hash60`` family — the DuckDB twin
    parses the same 15 md5 hex chars). Documents shorter than ``window``
    tokens emit nothing."""
    from deepgraph_spark.pipeline.dedup import hash60

    docs = reparallelize_small_scan(docs, id_col)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    wins = F.transform(
        F.sequence(F.lit(0), F.size(toks) - window),
        lambda j: F.concat_ws(" ", F.slice(toks, j + 1, window)),
    )
    return (
        docs.where(F.size(toks) >= window)
        .select(F.col(id_col), F.posexplode(wins).alias("start", "win"))
        .select(id_col, "start", hash60(F.col("win")).alias("gh"))
    )


def _dup_occurrences(
    docs: DataFrame, *, text_col: str, id_col: str, window: int
) -> DataFrame:
    """(id, start) of windows whose text appears in >= 2 distinct docs."""
    occ = _window_occurrences(docs, text_col=text_col, id_col=id_col, window=window)
    dup = (
        occ.groupBy("gh")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gh")
    )
    return occ.join(dup, "gh", "left_semi").select(id_col, "start")


def duplicate_spans(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """Maximal cross-document duplicate spans per document.

    Returns ``(id_col, span_start, span_end, n_windows)``: half-open token
    intervals ``[span_start, span_end)`` formed by merging overlapping or
    touching duplicated windows, with the number of duplicated windows each
    span absorbed. The merge is the classic running-max sweep as a
    per-document window function (new span iff this window starts after
    every previous window's end), so the whole operator distributes by
    document."""
    occ = _dup_occurrences(docs, text_col=text_col, id_col=id_col, window=window)
    w_ord = Window.partitionBy(id_col).orderBy("start")
    prev_max_end = F.max(F.col("start") + window).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = occ.select(
        id_col,
        "start",
        F.when(
            prev_max_end.isNull() | (F.col("start") > prev_max_end), F.lit(1)
        ).otherwise(F.lit(0)).alias("new_span"),
    )
    grouped = flagged.select(
        id_col,
        "start",
        F.sum("new_span").over(
            w_ord.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("grp"),
    )
    return grouped.groupBy(id_col, "grp").agg(
        F.min("start").alias("span_start"),
        (F.max("start") + window).alias("span_end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).drop("grp")


def dup_span_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """Per-document duplication accounting over the merged spans: one row
    per input document — ``(id_col, n_tokens, dup_tokens, dup_frac)`` where
    ``dup_tokens`` sums the merged (disjoint) span lengths and ``dup_frac``
    is the fraction of the document's tokens inside some cross-document
    duplicate span (0.0 for clean or too-short documents). The corpus-level
    quality dial a curation pipeline thresholds on before stripping.

    Null text is treated as the empty string (the package-wide convention:
    one empty token, zero duplicate coverage) — without the coalesce,
    Spark's non-ANSI ``size(NULL) = -1`` would silently yield ``n_tokens =
    -1`` and a negative ``dup_frac`` (round-6 advice)."""
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    spans = duplicate_spans(docs, text_col=text_col, id_col=id_col, window=window)
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_tokens")
    )
    return (
        docs.select(F.col(id_col), F.size(toks).alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .fillna(0, subset=["dup_tokens"])
        .select(
            id_col,
            "n_tokens",
            "dup_tokens",
            (F.col("dup_tokens") / F.col("n_tokens")).cast("double").alias("dup_frac"),
        )
    )


def strip_duplicate_spans(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """Remove cross-document duplicate spans, keeping one canonical copy.

    Canonical occurrence of each duplicated window = the lexicographically
    smallest ``(id, start)`` over its occurrences (deterministic; no corpus
    ordering assumptions). A token is dropped iff it is covered by at least
    one NON-canonical duplicated window and by no canonical one in its own
    document. Guarantees: the canonical copy of every duplicated window
    survives intact, clean text is untouched, and only provably-duplicated
    coverage is ever dropped (when 3+ documents overlap on *different*
    window sets, a region may survive in more than one of them — removal is
    conservative, never lossy).

    Returns one row per input document ``(id_col, text_col)`` with the
    surviving tokens joined by single spaces (tokenization canonicalizes
    whitespace — documented, and mirrored by the oracle). Token coverage
    explodes ``window`` positions per duplicated occurrence only (clean
    windows never expand), and the rebuild groups by document, so the
    operator stays document-partitioned at any corpus size.

    Clean-doc fast path (round-6 verdict): only documents with ≥ 1
    *removable* token (covered by a non-canonical duplicated window and no
    canonical one) pay the token posexplode + per-doc sort rebuild; the
    rest — the overwhelming majority of a deduplicated corpus — take a pure
    ``regexp_replace`` whitespace canonicalization, so the expensive path
    scales with *duplicated* volume, not corpus volume."""
    occ = _window_occurrences(docs, text_col=text_col, id_col=id_col, window=window)
    dup = (
        occ.groupBy("gh")
        .agg(
            F.count_distinct(F.col(id_col)).alias("nd"),
            F.min(F.struct(F.col(id_col).alias("d"), F.col("start").alias("s"))).alias("canon"),
        )
        .where(F.col("nd") >= 2)
        .select("gh", "canon")
    )
    docc = occ.join(dup, "gh").select(
        id_col,
        "start",
        (
            (F.col("canon.d") == F.col(id_col)) & (F.col("canon.s") == F.col("start"))
        ).alias("is_canon"),
    )
    cover = docc.select(
        id_col,
        F.explode(F.sequence(F.col("start"), F.col("start") + window - 1)).alias("p"),
        "is_canon",
    ).groupBy(id_col, "p").agg(
        F.max(F.when(F.col("is_canon"), 1).otherwise(0)).alias("canon_cov"),
        F.max(F.when(~F.col("is_canon"), 1).otherwise(0)).alias("other_cov"),
    )
    # cover is referenced twice (dirty-id derivation and the kept join) —
    # without a cache boundary the whole window-hash/dup-detection subtree
    # re-evaluates once per reference. Lazy localCheckpoint persists on first
    # use, truncates the lineage, and the blocks are reclaimed by the
    # ContextCleaner when the handles go out of scope.
    cover = cover.localCheckpoint(eager=False)
    # docs with >= 1 token to drop: only these need the exploded rebuild
    # (groupBy, not distinct-after-select: one exchange fewer)
    dirty_ids = cover.where(
        (F.col("other_cov") == 1) & (F.col("canon_cov") == 0)
    ).groupBy(id_col).agg(F.lit(1).alias("_dirty")).select(id_col)
    text_c = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(F.trim(text_c), r"\s+")
    pos = docs.join(dirty_ids, id_col, "left_semi").select(
        F.col(id_col), F.posexplode(toks).alias("p", "tok")
    )
    # one row per DIRTY doc (collect_list skips the nulls the removable
    # filter produces, so an all-removed document still gets a row with '')
    removable = (F.col("other_cov") == 1) & (F.col("canon_cov") == 0)
    kept = (
        pos.join(cover, [id_col, "p"], "left")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.coalesce(removable, F.lit(False)),
                                F.struct("p", "tok"),
                            )
                        )
                    ),
                    lambda s: s["tok"],
                ),
            ).alias("_rebuilt")
        )
    )
    # single final join: dirty docs take their rebuilt text, clean docs (no
    # kept row) fall through to a native whitespace canonicalization — the
    # same single-space form the rebuild produces, without paying the token
    # explode (at corpus scale clean docs are the overwhelming majority)
    return docs.join(kept, id_col, "left").select(
        F.col(id_col),
        F.coalesce(
            F.col("_rebuilt"),
            F.regexp_replace(F.trim(text_c), r"\s+", " "),
        ).alias(text_col),
    )
