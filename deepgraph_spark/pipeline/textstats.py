"""Text analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting. Everything except the fingerprint stays
in native Column expressions (whole-stage codegen, SQL-oracle-parity)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny marker vocabularies for the language-ID heuristic (deterministic,
# SQL-expressible: count marker-word hits per language, argmax with
# lexicographic tie-break)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "de", "la"],
    "fr": ["le", "et", "les"],
}


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_stats(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_chars, avg_token_len) — whitespace tokenization."""
    toks = _tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        (
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


def text_quality(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality features: alpha/digit/space/punct ratios + stopword ratio.

    All ratios over n_chars; stopword ratio = fraction of tokens in a small
    english stopword list. Simple enough to hold bit-for-bit against a SQL
    oracle."""
    n = F.length(text_col).cast("double")
    alpha = F.length(F.regexp_replace(text_col, "[^a-zA-Z]", ""))
    digit = F.length(F.regexp_replace(text_col, "[^0-9]", ""))
    space = F.length(F.regexp_replace(text_col, "[^ ]", ""))
    toks = _tokens(text_col)
    stop = F.array([F.lit(w) for w in ["the", "a", "of", "and", "to", "in"]])
    stop_n = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return docs.select(
        F.col(id_col),
        (alpha / n).alias("alpha_ratio"),
        (digit / n).alias("digit_ratio"),
        (space / n).alias("space_ratio"),
        (stop_n.cast("double") / F.size(toks)).alias("stopword_ratio"),
    )


def lang_id(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language guess: language with most marker hits among
    tokens; ties → lexicographically smallest language code; zero hits →
    'und'."""
    toks = _tokens(text_col)
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array([F.lit(m) for m in markers])
        scores.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))))
    best_score = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    # reverse order so earlier (lexicographically smaller) languages win ties
    for lang, s in reversed(scores):
        guess = F.when((best_score > 0) & (s == best_score), F.lit(lang)).otherwise(guess)
    return docs.select(F.col(id_col), guess.alias("lang_guess"))


def repetition_stats(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Intra-document repetition signal (the Gopher-style quality rule
    "fraction of duplicated n-grams"): per document, total vs distinct token
    ``k``-gram counts and ``dup_gram_ratio = 1 - distinct/total``.

    Whole plan is explode → one two-level aggregate (per-(doc, gram) counts,
    then per-doc rollup) over 60-bit gram hashes — only ``(doc_id, hash)``
    longs shuffle, and the first aggregation map-side-combines, so a doc with
    pathological repetition SHRINKS its shuffle volume rather than inflating
    it. Documents shorter than ``k`` tokens count one whole-text gram."""
    from deepgraph_spark.pipeline.dedup import hash60
    from deepgraph_spark.pipeline.util import reparallelize_small_scan

    docs = reparallelize_small_scan(docs, id_col)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda j: F.concat_ws(" ", F.slice(toks, j + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    g = docs.select(F.col(id_col), F.explode(grams).alias("gram")).select(
        id_col, hash60(F.col("gram")).alias("gh")
    )
    per_gram = g.groupBy(id_col, "gh").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.lit(1.0) - F.count(F.lit(1)) / F.sum("c")).alias("dup_gram_ratio"),
    )


def corpus_ngram_topk(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k: int = 2,
    top: int = 20,
) -> DataFrame:
    """Corpus-wide most-frequent token ``k``-grams (vocabulary / boilerplate
    inspection): (gram, n) with a deterministic order (count desc, gram asc).

    explode → hash-aggregate on the gram string (map-side partial combine
    collapses each executor's counts before the shuffle) → orderBy+limit,
    which Spark executes as TakeOrdered — per-partition top-``top`` heaps
    merged on the driver, never a global sort of the gram dictionary."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda j: F.concat_ws(" ", F.slice(toks, j + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    from deepgraph_spark.pipeline.util import reparallelize_small_scan

    return (
        reparallelize_small_scan(docs, docs.columns[0])
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(top)
    )


def doc_fingerprints(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., MOSS): hash every
    token ``k``-gram, then keep the minimum hash of each sliding window of
    ``window`` consecutive k-grams, distinct per document.

    All-native plan: sequence/transform builds the k-grams (no Python),
    :func:`deepgraph_spark.pipeline.dedup.hash60` hashes them JVM-side, and
    the window-min is ``min() OVER (PARTITION BY doc ORDER BY pos ROWS
    BETWEEN CURRENT ROW AND window-1 FOLLOWING)`` — a partitioned window, so
    the operator distributes by document. Documents shorter than ``k`` tokens
    contribute one whole-text gram. Returns (id, fingerprint long) rows.
    """
    from pyspark.sql import Window as W

    from deepgraph_spark.pipeline.dedup import hash60
    from deepgraph_spark.pipeline.util import reparallelize_small_scan

    docs = reparallelize_small_scan(docs, id_col)
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda j: F.concat_ws(" ", F.slice(toks, j + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    g = docs.select(
        F.col(id_col),
        F.size(grams).alias("n_grams"),
        F.posexplode(grams).alias("j", "gram"),
    )
    h = g.select(id_col, "n_grams", "j", hash60(F.col("gram")).alias("gh"))
    w = W.partitionBy(id_col).orderBy("j").rowsBetween(0, window - 1)
    # full windows only (j <= n_grams - window); short docs -> one window
    keep = (F.col("j") <= F.col("n_grams") - window) | (
        (F.col("j") == 0) & (F.col("n_grams") < window)
    )
    return (
        h.select(F.col(id_col), "n_grams", "j", F.min("gh").over(w).alias("fingerprint"))
        .where(keep)
        .select(id_col, "fingerprint")
        .distinct()
    )
