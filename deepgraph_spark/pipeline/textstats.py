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


def doc_fingerprints(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
) -> DataFrame:
    """Winnowing-style fingerprint: rolling polynomial (Karp-Rabin) hash over
    tokens, keep the min hash of each sliding window, distinct — the classic
    document-fingerprint sketch. Vectorized numpy per Arrow batch.
    Returns (id, fingerprint long) exploded rows."""

    # NB: python hash() is salted per-process for str — FNV keeps this
    # deterministic across executors/restarts
    def batch_det(it):
        from deepgraph_spark.pipeline.dedup import _fnv1a64

        B = np.uint64(1099511628211)
        for pdf in it:
            ids, fps = [], []
            for did, text in zip(pdf[id_col].values, pdf[text_col].values):
                toks = str(text).split()
                if not toks:
                    continue
                th = np.array([np.uint64(_fnv1a64(t)) for t in toks], dtype=np.uint64)
                n = len(th)
                w = min(window, n)
                roll = th[: n - w + 1].copy()
                for j in range(1, w):
                    roll = roll * B + th[j : n - w + 1 + j]
                sel = np.unique(roll)
                ids.extend([did] * len(sel))
                fps.extend(sel.astype(np.int64))
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    return docs.select(id_col, text_col).mapInPandas(
        batch_det, f"{id_col} long, fingerprint long"
    )
