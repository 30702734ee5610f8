"""Deduplication operators over a documents table.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup —
each designed so the expensive candidate generation stays a shuffle-bounded
DataFrame plan (explode → groupBy → bucket-join); vectorized numpy only
inside Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: keeper id (min) + copy count.

    Grouping key is the text itself for exactness; at 100 TB scale pre-group
    by ``xxhash64(text)`` first so the wide text column never shuffles twice
    (two-level: hash-group, then within-group exact compare).
    """
    return (
        docs.groupBy(F.col(text_col))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies")
    )


def _shingles(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per doc, via native sequence/transform —
    no Python in the hot path."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return (
        docs.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs with exact Jaccard verify.

    Plan: shingle-explode → per-doc minhash signature (one ``min(xxhash64(
    shingle, seed_i))`` per hash, computed in a single groupBy) → band hashes
    → bucket self-join for candidates → exact Jaccard via shingle-set join.
    Returns (a, b, jaccard) with a < b, jaccard >= threshold.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh = _shingles(docs, text_col, id_col, shingle_n).persist()

    sig = sh.groupBy(id_col).agg(
        *[F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    )
    band_cols = [
        F.xxhash64(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)], F.lit(b)).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    buckets = banded.select(
        id_col,
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("sig")) for b in range(bands)])
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.sig")

    left = buckets.select(F.col(id_col).alias("a"), "band", "sig")
    right = buckets.select(F.col(id_col).alias("b"), "band", "sig")
    cands = (
        left.join(right, ["band", "sig"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )

    # exact verify: |A∩B| via shingle join, |A|,|B| via counts
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cands.join(sh.select(F.col(id_col).alias("a"), "shingle"), "a")
        .join(sh.select(F.col(id_col).alias("b"), F.col("shingle").alias("shingle_b")), "b")
        .where(F.col("shingle") == F.col("shingle_b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb")), "b")
        .select(
            "a",
            "b",
            (F.col("i") / (F.col("sza") + F.col("szb") - F.col("i"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def simhash_fingerprints(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document (token-hash bit-vote), vectorized numpy
    inside one Arrow stage. Returns (id, simhash long)."""

    def batch(it):
        for pdf in it:
            out_ids = pdf[id_col].values
            sims = np.zeros(len(pdf), dtype=np.uint64)
            for row_i, text in enumerate(pdf[text_col].values):
                toks = str(text).split()
                if not toks:
                    continue
                # deterministic 64-bit token hashes (FNV-1a, vectorized-ish)
                hs = np.array([_fnv1a64(t) for t in toks], dtype=np.uint64)
                bitsm = ((hs[:, None] >> np.arange(bits, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
                votes = (2 * bitsm - 1).sum(axis=0)
                sims[row_i] = np.uint64(
                    sum(np.uint64(1) << np.uint64(i) for i, v in enumerate(votes) if v > 0)
                )
            yield pd.DataFrame({id_col: out_ids, "simhash": sims.astype(np.int64)})

    return docs.select(id_col, text_col).mapInPandas(batch, f"{id_col} long, simhash long")


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: list[str] | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Token-set Jaccard for all pairs within ``group_cols`` blocks
    (blocking bounds the pair space; SQL-oracle-friendly: pure Column ops).

    Returns (a, b, jaccard) with a < b within each block."""
    group_cols = group_cols or []
    toks = F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = docs.select(*group_cols, F.col(id_col), toks.alias("toks"))
    left = base.select(*group_cols, F.col(id_col).alias("a"), F.col("toks").alias("ta"))
    right = base.select(
        *[F.col(c).alias(f"{c}__r") for c in group_cols],
        F.col(id_col).alias("b"),
        F.col("toks").alias("tb"),
    )
    cond = F.col("a") < F.col("b")
    for c in group_cols:
        cond = cond & (F.col(c) == F.col(f"{c}__r"))
    pairs = left.join(right, cond)
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size("ta") + F.size("tb") - inter
    return pairs.select(
        "a", "b", (inter.cast("double") / union).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def embedding_neardup_pairs(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    group_cols: list[str] | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold) within
    optional blocking columns — native Column math (zip_with + aggregate),
    stays in whole-stage codegen."""
    group_cols = group_cols or []
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sumsq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    base = emb.select(*group_cols, F.col(id_col), v.alias("rv"), sumsq.alias("ss"))
    left = base.select(
        *group_cols, F.col(id_col).alias("a"), F.col("rv").alias("va"), F.col("ss").alias("sa")
    )
    right = base.select(
        *[F.col(c).alias(f"{c}__r") for c in group_cols],
        F.col(id_col).alias("b"),
        F.col("rv").alias("vb"),
        F.col("ss").alias("sb"),
    )
    cond = F.col("a") < F.col("b")
    for c in group_cols:
        cond = cond & (F.col(c) == F.col(f"{c}__r"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    # cos = dot / (sqrt(sa)*sqrt(sb)) — same associativity as the SQL oracle
    cos = dot / (F.sqrt("sa") * F.sqrt("sb"))
    return (
        left.join(right, cond)
        .select("a", "b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
