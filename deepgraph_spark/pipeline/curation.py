"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, deterministic train/val/test splits, token-budget shard
packing, and PII redaction.

These extend the reference's data-processing surface (the reference is a
single-node pandas engine; deepgraph.py has no corpus tooling) with the
operations a 100 TB text corpus actually needs before training. Every
operator is a declarative DataFrame plan — narrow shuffle rows, no
driver-side loops over data — except the one-pass Arrow stage in
:func:`pack_shards`, whose sequential running sum is exactly the part SQL
window semantics cannot distribute without a second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deepgraph_spark.pipeline.dedup import hash60

_WS = r"\s+"


def _token_kgrams(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, gram) rows: whitespace-token ``k``-grams; documents shorter than
    ``k`` tokens contribute their whole text as one gram (same convention as
    :func:`~deepgraph_spark.pipeline.textstats.doc_fingerprints`)."""
    from deepgraph_spark.pipeline.util import reparallelize_small_scan

    df = reparallelize_small_scan(df, id_col)
    toks = F.split(F.trim(F.col(text_col)), _WS)
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda j: F.concat_ws(" ", F.slice(toks, j + 1, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return df.select(F.col(id_col), F.explode(grams).alias("gram"))


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    *,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination by token ``k``-gram overlap (the standard
    n-gram-collision check training pipelines run against held-out eval
    suites): for every corpus document, how many of its distinct token
    k-grams also occur anywhere in ``eval_set``.

    Returns one row per corpus document:
    ``(id, n_grams, n_contaminated, contamination_ratio)`` — ratio of the
    document's distinct gram set that collides with the eval gram set.
    Filter ``contamination_ratio >= tau`` downstream to drop documents.

    Scale shape: grams are hashed to 60-bit longs *before* any join, so only
    ``(doc_id, hash)`` pairs ride the shuffles — never gram strings. The eval
    side reduces to a distinct hash set; benchmark suites are orders of
    magnitude smaller than a crawl corpus, so AQE broadcasts that side on its
    own — no forced-broadcast hint (an adversarially large eval set degrades
    to a shuffle join instead of an OOM).
    """
    cg = (
        _token_kgrams(corpus, text_col, id_col, k)
        .select(F.col(id_col), hash60(F.col("gram")).alias("gh"))
        .distinct()
        # referenced by BOTH the per-doc totals and the eval-collision join;
        # a lazy cut materializes the tokenize+hash+distinct once instead of
        # once per branch (Catalyst does not share subtrees across branches)
        .localCheckpoint(eager=False)
    )
    eg = (
        _token_kgrams(eval_set, eval_text_col or text_col, id_col, k)
        .select(hash60(F.col("gram")).alias("gh"))
        .distinct()
    )
    totals = cg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = cg.join(eg, "gh").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    return (
        totals.join(hits, id_col, "left")
        .fillna(0, subset=["n_contaminated"])
        .select(
            id_col,
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated").cast("double") / F.col("n_grams")).alias(
                "contamination_ratio"
            ),
        )
    )


def hash_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
    split_col: str = "split",
    resolution: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent id
    hash: ``bucket = hash60(id || ':' || seed) % resolution``, buckets carved
    into ranges by cumulative weight.

    The properties that matter in a pipeline: (1) stable — a document keeps
    its split across reruns, repartitions, and corpus growth (no global sort,
    no sampling RNG state); (2) embarrassingly parallel — one Column
    expression, no shuffle at all; (3) oracle-able — the md5-based
    :func:`hash60` has an exact DuckDB twin.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    ) % resolution
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = bucket < int(round(acc * resolution))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def pack_shards(
    df: DataFrame,
    *,
    budget: int,
    order_by=None,
    size_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Token-budget shard packing: assign each document a shard id so that
    consecutive documents (in ``order_by`` order) fill ~``budget`` tokens per
    shard — the write-side layout step before training-data serialization.

    Definition (SQL-window-equivalent, so it holds bit-for-bit against an
    oracle): ``shard = floor(exclusive_running_sum(size) / budget)``. A
    document straddling a boundary belongs to the shard where it starts.

    Scale shape — a distributed prefix sum, NOT a global window: (1) one
    range partition + in-partition sort pins global order (same layout trick
    as :func:`~deepgraph_spark.core.with_dense_index`); (2) per-partition
    size totals (a tiny aggregate, <=1 row per partition) become cumulative
    offsets entering the plan as a closure constant; (3) a single Arrow pass
    adds ``offset[partition] + local running sum`` — batches of a partition
    stream through ``mapInPandas`` in sorted order, so the running sum never
    leaves the executor and NOTHING shuffles after the initial range
    exchange. A plain ``sum() OVER (ORDER BY ...)`` would instead serialize
    the whole corpus through one task.
    """
    order_by = order_by or [id_col]
    size_expr = (
        F.col(size_col)
        if size_col
        else F.size(F.split(F.trim(F.col(text_col)), _WS))
    )
    s1 = (
        df.withColumn("__sz", size_expr.cast("long"))
        .repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    parts = s1.groupBy("__pid").agg(F.sum("__sz").alias("__t")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(parts, key=lambda r: r["__pid"]):
        offsets[int(row["__pid"])] = acc
        acc += int(row["__t"])

    fields = [f for f in s1.schema.fields if f.name not in ("__pid", "__sz")]
    out_schema = T.StructType(fields + [T.StructField(shard_col, T.LongType())])
    out_cols = [f.name for f in fields]
    bud = int(budget)

    def pack(it):
        running = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if running is None:
                running = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            sz = pdf["__sz"].astype("int64")
            start = sz.cumsum() - sz + running  # exclusive running sum
            running += int(sz.sum())
            out = pdf[out_cols].copy()
            out[shard_col] = (start // bud).astype("int64")
            yield out

    return s1.mapInPandas(pack, out_schema)


def curation_pipeline(
    corpus: DataFrame,
    eval_set: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_keep: tuple[str, ...] = ("en",),
    min_alpha_ratio: float = 0.815,
    neardup_threshold: float = 0.5,
    hash_fn: str = "md5",
    contamination_k: int = 8,
    max_contamination: float = 0.5,
    split_seed: int = 42,
    keep_split: str = "train",
    shard_budget: int = 2000,
    strip_spans: bool = False,
    span_window: int = 8,
    embeddings: DataFrame | None = None,
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    semantic_threshold: float = 0.85,
    semantic_centroid_mod: int = 1000,
    semantic_n_centroids: int | None = None,
) -> DataFrame:
    """The end-to-end curation pipeline a 100 TB corpus actually runs before
    training, composed from this package's own operators:

    PII redaction → language-ID filter → quality (alpha-ratio) filter →
    MinHash-LSH near-dup removal (keep one canonical doc per duplicate
    cluster) → [``strip_spans=True``: cross-document duplicate-span removal
    over the survivors — the ExactSubstr pass that rewrites text, so every
    later stage (decontamination grams, token counts, shard packing) sees
    the stripped text] → [``embeddings`` given: SemDeDup semantic dedup over
    the survivors' embedding rows (joined ``emb_id_col`` = doc id), dropping
    non-canonical members of each semantic cluster] → benchmark
    decontamination against ``eval_set`` → deterministic hash split (keep
    ``keep_split``) → token-budget shard packing.

    Returns ``(id, n_tokens, shard)`` for the surviving documents. The point
    of the composed form (vs each operator's own gate) is that the stages
    compose *as DataFrame plans*: every inter-stage boundary is an id-keyed
    semi/anti join of narrow key rows, so Catalyst sees one lazy plan and the
    only wide exchanges are the ones each stage owns (LSH band shuffle, gram
    hash join, the single range exchange in :func:`pack_shards`). The one
    exception is the semantic stage: its connected-component closure is an
    iterative kernel that materializes internally (documented at
    :func:`deepgraph_spark.pipeline.dedup.semantic_dedup`) — the stage's
    boundary is still an id-keyed anti join.

    Scale shape per stage is unchanged from the individual operators —
    documented at their definitions; nothing here adds a shuffle beyond the
    id-keyed filters.
    """
    from deepgraph_spark.pipeline.dedup import neardup_clusters, semantic_dedup
    from deepgraph_spark.pipeline.spandedup import strip_duplicate_spans
    from deepgraph_spark.pipeline.textstats import lang_id, text_quality

    # 1. redact PII on both sides (before dedup, so redacted boilerplate
    #    dedups; before decontamination, so eval grams match redacted text)
    # lazy cut: the redacted corpus feeds three branches (the language
    # filter, the quality filter, and the survivor table itself) and the
    # triple-regex redaction chain is the pipeline's most expensive
    # per-row map — materialize it once, not once per branch
    red_c = redact_pii(corpus, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("text_redacted").alias(text_col)
    ).localCheckpoint(eager=False)
    red_e = redact_pii(eval_set, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("text_redacted").alias(text_col)
    )

    # 2+3. language + quality filters (id-keyed joins of 1-row-per-doc sides)
    lang = lang_id(red_c, text_col=text_col, id_col=id_col).where(
        F.col("lang_guess").isin(*lang_keep)
    )
    qual = text_quality(red_c, text_col=text_col, id_col=id_col).where(
        F.col("alpha_ratio") >= min_alpha_ratio
    )
    surv1 = red_c.join(lang.select(id_col), id_col, "left_semi").join(
        qual.select(id_col), id_col, "left_semi"
    )

    # 4. near-dup removal: keep cluster canonicals (cluster == own id) and
    #    docs with no near-duplicate at all (absent from the cluster table)
    drops = neardup_clusters(
        surv1,
        text_col=text_col,
        id_col=id_col,
        threshold=neardup_threshold,
        hash_fn=hash_fn,
    ).where(F.col("cluster") != F.col(id_col))
    surv2 = surv1.join(drops.select(id_col), id_col, "left_anti")

    # 4b. optional: cross-document duplicate-span removal over the survivors —
    #     rewrites text, so decontamination grams / token counts / shard
    #     packing all see the stripped text
    if strip_spans:
        surv2 = strip_duplicate_spans(
            surv2, text_col=text_col, id_col=id_col, window=span_window
        )

    # 4c. optional: SemDeDup semantic dedup over the survivors' embeddings
    #     (keep cluster canonicals, same keep rule as the MinHash stage)
    if embeddings is not None:
        emb_surv = embeddings.join(
            surv2.select(F.col(id_col).alias(emb_id_col)), emb_id_col, "left_semi"
        )
        sem_drops = semantic_dedup(
            emb_surv,
            vec_col=vec_col,
            id_col=emb_id_col,
            threshold=semantic_threshold,
            centroid_mod=semantic_centroid_mod,
            n_centroids=semantic_n_centroids,
        ).where(F.col("cluster") != F.col(emb_id_col))
        surv2 = surv2.join(
            sem_drops.select(F.col(emb_id_col).alias(id_col)), id_col, "left_anti"
        )

    # The survivor table is referenced by several downstream branches (the
    # decontamination gram build, its own anti-join, and the final
    # split+pack chain); Catalyst does not share common subtrees across
    # branches, so without a cut each branch re-runs the full redaction
    # regex chain + both filters + the near-dup anti-join. A LAZY local
    # checkpoint materializes the survivors once at the first action and
    # every later branch reads the cached rows (measured: the composed
    # pipeline re-evaluated this subtree 3x at bench scale).
    surv2 = surv2.localCheckpoint(eager=False)

    # 5. decontamination against the (redacted) eval set
    contaminated = decontaminate(
        surv2, red_e, k=contamination_k, text_col=text_col, id_col=id_col
    ).where(F.col("contamination_ratio") >= max_contamination)
    surv3 = surv2.join(contaminated.select(id_col), id_col, "left_anti")

    # 6. deterministic split, keep one partition of it
    surv4 = hash_split(surv3, id_col=id_col, seed=split_seed).where(
        F.col("split") == keep_split
    )

    # 7. token-budget shard packing over the survivors, in id order
    sized = surv4.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), _WS)).cast("long").alias("n_tokens"),
    )
    return pack_shards(
        sized,
        budget=shard_budget,
        order_by=[id_col],
        size_col="n_tokens",
        id_col=id_col,
    )


# (name, regex) — RE2/Java-compatible syntax so the Spark plan and the DuckDB
# oracle compile the same automaton; replacement token is <NAME>.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"),
    ("phone", r"\+\d{9,14}"),
]


def redact_pii(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Redact PII-shaped substrings (emails, IPv4 addresses, international
    phone numbers by default) and count matches per category.

    Returns ``(id, text_redacted, n_<category>...)``. Counts are taken on the
    ORIGINAL text; replacements apply in pattern order (emails first, so an
    address's host part is gone before the looser patterns run). Pure Column
    expressions — whole-stage codegen, no shuffle, no Python.
    """
    pats = patterns or PII_PATTERNS
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, pat in pats
    ]
    out_text = F.col(text_col)
    for name, pat in pats:
        out_text = F.regexp_replace(out_text, pat, f"<{name.upper()}>")
    return docs.select(F.col(id_col), out_text.alias("text_redacted"), *counts)
