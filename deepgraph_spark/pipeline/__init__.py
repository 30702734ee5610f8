"""Large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) — first-class components alongside the
link-graph engine, all expressed as declarative DataFrame plans or
Arrow-vectorized pandas stages."""

from deepgraph_spark.pipeline.curation import (
    curation_pipeline,
    decontaminate,
    hash_split,
    pack_shards,
    redact_pii,
)
from deepgraph_spark.pipeline.dedup import (
    dedup_against_index,
    embedding_neardup_pairs,
    exact_dedup,
    line_exact_dedup,
    minhash_lsh_dedup,
    minhash_signatures,
    neardup_clusters,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_fingerprints,
)
from deepgraph_spark.pipeline.mixing import mix_corpora
from deepgraph_spark.pipeline.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
)
from deepgraph_spark.pipeline.spandedup import (
    dup_span_stats,
    duplicate_spans,
    strip_duplicate_spans,
)
from deepgraph_spark.pipeline.textstats import (
    corpus_ngram_topk,
    doc_fingerprints,
    lang_id,
    repetition_stats,
    text_quality,
    token_stats,
)

__all__ = [
    "exact_dedup",
    "line_exact_dedup",
    "minhash_lsh_dedup",
    "mix_corpora",
    "minhash_signatures",
    "dedup_against_index",
    "neardup_clusters",
    "semantic_dedup",
    "simhash_fingerprints",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_lsh",
    "token_stats",
    "text_quality",
    "lang_id",
    "doc_fingerprints",
    "repetition_stats",
    "corpus_ngram_topk",
    "decontaminate",
    "hash_split",
    "pack_shards",
    "redact_pii",
    "curation_pipeline",
    "duplicate_spans",
    "dup_span_stats",
    "strip_duplicate_spans",
]
