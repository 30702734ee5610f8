"""Training-mix assembly: combine corpora at target token-weight ratios by
deterministic hash downsampling.

The data-mixing step every LLM training pipeline runs over its curated
sources (web / code / books / …): given per-source weights, keep the
largest mix that honours the ratios WITHOUT upsampling any source, by
downsampling each source with the same content-independent id-hash rule
``hash_split`` uses — stable across reruns and corpus growth, zero
shuffle (one Column predicate per source), and md5-mirrorable so the whole
derivation (token counts → capacity → keep fractions → kept rows) is one
DuckDB oracle.

Math: with per-source token counts t_i and weights w_i (only the RATIOS
matter; weights are used as given — no normalization, so the oracle can
reproduce every double bit-for-bit), the mix capacity is
``T = min_i t_i / w_i`` and each source keeps fraction
``f_i = w_i * T / t_i`` (== 1 for the binding source). A row survives iff
``hash60(id ':' seed) % resolution < floor(f_i * resolution)`` — the
resolution-granular deterministic analogue of Bernoulli(f_i) sampling, so
realized token ratios match the weights up to sampling noise, not exactly.

Eager contract: computing t_i runs one bounded-scalar aggregation per
source at call time (the fractions are plan literals, like
``pack_shards``'s prefix sums).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepgraph_spark.pipeline.dedup import hash60


def mix_corpora(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    resolution: int = 1_048_576,
    source_col: str = "source",
) -> DataFrame:
    """Union of the kept rows of every source, tagged with ``source_col``.

    ``sources`` and ``weights`` share keys. Fails loud on an empty source
    (a zero token count makes the requested ratio unsatisfiable) rather
    than silently emitting a mix with a missing component.
    """
    if set(sources) != set(weights):
        raise ValueError(f"sources/weights key mismatch: {set(sources) ^ set(weights)}")
    if not sources:
        raise ValueError("mix_corpora: no sources given")
    ntok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    tokens = {
        name: (df.agg(F.sum(ntok).alias("t")).collect()[0]["t"] or 0)
        for name, df in sources.items()
    }
    empty = [n for n, t in tokens.items() if t <= 0]
    if empty:
        raise ValueError(f"mix_corpora: source(s) with zero tokens: {empty}")
    # double arithmetic in the exact order the oracle mirrors:
    # T = min(t_i / w_i); f_i = w_i * T / t_i
    cap = min(tokens[n] / weights[n] for n in sources)
    out = None
    for name, df in sources.items():
        frac = weights[name] * cap / tokens[name]
        cut = math.floor(frac * resolution)
        keep = (
            hash60(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")))
            % resolution
            < F.lit(cut)
        )
        part = df.where(keep).withColumn(source_col, F.lit(name))
        out = part if out is None else out.unionByName(part)
    return out
