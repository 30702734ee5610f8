"""Streaming incremental near-dup: match arriving documents against a
persisted MinHash signature index (``pipeline.minhash_signatures``) as they
land — the ingest-side twin of ``pipeline.dedup_against_index``, the way a
recurring crawl actually consumes the index.

Pattern: ``foreachBatch``. A document's signature depends only on that
document (per-doc aggregation over its own shingles), and each batch is
matched against the same static index, so the union of per-batch match sets
is EXACTLY the batch operator's output regardless of how the stream is
micro-batched — deterministic, hence fully value-oracle-able against the
same DuckDB mirror as the batch gate. State lives in the index table, not
in streaming state: 24/7 deployments refresh the index with the
just-admitted signatures per batch (append the new rows to the index sink);
the bounded replay here keeps the index static, which is the oracle-able
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def incremental_dedup_replay(
    new_docs: DataFrame,
    index: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    hash_fn: str = "xxhash64",
    batches: int = 4,
    work_dir: str | None = None,
    timeout_sec: int = 600,
) -> DataFrame:
    """Bounded replay: ``new_docs`` is split into ``batches`` files, streamed
    one file per micro-batch (file source → ``maxFilesPerTrigger=1`` →
    availableNow), each batch matched against the static ``index`` with
    ``dedup_against_index`` inside ``foreachBatch`` and appended to a parquet
    sink. Returns the union of per-batch ``(new_id, corpus_id,
    est_jaccard)`` matches — equal to the batch operator over the whole
    table by the determinism argument in the module docstring."""
    import os
    import tempfile
    import uuid

    from deepgraph_spark.pipeline.dedup import dedup_against_index

    spark = new_docs.sparkSession
    work = work_dir or tempfile.mkdtemp(prefix="dg_idx_replay_")
    run = uuid.uuid4().hex[:8]
    src = os.path.join(work, "src_" + run)
    ck = os.path.join(work, "ck_" + run)
    out = os.path.join(work, "out_" + run)

    base = new_docs.select(id_col, text_col)
    base.repartition(batches).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def _match(batch_df: DataFrame, _batch_id: int) -> None:
        dedup_against_index(
            batch_df,
            index,
            text_col=text_col,
            id_col=id_col,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            hash_fn=hash_fn,
        ).write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(_match)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"availableNow replay did not finish in {timeout_sec}s")
    return spark.read.parquet(out)
