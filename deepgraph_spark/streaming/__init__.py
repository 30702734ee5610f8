from deepgraph_spark.streaming.dedup_stream import (
    exact_dedup_replay,
    stream_exact_dedup,
)
from deepgraph_spark.streaming.edge_stream import band_edges_replay, stream_band_edges
from deepgraph_spark.streaming.index_stream import incremental_dedup_replay
from deepgraph_spark.streaming.topk_stream import stream_topk, topk_replay
from deepgraph_spark.streaming.sessions import (
    sessionize_batch,
    sessionize_replay,
    stream_sessionize,
)

__all__ = [
    "stream_band_edges",
    "band_edges_replay",
    "stream_sessionize",
    "sessionize_batch",
    "sessionize_replay",
    "stream_exact_dedup",
    "exact_dedup_replay",
    "incremental_dedup_replay",
    "stream_topk",
    "topk_replay",
]
