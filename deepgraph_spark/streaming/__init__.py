from deepgraph_spark.streaming.edge_stream import stream_band_edges
from deepgraph_spark.streaming.sessions import sessionize_batch, stream_sessionize

__all__ = ["stream_band_edges", "stream_sessionize", "sessionize_batch"]
