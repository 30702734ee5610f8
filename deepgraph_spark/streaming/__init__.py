from deepgraph_spark.streaming.edge_stream import stream_band_edges

__all__ = ["stream_band_edges"]
