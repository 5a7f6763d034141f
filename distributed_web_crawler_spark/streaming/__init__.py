from .events_stream import sliding_counts_stream, tumbling_counts_stream

__all__ = ["sliding_counts_stream", "tumbling_counts_stream"]
