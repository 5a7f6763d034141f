from .events_stream import tumbling_counts_stream

__all__ = ["tumbling_counts_stream"]
