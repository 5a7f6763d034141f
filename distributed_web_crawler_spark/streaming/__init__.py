from .events_stream import (
    interval_join_stream,
    sliding_counts_stream,
    static_enriched_stream,
    tumbling_counts_stream,
    watermark_dedup_stream,
    windowed_counts_update_query,
)
from .stateful import first_seen_stream
