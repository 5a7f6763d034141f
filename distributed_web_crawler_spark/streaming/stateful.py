"""Custom stateful streaming operator via ``applyInPandasWithState``.

``first_seen_stream`` is the crawl engine's URL-seen dedup (D4) re-expressed
as an unbounded stream operator: per key, emit the deterministic arg-min row
(by the given order columns) of the FIRST batch that carries the key, then
never emit the key again — per-key state in the streaming state store marks
it seen forever. The reference has no event-time stream processor
(SURVEY.md §2.12); this is the forward-looking analog of its
`processedUrls` in-memory set (core/WebCrawler.java:33), made exact,
distributed, and restart-safe (state checkpoints with the query).

Scale shape: one state-store shuffle on the key — identical to the batch
D4 anti-join's shuffle — with O(distinct keys) boolean state, no growth
per row. Within a batch the candidate is reduced per Arrow chunk before
concat, so a hot key's batch never materializes whole in pandas.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_OUT = ("user_id long, event_id long, ts timestamp, "
                  "event_type string")
_STATE = "seen boolean"


def first_seen_stream(events: DataFrame) -> DataFrame:
    """Per user_id, the (ts, event_id)-min event of the first batch where
    the user appears; users already in state emit nothing. Append mode."""

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            return
        best = None
        for pdf in pdfs:
            cand = pdf.nsmallest(1, ["ts", "event_id"])
            if best is None:
                best = cand
            else:
                best = pd.concat([best, cand]).nsmallest(1, ["ts", "event_id"])
        if best is not None and len(best):
            state.update((True,))
            yield best[["user_id", "event_id", "ts", "event_type"]]

    return (events.groupBy("user_id")
            .applyInPandasWithState(fn, FIRST_SEEN_OUT, _STATE,
                                    "append", GroupStateTimeout.NoTimeout))
