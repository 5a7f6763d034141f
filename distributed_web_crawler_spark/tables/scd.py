"""SCD2 history merge: fold a new crawl snapshot into a
slowly-changing-dimension page-history table.

The reference overwrites each page row in place on recrawl (repository/
PageRepository.java upsert via Cassandra); a training-data pipeline
instead needs the page's *history* — which content version was live when
a corpus snapshot was cut — i.e. the classic MERGE INTO ... WHEN MATCHED
pattern every lakehouse CDC flow runs. Implemented as ONE full-outer
hash join on the key (the exact physical shape of a MERGE) followed by a
map-only row generator: each key emits its closed interval and/or its
current interval from a single when-chain over an exploded struct array.
No window, no second shuffle; at 100 TB both sides hash-partition by key
and AQE handles the skewed-host tail like every other key join here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(old: DataFrame, new: DataFrame, key_col: str,
               value_col: str, old_round: int = 0,
               new_round: int = 1) -> DataFrame:
    """(old snapshot, new snapshot) -> SCD2 rows
    (key, content, valid_from, valid_to, is_current):

    - key unchanged     -> one open row [old_round, NULL)
    - key changed       -> closed [old_round, new_round) + open [new_round,)
    - key deleted       -> closed [old_round, new_round)
    - key inserted      -> open [new_round,)
    """
    o = old.select(F.col(key_col).alias("key"),
                   F.col(value_col).alias("v_old"))
    n = new.select(F.col(key_col).alias("key"),
                   F.col(value_col).alias("v_new"))
    j = o.join(n, "key", "full_outer")
    has_old, has_new = F.col("v_old").isNotNull(), F.col("v_new").isNotNull()
    lf, lt = F.lit(old_round).cast("long"), F.lit(new_round).cast("long")
    nul = F.lit(None).cast("long")

    def row(content, valid_from, valid_to, is_current):
        return F.struct(content.alias("content"),
                        valid_from.alias("valid_from"),
                        valid_to.alias("valid_to"),
                        F.lit(is_current).alias("is_current"))

    closed = row(F.col("v_old"), lf, lt, False)
    opened = row(F.col("v_new"), lt, nul, True)
    carried = row(F.col("v_old"), lf, nul, True)
    rows = (F.when(has_old & has_new & (F.col("v_old") == F.col("v_new")),
                   F.array(carried))
            .when(has_old & has_new, F.array(closed, opened))
            .when(has_old, F.array(closed))
            .otherwise(F.array(opened)))
    return (j.select("key", F.explode(rows).alias("r"))
            .select("key", "r.content", "r.valid_from", "r.valid_to",
                    "r.is_current"))
