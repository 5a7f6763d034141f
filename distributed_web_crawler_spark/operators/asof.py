"""As-of join — the time-series operator Spark's DataFrame API lacks.

For every left row, attach the single most recent right row with
right.ts <= left.ts (backward, inclusive) sharing the join key, with an
optional tolerance that voids matches older than `left.ts - tolerance`.

Implementation is the union + running-last trick, NOT a range join:
tag both inputs, union them, and take `last(<right col>, ignorenulls)`
over a window ordered by (ts, side) within each key. One hash exchange
on the key and one sort — at 100 TB this is the plan you want, whereas
the naive `l.ts >= r.ts` range join explodes to O(|l|·|r|) candidate
pairs per key before picking the max (Spark plans it as a broadcast
nested loop or cartesian per key). Ties at equal ts resolve
reference-first (side 0 before side 1), matching ASOF semantics where
an equal-timestamp right row is a valid match; duplicate right rows on
the same (key, ts) must be resolved by the caller (e.g. keep min id)
for the result to be deterministic — the oracle does the same.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              ts_col: str = "ts", prefix: str = "asof_",
              tolerance: Column | None = None) -> DataFrame:
    """Backward-inclusive left as-of join.

    Every column of `right` except the key(s) and `ts_col` is carried
    onto matching left rows as `{prefix}{name}`, plus `{prefix}{ts_col}`
    (the matched timestamp). Left rows with no admissible right row get
    nulls. `tolerance` (an interval Column, e.g. F.expr("INTERVAL 10
    MINUTES")) voids matches with right.ts < left.ts - tolerance.
    """
    keys = [on] if isinstance(on, str) else list(on)
    carry = [c for c in right.columns if c not in (*keys, ts_col)]
    carried = [f"{prefix}{c}" for c in carry]
    out_ts = f"{prefix}{ts_col}"

    lhs = left.select(
        *keys, ts_col, F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (*keys, ts_col)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}")
          for c in carry],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(out_ts))
    rhs = right.select(
        *keys, ts_col, F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (*keys, ts_col)],
        *[F.col(c).alias(f"{prefix}{c}") for c in carry],
        F.col(ts_col).alias(out_ts))

    w = (Window.partitionBy(*keys).orderBy(ts_col, "_side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = rhs.unionByName(lhs)
    for c in (*carried, out_ts):
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    res = u.where(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        admissible = F.col(out_ts) >= (F.col(ts_col) - tolerance)
        for c in carried:
            res = res.withColumn(c, F.when(admissible, F.col(c)))
        res = res.withColumn(out_ts, F.when(admissible, F.col(out_ts)))
    return res
