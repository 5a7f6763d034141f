"""Whole-board plan hygiene sweep: explain EVERY queries() entry at sf0.01
and report scale red flags per plan —

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: an unkeyed join that
  explodes at corpus scale;
- ``BatchEvalPython``: a row-at-a-time Python UDF on the plan (the Arrow
  operators show up as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  and are fine);
- ``Exchange SinglePartition``: a stage that funnels the whole dataset
  through one task (global window / global sort tails).

Planning only — nothing executes. Usage: python tools/plan_sweep.py
[name ...]; exits non-zero if any non-whitelisted flag fires (whitelist
lives in tests/test_plan_hygiene.py, which is the CI face of this sweep).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from distributed_web_crawler_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

FLAGS = {
    "cartesian": ("CartesianProduct",),
    "nested_loop": ("BroadcastNestedLoopJoin",),
    "row_python": ("BatchEvalPython",),
    "single_partition": ("Exchange SinglePartition",),
}


def sweep(spark, names=None) -> dict[str, list[str]]:
    qs = entrymod.queries()
    hits: dict[str, list[str]] = {}
    for name in sorted(names or qs):
        try:
            plan = qs[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # planning failure is itself a finding
            hits[name] = [f"PLANNING FAILED: {e}"]
            continue
        found = [flag for flag, needles in FLAGS.items()
                 if any(n in plan for n in needles)]
        if found:
            hits[name] = found
    return hits


def main() -> int:
    only = sys.argv[1:] or None
    spark = get_spark("plan_sweep")
    hits = sweep(spark, only)
    total = len(only or entrymod.queries())
    for name, found in sorted(hits.items()):
        print(f"FLAG {name}: {', '.join(found)}")
    print(f"{total - len(hits)}/{total} plans clean")
    return 1 if hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
