"""Local replica of the driver's correctness gate: run every queries()[name]
on Spark and its oracle_sql()[name] on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (exact; floats must match
bit-for-bit after the query's own rounding).

Usage: python tools/oracle_check.py [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from distributed_web_crawler_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        g, w = normalize(got), normalize(want)
        status = []
        if len(g) != len(w):
            status.append(f"rowcount {len(g)} vs {len(w)}")
        if list(g.columns) != list(w.columns):
            status.append(f"cols {list(g.columns)} vs {list(w.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status.append(f"values: {str(e)[:400]}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name}: {len(g)} rows match "
                  f"({time.time() - t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
