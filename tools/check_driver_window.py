"""Dev harness: simulate the driver's CORRECTNESS gate over queries().

Runs every queries() entry at the given sf_dir, runs the matching
oracle_sql() in DuckDB on the same parquet views, and compares the way
the driver does: row count, column-name set, and values with columns
sorted by name. Entries without an oracle get a rows-only check
(runs, >=0 rows, stable schema).

Usage: python tools/check_driver_window.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as e
    from rlerrorgenerator_spark.session import get_spark

    spark = get_spark("check_driver_window",
                      cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qmap = e.queries()
    omap = e.oracle_sql()
    bad = 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sorted(
                tuple(_norm(r[c]) for c in cols) for r in sdf.collect()
            )
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL-spark] {name}: {type(exc).__name__}: {exc}")
            bad += 1
            continue
        dt = time.time() - t0
        if name not in omap:
            print(f"[rows-only]  {name}: {len(srows)} rows  ({dt:.1f}s)")
            continue
        try:
            cur = con.execute(omap[name])
            names = [d[0] for d in cur.description]
            raw = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL-sql]   {name}: {exc}")
            bad += 1
            continue
        ocols = sorted(names)
        idx = [names.index(c) for c in ocols]
        orows = sorted(
            tuple(_norm(row[i]) for i in idx) for row in raw
        )
        if cols != ocols:
            print(f"[SCHEMA]     {name}: spark={cols} oracle={ocols}")
            bad += 1
        elif len(srows) != len(orows):
            print(f"[ROWS]       {name}: spark={len(srows)} "
                  f"oracle={len(orows)}")
            bad += 1
        elif srows != orows:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(srows, orows))
                if a != b
            )
            print(f"[VALUES]     {name}: first diff at row {diff[0]}:\n"
                  f"  spark : {diff[1]}\n  oracle: {diff[2]}")
            bad += 1
        else:
            print(f"[OK]         {name}: {len(srows)} rows  ({dt:.1f}s)")
    print(f"\n{'ALL GREEN' if not bad else f'{bad} FAILURES'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
