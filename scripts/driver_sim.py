"""Simulate the driver harness against __spark_entry__.py: a PLAIN
SparkSession (none of our engine confs), entry() smoke at sf0.001, then
every queries() entry vs its oracle_sql() twin via DuckDB at sf0.01.
Usage: python scripts/driver_sim.py [--quick] [--only name1,name2,...]
                                    [--sf DIR]
  --quick  first 4 registry entries only (~2 min)
  --only   comma-separated query names (targeted re-verification)
  --sf     testdata dir (default /root/testdata/sf0.01); running the
           full catalog at a second SF guards against queries that only
           pass on one data distribution
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from tests.oracle_compare import rows_key  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    global SF
    if "--sf" in sys.argv:
        SF = sys.argv[sys.argv.index("--sf") + 1]
    quick = "--quick" in sys.argv
    # deliberately plain session — the driver owns the session config
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = E.entry(spark)
    rows = out.collect()
    print(f"entry(): {len(rows)} rows, schema: {[f.name for f in out.schema]}")
    assert len(rows) > 0

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    queries = E.queries()
    oracles = E.oracle_sql()
    # registration order, not sorted — mirrors the driver harness, so a
    # per-query time budget plays out here the same way it will there
    names = list(queries)
    if "--only" in sys.argv:
        wanted = sys.argv[sys.argv.index("--only") + 1].split(",")
        unknown = [n for n in wanted if n not in queries]
        assert not unknown, f"unknown queries: {unknown}"
        names = wanted
    elif quick:
        names = names[:4]
    failed = []
    times: dict[str, float] = {}
    for name in names:
        t0 = time.monotonic()
        df = queries[name](spark, SF)
        sp_cols = [c.lower() for c in df.columns]
        sp_rows = [tuple(r) for r in df.collect()]
        times[name] = time.monotonic() - t0
        # operators persist multi-consumer frames whose consumers live
        # in the returned lazy plan, so they can't unpersist themselves
        # — the session owner drops the cache between queries or blocks
        # accumulate over a 256-query sweep (bench.py does the same)
        spark.catalog.clearCache()
        if name not in oracles:
            print(f"  {name}: rows-only check, {len(sp_rows)} rows "
                  f"[{times[name]:.2f}s]")
            continue
        rel = con.execute(oracles[name])
        dk_cols = [d[0].lower() for d in rel.description]
        dk_rows = rel.fetchall()
        ok = (
            sorted(sp_cols) == sorted(dk_cols)
            and len(sp_rows) == len(dk_rows)
            and rows_key(sp_rows, sp_cols) == rows_key(dk_rows, dk_cols)
        )
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} "
              f"({len(sp_rows)} rows) [{times[name]:.2f}s]")
        if not ok:
            failed.append(name)
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print("slowest:", ", ".join(f"{n}={t:.1f}s" for n, t in slow))
    print(f"total spark-side: {sum(times.values()):.1f}s over {len(times)}")
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print("driver-sim: ALL MATCH")


if __name__ == "__main__":
    main()
