"""Simulate the driver harness against __spark_entry__.py: a PLAIN
SparkSession (none of our engine confs), entry() smoke at sf0.001, then
every queries() entry vs its oracle_sql() twin via DuckDB at sf0.01.
Usage: python scripts/driver_sim.py [--quick] [--only name1,name2,...]
                                    [--sf DIR] [--out FILE]
  --quick  first 4 registry entries only (~2 min)
  --only   comma-separated query names (targeted re-verification)
  --sf     testdata dir (default /root/testdata/sf0.01); running the
           full catalog at a second SF guards against queries that only
           pass on one data distribution
  --out    write per-query rows in the driver's CORRECTNESS format
           (committed for second-SF sweeps, e.g. CORRECTNESS_SF01.json)
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


def _flag_value(flag: str) -> str | None:
    """Value of a ``--flag VALUE`` pair, validated UP FRONT: a trailing
    flag with no value must die here, not as an IndexError after the
    multi-minute sweep (ADVICE r11)."""
    if flag not in sys.argv:
        return None
    i = sys.argv.index(flag)
    if i + 1 >= len(sys.argv) or sys.argv[i + 1].startswith("--"):
        sys.exit(f"driver-sim: {flag} requires a value")
    return sys.argv[i + 1]


def main() -> None:
    global SF
    SF = _flag_value("--sf") or SF
    # --out is parsed AND proved writable before the sweep starts: a
    # typo'd directory used to fail only at write time, losing the
    # entire multi-minute record (ADVICE r11). Probe with append so an
    # existing file is not truncated by a sweep that later crashes.
    out_path = _flag_value("--out")
    if out_path is not None:
        try:
            with open(out_path, "a"):
                pass
        except OSError as exc:
            sys.exit(f"driver-sim: --out {out_path} not writable: {exc}")
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
    only = _flag_value("--only")
    if only is not None:
        wanted = only.split(",")
        unknown = [n for n in wanted if n not in queries]
        assert not unknown, f"unknown queries: {unknown}"
        names = wanted
    elif quick:
        names = names[:4]
    failed = []
    times: dict[str, float] = {}
    record: dict[str, dict] = {}
    for name in names:
        t0 = time.monotonic()
        try:
            df = queries[name](spark, SF)
            sp_cols = [c.lower() for c in df.columns]
            sp_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # record, don't abort the sweep
            times[name] = time.monotonic() - t0
            spark.catalog.clearCache()
            print(f"  {name}: ERROR {exc}")
            failed.append(name)
            record[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": str(exc)[:500],
            }
            continue
        times[name] = time.monotonic() - t0
        # operators persist multi-consumer frames whose consumers live
        # in the returned lazy plan, so they can't unpersist themselves
        # — the session owner drops the cache between queries or blocks
        # accumulate over a 256-query sweep (bench.py does the same)
        spark.catalog.clearCache()
        if name not in oracles:
            print(f"  {name}: rows-only check, {len(sp_rows)} rows "
                  f"[{times[name]:.2f}s]")
            record[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(sp_rows),
                "oracle_rows": None, "err": None,
            }
            continue
        rel = con.execute(oracles[name])
        dk_cols = [d[0].lower() for d in rel.description]
        dk_rows = rel.fetchall()
        rows_ok = len(sp_rows) == len(dk_rows)
        schema_ok = sorted(sp_cols) == sorted(dk_cols)
        hash_ok = schema_ok and rows_key(sp_rows, sp_cols) == rows_key(
            dk_rows, dk_cols
        )
        ok = rows_ok and schema_ok and hash_ok
        print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} "
              f"({len(sp_rows)} rows) [{times[name]:.2f}s]")
        if not ok:
            failed.append(name)
        record[name] = {
            "rows_match": rows_ok, "schema_match": schema_ok,
            "hash_match": hash_ok, "spark_rows": len(sp_rows),
            "oracle_rows": len(dk_rows), "err": None,
        }
    if out_path is not None:
        import json

        with open(out_path, "w") as fh:
            json.dump({"sf_dir": SF, "rows": record}, fh, indent=1)
            fh.write("\n")
        print(f"wrote {len(record)} rows to {out_path}")
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print("slowest:", ", ".join(f"{n}={t:.1f}s" for n, t in slow))
    print(f"total spark-side: {sum(times.values()):.1f}s over {len(times)}")
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print("driver-sim: ALL MATCH")


if __name__ == "__main__":
    main()
