"""Targeted re-timing of individual headline queries with the EXACT
bench.py methodology (untimed count warm-up, then min-of-N noop-sink
runs with clearCache between) so before/after numbers are comparable
to BENCH_*.json records.

    SPARK_GRAFT_CPUS=32 python scripts/time_queries.py q1,q2,... [runs]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = "/root/testdata/sf0.1"

    from redshift_etl_spark import queries as Q
    from redshift_etl_spark.session import get_spark

    spark = get_spark(app_name="time_queries")
    all_q = Q.all_queries()
    spark.range(1).count()

    for name in names:
        fn = all_q[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        n = fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
            spark.catalog.clearCache()
        print(f"# {name}: {best:.3f}s ({n} rows)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
