"""One-off decomposition of lang_marker_spearman's 10x slope (verdict
r09 item 4): is the 2.82x the two midrank range exchanges, or the
marker-projection scan CPU? Times three nested stages at sf0.1 and the
10x fixture:

  scan   — the scored projection alone (marker_hits + length), forced
           through an aggregate so nothing prunes;
  ranks  — ONE midrank pipeline (groupBy counts → ranked_cumsum →
           midrank join) aggregated, i.e. half the exchange work;
  full   — the complete spearman_corr.

Run idle, after scale_rehearsal's fixture exists:
    python scripts/profile_spearman.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
BIG = "/tmp/spark_graft_sfbig"


def main() -> None:
    import pyspark.sql.functions as F

    from redshift_etl_spark.operators import text as TX
    from redshift_etl_spark.operators.distsort import (
        ranked_cumsum,
        spearman_corr,
    )
    from redshift_etl_spark.queries.tables import load
    from redshift_etl_spark.session import get_spark

    spark = get_spark(app_name="profile_spearman")
    spark.range(1).count()

    def scored(d: str):
        return load(spark, d, "documents").select(
            TX.marker_hits("text", TX.LANG_MARKERS["en"]).alias("s"),
            F.col("n_chars").cast("long").alias("len"),
        )

    def t(fn) -> float:
        best = None
        for _ in range(2):  # min-of-2, same protocol as bench.py
            t0 = time.perf_counter()
            fn()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
        return round(best, 3)

    out: dict = {}
    for label, d in (("sf0.1", SRC), ("sfbig", BIG)):
        sc = scored(d)
        out[f"scan[{label}]"] = t(
            lambda: sc.agg(F.sum("s"), F.sum("len")).collect()
        )

        def one_midrank():
            counts = sc.groupBy("s").agg(
                F.count(F.lit(1)).cast("long").alias("__cnt")
            )
            cum = ranked_cumsum(
                counts, [F.col("s").asc()], "__cnt",
                rank_name="__rk", cumsum_name="__cum",
            )
            mid = cum.select(
                "s", (2 * F.col("__cum") - F.col("__cnt") + 1).alias("r")
            )
            sc.join(mid, "s").agg(
                F.sum(F.col("r").cast("decimal(38,0)"))
            ).collect()

        out[f"ranks1[{label}]"] = t(one_midrank)
        out[f"full[{label}]"] = t(
            lambda: spearman_corr(sc, "s", "len").collect()
        )

    for stage in ("scan", "ranks1", "full"):
        a, b = out[f"{stage}[sf0.1]"], out[f"{stage}[sfbig]"]
        out[f"slope[{stage}]"] = round(b / max(a, 1e-9), 2)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
