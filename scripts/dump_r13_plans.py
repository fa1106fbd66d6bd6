"""Dump `.explain("formatted")` for the r13-optimization target queries
into plans/r13/<query>_<tag>.txt (tag = before|after).

    python scripts/dump_r13_plans.py before [name1,name2,...]

Runs at sf0.1 (the bench SF) on the same session config as bench.py so
the plans match what the bench executes. Queries whose construction
itself runs jobs (fixture builds, localCheckpoint iterations) still
produce a meaningful final-frame plan; the iterative part is described
by the operator docstrings and OPTIMIZATION_r13.md.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DEFAULT_TARGETS = [
    "bootstrap_value_ci",
    "hard_negative_mining",
    "semdedup",
    "embedding_dedup_clusters",
    "selectivity_conjunctive",
    "distinct_count_estimate",
    "join_size_estimate",
    "fact_key_overlap",
    "dsir_select",
    "substring_dedup",
    "span_dedup",
    "sql_agent_metrics",
    "agent_metrics",
    "trade_pagerank",
    "nb_source_confusion",
    "decontaminate_semantic",
    "bitext_margin_bucketed",
    "hard_negatives_bucketed",
    "dedup_minhash_lsh",
    "scd1_merge_wide",
    "corpus_prep",
    "krippendorff_lang",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_TARGETS
    )
    sf_dir = "/root/testdata/sf0.1"
    out_dir = pathlib.Path(__file__).resolve().parent.parent / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)

    from redshift_etl_spark import queries as Q
    from redshift_etl_spark.session import get_spark

    spark = get_spark(app_name="dump_r13_plans")
    all_q = Q.all_queries()
    for name in names:
        fn = all_q[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
