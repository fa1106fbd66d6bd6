"""BPE merge-rule training as DataFrame algebra.

Byte-pair-encoding vocabulary training is the canonical tokenizer
build step; its core loop — count adjacent symbol pairs (weighted by
word frequency), merge the most frequent pair everywhere, repeat — is
usually written imperatively. Here each iteration is pure relational
algebra over the distinct-word frame, so it runs distributed and a SQL
twin replicates it exactly:

- pair counts: lead() window over per-word symbol positions + one hash
  aggregate (weighted by word freq);
- best pair: (count DESC, left ASC, right ASC) — deterministic ties;
- the GREEDY LEFT-TO-RIGHT merge ("a a a" → ["aa","a"], "a b a b" →
  ["ab","ab"]) is the classic stateful scan, expressed STATELESSLY as
  gaps-and-islands: cumulative count of matching positions makes
  pos − cum constant per run of consecutive matches, and within each
  run exactly the odd-ranked positions merge (each merge consumes its
  right neighbor, so every other match in a chain survives).

The word frame is |vocabulary|-sized (tiny relative to the corpus —
the corpus is touched once to build it), so iterations cost windows
over thousands of rows, not data scans. `bpe_oracle_sql` unrolls the
same recurrence as CTEs from shared tie-break rules, which is what
lets the driver hash-compare a trained artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col

__all__ = ["bpe_merges", "bpe_encode", "bpe_oracle_sql"]


def _word_frame(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("w", "freq", F.split("w", "").alias("toks"))
    )


def _merge_once(frame: DataFrame):
    """One BPE iteration: returns (rule_df(lhs, rhs, cnt), next_frame)."""
    x = _explode_symbols(frame)
    pc = (
        x.filter(F.col("nxt").isNotNull())
        .groupBy("tok", "nxt")
        .agg(F.sum("freq").alias("cnt"))
    )
    best = (
        pc.orderBy(F.desc("cnt"), F.asc("tok"), F.asc("nxt"))
        .limit(1)
        .select(
            F.col("tok").alias("lhs"),
            F.col("nxt").alias("rhs"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )
    return best, _apply_rule(x, best)


def _apply_rule(x: DataFrame, rule: DataFrame) -> DataFrame:
    """Apply one merge rule (1-row frame with lhs/rhs) to the exploded
    symbol frame ``x`` (w, freq, pos, tok, nxt) — the gaps-and-islands
    greedy left-to-right merge; returns the rebuilt word frame."""
    wp = Window.partitionBy("w").orderBy("pos")
    m = x.crossJoin(
        F.broadcast(rule.select("lhs", "rhs"))
    ).withColumn(
        "m", (F.col("tok") == F.col("lhs")) & (F.col("nxt") == F.col("rhs"))
    )
    c = m.withColumn(
        "rnm",
        F.sum(F.when(F.col("m"), 1).otherwise(0)).over(wp),
    ).withColumn("grp", F.when(F.col("m"), F.col("pos") - F.col("rnm")))
    s = c.withColumn(
        "sel",
        F.col("m")
        & (
            F.row_number().over(
                Window.partitionBy("w", "grp").orderBy("pos")
            )
            % 2
            == 1
        ),
    )
    n = s.withColumn("prev_sel", F.lag("sel").over(wp))
    nt = (
        F.when(F.col("sel"), F.concat(F.col("tok"), F.col("nxt")))
        .when(F.coalesce(F.col("prev_sel"), F.lit(False)), F.lit(None))
        .otherwise(F.col("tok"))
    )
    return (
        n.withColumn("nt", nt)
        .filter(F.col("nt").isNotNull())
        .groupBy("w", "freq")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "nt"))),
                lambda e: e.getField("nt"),
            ).alias("toks")
        )
    )


def _explode_symbols(frame: DataFrame) -> DataFrame:
    wp = Window.partitionBy("w").orderBy("pos")
    return frame.select(
        "w", "freq", F.posexplode("toks").alias("pos", "tok")
    ).withColumn("nxt", F.lead("tok").over(wp))


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rules: list[tuple[str, str]],
) -> DataFrame:
    """Apply trained merge rules in order to tokenize the corpus:
    (id_col, tokens array<string>). The rules replay over the DISTINCT
    word frame only (|vocabulary| rows — each rule is windows over that
    tiny frame, the corpus itself is never rescanned per rule); the
    word→symbols mapping then broadcasts onto the documents' word
    positions and flattens in order. ``rules`` is the collected
    (lhs, rhs) list from `bpe_merges` — a tiny driver-side artifact,
    like a codebook fixture."""
    frame = _word_frame(df, text_col)
    spark = df.sparkSession
    for i, (lhs, rhs) in enumerate(rules):
        rule = spark.createDataFrame([(lhs, rhs)], "lhs string, rhs string")
        frame = _apply_rule(_explode_symbols(frame), rule)
        if (i + 1) % 5 == 0:
            frame = frame.localCheckpoint(eager=False)
    mapping = frame.select("w", "toks")
    words = df.select(
        F.col(id_col), F.posexplode(tokens_col(text_col)).alias("wpos", "w")
    )
    return (
        words.join(F.broadcast(mapping), "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("wpos", "toks"))),
                    lambda e: e.getField("toks"),
                )
            ).alias("tokens")
        )
    )


def bpe_merges(
    df: DataFrame, text_col: str, iterations: int = 3
) -> DataFrame:
    """The first ``iterations`` BPE merge rules over the corpus:
    (step, lhs, rhs, merged, cnt) — the trained artifact a tokenizer
    loads. Each iteration localCheckpoints the (tiny) word frame so the
    plan stays bounded."""
    frame = _word_frame(df, text_col)
    out = None
    for step in range(1, iterations + 1):
        frame = frame.localCheckpoint(eager=False)
        rule, frame = _merge_once(frame)
        r = rule.select(
            F.lit(step).cast("long").alias("step"),
            "lhs",
            "rhs",
            F.concat("lhs", "rhs").alias("merged"),
            "cnt",
        )
        out = r if out is None else out.unionByName(r)
    return out


def bpe_oracle_sql(iterations: int = 3, source: str = "documents") -> str:
    """The identical recurrence unrolled as DuckDB CTEs."""
    parts = [
        f"""WITH w0 AS (
  SELECT w, COUNT(*) AS freq, str_split(w, '') AS toks
  FROM (SELECT unnest(str_split(text, ' ')) AS w FROM {source})
  GROUP BY w
)"""
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(f"""x{i} AS (
  SELECT w, freq, t.pos, toks[t.pos] AS tok,
         CASE WHEN t.pos < len(toks) THEN toks[t.pos + 1] END AS nxt
  FROM w{p}, unnest(range(1, len(toks) + 1)) AS t(pos)
)""")
        parts.append(f"""best{i} AS (
  SELECT tok AS lhs, nxt AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM x{i} WHERE nxt IS NOT NULL GROUP BY tok, nxt
  ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1
)""")
        parts.append(f"""m{i} AS (
  SELECT x.*, (x.tok = b.lhs AND x.nxt = b.rhs) AS m
  FROM x{i} x CROSS JOIN best{i} b
)""")
        parts.append(f"""g{i} AS (
  SELECT *, CASE WHEN m THEN pos - rnm END AS grp FROM (
    SELECT *, SUM(CASE WHEN m THEN 1 ELSE 0 END)
              OVER (PARTITION BY w ORDER BY pos) AS rnm
    FROM m{i}
  )
)""")
        parts.append(f"""s{i} AS (
  SELECT *, (m AND (row_number()
      OVER (PARTITION BY w, grp ORDER BY pos) % 2 = 1)) AS sel
  FROM g{i}
)""")
        parts.append(f"""w{i} AS (
  SELECT w, freq, list(nt ORDER BY pos) AS toks FROM (
    SELECT w, freq, pos,
           CASE WHEN sel THEN tok || nxt
                WHEN COALESCE(lag(sel) OVER (PARTITION BY w ORDER BY pos),
                              FALSE) THEN NULL
                ELSE tok END AS nt
    FROM s{i}
  ) WHERE nt IS NOT NULL GROUP BY w, freq
)""")
    tail = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, lhs, rhs, "
        f"lhs || rhs AS merged, cnt FROM best{i}"
        for i in range(1, iterations + 1)
    )
    return ",\n".join(parts) + f"\n{tail}\nORDER BY step"
