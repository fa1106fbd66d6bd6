"""Normalize layer — the reference's transform stage (SURVEY §2.2 P1/P2,
§2.7 T1–T7) as one declarative operator.

The reference does this per-object in pandas: project a keep-list,
lowercase headers, coerce datetimes/booleans/numerics/strings
(`Salesforce/Task/lambda_litify_task.py:59-114`,
`Salesforce/Matter/lambda_litify_matter.py:74-303`). Here it is a single
``normalize(df, schema)`` that emits one ``select`` — one projection node
Catalyst pushes into the scan, no per-column withColumn chains (each
withColumn adds an analysis pass; a single select keeps the plan flat).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import functions as fx
from .schemas import (
    BOOL01,
    DATE_DDMMYYYY,
    FLOAT0,
    INT0,
    STRING,
    TIMESTAMP,
    ObjectSchema,
)

_COERCERS = {
    TIMESTAMP: fx.ts_or_null,
    BOOL01: fx.bool01,
    INT0: fx.int0,
    FLOAT0: fx.float0,
    DATE_DDMMYYYY: fx.parse_ddmmyyyy,
    STRING: fx.null_if_blank,  # '' → NULL end-to-end (T6 + COPY EMPTYASNULL)
}


def lowercase_columns(df: DataFrame) -> DataFrame:
    """P2 — `Salesforce/Task/lambda_litify_task.py:113`."""
    return df.toDF(*[c.lower() for c in df.columns])


def normalize(df: DataFrame, schema: ObjectSchema, strict: bool = False) -> DataFrame:
    """Project to the schema's keep-list (P1), lowercase (P2), and coerce
    every column per its class (T1–T7) in ONE select.

    Missing source columns are tolerated (the reference guards each
    boolean with ``if field in df.columns``,
    `Salesforce/Matter/lambda_litify_matter.py:287`): absent → typed NULL
    column unless ``strict``.
    """
    present = {c.lower(): c for c in df.columns}
    cols: list[Column] = []
    for name, cls in schema.fields.items():
        if name in present:
            cols.append(_COERCERS[cls](F.col(present[name])).alias(name))
        elif strict:
            raise ValueError(f"{schema.name}: missing required column {name!r}")
        else:
            # absent column ⇒ coerce a NULL through the class rules, so
            # defaults apply (bool→0, int→0, float→0.0, string/ts→NULL)
            cols.append(
                _COERCERS[cls](F.lit(None).cast("string")).alias(name)
            )
    return df.select(*cols)


def observed(
    df: DataFrame,
    name: str,
    null_cols: tuple[str, ...] = (),
):
    """Attach zero-cost pipeline metrics: row count plus a null count
    per requested column, gathered DURING the next action on the
    returned frame — no second scan, no collect.

    This is the engine's replacement for the reference's print-based
    observability (`Procesando CSV: {key}` + row-count prints, SURVEY
    §5): the reference pays a pandas `len(df)` on the driver; `observe`
    rides the existing job as accumulator-style metrics, which is the
    only observability pattern that survives a 1000-executor run.

    Returns ``(df, observation)``; read ``observation.get`` after an
    action. Works in batch; for streams use the listener-based variant
    of the same API.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"n_null_{c}")
        )
    return df.observe(obs, *metrics), obs
