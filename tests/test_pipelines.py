"""Pipeline facade (P1–P9): each reference pipeline's engine
counterpart, end-to-end on fixture data."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from redshift_etl_spark import pipelines as P
from redshift_etl_spark import schemas as S


def test_salesforce_ingest_two_folders(spark, tmp_path):
    for day, rows in [
        ("d1", "T1,First,false,2024-02-01 10:00:00\nT2,Keep,true,2024-02-01 11:00:00"),
        ("d2", "T1,Updated,true,2024-02-02 10:00:00\nT3,New,false,2024-02-02 11:00:00"),
    ]:
        d = tmp_path / day
        d.mkdir()
        (d / "task.csv").write_text(
            "Id,Subject,IsClosed,LastModifiedDate\n" + rows + "\n"
        )
    target = spark.createDataFrame([], S.SF_TASK.spark_schema())
    merged = P.salesforce_ingest(
        spark,
        [str(tmp_path / "d1" / "task.csv"), str(tmp_path / "d2" / "task.csv")],
        S.SF_TASK,
        target,
    )
    rows = {r["id"]: r["subject"] for r in merged.collect()}
    assert rows == {"T1": "Updated", "T2": "Keep", "T3": "New"}


def test_previous_interval_bounds_halfopen_and_wrap():
    # `…CTR with boto3/lambda_boto3_connect_redshift.py:30-55`
    start, end, label = P.previous_interval_bounds(
        datetime(2024, 3, 5, 14, 40)
    )
    assert (start, end, label) == (
        datetime(2024, 3, 5, 12, 0), datetime(2024, 3, 5, 14, 0), "12-14",
    )
    # midnight wrap 22-00
    start, end, label = P.previous_interval_bounds(datetime(2024, 3, 6, 0, 40))
    assert (start.hour, end.hour, label) == (22, 0, "22-00")
    assert start == datetime(2024, 3, 5, 22, 0)


def test_ctr_backfill_paginated_anti_join(spark):
    schema = S.F_CALLS.spark_schema()
    base = {f.name: None for f in schema.fields}

    def row(cid, disconn=True):
        r = dict(base)
        r["contact_id"] = cid
        r["init_time"] = datetime(2024, 1, 1, 10)
        r["disconn_time"] = datetime(2024, 1, 1, 11) if disconn else None
        return r

    pages = {
        None: ([row("C1"), row("C2", disconn=False)], "t1"),
        "t1": ([row("C3"), row("C1")], None),  # C1 duplicate in-batch
    }
    fact = spark.createDataFrame([row("C3")], schema)  # C3 already loaded
    out = P.ctr_backfill(spark, lambda tok: pages[tok], fact)
    ids = sorted(r["contact_id"] for r in out.collect())
    # C2 dropped (incomplete), C3 not duplicated, C1 added once
    assert ids == ["C1", "C3"]


def test_dim_upsert_scd1(spark):
    target = spark.createDataFrame(
        [("U1", "old@x", "Old", None, datetime(2024, 1, 1))],
        S.DIM_USERS.spark_schema(),
    )
    rows = [
        {
            "user_id": "U1",
            "user_email": "new@x",
            "user_name": "New",
            "user_lastname": None,
            "last_modified": datetime(2024, 2, 1),
        },
        {
            "user_id": "U2",
            "user_email": "u2@x",
            "user_name": "Two",
            "user_lastname": "L",
            "last_modified": datetime(2024, 2, 1),
        },
    ]
    out = P.dim_upsert(spark, rows, S.DIM_USERS, target)
    emails = {r["user_id"]: r["user_email"] for r in out.collect()}
    assert emails == {"U1": "new@x", "U2": "u2@x"}


def test_sheet_ingest_normalizes_and_merges(spark):
    target = spark.createDataFrame([], S.EMPLOYEE.spark_schema())
    rows = [
        {
            "Email": "  a@x.com ",
            "Employee name": "Ann",
            "Hiring date": "25/12/2023",
            "Date of birth": "31/02/2024",
            "lastmodifieddate": "2024-03-01 00:00:00",
        }
    ]
    # sheet headers contain spaces — normalize matches lowercase; spaces
    # are the caller's concern (gspread returns exact header text)
    cleaned = [
        {k.lower().replace(" ", "_"): v for k, v in r.items()} for r in rows
    ]
    out = P.sheet_ingest(spark, cleaned, target)
    r = out.first()
    assert r["email"] == "a@x.com"              # trimmed (F10)
    assert str(r["hiring_date"]) == "2023-12-25"  # DD/MM/YYYY (F9)
    assert r["date_of_birth"] is None            # invalid date → NULL


def test_goals_upsert_composite_key(spark):
    schema = S.GOALS.spark_schema()
    target = spark.createDataFrame(
        [("t", datetime(2024, 1, 1), 1, "Ann", "a@x", 10.0)], schema
    )
    rows = [
        {
            "team": "t",
            "week_first_day": datetime(2024, 1, 1),
            "week_number": 1,
            "employee": "Ann",
            "employee_email": "a@x",
            "goal": 12.0,
        },
        {
            "team": "t",
            "week_first_day": datetime(2024, 1, 8),
            "week_number": 2,
            "employee": "Ann",
            "employee_email": "a@x",
            "goal": 5.0,
        },
    ]
    out = P.goals_upsert(spark, rows, target)
    goals = {
        (r["employee_email"], r["week_first_day"].day): r["goal"]
        for r in out.collect()
    }
    assert goals == {("a@x", 1): 12.0, ("a@x", 8): 5.0}
