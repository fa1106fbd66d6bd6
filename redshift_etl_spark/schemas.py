"""Schema registry — explicit StructTypes per ingested object.

The reference reads CSVs with full pandas inference and then coerces to
hand-maintained per-object type maps (`Salesforce/Task/lambda_litify_task.py:97-111`,
`Salesforce/User/lambda_litify_user.py:115-134`,
`Salesforce/Matter/lambda_litify_matter.py:76-279`). Here those maps
become declarative ``ObjectSchema``s: the single source of truth used by
``transforms.normalize`` to project, cast, and lowercase.

Type conventions (SURVEY §1):
- strings: missing → NULL (the reference's ``''`` + COPY EMPTYASNULL
  round-trips to NULL; we keep NULL end-to-end)
- booleans: int 0/1 via the explicit truthy set
  (`Salesforce/Matter/lambda_litify_matter.py:286-288`)
- ints: missing → 0; floats: missing → 0.0
  (`Salesforce/Matter/lambda_litify_matter.py:291-297`)
- timestamps: coerce-to-NULL on parse failure
  (`Salesforce/Task/lambda_litify_task.py:99-100`)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

# Coercion classes (SURVEY §2.7)
STRING = "string"          # T6/T7: residual default
TIMESTAMP = "timestamp"    # T1
BOOL01 = "bool01"          # T3 (canonical truthy-set variant)
INT0 = "int0"              # T4: NaN→0
FLOAT0 = "float0"          # T5: NaN→0.0
DATE_DDMMYYYY = "date_ddmmyyyy"  # F9 (Google Sheets dates)

_SPARK_TYPE = {
    STRING: T.StringType(),
    TIMESTAMP: T.TimestampType(),
    BOOL01: T.IntegerType(),
    INT0: T.LongType(),
    FLOAT0: T.DoubleType(),
    DATE_DDMMYYYY: T.DateType(),
}


@dataclass(frozen=True)
class ObjectSchema:
    """Declarative schema for one ingested object."""

    name: str
    key: tuple[str, ...]              # merge key columns (lowercase)
    recency_col: str | None           # SCD1 recency column, None = no SCD
    fields: dict[str, str]            # lowercase column -> coercion class

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c, _SPARK_TYPE[cls], True) for c, cls in self.fields.items()]
        )

    def columns(self) -> list[str]:
        return list(self.fields)


_REGISTRY: dict[str, ObjectSchema] = {}


def register(schema: ObjectSchema) -> ObjectSchema:
    _REGISTRY[schema.name] = schema
    return schema


def get(name: str) -> ObjectSchema:
    return _REGISTRY[name]


def names() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# Reference objects (trimmed to the FIXTURES.md representative columns;
# full column lists live in the cited reference files).
# ---------------------------------------------------------------------------

# Salesforce Task — `Salesforce/Task/lambda_litify_task.py:60-111`,
# target DDL `Salesforce/Task/SP_litify_task.sql:51-60`.
SF_TASK = register(
    ObjectSchema(
        name="sf_task",
        key=("id",),
        recency_col="lastmodifieddate",
        fields={
            "id": STRING,
            "whatid": STRING,
            "subject": STRING,
            "activitydate": TIMESTAMP,
            "status": STRING,
            "ishighpriority": BOOL01,
            "isclosed": BOOL01,
            "createddate": TIMESTAMP,
            "lastmodifieddate": TIMESTAMP,
            "completeddatetime": TIMESTAMP,
            "tasksubtype": STRING,
            "ownerid": STRING,
        },
    )
)

# Salesforce Matter (coercion-class representative of the ~250-col object)
# `Salesforce/Matter/lambda_litify_matter.py:76-303`.
SF_MATTER = register(
    ObjectSchema(
        name="sf_matter",
        key=("id",),
        recency_col="lastmodifieddate",
        fields={
            "id": STRING,
            "name": STRING,
            "createddate": TIMESTAMP,
            "lastmodifieddate": TIMESTAMP,
            "litify_pm__open_date__c": TIMESTAMP,
            "isdeleted": BOOL01,
            "urgent__c": BOOL01,
            "lives_saved__c": INT0,
            "turnaround_time__c": INT0,
            "litify_pm__total_damages__c": FLOAT0,
            "total_overdue_amount__c": FLOAT0,
            "litify_pm__status__c": STRING,
            "office__c": STRING,
        },
    )
)

# Salesforce User dim — `Salesforce/User/lambda_litify_user.py:74-144`.
SF_USER = register(
    ObjectSchema(
        name="sf_user",
        key=("id",),
        recency_col="lastmodifieddate",
        fields={
            "id": STRING,
            "username": STRING,
            "firstname": STRING,
            "lastname": STRING,
            "title": STRING,
            "cm_job_title__c": STRING,
            "department__c": STRING,
            "isactive": BOOL01,
            "startday": FLOAT0,
            "endday": FLOAT0,
            "lastmodifieddate": TIMESTAMP,
        },
    )
)

# Connect call fact — `Amazon Connect/Amazon Connect CTR with boto3/
# SP_boto3_connect_redshift.sql:5-14`; field semantics
# `…CTR with Firehose/lambda_connect_firehose_redshift.py:95-126`.
F_CALLS = register(
    ObjectSchema(
        name="f_calls",
        key=("contact_id",),
        recency_col=None,  # insert-only (anti-join dedupe, J2)
        fields={
            "contact_id": STRING,
            "init_contact_id": STRING,
            "prev_contact_id": STRING,
            "channel": STRING,
            "init_method": STRING,
            "init_time": TIMESTAMP,
            "disconn_time": TIMESTAMP,
            "agent_conn": TIMESTAMP,
            "agent_id": STRING,
            "agent_username": STRING,
            "agent_conn_att": INT0,
            "agent_afw_start": TIMESTAMP,
            "agent_afw_end": TIMESTAMP,
            "agent_afw_duration": INT0,
            "agent_interact_duration": INT0,
            "agent_holds": INT0,
            "agent_longest_hold": INT0,
            "queue_id": STRING,
            "customer_phone": STRING,
            "customer_hold_duration": INT0,
            "contact_duration": FLOAT0,
        },
    )
)

# Connect dims — `…/lambda_connect_user_upsert.py:131-133`,
# `…/lambda_connect_queue_upsert.py:98-100`.
DIM_USERS = register(
    ObjectSchema(
        name="dim_users",
        key=("user_id",),
        recency_col="last_modified",
        fields={
            "user_id": STRING,
            "user_email": STRING,
            "user_name": STRING,
            "user_lastname": STRING,
            "last_modified": TIMESTAMP,
        },
    )
)

DIM_QUEUES = register(
    ObjectSchema(
        name="dim_queues",
        key=("queue_id",),
        recency_col="last_modified",
        fields={
            "queue_id": STRING,
            "queue_name": STRING,
            "last_modified": TIMESTAMP,
        },
    )
)

# Google Sheets employee — `Google Sheets/Employee/lambda_legal_employee_upsert.py:95-132`.
EMPLOYEE = register(
    ObjectSchema(
        name="employee",
        key=("email",),
        recency_col="lastmodifieddate",
        fields={
            "email": STRING,
            "employee_name": STRING,
            "position": STRING,
            "tower": STRING,
            "team": STRING,
            "supervisor": STRING,
            "manager": STRING,
            "country": STRING,
            "hiring_date": DATE_DDMMYYYY,
            "last_working_day": DATE_DDMMYYYY,
            "date_of_birth": DATE_DDMMYYYY,
            "lastmodifieddate": TIMESTAMP,
        },
    )
)

# Google Sheets goals — composite-key conditional upsert (J5)
# `Google Sheets/Goals/lambda_legal_goals_upsert.py:49-77`.
GOALS = register(
    ObjectSchema(
        name="goals",
        key=("employee_email", "week_first_day"),
        recency_col=None,
        fields={
            "team": STRING,
            "week_first_day": TIMESTAMP,
            "week_number": INT0,
            "employee": STRING,
            "employee_email": STRING,
            "goal": FLOAT0,
        },
    )
)

# Streaming CTR raw record schema (nested, pre-flatten) —
# `…CTR with Firehose/lambda_connect_firehose_redshift.py:91-126`.
CTR_JSON_SCHEMA = T.StructType(
    [
        T.StructField("ContactId", T.StringType()),
        T.StructField("InitialContactId", T.StringType()),
        T.StructField("PreviousContactId", T.StringType()),
        T.StructField("Channel", T.StringType()),
        T.StructField("InitiationMethod", T.StringType()),
        T.StructField("InitiationTimestamp", T.StringType()),
        T.StructField("DisconnectTimestamp", T.StringType()),
        T.StructField("LastUpdateTimestamp", T.StringType()),
        T.StructField(
            "Agent",
            T.StructType(
                [
                    T.StructField("ARN", T.StringType()),
                    T.StructField("Username", T.StringType()),
                    T.StructField("ConnectedToAgentTimestamp", T.StringType()),
                    T.StructField("AfterContactWorkStartTimestamp", T.StringType()),
                    T.StructField("AfterContactWorkEndTimestamp", T.StringType()),
                    T.StructField("AfterContactWorkDuration", T.LongType()),
                    T.StructField("AgentInteractionDuration", T.LongType()),
                    T.StructField("NumberOfHolds", T.LongType()),
                    T.StructField("LongestHoldDuration", T.LongType()),
                    T.StructField("CustomerHoldDuration", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "Queue",
            T.StructType(
                [
                    T.StructField("ARN", T.StringType()),
                    T.StructField("Name", T.StringType()),
                    T.StructField("EnqueueTimestamp", T.StringType()),
                    T.StructField("DequeueTimestamp", T.StringType()),
                    T.StructField("Duration", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "CustomerEndpoint",
            T.StructType(
                [
                    T.StructField("Address", T.StringType()),
                    T.StructField("Type", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "SystemEndpoint",
            T.StructType([T.StructField("Address", T.StringType())]),
        ),
    ]
)


def schema_drift(
    incoming: T.StructType, expected: "ObjectSchema"
) -> dict[str, list]:
    """Data-contract check for an arriving batch: compare the batch's
    observed schema against the registered contract BEFORE normalize
    coerces anything. Returns a drift report with four lists:

    - ``added``: columns the contract doesn't know (lowercased match —
      the ingest convention). New upstream fields; safe to ignore, but
      the contract owner should decide.
    - ``missing``: contract columns absent from the batch. normalize
      fills them with the class default, so this is data loss only if
      unexpected — which is exactly why it's reported.
    - ``type_changed``: (column, observed, expected_class) triples where
      the arriving native type can no longer coerce losslessly into the
      contract class (e.g. arriving string for an INT0 column is fine —
      try_cast handles it — but arriving double for BOOL01 is a
      contract break).
    - ``key_missing``: merge-key columns absent — a hard failure for
      any SCD pipeline, listed separately so callers can raise.

    Pure metadata — no data is read. The judgment of lossless
    coercibility is intentionally conservative: strings coerce into
    anything (every reference feed arrives stringly), numerics widen
    (int → long → double), everything else must match its class type.
    """
    exp_fields = {c.lower(): cls for c, cls in expected.fields.items()}
    obs = {f.name.lower(): f.dataType for f in incoming.fields}

    added = sorted(c for c in obs if c not in exp_fields)
    missing = sorted(c for c in exp_fields if c not in obs)

    _widens: dict[str, tuple] = {
        INT0: (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        FLOAT0: (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType,
        ),
        BOOL01: (T.BooleanType, T.ByteType, T.ShortType, T.IntegerType,
                 T.LongType),
        TIMESTAMP: (T.TimestampType, T.TimestampNTZType, T.DateType),
        DATE_DDMMYYYY: (T.DateType,),
        STRING: (),  # any type casts to string
    }
    type_changed = []
    for c, dt in obs.items():
        if c not in exp_fields:
            continue
        cls = exp_fields[c]
        if isinstance(dt, T.StringType) or cls == STRING:
            continue
        if not isinstance(dt, _widens.get(cls, ())):
            type_changed.append((c, dt.simpleString(), cls))

    key_missing = sorted(
        k for k in expected.key if k.lower() not in obs
    )
    return {
        "added": added,
        "missing": missing,
        "type_changed": sorted(type_changed),
        "key_missing": key_missing,
    }
