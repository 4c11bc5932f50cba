"""Event envelope + per-event-type property schemas (the schema registry).

Reference parity: the reference registers one Pydantic properties model
per event name at startup and rejects unknown names at ingest
(/root/reference/models/event.py:8-32, services/event_registry.py:15-32,
app.py:20-24). Here the registry is a plain dict of StructTypes; an
incoming JSON ``props`` string is parsed with ``from_json`` against the
schema selected by ``event_type``, and rows that fail to parse (or carry
an unregistered event name) are split into a quarantine DataFrame instead
of an HTTP 400.

At scale this is a single narrow projection over the stream/scan — no
shuffle, fully codegen'd, schema dispatch compiled into one CASE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Envelope of the reference's Event (models/event.py:28-32) mapped onto
# the driver's events table (event_id<->uuid, ts<->timestamp,
# event_type<->name, props JSON<->event_properties, value<->amount).
EVENT_ENVELOPE = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

# Per-event-type property schemas (reference models/event.py:8-25 has
# scam_flag/add_credit_card/chargeback/purchase; the driver's synthetic
# stream carries five types, all with a {"k": int} payload).
PROPS_SCHEMAS: dict[str, T.StructType] = {
    name: T.StructType([T.StructField("k", T.LongType(), True)])
    for name in ("click", "signup", "error", "view", "purchase")
}


def registered_event_types() -> tuple[str, ...]:
    return tuple(sorted(PROPS_SCHEMAS))


def parse_events(events: DataFrame) -> DataFrame:
    """Schema-validated parse (reference app.py:30-41).

    Adds a typed ``props_parsed`` struct column and an ``is_valid`` flag:
    valid = registered event name AND props parses under that name's
    schema (or is absent). All built-in expressions — Catalyst folds the
    per-type dispatch into one codegen'd projection.
    """
    known = F.col("event_type").isin(list(PROPS_SCHEMAS))
    # All driver types share one props schema; keep the per-type dispatch
    # shape anyway so heterogeneous registries drop in unchanged.
    # PERMISSIVE from_json yields an all-null struct (not NULL) on
    # malformed input, so each schema gets a corrupt-record field and
    # validity checks that field instead.
    parsed = None
    for name, schema in PROPS_SCHEMAS.items():
        with_corrupt = T.StructType(
            [*schema.fields, T.StructField("_corrupt", T.StringType(), True)]
        )
        branch = F.from_json(
            "props", with_corrupt, {"columnNameOfCorruptRecord": "_corrupt"}
        )
        parsed = F.when(F.col("event_type") == name, branch) if parsed is None else parsed.when(
            F.col("event_type") == name, branch
        )
    out = events.withColumn("props_parsed", parsed)
    # coalesce to FALSE: with a NULL event_type, `isin` is NULL and a
    # three-valued is_valid would be dropped by BOTH filter(v) and
    # filter(~v) — the row VANISHES from valid and quarantine alike
    # (round-8 ingest-contract find). Event-time and event-name are
    # CONTRACT-REQUIRED (the reference 400s an event Pydantic can't
    # parse; time analytics are undefined without ts) — rows missing
    # either land in quarantine, never in the tables and never in the
    # void.
    return out.withColumn(
        "is_valid",
        F.coalesce(
            F.col("ts").isNotNull()
            & known
            & (
                F.col("props").isNull()
                | (
                    F.col("props_parsed").isNotNull()
                    & F.col("props_parsed._corrupt").isNull()
                )
            ),
            F.lit(False),
        ),
    ).withColumn("props_parsed", F.col("props_parsed").dropFields("_corrupt"))


def split_quarantine(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) — the engine's analog of the 400 response."""
    parsed = parse_events(events)
    return (
        parsed.filter(F.col("is_valid")).drop("is_valid"),
        parsed.filter(~F.col("is_valid")).drop("is_valid"),
    )
