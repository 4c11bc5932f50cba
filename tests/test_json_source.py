"""JSON-lines event source: envelope quarantine + streaming parity with
the parquet source + property-schema validation reuse (A1/A2)."""

import json

from feature_store_2_spark.schemas import split_quarantine
from feature_store_2_spark.sources.json_events import (
    read_event_stream_json,
    read_events_json,
    split_envelope_quarantine,
)
from feature_store_2_spark.streaming.introspection import query_metrics

LINES = [
    # valid, full envelope + well-formed props
    {"event_id": 1, "ts": "2026-01-01T12:00:00", "user_id": 7,
     "event_type": "purchase", "value": 9.5, "props": '{"k": 3}'},
    # valid envelope, unregistered event name -> property-level quarantine
    {"event_id": 2, "ts": "2026-01-01T12:00:01", "user_id": 7,
     "event_type": "mystery", "value": 1.0, "props": '{"k": 1}'},
    # valid envelope, malformed props JSON -> property-level quarantine
    {"event_id": 3, "ts": "2026-01-01T12:00:02", "user_id": 8,
     "event_type": "click", "value": 2.0, "props": "{not json"},
    # missing user_id -> envelope-level quarantine
    {"event_id": 4, "ts": "2026-01-01T12:00:03",
     "event_type": "view", "value": 0.1, "props": None},
]


def _write(tmp_path):
    p = tmp_path / "events_json"
    p.mkdir()
    with open(p / "part-0.json", "w") as f:
        for line in LINES:
            f.write(json.dumps(line) + "\n")
        f.write("this is not json at all\n")  # corrupt line
    return str(p)


def test_batch_json_envelope_and_props_quarantine(spark, tmp_path):
    path = _write(tmp_path)
    raw = read_events_json(spark, path)
    ok, bad = split_envelope_quarantine(raw)
    assert bad.count() == 2  # missing-user_id row + unparseable line
    assert sorted(r.event_id for r in ok.collect()) == [1, 2, 3]

    valid, quarantined = split_quarantine(ok)
    assert sorted(r.event_id for r in valid.collect()) == [1]
    assert sorted(r.event_id for r in quarantined.collect()) == [2, 3]
    row = valid.collect()[0]
    assert row.props_parsed.k == 3 and row.value == 9.5


def test_streaming_json_source_matches_batch(spark, tmp_path):
    path = _write(tmp_path)
    stream = read_event_stream_json(spark, path)
    ok, _ = split_envelope_quarantine(stream)
    q = (
        ok.writeStream.format("memory")
        .queryName("json_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.event_id for r in spark.table("json_stream_test").collect())
    assert got == [1, 2, 3]

    m = query_metrics(q)
    assert m["is_active"] is False
    assert m["num_input_rows"] == 5  # 4 json lines + 1 corrupt line
    assert m["source_description"].startswith("FileStreamSource")


def test_quarantine_never_voids_rows(spark):
    """NULL event_type / NULL ts rows must land IN QUARANTINE: with a
    three-valued is_valid both filter(v) and filter(~v) drop the row —
    it vanishes from valid AND quarantine (round-8 ingest-contract
    find, fixed with coalesce-to-FALSE + the ts-required check)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2026, 1, 1, 12), 7, "purchase", 9.5, '{"k": 3}'),
        (2, dt.datetime(2026, 1, 1, 12), 7, None, 1.0, '{"k": 1}'),  # no name
        (3, None, 8, "click", 2.0, '{"k": 2}'),                      # no ts
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    valid, quarantined = split_quarantine(df)
    assert sorted(r.event_id for r in valid.collect()) == [1]
    assert sorted(r.event_id for r in quarantined.collect()) == [2, 3]
    assert valid.count() + quarantined.count() == df.count()
