"""Adversarial cross-engine micro-fixtures.

The driver's correctness gate runs on the seed-42 synthetic tables,
whose shape can hide edge cases (the r7 finds: Sen's-slope even-case
median, 1-ulp decimal->double corr divergence — both invisible at
sf0.01). This suite crafts a small events table that CONCENTRATES the
hazards — same-timestamp ties, single-event users, bursts on window
boundaries, conversion-before-signup, midnight-edge timestamps — and
pins Spark == DuckDB-oracle equality on it for the events-only entries
most exposed to ordering/boundary semantics.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from feature_store_2_spark.queries import CATALOG, _load_all

_load_all()
_BY = {q.name: q for q in CATALOG}

# Every batch entry whose ORACLE reads only the events table runs
# against the crafted fixture — auto-derived so new entries enroll
# themselves. (Streaming entries stage their own sources; entries
# whose Spark side needs other tables or a pre-built store are
# excluded below with the reason.)
import re as _re

_OTHER_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings",
)

EXCLUDED = {
    # point lookup / version diff / forget: need the sharded grants
    # store built for the target dir first (their own pytest covers
    # store semantics end-to-end)
    "fs_point_lookup",
    "fs_grants_version_diff",
    "fs_grants_forget_users",
}


def _events_only_entries():
    out = []
    for q in CATALOG:
        if not q.oracle or q.name.startswith("stream_"):
            continue
        if q.name in EXCLUDED:
            continue
        o = q.oracle.lower()
        if "events" not in o:
            continue
        if any(_re.search(rf"\b{t}\b", o) for t in _OTHER_TABLES):
            continue
        out.append(q.name)
    return out


ENTRIES = _events_only_entries()


def _ts(day, h=0, m=0, s=0, us=0):
    return dt.datetime(2024, 1, day, h, m, s, us)


def _crafted_events() -> pd.DataFrame:
    rows = []

    def add(ts, user, etype, value=1.0):
        rows.append((len(rows), ts, user, etype, value, '{"k": 1}'))

    # user 1: a single event ever (short history / all-censored)
    add(_ts(1, 10), 1, "signup")
    # user 2: signup and purchase at the SAME instant (0s conversion,
    # tie-order hazard)
    add(_ts(2, 9), 2, "signup")
    add(_ts(2, 9), 2, "purchase", 2.5)
    # user 3: a 12-event burst inside 10 seconds, several sharing
    # timestamps (throttle / concurrency / coalesce boundary ties)
    for i in range(12):
        add(_ts(3, 12, 0, i // 2), 3, "click")
    # user 4: the error->click->purchase motif twice, back-to-back
    # (overlapping sequence-match candidates)
    for k in range(2):
        add(_ts(4, 8 + k, 0, 0), 4, "error")
        add(_ts(4, 8 + k, 0, 30), 4, "click")
        add(_ts(4, 8 + k, 1, 0), 4, "purchase", 1.5)
    # user 5: purchase BEFORE signup (out-of-order funnel)
    add(_ts(5, 7), 5, "purchase", 0.01)
    add(_ts(5, 8), 5, "signup")
    # user 6: events exactly at midnight and 1us before (date-trunc edge)
    add(_ts(6, 0, 0, 0, 0), 6, "view")
    add(_ts(7, 0, 0, 0, 0) - dt.timedelta(microseconds=1), 6, "view")
    # user 7: signup then purchase after exactly 7 days (window edge);
    # interleaved error at the same second as the purchase
    add(_ts(8, 6), 7, "signup")
    add(_ts(15, 6), 7, "purchase", 327.53)
    add(_ts(15, 6), 7, "error")
    # four distinct days for user 8 so daily aggregates have an even
    # pairwise-slope count (C(4,2)=6 — the Sen's-slope regression shape,
    # here mixed into a multi-user table)
    for di, cnt in enumerate([3, 7, 1, 9]):
        for k in range(cnt):
            add(_ts(20 + di, 14, 0, k), 8, "view")
    return pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial")
    _crafted_events().to_parquet(d / "events.parquet")
    return str(d)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # Spark DATE arrives as object(datetime.date) while DuckDB's
        # fetchdf gives datetime64 — same values, different carriers;
        # render both as ISO strings before comparing.
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
            ser = df[c]
            df[c] = ser.str.replace(r"^(\d{4}-\d{2}-\d{2}) 00:00:00$", r"\1", regex=True)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", ENTRIES)
def test_crafted_edge_fixture_matches_oracle(spark, crafted_dir, name):
    q = _BY[name]
    got = _canon(q.fn(spark, crafted_dir).toPandas())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{crafted_dir}/events.parquet')"
    )
    exp = _canon(con.execute(q.oracle).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ---------------------------------------------------------------------------
# Documents-side adversarial fixture
# ---------------------------------------------------------------------------

DOC_EXCLUDED = {
    # needs the events table too on the Spark side (joint fixture)
    # — none currently; placeholder for future entries
}


def _docs_only_entries():
    others = (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings",
    )
    out = []
    for q in CATALOG:
        if not q.oracle or q.name.startswith("stream_"):
            continue
        if q.name in DOC_EXCLUDED:
            continue
        o = q.oracle.lower()
        if "documents" not in o:
            continue
        if any(_re.search(rf"\b{t}\b", o) for t in others):
            continue
        out.append(q.name)
    return out


def _crafted_documents() -> pd.DataFrame:
    base = (
        "the fast key order sort table scan merge part window small hash "
        "scan join order batch stream spark window dup data row value "
        "filter line agg column vector query group slow big customer"
    )
    near = base.replace("vector", "tensor")
    prefix = " ".join(base.split(" ")[:15])
    rows = [
        (0, "", "en", "src0"),                      # empty text
        (1, "hello", "en", "src0"),                 # single token
        (2, "a  b", "en", "src1"),                  # double space -> empty token
        (3, " leading and trailing ", "en", "src1"),  # edge spaces
        (4, base, "en", "src2"),                    # exact dup of 5
        (5, base, "en", "src2"),
        (6, near, "en", "src3"),                    # near-dup (1 token)
        (7, prefix, "en", "src3"),                  # containment prefix
        (8, "café nämé 東京 café", "de", "src4"),  # unicode
        (9, " ".join(["spam"] * 30), "en", "src4"),  # degenerate repetition
        (10, "x" * 500, "en", "src5"),               # one huge token
        (11, "reach a.b@corp.example.com or 999-555-1234 now", "en", "src5"),
        (12, "the quick brown fox jumps over the lazy dog", "en", "src6"),
        (13, "pack my box with five dozen liquor jugs", "fr", "src6"),
        (14, "sphinx of black quartz judge my vow", "fr", "src7"),
        (15, "how vexingly quick daft zebras jump", "de", "src7"),
    ]
    return pd.DataFrame(
        [(i, t, lg, sc, len(t)) for i, t, lg, sc in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )


@pytest.fixture(scope="module")
def crafted_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_docs")
    _crafted_documents().to_parquet(d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", _docs_only_entries())
def test_crafted_docs_fixture_matches_oracle(spark, crafted_docs_dir, name):
    q = _BY[name]
    got = _canon(q.fn(spark, crafted_docs_dir).toPandas())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{crafted_docs_dir}/documents.parquet')"
    )
    exp = _canon(con.execute(q.oracle).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# ---------------------------------------------------------------------------
# Embeddings-side adversarial fixture
# ---------------------------------------------------------------------------


def _embeddings_only_entries():
    others = (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents",
    )
    out = []
    for q in CATALOG:
        if not q.oracle or q.name.startswith("stream_"):
            continue
        o = q.oracle.lower()
        if "embeddings" not in o:
            continue
        if any(_re.search(rf"\b{t}\b", o) for t in others):
            continue
        out.append(q.name)
    return out


def _crafted_embeddings() -> pd.DataFrame:
    """40 vectors, dim 64, all components exactly representable in
    float32 (small integers and halves) so any Spark/DuckDB diff is
    semantics, never accumulation noise. Hazards: the all-zero vector
    (norm 0 — cosine's divide-by-zero), an exact duplicate pair, an
    antipodal pair (cosine -1), a same-direction scaled copy, and a
    tiny-magnitude vector."""
    dim = 64

    def vec(f):
        return [float(f(j)) for j in range(dim)]

    rows = [
        (0, vec(lambda j: 0), 0),                       # zero norm
        (1, vec(lambda j: 1 if j == 0 else 0), 1),      # unit e0
        (2, vec(lambda j: (j % 7) - 3), 2),             # dup of 3
        (3, vec(lambda j: (j % 7) - 3), 3),
        (4, vec(lambda j: -((j % 7) - 3)), 4),          # antipodal to 3
        (5, vec(lambda j: ((j % 7) - 3) * 8), 5),       # scaled copy of 3
        (6, vec(lambda j: 0.5 if j % 3 == 0 else 0), 6),  # halves
    ]
    for i in range(7, 40):
        rows.append((i, vec(lambda j, i=i: ((i * 31 + j * 17) % 13) - 6), i % 10))
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])


@pytest.fixture(scope="module")
def crafted_emb_dir(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adversarial_emb")
    pdf = _crafted_embeddings()
    table = pa.table(
        {
            "vec_id": pa.array(pdf["vec_id"], pa.int64()),
            "embedding": pa.array(
                pdf["embedding"], pa.list_(pa.float32())
            ),
            "label": pa.array(pdf["label"], pa.int32()),
        }
    )
    pq.write_table(table, d / "embeddings.parquet")
    return str(d)


@pytest.mark.parametrize("name", _embeddings_only_entries())
def test_crafted_embeddings_fixture_matches_oracle(
    spark, crafted_emb_dir, name
):
    q = _BY[name]
    got = _canon(q.fn(spark, crafted_emb_dir).toPandas())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{crafted_emb_dir}/embeddings.parquet')"
    )
    exp = _canon(con.execute(q.oracle).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
