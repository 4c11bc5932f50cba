"""Unit tests for the batch feature pipeline, mirroring the reference's
test corpus (tests/test_aggregates.py, tests/test_rules.py — SURVEY.md §5):
uuid dedup, multi-user isolation, COUNT/SUM/DISTINCT_COUNT semantics,
VALUE/DIVIDE rules incl. denom_min override and zero-denominator, and
the config invariants."""

import datetime as dt

import pytest

from feature_store_2_spark.config import (
    AggregateSpec,
    AggregateType,
    EngineConfig,
    FeatureSpec,
    RuleCondition,
    RuleOperation,
    RuleSpec,
)
from feature_store_2_spark.plans.feature_pipeline import (
    feature_grants_long,
    feature_grants_wide,
    user_aggregates,
)

TS = dt.datetime(2024, 1, 1)
COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def make_events(spark, rows):
    return spark.createDataFrame(
        [(i if eid is None else eid, TS, u, t, v, p) for i, (eid, u, t, v, p) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


CFG = EngineConfig(
    aggregates=(
        AggregateSpec("n_errors", "error", AggregateType.COUNT),
        AggregateSpec("distinct_ks", "signup", AggregateType.DISTINCT_COUNT, "props.k"),
        AggregateSpec("n_signups", "signup", AggregateType.COUNT),
        AggregateSpec("click_amt", "click", AggregateType.SUM, "value"),
        AggregateSpec("purchase_amt", "purchase", AggregateType.SUM, "value"),
    ),
    rules=(
        RuleSpec("few_errors", ("n_errors",), RuleOperation.VALUE, RuleCondition.LESS_THAN, 2),
        RuleSpec(
            "k_ratio",
            ("distinct_ks", "n_signups"),
            RuleOperation.DIVIDE,
            RuleCondition.LESS_THAN,
            0.25,
            denom_min=3,
        ),
        RuleSpec(
            "click_ratio",
            ("click_amt", "purchase_amt"),
            RuleOperation.DIVIDE,
            RuleCondition.LESS_THAN,
            0.10,
        ),
    ),
    features=(
        FeatureSpec("purchase", ("k_ratio", "click_ratio")),
        FeatureSpec("message", ("few_errors",)),
    ),
)


def aggs_map(spark, rows):
    df = user_aggregates(make_events(spark, rows), CFG)
    return {r["user_id"]: r.asDict() for r in df.collect()}


def test_count_dedupes_by_uuid(spark):
    # reference tests/test_aggregates.py:104-130 — same uuid twice counts once
    rows = [(1, 10, "error", None, None), (1, 10, "error", None, None), (2, 10, "error", None, None)]
    assert aggs_map(spark, rows)[10]["n_errors"] == 2


def test_multi_user_isolation(spark):
    rows = [(None, 1, "error", None, None), (None, 1, "error", None, None), (None, 2, "error", None, None)]
    m = aggs_map(spark, rows)
    assert m[1]["n_errors"] == 2 and m[2]["n_errors"] == 1


def test_sum_dedupes_by_uuid_not_value(spark):
    # two distinct uuids with same value both count; duplicate uuid doesn't
    rows = [(1, 5, "click", 10.0, None), (2, 5, "click", 10.0, None), (2, 5, "click", 10.0, None)]
    assert aggs_map(spark, rows)[5]["click_amt"] == 20.0


def test_distinct_count_of_props_field(spark):
    rows = [
        (None, 7, "signup", None, '{"k": 1}'),
        (None, 7, "signup", None, '{"k": 1}'),
        (None, 7, "signup", None, '{"k": 2}'),
    ]
    m = aggs_map(spark, rows)
    assert m[7]["distinct_ks"] == 2 and m[7]["n_signups"] == 3


def test_zero_value_counts_unlike_reference_falsy_check(spark):
    # documented divergence: amount == 0.0 participates (only NULL is missing)
    rows = [(None, 3, "purchase", 0.0, None), (None, 3, "purchase", 5.0, None)]
    assert aggs_map(spark, rows)[3]["purchase_amt"] == 5.0


def grants_for(spark, rows):
    df = feature_grants_wide(make_events(spark, rows), CFG)
    return {r["user_id"]: r.asDict() for r in df.collect()}


def test_value_rule_strict_compare(spark):
    rows = [(None, 1, "error", None, None), (None, 1, "error", None, None)]  # n_errors == 2
    m = grants_for(spark, rows)
    assert m[1]["few_errors"] is False  # strict <, 2 < 2 fails
    assert m[1]["message_grant"] is False


def test_divide_rule_and_denom_min_override(spark):
    # 2 signups < denom_min=3 -> k_ratio abides regardless of ratio
    rows = [
        (None, 1, "signup", None, '{"k": 1}'),
        (None, 1, "signup", None, '{"k": 2}'),
    ]
    m = grants_for(spark, rows)
    assert m[1]["k_ratio"] is True
    # 4 signups, 4 distinct ks -> ratio 1.0 >= 0.25 -> fails
    rows = [(None, 2, "signup", None, f'{{"k": {i}}}') for i in range(4)]
    m = grants_for(spark, rows)
    assert m[2]["k_ratio"] is False
    assert m[2]["purchase_grant"] is False


def test_divide_zero_denominator_is_ratio_zero(spark):
    # intended semantics of models/rules.py:60-62 — no purchases => ratio 0
    rows = [(None, 9, "click", 50.0, None)]
    m = grants_for(spark, rows)
    assert m[9]["click_ratio"] is True  # 0 < 0.10


def test_grants_long_shape(spark):
    rows = [(None, 1, "purchase", 10.0, None)]
    df = feature_grants_long(make_events(spark, rows), CFG)
    got = {(r["user_id"], r["feature"]): r["has_grant"] for r in df.collect()}
    assert got == {(1, "purchase"): True, (1, "message"): True}


def test_config_invariants():
    with pytest.raises(ValueError):
        AggregateSpec("bad", "error", AggregateType.COUNT, "value")  # COUNT forbids field
    with pytest.raises(ValueError):
        AggregateSpec("bad", "error", AggregateType.SUM)  # SUM requires field
    with pytest.raises(ValueError):
        RuleSpec("bad", ("a",), RuleOperation.DIVIDE, RuleCondition.LESS_THAN, 1)
    with pytest.raises(ValueError):
        FeatureSpec("Bad_Name", ("r",))
    with pytest.raises(ValueError):
        EngineConfig(
            aggregates=(AggregateSpec("a", "error", AggregateType.COUNT),),
            rules=(RuleSpec("r", ("missing",), RuleOperation.VALUE, RuleCondition.LESS_THAN, 1),),
            features=(),
        )
