"""Declarative feature-store config: aggregates, rules, features.

Reference parity (/root/reference/config.py:10-87 compiled by
app_builder.py:61-131): aggregates are per-user accumulators over one
event type (COUNT deduped by event uuid, DISTINCT_COUNT(field),
SUM(field) deduped by uuid — models/aggregate.py:41-83); rules are
scalar predicates over one or two aggregates (VALUE / DIVIDE with
denom_min override — models/rules.py:25-75); features are conjunctions
of rules (models/rules.py:103-121). The same fail-fast invariants are
enforced here at import/build time:
  * COUNT forbids a field; SUM/DISTINCT_COUNT require one
    (models/aggregate.py:29-38)
  * DIVIDE requires two aggregates, VALUE exactly one
    (models/rules.py:45-50)
  * feature names match ``[a-z]+`` (models/rules.py:106-109)

Documented divergences from the reference (SURVEY.md §7):
  * DIVIDE by zero yields ratio 0 (the *intended* semantics of
    models/rules.py:60-62; the literal code raises and the event is
    dropped upstream).
  * ``denom_min`` is honored even when 0 (reference treats 0 as falsy
    and ignores it, models/rules.py:58).
  * Only NULL counts as a missing field value (the reference treats any
    falsy value, e.g. amount == 0.0, as missing —
    models/aggregate.py:72-78).
  * Grants are declarative (grant <=> all rules abide); the reference's
    re-grant path is unreachable so its revocations are sticky
    (services/event_processer.py:61-63).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum


class AggregateType(str, Enum):
    COUNT = "count"
    DISTINCT_COUNT = "distinct_count"
    SUM = "sum"


class RuleOperation(str, Enum):
    VALUE = "value"
    DIVIDE = "divide"


class RuleCondition(str, Enum):
    GREATER_THAN = ">"
    LESS_THAN = "<"


@dataclass(frozen=True)
class AggregateSpec:
    name: str
    event_name: str
    type: AggregateType
    field: str | None = None  # column or props field the accumulator reads

    def __post_init__(self) -> None:
        if self.type is AggregateType.COUNT and self.field is not None:
            raise ValueError(f"aggregate {self.name}: COUNT must not specify a field")
        if self.type is not AggregateType.COUNT and not self.field:
            raise ValueError(f"aggregate {self.name}: {self.type.value} requires a field")


@dataclass(frozen=True)
class RuleSpec:
    name: str
    aggregates: tuple[str, ...]
    operation: RuleOperation
    condition: RuleCondition
    value: float
    denom_min: float | None = None

    def __post_init__(self) -> None:
        want = 2 if self.operation is RuleOperation.DIVIDE else 1
        if len(self.aggregates) != want:
            raise ValueError(
                f"rule {self.name}: {self.operation.value} takes {want} aggregate(s), "
                f"got {len(self.aggregates)}"
            )
        if self.denom_min is not None and self.operation is not RuleOperation.DIVIDE:
            raise ValueError(f"rule {self.name}: denom_min only applies to DIVIDE")


_FEATURE_NAME = re.compile(r"^[a-z]+$")


@dataclass(frozen=True)
class FeatureSpec:
    name: str
    rules: tuple[str, ...]

    def __post_init__(self) -> None:
        if not _FEATURE_NAME.match(self.name):
            raise ValueError(f"feature name {self.name!r} must match [a-z]+")
        if not self.rules:
            raise ValueError(f"feature {self.name}: needs at least one rule")


@dataclass(frozen=True)
class EngineConfig:
    aggregates: tuple[AggregateSpec, ...]
    rules: tuple[RuleSpec, ...]
    features: tuple[FeatureSpec, ...]

    def __post_init__(self) -> None:
        agg_names = {a.name for a in self.aggregates}
        if len(agg_names) != len(self.aggregates):
            raise ValueError("duplicate aggregate names")
        rule_names = set()
        for r in self.rules:
            if r.name in rule_names:
                raise ValueError(f"duplicate rule name {r.name}")
            rule_names.add(r.name)
            missing = set(r.aggregates) - agg_names
            if missing:
                raise ValueError(f"rule {r.name}: unknown aggregates {sorted(missing)}")
        for f in self.features:
            missing = set(f.rules) - rule_names
            if missing:
                raise ValueError(f"feature {f.name}: unknown rules {sorted(missing)}")

    def aggregates_for_event(self, event_name: str) -> tuple[AggregateSpec, ...]:
        """Inverted index event name -> aggregates
        (models/aggregate.py:111-114); in Spark this is just the
        event_type predicate that gets pushed into the scan."""
        return tuple(a for a in self.aggregates if a.event_name == event_name)


# Default config over the driver's events table, shaped exactly like the
# reference's (config.py:10-87): error<->scam_flag, signup<->add_credit_card
# (props.k <-> zipcode), purchase<->purchase(amount=value), click<->chargeback.
DEFAULT_CONFIG = EngineConfig(
    aggregates=(
        AggregateSpec("total_error_flags", "error", AggregateType.COUNT),
        AggregateSpec("signup_distinct_ks", "signup", AggregateType.DISTINCT_COUNT, "props.k"),
        AggregateSpec("total_signups", "signup", AggregateType.COUNT),
        AggregateSpec("total_click_amount", "click", AggregateType.SUM, "value"),
        AggregateSpec("total_purchase_amount", "purchase", AggregateType.SUM, "value"),
    ),
    rules=(
        RuleSpec(
            "cannot_error_message",
            ("total_error_flags",),
            RuleOperation.VALUE,
            RuleCondition.LESS_THAN,
            3,
        ),
        RuleSpec(
            "too_many_distinct_ks",
            ("signup_distinct_ks", "total_signups"),
            RuleOperation.DIVIDE,
            RuleCondition.LESS_THAN,
            0.95,
            denom_min=2,
        ),
        RuleSpec(
            "click_to_purchase_ratio",
            ("total_click_amount", "total_purchase_amount"),
            RuleOperation.DIVIDE,
            RuleCondition.LESS_THAN,
            1.0,
        ),
    ),
    features=(
        FeatureSpec("purchase", ("too_many_distinct_ks", "click_to_purchase_ratio")),
        FeatureSpec("message", ("cannot_error_message",)),
    ),
)
