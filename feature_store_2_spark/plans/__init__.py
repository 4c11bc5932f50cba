from feature_store_2_spark.plans.feature_pipeline import (
    feature_grants_long,
    feature_grants_wide,
    rule_columns,
    user_aggregates,
)

__all__ = [
    "feature_grants_long",
    "feature_grants_wide",
    "rule_columns",
    "user_aggregates",
]
