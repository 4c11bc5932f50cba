"""No catalog entry may output a complex-typed column.

The driver's correctness gate canonicalizes results by sorting raw
values then factorizing (pandas) — a list/map/struct-valued column
raises `TypeError: unhashable type` at the gate even when the values
are correct. Round 7's only red driver row (`func_array_set_ops`,
CORRECTNESS_r07) was exactly this, and the local replica masked it by
stringifying before sorting. This lint builds every entry's DataFrame
(no collection — schema only for batch plans) and asserts every
top-level output field is scalar, so the class cannot regress.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import ArrayType, MapType, StructType  # noqa: E402

from feature_store_2_spark.queries import CATALOG  # noqa: E402

# Streaming entries execute a micro-batch pipeline just to *build* the
# result DataFrame; their schemas are pinned by their own tests and the
# driver scores them too, but running ~30 pipelines here would dominate
# suite time. They are still covered: the full-catalog oracle sweep
# (tools/check_oracle.py) now fails on driver-unhashable columns for
# every entry including streaming ones.
_SKIP_PREFIXES = ("stream_", "fs_grants", "mv_", "storage_")


def _complex_fields(schema):
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


@pytest.mark.parametrize(
    "entry",
    [q for q in CATALOG if not q.name.startswith(_SKIP_PREFIXES)],
    ids=lambda q: q.name,
)
def test_no_complex_output_columns(entry, spark, sf_dir):
    df = entry.fn(spark, sf_dir)
    bad = _complex_fields(df.schema)
    assert not bad, (
        f"{entry.name} outputs complex-typed columns {bad} — the driver's "
        "hash gate cannot factorize them; render to string "
        "(F.array_join / array_to_string) in both the entry and oracle"
    )
