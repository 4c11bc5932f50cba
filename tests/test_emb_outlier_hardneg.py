"""Pins for emb_outlier_centroid_distance / emb_hard_negative_mining on
hand-built vectors with exact quantized distances known by inspection."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_2_spark.functions.vector import QUANT_SCALE
from feature_store_2_spark.queries.llm_similarity import (
    emb_hard_negative_mining,
    emb_outlier_centroid_distance,
)

DIM = 64
S = QUANT_SCALE


def _emb(spark, tmp_path, rows):
    """rows: [(vec_id, label, {dim: value})]"""
    data = [
        (vid, [float(d.get(i, 0.0)) for i in range(DIM)], lab)
        for vid, lab, d in rows
    ]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    )
    sf = os.path.join(str(tmp_path), "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


def test_outlier_is_farthest_from_own_centroid(spark, tmp_path):
    # Label 0: two vectors at origin, one at 3.0 on dim 0. Centroid =
    # floor(3S/3) = S at dim 0 -> dist2: S^2, S^2, (2S)^2.
    rows = [(0, 0, {}), (1, 0, {}), (2, 0, {0: 3.0})]
    sf = _emb(spark, tmp_path, rows)
    out = {
        r["vec_id"]: r["dist2_q"]
        for r in emb_outlier_centroid_distance(spark, sf).collect()
    }
    assert out == {0: S * S, 1: S * S, 2: 4 * S * S}


def test_hard_negative_nearest_other_label_with_tiebreak(spark, tmp_path):
    # Query 0 (label 0) at origin; label-1 candidates at distance 1.0
    # (vec 1) and 2.0 (vec 2); a same-label vector at distance 0.5 must
    # be ignored. Vec 4 ties vec 1 exactly -> lower id wins.
    rows = [
        (0, 0, {}),
        (1, 1, {0: 1.0}),
        (2, 1, {0: 2.0}),
        (3, 0, {0: 0.5}),
        (4, 1, {1: 1.0}),
    ]
    sf = _emb(spark, tmp_path, rows)
    out = {
        r["query_id"]: (r["hard_neg_id"], r["neg_label"], r["dist2_q"])
        for r in emb_hard_negative_mining(spark, sf).collect()
    }
    assert out[0] == (1, 1, S * S)
    # query 3 (label 0, at 0.5 on dim 0): nearest label-1 is vec 1 at
    # distance 0.5 -> (S/2)^2.
    assert out[3] == (1, 1, (S // 2) * (S // 2))
