from feature_store_2_spark.functions.vector import (
    QUANT_SCALE,
    cosine_from_parts,
    qdot,
    qnorm2,
    quantize,
)

__all__ = ["QUANT_SCALE", "cosine_from_parts", "qdot", "qnorm2", "quantize"]
