"""Column-level helper functions shared across operators."""

from amorphous_mapreduce_spark.functions.hashing import hex_hash64, md5_hex
from amorphous_mapreduce_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "hex_hash64",
    "l2_norm",
    "md5_hex",
]
