from keystone_spark.functions.vector import (
    dot,
    l2_norm,
    cosine_similarity,
    scale_shift,
    elementwise,
)
from keystone_spark.functions.text import (
    tokens,
    char_shingles,
    word_ngrams,
    token_count,
    quality_features,
    simhash64,
    rolling_fingerprint,
)

__all__ = [
    "dot",
    "l2_norm",
    "cosine_similarity",
    "scale_shift",
    "elementwise",
    "tokens",
    "char_shingles",
    "word_ngrams",
    "token_count",
    "quality_features",
    "simhash64",
    "rolling_fingerprint",
]
