"""Public function library — the engine's reusable column expressions.

Everything here is a Catalyst expression builder (JVM codegen, no Python
row path): vector math, set similarity, shingling, text features,
fingerprints. Declared queries and user code share these.
"""

from s3_kinesis_replay_spark.operators.dedup import (  # noqa: F401
    jaccard,
    word_shingles,
)
from s3_kinesis_replay_spark.operators.similarity import cosine_expr  # noqa: F401
from s3_kinesis_replay_spark.operators.text import (  # noqa: F401
    bpe_ish_token_count,
    language_scores,
    quality_features,
    rolling_fingerprint,
    token_count,
)

__all__ = [
    "jaccard",
    "word_shingles",
    "cosine_expr",
    "bpe_ish_token_count",
    "language_scores",
    "quality_features",
    "rolling_fingerprint",
    "token_count",
]
