"""Column-expression function library: the engine's reusable scalar surface.

One import point for every custom Column-level function the operators
define, grouped by domain — the analogue of `pyspark.sql.functions` for
this engine's extensions. All are either pure JVM expression trees
(codegen'd) or Arrow-batched pandas UDFs; none are row-at-a-time Python.
"""

from ..operators.dedup import hamming64, normalize_text, word_shingles
from ..operators.similarity import (
    cosine,
    cosine_pandas,
    dot,
    lsh_signature,
    norm,
)
from ..operators.text import (
    fingerprint,
    predict_language,
    quality_score,
    rolling_hashes,
    stopword_ratio,
    token_count,
    tokenize,
    whitespace_token_count,
    winnow_fingerprint,
    words,
)

__all__ = [
    # text normalization / dedup keys
    "normalize_text",
    "word_shingles",
    "hamming64",
    # embeddings
    "dot",
    "norm",
    "cosine",
    "cosine_pandas",
    "lsh_signature",
    # text analysis
    "tokenize",
    "token_count",
    "whitespace_token_count",
    "words",
    "stopword_ratio",
    "quality_score",
    "predict_language",
    "fingerprint",
    "rolling_hashes",
    "winnow_fingerprint",
]
