"""Pipeline operators beyond the reference's surface: dedup, similarity
search, text analysis, multimodal columns, as-of/range joins."""

from . import asof, dedup, multimodal, similarity, text

__all__ = ["asof", "dedup", "multimodal", "similarity", "text"]
