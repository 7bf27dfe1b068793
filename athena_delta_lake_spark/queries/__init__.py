"""Driver-facing query registry: every implemented operator from SURVEY §2
exposed as (spark_fn, oracle_sql) pairs."""

from .base import QueryDef, register_views, registry

__all__ = ["QueryDef", "register_views", "registry"]
