"""athena_delta_lake_spark — PySpark-native analytics engine.

A from-scratch rebuild of the system capability of
`malonsocasas/athena-delta-lake` (an Athena federated-query connector for
metastore-less Delta tables on object storage): Spark SQL/Catalyst supplies
the relational engine the reference delegated to Athena, and this package
supplies the parts the reference actually implemented — native Delta
transaction-log replay, storage-layout catalog discovery, partition/stats
file pruning, and the scan — plus the large-scale data-pipeline operator
surface (dedup, similarity search, text analysis, multimodal columns,
streaming).
"""

from .catalog import DeltaPond, register_flat_dir
from .delta import DeltaLog, DeltaTable, write_delta
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "DeltaLog",
    "DeltaPond",
    "DeltaTable",
    "get_spark",
    "register_flat_dir",
    "write_delta",
    "__version__",
]
