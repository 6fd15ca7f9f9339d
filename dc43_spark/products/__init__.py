from dc43_spark.products.odps import DataProduct, Port, ProductRegistry
from dc43_spark.products.store import (
    FSProductStore,
    MemoryProductStore,
    ProductStore,
    SQLProductStore,
    register_port,
)

__all__ = [
    "DataProduct",
    "Port",
    "ProductRegistry",
    "ProductStore",
    "MemoryProductStore",
    "FSProductStore",
    "SQLProductStore",
    "register_port",
]
