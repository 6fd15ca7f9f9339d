from dc43_spark.products.collibra import (
    CollibraProductAdapter,
    CollibraProductStore,
    HttpCollibraProductAdapter,
    MemoryCollibraProductAdapter,
)
from dc43_spark.products.odps import DataProduct, Port, ProductRegistry
from dc43_spark.products.store import (
    FSProductStore,
    MemoryProductStore,
    ProductStore,
    SparkTableProductStore,
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
    "SparkTableProductStore",
    "CollibraProductAdapter",
    "CollibraProductStore",
    "HttpCollibraProductAdapter",
    "MemoryCollibraProductAdapter",
    "register_port",
]
