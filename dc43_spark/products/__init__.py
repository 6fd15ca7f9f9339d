from dc43_spark.products.odps import DataProduct, Port, ProductRegistry

__all__ = ["DataProduct", "Port", "ProductRegistry"]
