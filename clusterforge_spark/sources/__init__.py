from clusterforge_spark.sources.readers import (
    TABLE_SCHEMAS,
    load_table,
    read_retail_csv,
)

__all__ = ["TABLE_SCHEMAS", "load_table", "read_retail_csv"]
