from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import (
    TABLE_NAMES,
    load_tables,
    register_views,
)
from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse

__all__ = ["TABLE_NAMES", "Warehouse", "load_tables", "register_views"]
