from oroboro_dw_dbt_spark.engine.dag import (  # noqa: F401
    Model,
    ModelGraph,
    SourceRegistry,
    model,
)
from oroboro_dw_dbt_spark.engine.maintenance import compact_table  # noqa: F401
from oroboro_dw_dbt_spark.engine.table_format import (  # noqa: F401
    LocalParquetFormat,
    ManifestParquetFormat,
)
from oroboro_dw_dbt_spark.engine.tests import (  # noqa: F401
    DataTest,
    accepted_values,
    not_null,
    relationship,
    unique_combination_of_columns,
)
