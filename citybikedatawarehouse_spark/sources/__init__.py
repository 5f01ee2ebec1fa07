from citybikedatawarehouse_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    read_ride_csv,
)
from citybikedatawarehouse_spark.sources.writers import (  # noqa: F401
    write_parquet,
    write_table,
)
