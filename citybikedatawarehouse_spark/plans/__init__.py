from citybikedatawarehouse_spark.plans.catalog import (  # noqa: F401
    ORACLES,
    QUERIES,
    register,
)
