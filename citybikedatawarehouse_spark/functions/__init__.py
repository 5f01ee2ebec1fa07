from citybikedatawarehouse_spark.functions.geo import haversine_km  # noqa: F401
from citybikedatawarehouse_spark.functions.keys import surrogate_key  # noqa: F401
from citybikedatawarehouse_spark.functions.measures import (  # noqa: F401
    duration_seconds,
    speed_kmh,
    zero_coalesce,
)
from citybikedatawarehouse_spark.functions.datetime_parts import (  # noqa: F401
    with_date_parts,
)
