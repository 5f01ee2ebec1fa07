"""citybikedatawarehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo LauraIkic/CityBikeDataWarehouse
(batch star-schema ETL over Citi Bike ride data; see SURVEY.md),
built Spark-first:

- DataFrame / Spark SQL declarative plans; Catalyst + AQE optimize.
- Parquet-backed columnar storage instead of PostgreSQL heap tables.
- Dimension/fact builders as pure DataFrame -> DataFrame functions.
- Extensions for large-scale training-data pipelines: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search,
  text analysis, multimodal column plumbing, structured streaming.

Nothing here is a port of the reference's pandas/psycopg2 code; the
reference defines WHAT to compute (SURVEY.md section 2), this package
defines HOW on Spark.
"""

__version__ = "0.1.0"

from citybikedatawarehouse_spark.session import get_spark  # noqa: F401
