"""Explicit schemas for every table the engine touches.

Schema-on-read with declared StructTypes — never inferSchema in the
hot path (SURVEY.md section 1.1: the reference infers CSV dtypes via
pandas; we pin them for determinism and so Catalyst can prune columns
against a known Parquet/CSV schema).

Two groups:
  * RIDE / star-schema types, mirroring the reference DDL
    (/root/reference/src/check_and_create_db_v4.py:66-135 — cited for
    parity only, re-expressed as Spark StructTypes).
  * The driver testdata tables (TESTDATA.md / FIXTURES.md section B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference `ride` flat input (check_and_create_db.py:96-115) -----------
RIDE_SCHEMA = T.StructType(
    [
        T.StructField("ride_id", T.StringType(), False),
        T.StructField("rideable_type", T.StringType(), True),
        T.StructField("started_at", T.StringType(), True),  # parsed leniently later
        T.StructField("ended_at", T.StringType(), True),
        T.StructField("start_station_name", T.StringType(), True),
        T.StructField("start_station_id", T.StringType(), True),
        T.StructField("end_station_name", T.StringType(), True),
        T.StructField("end_station_id", T.StringType(), True),
        T.StructField("start_lat", T.DoubleType(), True),
        T.StructField("start_lng", T.DoubleType(), True),
        T.StructField("end_lat", T.DoubleType(), True),
        T.StructField("end_lng", T.DoubleType(), True),
        T.StructField("member_casual", T.StringType(), True),
    ]
)

# --- v4 star schema (check_and_create_db_v4.py:66-135) ---------------------
MEMBER_DIM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
    ]
)

RIDEABLE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
    ]
)

STATION_DIM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
    ]
)

DATE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("quarter", T.IntegerType(), True),
        T.StructField("month", T.IntegerType(), True),
        T.StructField("week", T.IntegerType(), True),
        T.StructField("day", T.IntegerType(), True),
        T.StructField("hour", T.IntegerType(), True),
        T.StructField("minute", T.IntegerType(), True),
        T.StructField("second", T.IntegerType(), True),
        T.StructField("date", T.TimestampType(), True),
    ]
)

RIDE_FACT_SCHEMA = T.StructType(
    [
        T.StructField("member_type_id", T.StringType(), True),
        T.StructField("rideable_type_id", T.StringType(), True),
        T.StructField("start_station_id", T.StringType(), True),
        T.StructField("end_station_id", T.StringType(), True),
        T.StructField("start_date_id", T.StringType(), True),
        T.StructField("end_date_id", T.StringType(), True),
        T.StructField("trip_duration", T.IntegerType(), True),
        T.StructField("distance", T.DoubleType(), True),
        T.StructField("speed", T.DoubleType(), True),
    ]
)

# --- driver testdata tables (FIXTURES.md section B) ------------------------
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
