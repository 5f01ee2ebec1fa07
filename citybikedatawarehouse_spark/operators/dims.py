"""Dimension builders for the citibike star schema.

Pure DataFrame -> DataFrame functions re-expressing the reference's
pandas dimension ETL (/root/reference/src/check_and_create_db_v4.py:
145-234 — cited for parity, not ported):

  member_dimension   : distinct member_casual        (:147-151)
  rideable_dimension : distinct rideable_type        (:155-159)
  station_dimension  : start ∪ end stations, dedup   (:162-180)
  date_dimension     : started ∪ ended timestamps at timestamp grain,
                       dedup on the timestamp, all date parts (:184-234)

Differences by design (SURVEY.md section 7):
  * surrogate keys are deterministic sha2 of the natural key
    (mode='uuid' reproduces the reference's uuid4 behavior);
  * no join-back needed downstream — the fact derives the same keys;
  * dedup is a hash aggregate (map-side partial), not an in-memory
    drop_duplicates: scales to any cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.datetime_parts import date_part
from citybikedatawarehouse_spark.functions.keys import surrogate_key


def build_member_dim(rides: DataFrame, key_mode: str = "sha2") -> DataFrame:
    """member_dimension(id, type) from distinct member_casual."""
    return (
        rides.select(F.col("member_casual").alias("type"))
        .distinct()
        .select(surrogate_key("type", mode=key_mode).alias("id"), "type")
    )


def build_rideable_dim(rides: DataFrame, key_mode: str = "sha2") -> DataFrame:
    """rideable_dimension(id, type) from distinct rideable_type."""
    return (
        rides.select(F.col("rideable_type").alias("type"))
        .distinct()
        .select(surrogate_key("type", mode=key_mode).alias("id"), "type")
    )


def build_station_dim(rides: DataFrame, key_mode: str = "sha2") -> DataFrame:
    """station_dimension(id, name, latitude, longitude): union of
    start and end stations, full-row dedup.

    The natural key is (name, latitude, longitude) — the same triple
    the reference later float-equi-joins on (check_and_create_db_v4.py:
    250-259). Keeping coordinates bit-identical through the pipeline
    makes the derived key safe; rows with null end stations are
    dropped from the dimension (they produce null FK in the fact,
    matching the reference's left-join misses).
    """
    # both endpoints from ONE ride scan (a union of two selects would
    # read the source twice — the round-5 single-pass-mirror rule)
    stations = rides.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("start_station_name").alias("name"),
                    F.col("start_lat").alias("latitude"),
                    F.col("start_lng").alias("longitude"),
                ),
                F.struct(
                    F.col("end_station_name").alias("name"),
                    F.col("end_lat").alias("latitude"),
                    F.col("end_lng").alias("longitude"),
                ),
            )
        ).alias("s")
    ).select("s.name", "s.latitude", "s.longitude").distinct()
    stations = stations.filter(
        F.col("name").isNotNull()
        | F.col("latitude").isNotNull()
        | F.col("longitude").isNotNull()
    )
    return stations.select(
        surrogate_key("name", "latitude", "longitude", mode=key_mode).alias("id"),
        "name",
        "latitude",
        "longitude",
    )


def build_date_dim(rides: DataFrame, key_mode: str = "sha2") -> DataFrame:
    """date_dimension at timestamp grain: started_at ∪ ended_at,
    dedup on the full timestamp, every date/time part materialized
    (year..second + ISO week — pandas isocalendar ≡ Spark weekofyear).
    """
    ts = (
        rides.select(
            F.explode(F.array("started_at", "ended_at")).alias("date")
        )
        .filter(F.col("date").isNotNull())
        .distinct()
    )
    return ts.select(
        surrogate_key("date", mode=key_mode).alias("id"),
        date_part("year", "date").alias("year"),
        date_part("quarter", "date").alias("quarter"),
        date_part("month", "date").alias("month"),
        date_part("week", "date").alias("week"),
        date_part("day", "date").alias("day"),
        date_part("hour", "date").alias("hour"),
        date_part("minute", "date").alias("minute"),
        date_part("second", "date").alias("second"),
        "date",
    )
