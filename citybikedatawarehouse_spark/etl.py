"""The citibike star-schema ETL pipeline — the engine's flagship
end-to-end flow, equivalent in capability to the reference's
`write_csv_to_database` (/root/reference/src/check_and_create_db_v4.py:
139-298) re-designed for Spark:

  * one lazy logical plan per output table; the ride scan is cached
    once and shared by all five builds (the reference re-traverses
    the eager pandas frame);
  * dimension dedup = distributed hash aggregate;
  * the fact build is join-free in 'derive' key mode;
  * outputs are columnar Parquet, fact partitioned by (year, month)
    for partition pruning at scale.

Ingestion note (SURVEY.md section 2.3 op 24): timestamps parse
leniently; rows the reference would crash on (no fractional seconds)
are kept, and the audit counts are returned.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from citybikedatawarehouse_spark.operators.dims import (
    build_date_dim,
    build_member_dim,
    build_rideable_dim,
    build_station_dim,
)
from citybikedatawarehouse_spark.operators.fact import build_ride_fact
from citybikedatawarehouse_spark.sources.readers import read_ride_csv
from citybikedatawarehouse_spark.sources.writers import write_parquet


@dataclass
class EtlResult:
    tables: dict[str, DataFrame] = field(default_factory=dict)

    def row_counts(self) -> dict[str, int]:
        return {k: v.count() for k, v in self.tables.items()}


def run_citibike_etl(
    spark: SparkSession,
    csv_path: str,
    out_dir: str | None = None,
    key_mode: str = "sha2",
    fact_strategy: str = "derive",
    partition_fact: bool = True,
    strict: bool = False,
) -> EtlResult:
    """CSV -> member/rideable/station/date dims + ride_fact.

    With ``out_dir`` set, writes each table as Parquet (fact
    partitioned by year/month unless disabled); always returns the
    DataFrames for further composition. ``strict=True`` passes the
    reference's fail-fast timestamp-parse contract through to the
    reader (see read_ride_csv): the pipeline dies on the first
    unparseable timestamp instead of null-auditing it.
    """
    rides = read_ride_csv(spark, csv_path, strict=strict).cache()

    member = build_member_dim(rides, key_mode)
    rideable = build_rideable_dim(rides, key_mode)
    station = build_station_dim(rides, key_mode)
    date = build_date_dim(rides, key_mode)
    fact = build_ride_fact(
        rides,
        strategy=fact_strategy,
        dims={"member": member, "rideable": rideable, "station": station, "date": date},
        keep_partition_cols=partition_fact,
    )

    tables = {
        "member_dimension": member,
        "rideable_dimension": rideable,
        "station_dimension": station,
        "date_dimension": date,
        "ride_fact": fact,
    }
    if out_dir:
        for name, df in tables.items():
            write_parquet(
                df,
                f"{out_dir}/{name}",
                partition_by=("year", "month")
                if (name == "ride_fact" and partition_fact)
                else (),
            )
    return EtlResult(tables=tables)
