"""Property tests (SURVEY.md section 5 item 3): haversine symmetry /
identity / null propagation, duration-speed sign coupling, dedup
idempotence, surrogate-key null-safety."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.functions.geo import haversine_km
from citybikedatawarehouse_spark.functions.keys import surrogate_key
from citybikedatawarehouse_spark.functions.measures import speed_kmh, zero_coalesce


@pytest.fixture(scope="module")
def points(spark):
    rng = random.Random(7)
    rows = [
        (
            i,
            40.5 + rng.random() * 0.5,
            -74.2 + rng.random() * 0.3,
            40.5 + rng.random() * 0.5,
            -74.2 + rng.random() * 0.3,
        )
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "id long, lat1 double, lng1 double, lat2 double, lng2 double")


def test_haversine_symmetry(points):
    df = points.select(
        haversine_km("lat1", "lng1", "lat2", "lng2").alias("ab"),
        haversine_km("lat2", "lng2", "lat1", "lng1").alias("ba"),
    )
    rows = df.collect()
    assert all(abs(r["ab"] - r["ba"]) < 1e-9 for r in rows)


def test_haversine_identity(points):
    rows = points.select(haversine_km("lat1", "lng1", "lat1", "lng1").alias("d")).collect()
    assert all(r["d"] == 0.0 for r in rows)


def test_haversine_positive_and_bounded(points):
    rows = points.select(haversine_km("lat1", "lng1", "lat2", "lng2").alias("d")).collect()
    # bbox spans ~0.5 deg -> max ~75km; also Earth half-circumference bound
    assert all(0.0 <= r["d"] < math.pi * 6371.0 for r in rows)


def test_haversine_null_propagates(spark):
    df = spark.createDataFrame(
        [(40.7, -74.0, None, -74.0)], "lat1 double, lng1 double, lat2 double, lng2 double"
    )
    assert df.select(haversine_km("lat1", "lng1", "lat2", "lng2").alias("d")).collect()[0]["d"] is None


def test_haversine_against_reference_formula(spark):
    """Spot value vs an independent python implementation."""
    lat1, lng1, lat2, lng2 = 40.719586, -74.043117, 40.728745, -74.032108
    got = (
        spark.range(1)
        .select(
            haversine_km(F.lit(lat1), F.lit(lng1), F.lit(lat2), F.lit(lng2)).alias("d")
        )
        .collect()[0]["d"]
    )
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lng2 - lng1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    want = 2 * 6371.0 * math.asin(math.sqrt(a))
    assert got == pytest.approx(want, abs=1e-12)


def test_speed_zero_cases(spark):
    df = spark.createDataFrame(
        [
            (10.0, 0.0),     # /0 -> 0
            (10.0, None),    # null duration -> 0
            (None, 3600.0),  # null distance -> 0
            (10.0, 3600.0),  # 10 km/h
            (10.0, -3600.0), # negative duration -> negative speed passes through
        ],
        "dist double, dur double",
    )
    rows = df.select(speed_kmh("dist", "dur").alias("v")).collect()
    assert [r["v"] for r in rows] == [0.0, 0.0, 0.0, 10.0, -10.0]


def test_zero_coalesce_maps_nan_and_inf(spark):
    df = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (float("-inf"),), (None,), (2.5,)], "x double"
    )
    rows = df.select(zero_coalesce(F.col("x")).alias("v")).collect()
    assert [r["v"] for r in rows] == [0.0, 0.0, 0.0, 0.0, 2.5]


def test_dedup_idempotent(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "k int, v string")
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == 2


def test_surrogate_key_null_safety(spark):
    df = spark.createDataFrame(
        [("x", None), (None, "x"), (None, None), ("x", "x")], "a string, b string"
    )
    keys = [r["k"] for r in df.select(surrogate_key("a", "b").alias("k")).collect()]
    assert len(set(keys)) == 4  # no collisions across null layouts
    assert all(k is not None and len(k) == 64 for k in keys)


def test_variant_path_equals_get_json_object(spark, sf_dir):
    """Spark 4's binary VARIANT path (parse_json + variant_get) must
    extract the same values as the string-parsing get_json_object
    used by q51 — the two JSON codepaths are interchangeable on the
    events.props column."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    both = ev.select(
        F.get_json_object("props", "$.k").cast("int").alias("s"),
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("v"),
    )
    assert both.where(~(F.col("s").eqNullSafe(F.col("v")))).count() == 0


def test_ordered_pair_structs_complete_and_canonical(spark):
    """For a sorted deduped array of n items the HOF emits exactly
    C(n,2) structs, each with p1 < p2, covering every unordered pair
    — the contract that lets it replace a.k < b.k self-joins."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.functions.arrays import (
        ordered_pair_structs,
    )

    rows = [([1, 3, 5, 9, 12],), ([7],), ([],), ([2, 4],)]
    df = spark.createDataFrame(rows, "ps: array<bigint>")
    got = [
        sorted((p.p1, p.p2) for p in r.pairs)
        for r in df.select(
            ordered_pair_structs("ps").alias("pairs")
        ).collect()
    ]
    want = [sorted(combinations(ps, 2)) for (ps,) in rows]
    assert got == want
