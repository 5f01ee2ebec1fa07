"""PostgreSQL-dialect parity for the JDBC sink — no server needed.

The reference's actual sink is SQLAlchemy ``to_sql`` into PostgreSQL
(/root/reference/src/create_db_from_csv.py:12-14). The sandbox has no
PostgreSQL JDBC driver jar and no network to fetch one (documented
environment gate, same class as the protobuf gate), so the end-to-end
write runs against embedded Derby (test_jdbc_roundtrip.py). What that
leaves unproven is exactly ONE thing: the PostgreSQL *dialect* — URL
routing, per-type DDL mapping, identifier quoting, truncate semantics.
That dialect ships INSIDE Spark's own JVM
(org.apache.spark.sql.jdbc.PostgresDialect), so these tests pin it
directly: the CREATE TABLE column DDL Spark would emit against a real
PostgreSQL is golden-checked here, and the only thing the deployment
adds is the driver jar on the classpath.

Gate re-checked round 11: no postgresql*.jar anywhere on the box and
installs remain disallowed — when a jar appears, point
spark.jars at it and the Derby round-trip suite runs against real PG
with no code change.
"""

from __future__ import annotations

import pytest

PG_URL = "jdbc:postgresql://host:5432/citybike"


@pytest.fixture(scope="module")
def pg_dialect(spark):
    return spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(PG_URL)


def _jdbc_utils(spark):
    return spark._jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils


def _scala_none(spark):
    return getattr(getattr(spark._jvm.scala, "None$"), "MODULE$")


def test_postgres_url_routes_to_postgres_dialect(spark, pg_dialect):
    """jdbc:postgresql:// URLs must resolve to PostgresDialect, not
    the NoopDialect fallback — this is the routing write_jdbc relies
    on when the deployment points it at the reference's server."""
    assert (
        pg_dialect.getClass().getName()
        == "org.apache.spark.sql.jdbc.PostgresDialect"
    )


def test_postgres_type_mapping_golden(spark, pg_dialect):
    """Per-type DDL golden: every Spark type our sinks emit maps to
    the PostgreSQL column type a DBA would expect. Dialect overrides
    first, JdbcUtils common defaults where the dialect defers."""
    jvm = spark._jvm
    types = jvm.org.apache.spark.sql.types.DataTypes
    ju = _jdbc_utils(spark)

    expected = {
        "StringType": "TEXT",
        "BooleanType": "BOOLEAN",
        "DoubleType": "FLOAT8",
        "FloatType": "FLOAT4",
        "ShortType": "SMALLINT",
        "ByteType": "SMALLINT",
        "BinaryType": "BYTEA",
        "TimestampType": "TIMESTAMP WITH TIME ZONE",
        # dialect defers to the cross-database defaults for these
        "IntegerType": "INTEGER",
        "LongType": "BIGINT",
        "DateType": "DATE",
    }
    for name, want in expected.items():
        t = getattr(types, name)
        opt = pg_dialect.getJDBCType(t)
        if not opt.isDefined():
            opt = ju.getCommonJDBCType(t)
        assert opt.isDefined(), name
        got = opt.get().databaseTypeDefinition()
        assert got == want, f"{name}: {got} != {want}"


def test_postgres_create_table_ddl_golden_ride_fact(spark, pg_dialect):
    """Full CREATE TABLE column list for the reference's actual
    table shape (ride fact: sha2 string keys, INT duration cast —
    check_and_create_db_v4.py writes duration as INT via to_sql
    dtype) through the same JdbcUtils.schemaString the JDBC writer
    calls at table-creation time."""
    fact = spark.createDataFrame(
        [],
        "member_type_id string, rideable_type_id string,"
        " start_station_id string, end_station_id string,"
        " start_date_id string, end_date_id string,"
        " trip_duration int, distance double, speed double,"
        " year int, month int",
    )
    ddl = _jdbc_utils(spark).schemaString(
        pg_dialect, fact._jdf.schema(), True, _scala_none(spark)
    )
    cols = [c.strip() for c in ddl.split(",")]
    assert cols == [
        '"member_type_id" TEXT',
        '"rideable_type_id" TEXT',
        '"start_station_id" TEXT',
        '"end_station_id" TEXT',
        '"start_date_id" TEXT',
        '"end_date_id" TEXT',
        '"trip_duration" INTEGER',
        '"distance" FLOAT8',
        '"speed" FLOAT8',
        '"year" INTEGER',
        '"month" INTEGER',
    ], ddl


def test_postgres_identifier_quoting_and_truncate(spark, pg_dialect):
    """Overwrite-mode building blocks: double-quoted identifiers
    (PostgreSQL folds unquoted names to lowercase — a camelCase
    column would silently rename without this) and the TRUNCATE
    statement used when truncate=true skips the DROP/CREATE."""
    assert pg_dialect.quoteIdentifier("Ride Fact") == '"Ride Fact"'
    trunc = pg_dialect.getTruncateQuery('"ride_fact"')
    assert trunc.startswith('TRUNCATE TABLE ONLY "ride_fact"'), trunc
