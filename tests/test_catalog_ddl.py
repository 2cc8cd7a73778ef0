from pyspark.sql import types as T
from pyspark.sql import functions as F

from gravity_spark.core.catalog import (
    Catalog,
    ColumnDef,
    TableDef,
    coerce_from_string,
    mysql_to_spark_type,
)
from gravity_spark.operators.ddl import parse_and_apply


def test_type_mapping():
    cases = {
        "tinyint": T.ByteType(),
        "tinyint unsigned": T.ShortType(),
        "int(11)": T.IntegerType(),
        "int(11) unsigned": T.LongType(),
        "bigint(20)": T.LongType(),
        "bigint unsigned": T.DecimalType(20, 0),
        "mediumint": T.IntegerType(),
        "decimal(10,2)": T.DecimalType(10, 2),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bit(1)": T.BooleanType(),
        "bit(8)": T.BinaryType(),
        "datetime": T.TimestampType(),
        "timestamp": T.TimestampType(),
        "date": T.DateType(),
        "time": T.StringType(),
        "year": T.IntegerType(),
        "varchar(256)": T.StringType(),
        "longtext": T.StringType(),
        "mediumblob": T.BinaryType(),
        "enum('a','b')": T.StringType(),
        "json": T.StringType(),
    }
    for mysql, expected in cases.items():
        assert mysql_to_spark_type(mysql) == expected, mysql


def test_zero_date_coercion(spark):
    df = spark.createDataFrame(
        [("0000-00-00 00:00:00",), ("2024-01-01 10:00:00",)], "v string"
    )
    out = df.select(coerce_from_string(F.col("v"), "datetime").alias("ts")).collect()
    assert out[0]["ts"] is None
    assert out[1]["ts"].year == 2024


def test_bit1_coercion(spark):
    df = spark.createDataFrame([("0",), ("1",)], "v string")
    out = [r["b"] for r in df.select(coerce_from_string(F.col("v"), "bit(1)").alias("b")).collect()]
    assert out == [False, True]


def test_typed_projection(spark):
    from gravity_spark.core.envelope import memory_changes

    t = TableDef(
        database="app",
        name="users",
        columns=[
            ColumnDef("id", "bigint", is_pk=True),
            ColumnDef("bal", "decimal(10,2)"),
            ColumnDef("joined", "datetime"),
        ],
    )
    changes = memory_changes(spark, [
        {"database": "app", "table": "users", "op": "insert",
         "data": {"id": 7, "bal": "12.50", "joined": "0000-00-00 00:00:00"},
         "pks": {"id": 7}, "seq": 1},
    ])
    row = t.typed_projection(changes).collect()[0]
    assert row["id"] == 7 and str(row["bal"]) == "12.50" and row["joined"] is None


def test_ddl_create_alter_roundtrip():
    cat = Catalog()
    r = parse_and_apply(
        """CREATE TABLE IF NOT EXISTS app.users (
             id bigint(20) NOT NULL,
             name varchar(256),
             email varchar(30) NOT NULL DEFAULT 'default_email',
             ts timestamp,
             PRIMARY KEY (id)
           )""",
        cat,
    )
    assert r.handled and r.kind == "create-table"
    t = cat.get("app", "users")
    assert t.pk_columns == ["id"]
    assert [c.name for c in t.columns] == ["id", "name", "email", "ts"]
    assert t.columns[2].default == "default_email"
    assert not t.columns[1].nullable is None

    r = parse_and_apply("ALTER TABLE app.users ADD COLUMN age int", cat)
    assert r.handled
    assert [c.name for c in cat.get("app", "users").columns][-1] == "age"

    r = parse_and_apply("ALTER TABLE app.users DROP COLUMN name", cat)
    assert "name" not in [c.name for c in cat.get("app", "users").columns]

    r = parse_and_apply("RENAME TABLE app.users TO app.users_v2", cat)
    assert ("app", "users_v2") in cat.tables and ("app", "users") not in cat.tables

    r = parse_and_apply("DROP TABLE app.users_v2", cat)
    assert cat.tables == {}


def test_ddl_routing_rewrite():
    cat = Catalog()

    def route(db, table):
        return ("warehouse", f"w_{table}") if db == "app" else (db, table)

    r = parse_and_apply("CREATE TABLE app.orders (id int, PRIMARY KEY(id))", cat, route=route)
    assert r.database == "warehouse" and r.table == "w_orders"
    assert "`warehouse`.`w_orders`" in r.statement
    assert ("warehouse", "w_orders") in cat.tables


def test_ddl_unknown_passthrough():
    cat = Catalog()
    r = parse_and_apply("CREATE INDEX idx ON t(a)", cat)
    assert not r.handled and r.kind == "unknown"


def test_catalog_json_roundtrip():
    cat = Catalog()
    parse_and_apply("CREATE TABLE app.t (id bigint, v varchar(10), PRIMARY KEY(id))", cat)
    payload = cat.to_json()
    cat2 = Catalog.from_json(payload)
    assert cat2.get("app", "t").pk_columns == ["id"]
