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


# --- reference ALTER rewrite branches (mysql.go:246-392) -----------------

def _users_cat():
    cat = Catalog()
    parse_and_apply(
        "CREATE TABLE app.users (id bigint, name varchar(10), bal decimal(10,2), PRIMARY KEY(id))",
        cat,
    )
    return cat


def test_alter_multi_spec_single_statement():
    cat = _users_cat()
    r = parse_and_apply(
        "ALTER TABLE app.users ADD COLUMN age int, DROP COLUMN name, "
        "MODIFY COLUMN bal decimal(20,4)",
        cat,
    )
    assert r.handled and r.kind == "alter-table"
    assert r.statements == [
        "ALTER TABLE `app`.`users` ADD COLUMN `age` int, "
        "DROP COLUMN `name`, MODIFY COLUMN `bal` decimal(20,4)"
    ]
    t = cat.get("app", "users")
    assert [c.name for c in t.columns] == ["id", "bal", "age"]
    assert next(c for c in t.columns if c.name == "bal").mysql_type == "decimal(20,4)"


def test_alter_tidb_splits_per_spec():
    """TiDB mode: one statement per spec (mysql.go:316-327)."""
    cat = _users_cat()
    r = parse_and_apply(
        "ALTER TABLE app.users ADD COLUMN a int, ADD COLUMN b int",
        cat,
        tidb=True,
    )
    assert r.statements == [
        "ALTER TABLE `app`.`users` ADD COLUMN `a` int",
        "ALTER TABLE `app`.`users` ADD COLUMN `b` int",
    ]
    assert [c.name for c in cat.get("app", "users").columns] == [
        "id", "name", "bal", "a", "b",
    ]


def test_alter_change_column_renames_and_retypes():
    cat = _users_cat()
    r = parse_and_apply(
        "ALTER TABLE app.users CHANGE COLUMN name full_name varchar(64) NOT NULL",
        cat,
    )
    assert r.handled
    t = cat.get("app", "users")
    names = [c.name for c in t.columns]
    assert "full_name" in names and "name" not in names
    assert "CHANGE COLUMN `name` `full_name` varchar(64) NOT NULL" in r.statement


def test_alter_add_with_position():
    cat = _users_cat()
    parse_and_apply("ALTER TABLE app.users ADD COLUMN z int FIRST", cat)
    parse_and_apply("ALTER TABLE app.users ADD COLUMN mid int AFTER id", cat)
    assert [c.name for c in cat.get("app", "users").columns] == [
        "z", "id", "mid", "name", "bal",
    ]


def test_alter_rename_chain_mid_statement():
    """RENAME TO inside ALTER: later specs address the renamed table."""
    cat = _users_cat()
    r = parse_and_apply(
        "ALTER TABLE app.users RENAME TO app.members, ADD COLUMN joined date",
        cat,
    )
    assert r.handled
    assert ("app", "members") in cat.tables and ("app", "users") not in cat.tables
    assert [c.name for c in cat.get("app", "members").columns][-1] == "joined"


def test_alter_index_specs_pass_through():
    cat = _users_cat()
    r = parse_and_apply(
        "ALTER TABLE app.users ADD INDEX idx_name (name), DROP PRIMARY KEY",
        cat,
    )
    assert r.handled
    assert "ADD INDEX idx_name (name)" in r.statement
    assert "DROP PRIMARY KEY" in r.statement
    # catalog columns untouched
    assert [c.name for c in cat.get("app", "users").columns] == ["id", "name", "bal"]


def test_rename_table_multi_pair_and_tidb_split():
    cat = Catalog()
    parse_and_apply("CREATE TABLE app.a (id int, PRIMARY KEY(id))", cat)
    parse_and_apply("CREATE TABLE app.b (id int, PRIMARY KEY(id))", cat)
    r = parse_and_apply("RENAME TABLE app.a TO app.a2, app.b TO app.b2", cat)
    assert r.handled
    assert r.statements == [
        "RENAME TABLE `app`.`a` TO `app`.`a2`, `app`.`b` TO `app`.`b2`"
    ]
    assert ("app", "a2") in cat.tables and ("app", "b2") in cat.tables

    cat2 = Catalog()
    parse_and_apply("CREATE TABLE app.a (id int, PRIMARY KEY(id))", cat2)
    parse_and_apply("CREATE TABLE app.b (id int, PRIMARY KEY(id))", cat2)
    r2 = parse_and_apply(
        "RENAME TABLE app.a TO app.a2, app.b TO app.b2", cat2, tidb=True
    )
    assert r2.statements == [
        "RENAME TABLE `app`.`a` TO `app`.`a2`",
        "RENAME TABLE `app`.`b` TO `app`.`b2`",
    ]


def test_create_drop_database_routed_idempotent():
    """IF NOT EXISTS / IF EXISTS forced like the reference (mysql.go:248-268)."""
    cat = Catalog()

    def route(db, table):
        return ("tgt_" + db, table)

    r = parse_and_apply("CREATE DATABASE app", cat, route=route)
    assert r.handled and r.kind == "create-db"
    assert r.statement == "CREATE DATABASE IF NOT EXISTS `tgt_app`"
    r = parse_and_apply("DROP SCHEMA IF EXISTS app", cat, route=route)
    assert r.statement == "DROP DATABASE IF EXISTS `tgt_app`"


def test_create_table_like_routes_both_sides():
    cat = Catalog()
    parse_and_apply("CREATE TABLE app.src (id bigint, PRIMARY KEY(id))", cat)

    def route(db, table):
        return (db, "w_" + table) if table == "src" else (db, table)

    # catalog already holds the ROUTED source table under w_src? no —
    # src was created unrouted above; route only applies to this stmt
    r = parse_and_apply("CREATE TABLE app.dst LIKE app.src", cat)
    assert r.handled and r.kind == "create-table"
    assert r.statement == "CREATE TABLE IF NOT EXISTS `app`.`dst` LIKE `app`.`src`"
    assert cat.get("app", "dst").pk_columns == ["id"]
    # and the refer table goes through the router too (mysql.go:275-280)
    r2 = parse_and_apply("CREATE TABLE app.dst2 LIKE app.src", cat, route=route)
    assert "LIKE `app`.`w_src`" in r2.statement


def test_quoted_default_with_comma_splits_correctly():
    cat = Catalog()
    parse_and_apply(
        "CREATE TABLE app.q (id int, v varchar(20) DEFAULT 'a,b', PRIMARY KEY(id))",
        cat,
    )
    t = cat.get("app", "q")
    assert [c.name for c in t.columns] == ["id", "v"]
    assert t.columns[1].default == "a,b"
