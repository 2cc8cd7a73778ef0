"""DDL statement handling: parse MySQL DDL, apply to the catalog, and
re-emit target-dialect DDL.

Reference parity:
  - pkg/outputs/mysql/mysql.go:222-440 — DDL applied by AST rewrite
    (create/drop/alter/rename/truncate), target db/table substituted
    from the router
  - pkg/core/msg.go:175-178 — DdlMsg carries the raw statement
  - barrier semantics: pkg/inputs/mysqlstream/binlog_tailer.go:434-509 —
    DDL waits for in-flight DML, then flushes position. In Spark the
    foreachBatch epoch boundary IS the barrier: apply DDL between
    micro-batches (stop trigger → apply → restart from checkpoint).

Scope: the five statement shapes the reference rewrites, parsed with a
small structured grammar (no external SQL parser in the image). Unknown
statements pass through unmodified with handled=False — same behavior
as the reference's fallthrough.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from gravity_spark.core.catalog import Catalog, ColumnDef, TableDef

_IDENT = r"`?([A-Za-z0-9_]+)`?"
_QUALIFIED = rf"(?:{_IDENT}\.)?{_IDENT}"


@dataclass
class DdlResult:
    handled: bool
    kind: str
    statement: str          # rewritten statement (target addressing)
    database: str | None = None
    table: str | None = None


def _sub_target(db: str | None, table: str, route) -> tuple[str | None, str]:
    if route is None:
        return db, table
    return route(db, table)


def parse_and_apply(
    statement: str,
    catalog: Catalog,
    current_db: str | None = None,
    route=None,
) -> DdlResult:
    """Parse one DDL statement, mutate the catalog, return the statement
    rewritten against the routed target (db, table).

    ``route`` is a callable (db, table) -> (target_db, target_table),
    mirroring the router substitution in the reference's AST rewrite.
    """
    stmt = statement.strip().rstrip(";")

    m = re.match(
        rf"(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QUALIFIED}\s*\((.*)\)\s*[^)]*$",
        stmt,
    )
    if m:
        db = m.group(1) or current_db
        table = m.group(2)
        tdb, ttable = _sub_target(db, table, route)
        cols, pks = _parse_column_block(m.group(3))
        for c in cols:
            if c.name in pks:
                c.is_pk = True
        catalog.put(TableDef(database=tdb or "", name=ttable, columns=cols))
        out = re.sub(
            rf"(?is)^(CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?){_QUALIFIED}",
            lambda mm: mm.group(1) + (f"`{tdb}`.`{ttable}`" if tdb else f"`{ttable}`"),
            stmt,
            count=1,
        )
        return DdlResult(True, "create-table", out, tdb, ttable)

    m = re.match(rf"(?is)^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?{_QUALIFIED}\s*$", stmt)
    if m:
        db = m.group(1) or current_db
        tdb, ttable = _sub_target(db, m.group(2), route)
        catalog.drop(tdb or "", ttable)
        pre = "DROP TABLE IF EXISTS " if "if" in stmt.lower() else "DROP TABLE "
        return DdlResult(True, "drop-table",
                         pre + (f"`{tdb}`.`{ttable}`" if tdb else f"`{ttable}`"),
                         tdb, ttable)

    m = re.match(
        rf"(?is)^ALTER\s+TABLE\s+{_QUALIFIED}\s+ADD\s+(?:COLUMN\s+)?{_IDENT}\s+(.+?)\s*$",
        stmt,
    )
    if m:
        db = m.group(1) or current_db
        tdb, ttable = _sub_target(db, m.group(2), route)
        col = ColumnDef(name=m.group(3), mysql_type=m.group(4))
        t = catalog.get(tdb or "", ttable)
        t.columns.append(col)
        return DdlResult(
            True, "alter-add-column",
            f"ALTER TABLE {f'`{tdb}`.' if tdb else ''}`{ttable}` ADD COLUMN "
            f"`{col.name}` {col.mysql_type}",
            tdb, ttable,
        )

    m = re.match(
        rf"(?is)^ALTER\s+TABLE\s+{_QUALIFIED}\s+DROP\s+(?:COLUMN\s+)?{_IDENT}\s*$", stmt
    )
    if m:
        db = m.group(1) or current_db
        tdb, ttable = _sub_target(db, m.group(2), route)
        t = catalog.get(tdb or "", ttable)
        t.columns = [c for c in t.columns if c.name != m.group(3)]
        return DdlResult(
            True, "alter-drop-column",
            f"ALTER TABLE {f'`{tdb}`.' if tdb else ''}`{ttable}` DROP COLUMN `{m.group(3)}`",
            tdb, ttable,
        )

    m = re.match(
        rf"(?is)^RENAME\s+TABLE\s+{_QUALIFIED}\s+TO\s+{_QUALIFIED}\s*$", stmt
    )
    if m:
        db1 = m.group(1) or current_db
        tdb1, t1 = _sub_target(db1, m.group(2), route)
        db2 = m.group(3) or current_db
        tdb2, t2 = _sub_target(db2, m.group(4), route)
        try:
            t = catalog.get(tdb1 or "", t1)
            catalog.drop(tdb1 or "", t1)
            t.database, t.name = tdb2 or "", t2
            catalog.put(t)
        except KeyError:
            pass
        return DdlResult(
            True, "rename-table",
            f"RENAME TABLE {f'`{tdb1}`.' if tdb1 else ''}`{t1}` TO "
            f"{f'`{tdb2}`.' if tdb2 else ''}`{t2}`",
            tdb2, t2,
        )

    m = re.match(rf"(?is)^TRUNCATE\s+(?:TABLE\s+)?{_QUALIFIED}\s*$", stmt)
    if m:
        db = m.group(1) or current_db
        tdb, ttable = _sub_target(db, m.group(2), route)
        return DdlResult(
            True, "truncate",
            f"TRUNCATE TABLE {f'`{tdb}`.' if tdb else ''}`{ttable}`", tdb, ttable,
        )

    return DdlResult(False, "unknown", stmt, current_db, None)


def _parse_column_block(block: str) -> tuple[list[ColumnDef], set[str]]:
    """Split a CREATE TABLE column block at top-level commas; collect
    column defs + primary key columns."""
    parts, depth, cur = [], 0, []
    for ch in block:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())

    cols: list[ColumnDef] = []
    pks: set[str] = set()
    for p in parts:
        mpk = re.match(rf"(?is)^PRIMARY\s+KEY\s*\((.+)\)$", p)
        if mpk:
            pks |= {c.strip().strip("`") for c in mpk.group(1).split(",")}
            continue
        if re.match(r"(?is)^(UNIQUE|KEY|INDEX|CONSTRAINT|FOREIGN)", p):
            continue
        mc = re.match(rf"(?is)^{_IDENT}\s+([A-Za-z]+(?:\([^)]*\))?(?:\s+unsigned)?)(.*)$", p)
        if not mc:
            continue
        rest = mc.group(3).lower()
        col = ColumnDef(
            name=mc.group(1),
            mysql_type=mc.group(2),
            nullable="not null" not in rest,
            is_pk="primary key" in rest,
            default=_extract_default(rest),
        )
        if col.is_pk:
            pks.add(col.name)
        cols.append(col)
    return cols, pks


def _extract_default(rest: str) -> str | None:
    m = re.search(r"default\s+'([^']*)'", rest)
    if m:
        return m.group(1)
    m = re.search(r"default\s+(\S+)", rest)
    return m.group(1) if m else None
