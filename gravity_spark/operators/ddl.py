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
    #: TiDB mode splits one multi-spec ALTER / multi-pair RENAME into one
    #: statement each (mysql.go:316-327,352-377); otherwise == [statement]
    statements: list[str] | None = None
    #: Structured column actions for sinks that must PHYSICALLY rewrite
    #: their target for non-additive DDL (the reference applies any
    #: ALTER via AST rewrite, mysql.go:222-440). Tuples:
    #:   ("add-col", name, mysql_type)
    #:   ("drop-col", name)
    #:   ("modify-col", name, mysql_type)
    #:   ("rename-col", old_name, new_name, mysql_type)
    #:   ("truncate",)
    actions: list[tuple] | None = None

    def __post_init__(self) -> None:
        if self.statements is None:
            self.statements = [self.statement]
        if self.actions is None:
            self.actions = []


def _sub_target(db: str | None, table: str, route) -> tuple[str | None, str]:
    if route is None:
        return db, table
    return route(db, table)


def parse_and_apply(
    statement: str,
    catalog: Catalog,
    current_db: str | None = None,
    route=None,
    tidb: bool = False,
) -> DdlResult:
    """Parse one DDL statement, mutate the catalog, return the statement
    rewritten against the routed target (db, table).

    ``route`` is a callable (db, table) -> (target_db, target_table),
    mirroring the router substitution in the reference's AST rewrite
    (pkg/outputs/mysql/mysql.go:246-392). ``tidb=True`` reproduces the
    reference's TiDB statement splitting: a multi-spec ALTER or a
    multi-pair RENAME is emitted as one statement per spec/pair in
    ``result.statements`` (TiDB historically executed only the first
    spec of a combined ALTER).
    """
    stmt = statement.strip().rstrip(";")

    # CREATE DATABASE / DROP DATABASE (mysql.go:247-269): schema routed,
    # idempotence forced (IF NOT EXISTS / IF EXISTS always added)
    m = re.match(
        rf"(?is)^CREATE\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?{_IDENT}\s*$",
        stmt,
    )
    if m:
        tdb, _ = _sub_target(m.group(1), "", route)
        return DdlResult(
            True, "create-db", f"CREATE DATABASE IF NOT EXISTS `{tdb}`", tdb, None
        )
    m = re.match(
        rf"(?is)^DROP\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+EXISTS\s+)?{_IDENT}\s*$", stmt
    )
    if m:
        tdb, _ = _sub_target(m.group(1), "", route)
        return DdlResult(
            True, "drop-db", f"DROP DATABASE IF EXISTS `{tdb}`", tdb, None
        )

    # CREATE TABLE ... LIKE ref — refer table is ALSO routed
    # (mysql.go:275-283)
    m = re.match(
        rf"(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QUALIFIED}\s+LIKE\s+{_QUALIFIED}\s*$",
        stmt,
    )
    if m:
        db = m.group(1) or current_db
        tdb, ttable = _sub_target(db, m.group(2), route)
        rdb = m.group(3) or current_db
        trdb, trtable = _sub_target(rdb, m.group(4), route)
        try:
            ref = catalog.get(trdb or "", trtable)
            import copy as _copy

            t = _copy.deepcopy(ref)
            t.database, t.name = tdb or "", ttable
            catalog.put(t)
        except KeyError:
            pass
        return DdlResult(
            True, "create-table",
            f"CREATE TABLE IF NOT EXISTS {_qual(tdb, ttable)} LIKE {_qual(trdb, trtable)}",
            tdb, ttable,
        )

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

    m = re.match(rf"(?is)^ALTER\s+TABLE\s+{_QUALIFIED}\s+(.+)$", stmt)
    if m:
        db = m.group(1) or current_db
        tdb, ttable = _sub_target(db, m.group(2), route)
        rewritten, actions = _apply_alter_specs(
            catalog, tdb, ttable, _split_top_level(m.group(3))
        )
        prefix = f"ALTER TABLE {_qual(tdb, ttable)} "
        if tidb:
            stmts = [prefix + s for s in rewritten]
        else:
            stmts = [prefix + ", ".join(rewritten)]
        return DdlResult(
            True, "alter-table", stmts[0], tdb, ttable,
            statements=stmts, actions=actions,
        )

    m = re.match(rf"(?is)^RENAME\s+TABLE\s+(.+)$", stmt)
    if m:
        pairs = []
        for part in _split_top_level(m.group(1)):
            pm = re.match(rf"(?is)^{_QUALIFIED}\s+TO\s+{_QUALIFIED}\s*$", part.strip())
            if not pm:
                return DdlResult(False, "unknown", stmt, current_db, None)
            db1 = pm.group(1) or current_db
            tdb1, t1 = _sub_target(db1, pm.group(2), route)
            db2 = pm.group(3) or current_db
            tdb2, t2 = _sub_target(db2, pm.group(4), route)
            try:
                t = catalog.get(tdb1 or "", t1)
                catalog.drop(tdb1 or "", t1)
                t.database, t.name = tdb2 or "", t2
                catalog.put(t)
            except KeyError:
                pass
            pairs.append((tdb1, t1, tdb2, t2))
        if tidb:
            # one RENAME per pair (mysql.go:352-365)
            stmts = [
                f"RENAME TABLE {_qual(a, b)} TO {_qual(c, d)}"
                for a, b, c, d in pairs
            ]
        else:
            stmts = [
                "RENAME TABLE "
                + ", ".join(f"{_qual(a, b)} TO {_qual(c, d)}" for a, b, c, d in pairs)
            ]
        last = pairs[-1]
        return DdlResult(
            True, "rename-table", stmts[0], last[2], last[3], statements=stmts
        )

    m = re.match(rf"(?is)^TRUNCATE\s+(?:TABLE\s+)?{_QUALIFIED}\s*$", stmt)
    if m:
        db = m.group(1) or current_db
        tdb, ttable = _sub_target(db, m.group(2), route)
        return DdlResult(
            True, "truncate",
            f"TRUNCATE TABLE {f'`{tdb}`.' if tdb else ''}`{ttable}`", tdb, ttable,
            actions=[("truncate",)],
        )

    return DdlResult(False, "unknown", stmt, current_db, None)


def _qual(db: str | None, table: str) -> str:
    return f"`{db}`.`{table}`" if db else f"`{table}`"


def _split_top_level(block: str) -> list[str]:
    """Split at commas not nested in parentheses or quotes."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in block:
        if quote:
            if ch == quote:
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0 and quote is None:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


#: one ALTER spec — the reference handles each ast.AlterTableSpec
#: independently (mysql.go:314-327); these regexes cover the MySQL forms
#: its parser restores: ADD/DROP/MODIFY/CHANGE COLUMN, RENAME TO,
#: index/key specs pass through.
_SPEC_ADD = re.compile(
    rf"(?is)^ADD\s+(?:COLUMN\s+)?{_IDENT}\s+(.+?)(\s+(?:FIRST|AFTER\s+{_IDENT}))?\s*$"
)
_SPEC_DROP = re.compile(rf"(?is)^DROP\s+(?:COLUMN\s+)?{_IDENT}\s*$")
_SPEC_MODIFY = re.compile(
    rf"(?is)^MODIFY\s+(?:COLUMN\s+)?{_IDENT}\s+(.+?)(\s+(?:FIRST|AFTER\s+{_IDENT}))?\s*$"
)
_SPEC_CHANGE = re.compile(
    rf"(?is)^CHANGE\s+(?:COLUMN\s+)?{_IDENT}\s+{_IDENT}\s+(.+?)(\s+(?:FIRST|AFTER\s+{_IDENT}))?\s*$"
)
_SPEC_RENAME = re.compile(rf"(?is)^RENAME\s+(?:TO\s+|AS\s+)?{_QUALIFIED}\s*$")
_SPEC_INDEX = re.compile(
    r"(?is)^(ADD\s+(?:UNIQUE\s+)?(?:INDEX|KEY)|ADD\s+PRIMARY\s+KEY|"
    r"DROP\s+(?:INDEX|KEY)|DROP\s+PRIMARY\s+KEY|ADD\s+CONSTRAINT|"
    r"DROP\s+FOREIGN\s+KEY)\b"
)


def _apply_alter_specs(
    catalog: Catalog, tdb: str | None, ttable: str, specs: list[str]
) -> tuple[list[str], list[tuple]]:
    """Apply each ALTER spec to the catalog; return (rewritten specs,
    structured column actions for physical sink rewrite).

    Covers the reference's per-spec rewrite surface
    (pkg/outputs/mysql/mysql.go:314-345): column add (with FIRST/AFTER
    position honored in the catalog), drop, MODIFY type change, CHANGE
    rename+retype, table RENAME chains (later specs address the renamed
    table), and index/constraint specs passed through untouched.
    Unknown specs also pass through — the reference executes whatever
    its parser restores and lets the target error.
    """

    def table():
        try:
            return catalog.get(tdb or "", ttable)
        except KeyError:
            return None

    def place(cols: list[ColumnDef], col: ColumnDef, pos: str | None) -> None:
        if pos:
            p = pos.strip()
            if p.upper() == "FIRST":
                cols.insert(0, col)
                return
            am = re.match(rf"(?is)^AFTER\s+{_IDENT}$", p)
            if am:
                names = [c.name for c in cols]
                if am.group(1) in names:
                    cols.insert(names.index(am.group(1)) + 1, col)
                    return
        cols.append(col)

    out: list[str] = []
    actions: list[tuple] = []
    for spec in specs:
        sm = _SPEC_ADD.match(spec)
        if sm and not _SPEC_INDEX.match(spec):
            col = ColumnDef(name=sm.group(1), mysql_type=sm.group(2).strip())
            t = table()
            if t is not None:
                place(t.columns, col, sm.group(3))
            out.append(
                f"ADD COLUMN `{col.name}` {col.mysql_type}"
                + (f"{sm.group(3)}" if sm.group(3) else "")
            )
            actions.append(("add-col", col.name, col.mysql_type))
            continue
        sm = _SPEC_DROP.match(spec)
        if sm and not _SPEC_INDEX.match(spec):
            t = table()
            if t is not None:
                t.columns = [c for c in t.columns if c.name != sm.group(1)]
            out.append(f"DROP COLUMN `{sm.group(1)}`")
            actions.append(("drop-col", sm.group(1)))
            continue
        sm = _SPEC_MODIFY.match(spec)
        if sm:
            t = table()
            if t is not None:
                for c in t.columns:
                    if c.name == sm.group(1):
                        c.mysql_type = sm.group(2).strip()
            out.append(
                f"MODIFY COLUMN `{sm.group(1)}` {sm.group(2).strip()}"
                + (f"{sm.group(3)}" if sm.group(3) else "")
            )
            actions.append(("modify-col", sm.group(1), sm.group(2).strip()))
            continue
        sm = _SPEC_CHANGE.match(spec)
        if sm:
            t = table()
            if t is not None:
                for c in t.columns:
                    if c.name == sm.group(1):
                        c.name = sm.group(2)
                        c.mysql_type = sm.group(3).strip()
            out.append(
                f"CHANGE COLUMN `{sm.group(1)}` `{sm.group(2)}` {sm.group(3).strip()}"
                + (f"{sm.group(4)}" if sm.group(4) else "")
            )
            actions.append(
                ("rename-col", sm.group(1), sm.group(2), sm.group(3).strip())
            )
            continue
        sm = _SPEC_RENAME.match(spec)
        if sm:
            new_db = sm.group(1) or tdb
            new_name = sm.group(2)
            t = table()
            if t is not None:
                catalog.drop(tdb or "", ttable)
                t.database, t.name = new_db or "", new_name
                catalog.put(t)
            out.append(f"RENAME TO {_qual(new_db, new_name)}")
            # subsequent specs address the renamed table
            tdb, ttable = new_db, new_name
            continue
        out.append(spec)  # index/constraint/unknown: pass through
    return out, actions


def _parse_column_block(block: str) -> tuple[list[ColumnDef], set[str]]:
    """Split a CREATE TABLE column block at top-level commas; collect
    column defs + primary key columns."""
    parts = _split_top_level(block)

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
