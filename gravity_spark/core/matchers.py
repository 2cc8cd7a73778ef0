"""Matchers: config predicates → Catalyst Column expressions.

Reference parity:
  - pkg/core/matcher.go:12-22 — matchers in a group AND together
  - pkg/matchers/schema_matcher.go:46-67   (match-schema: glob on db)
  - pkg/matchers/table_matcher.go:93-123   (match-table: glob list)
  - pkg/matchers/table_regex_matcher.go:12-44 (match-table-regex)
  - pkg/matchers/dml_operator_matcher.go:148-199 (match-dml-op)
  - pkg/matchers/ddl_regex_matcher.go:228-253 (match-ddl-regex)
  - pkg/utils/glob.go:11-60 — glob supports only '*', anchored

Compiling to Column expressions (not UDFs) keeps matching inside
whole-stage codegen, and — because routers pre-filter at the input in
the reference (pkg/inputs/mysqlstream/binlog_tailer.go:317-325) — lets
Catalyst push the same predicate into the source scan for free.
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def glob_to_regex(glob: str) -> str:
    """Translate gravity's '*'-only glob into an anchored regex."""
    parts = glob.split("*")
    return "^" + ".*".join(re.escape(p) for p in parts) + "$"


def _as_list(v: Any) -> list[str]:
    if isinstance(v, str):
        return [v]
    return list(v)


def match_glob(col: Column, globs: str | Sequence[str]) -> Column:
    """True if the column matches ANY of the globs (reference ORs a
    table-glob list, pkg/matchers/table_matcher.go:93-123)."""
    exprs = [col.rlike(glob_to_regex(g)) for g in _as_list(globs)]
    out = exprs[0]
    for e in exprs[1:]:
        out = out | e
    return out


def match_regex(col: Column, regexes: str | Sequence[str]) -> Column:
    exprs = [col.rlike(r) for r in _as_list(regexes)]
    out = exprs[0]
    for e in exprs[1:]:
        out = out | e
    return out


def compile_matchers(config: Mapping[str, Any]) -> Column:
    """AND-combine every ``match-*`` key into one Column predicate.

    Mirrors the registry discovery by config-key prefix
    (pkg/matchers/matchers.go:13-35). Unknown match-* keys raise, like
    the reference's registry lookup failure.
    """
    preds: list[Column] = []
    for key, val in config.items():
        if not key.startswith("match-"):
            continue
        if key == "match-schema":
            preds.append(match_glob(F.col("database"), val))
        elif key == "match-table":
            preds.append(match_glob(F.col("table"), val))
        elif key == "match-table-regex":
            preds.append(match_regex(F.col("table"), val))
        elif key == "match-dml-op":
            preds.append(F.col("op").isin(*_as_list(val)))
        elif key == "match-ddl-regex":
            preds.append(match_regex(F.col("ddl_statement"), val))
        else:
            raise ValueError(f"unknown matcher {key!r}")
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out
