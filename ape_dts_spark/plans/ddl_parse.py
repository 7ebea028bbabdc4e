"""Structural DDL recognition for CDC streams.

The reference parses DDL text into typed statements covering the everyday
schema-change vocabulary (dt-common/src/meta/ddl_meta/ddl_statement.rs:6-35,
ddl_parser.rs): create/drop/truncate/rename table, add/drop/rename column,
alter-other, create/drop database, create/drop index. This module recognizes
the same statement kinds with anchored regexes — enough to drive barrier
semantics and target-side schema evolution; anything unrecognized degrades to
``kind='other'`` and is logged, never silently applied.

Identifier quoting: MySQL backticks, ANSI double quotes, or bare names are
all accepted and stripped.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_ID = r'[`"]?([\w$]+)[`"]?'
_QID = rf"(?:{_ID}\.)?{_ID}"  # [schema.]name


def _clean(s: str | None) -> str | None:
    return s if s else None


@dataclass(frozen=True)
class DdlStatement:
    """One recognized DDL statement.

    kind: add_column | drop_column | rename_column | truncate_table |
          rename_table | drop_table | create_table | create_index |
          drop_index | create_database | drop_database | other
    schema/table: target identifiers when present in the text.
    args: kind-specific payload (column names, types, new names).
    """

    kind: str
    schema: str | None = None
    table: str | None = None
    args: tuple = ()


_PATTERNS: list[tuple[str, re.Pattern]] = [
    (
        "add_column",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+ADD\s+(?:COLUMN\s+)?{_ID}\s+(.+?)\s*;?\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        "drop_column",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+DROP\s+(?:COLUMN\s+)?{_ID}\s*;?\s*$",
            re.IGNORECASE,
        ),
    ),
    (
        "rename_column",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+RENAME\s+(?:COLUMN\s+)?{_ID}\s+TO\s+{_ID}\s*;?\s*$",
            re.IGNORECASE,
        ),
    ),
    (
        # MySQL CHANGE COLUMN old new type — rename + (ignored here) retype
        "rename_column",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+CHANGE\s+(?:COLUMN\s+)?{_ID}\s+{_ID}\s+.+?;?\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        "rename_table",
        re.compile(
            rf"^\s*(?:ALTER\s+TABLE\s+{_QID}\s+RENAME\s+(?:TO\s+|AS\s+)?|RENAME\s+TABLE\s+{_QID}\s+TO\s+){_QID}\s*;?\s*$",
            re.IGNORECASE,
        ),
    ),
    ("truncate_table", re.compile(rf"^\s*TRUNCATE\s+(?:TABLE\s+)?{_QID}\s*;?\s*$", re.IGNORECASE)),
    (
        "drop_table",
        re.compile(rf"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?{_QID}\s*;?\s*$", re.IGNORECASE),
    ),
    (
        "create_table",
        re.compile(
            rf"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QID}\s*\(.*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        "create_index",
        re.compile(
            rf"^\s*CREATE\s+(?:UNIQUE\s+)?INDEX\s+{_ID}\s+ON\s+{_QID}\s*\((.+?)\)\s*;?\s*$",
            re.IGNORECASE,
        ),
    ),
    ("drop_index", re.compile(rf"^\s*DROP\s+INDEX\s+{_ID}(?:\s+ON\s+{_QID})?\s*;?\s*$", re.IGNORECASE)),
    (
        "create_database",
        re.compile(rf"^\s*CREATE\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?{_ID}\s*;?\s*$", re.IGNORECASE),
    ),
    (
        "drop_database",
        re.compile(rf"^\s*DROP\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+EXISTS\s+)?{_ID}\s*;?\s*$", re.IGNORECASE),
    ),
]


def parse_ddl(text: str | None) -> DdlStatement:
    """Recognize a DDL statement's kind and targets; 'other' when unknown."""
    if not text or not text.strip():
        return DdlStatement("other")
    for kind, pat in _PATTERNS:
        m = pat.match(text)
        if not m:
            continue
        g = [(_clean(x)) for x in m.groups()]
        if kind == "add_column":
            return DdlStatement(kind, g[0], g[1], (g[2], g[3].strip().rstrip(";")))
        if kind == "drop_column":
            return DdlStatement(kind, g[0], g[1], (g[2],))
        if kind == "rename_column":
            return DdlStatement(kind, g[0], g[1], (g[2], g[3]))
        if kind == "rename_table":
            # groups: old(schema,name) twice (alternation) + new(schema,name)
            old = [x for x in g[:-2] if x is not None]
            new_schema, new_name = g[-2], g[-1]
            schema = old[0] if len(old) > 1 else None
            table = old[-1] if old else None
            return DdlStatement(kind, schema, table, (new_schema, new_name))
        if kind in ("truncate_table", "drop_table", "create_table"):
            return DdlStatement(kind, g[0], g[1])
        if kind == "create_index":
            return DdlStatement(kind, g[1], g[2], (g[0], tuple(c.strip(' `"') for c in g[3].split(","))))
        if kind == "drop_index":
            return DdlStatement(kind, g[1] if len(g) > 1 else None, g[2] if len(g) > 2 else None, (g[0],))
        if kind in ("create_database", "drop_database"):
            return DdlStatement(kind, g[0], None)
    return DdlStatement("other")
