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
# CREATE TABLE modifiers (PG UNLOGGED, [GLOBAL|LOCAL] TEMPORARY/TEMP)
_CT_MODS = r"(?:(?:GLOBAL\s+|LOCAL\s+)?TEMP(?:ORARY)?\s+|UNLOGGED\s+)?"

def _strip_comments(text: str) -> str:
    """String-aware comment removal (r13, ADVICE r12: the old regex pass
    stripped '#'/'--'/'/*' sequences INSIDE string literals, truncating
    e.g. ``DEFAULT 'a#b'`` and ``COMMENT 'issue #42'``). A character scan
    tracks '/"/backtick string state — with MySQL backslash escapes and
    doubled quotes — and removes comments only OUTSIDE strings: C-style
    ``/* */`` blocks, ``--`` line comments, and MySQL ``#`` line comments
    (ddl_parser.rs:77-81 removes the first two the same blind-regex way;
    string-awareness is strictly safer). A trailing line comment without a
    final newline is also stripped. An unterminated string keeps the
    remainder verbatim (nothing after it can be a comment we can prove)."""
    out: list[str] = []
    i, n = 0, len(text)
    in_str: str | None = None
    while i < n:
        ch = text[i]
        if in_str:
            out.append(ch)
            if ch == "\\" and in_str in ("'", '"') and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if ch == in_str:
                if i + 1 < n and text[i + 1] == in_str:  # '' "" `` doubling
                    out.append(text[i + 1])
                    i += 2
                    continue
                in_str = None
            i += 1
            continue
        if ch in ("'", '"', "`"):
            in_str = ch
            out.append(ch)
            i += 1
            continue
        if text[i : i + 2] == "/*":
            end = text.find("*/", i + 2)
            out.append(" ")
            i = n if end < 0 else end + 2
            continue
        if text[i : i + 2] == "--" or ch == "#":
            end = text.find("\n", i)
            out.append(" ")
            i = n if end < 0 else end + 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)

# Trailing MySQL online-DDL hints on ALTER TABLE / CREATE INDEX / DROP INDEX
# (https://dev.mysql.com/doc/refman/8.4/en/alter-table.html): ALGORITHM [=]
# DEFAULT|INPLACE|COPY|INSTANT and LOCK [=] DEFAULT|NONE|SHARED|EXCLUSIVE.
# Values are anchored to the documented enums so a real column named `lock`
# can never be eaten. The reference leaves these in `unparsed`; stripping
# them keeps the typed add/modify/drop recognition clean.
_HINTS = re.compile(
    r"(?:\s*,?\s*(?:ALGORITHM\s*=?\s*(?:DEFAULT|INPLACE|COPY|INSTANT)"
    r"|LOCK\s*=?\s*(?:DEFAULT|NONE|SHARED|EXCLUSIVE)))+\s*(;?)\s*$",
    re.IGNORECASE,
)


def _normalize(text: str) -> str:
    """Comment removal + trailing online-DDL-hint strip."""
    text = _strip_comments(text)
    return _HINTS.sub(r"\1", text)


def _clean(s: str | None) -> str | None:
    return s if s else None


@dataclass(frozen=True)
class DdlStatement:
    """One recognized DDL statement.

    kind: add_column | drop_column | rename_column | modify_column |
          truncate_table | rename_table | drop_table | create_table |
          create_index | drop_index | create_database | drop_database |
          alter_database | set_schema | alter_table | alter_partition |
          other
    schema/table: target identifiers when present in the text.
    args: kind-specific payload (column names, types, new names).
    """

    kind: str
    schema: str | None = None
    table: str | None = None
    args: tuple = ()


_PATTERNS: list[tuple[str, re.Pattern]] = [
    (
        # MySQL partition maintenance (r13 grammar breadth): ALTER TABLE t
        # {ADD|DROP|TRUNCATE|COALESCE|REORGANIZE|EXCHANGE|ANALYZE|OPTIMIZE|
        # REBUILD|REPAIR|DISCARD|IMPORT} PARTITION ..., plus PARTITION BY
        # <method> (...) repartitioning and REMOVE PARTITIONING. Must sit
        # BEFORE add_column/drop_column so ADD PARTITION / DROP PARTITION
        # never parse as a column named 'PARTITION'.
        "alter_partition",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+"
            rf"(?:((?:ADD|DROP|TRUNCATE|COALESCE|REORGANIZE|EXCHANGE|ANALYZE|OPTIMIZE"
            rf"|REBUILD|REPAIR|DISCARD|IMPORT)\s+PARTITION|PARTITION\s+BY"
            rf"|REMOVE\s+PARTITIONING)\b\s*(.*?))\s*;?\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        # the lookahead keeps ADD CONSTRAINT/INDEX/KEY/... out of add_column
        # (they fall through to the generic alter_table recognizer)
        "add_column",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+ADD\s+(?:COLUMN\s+)?"
            rf"(?!CONSTRAINT\b|INDEX\b|KEY\b|PRIMARY\b|UNIQUE\b|FOREIGN\b|CHECK\b|FULLTEXT\b|SPATIAL\b|PARTITION\b)"
            rf"{_ID}\s+(.+?)\s*;?\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        "drop_column",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+DROP\s+(?:COLUMN\s+)?"
            rf"(?!CONSTRAINT\b|INDEX\b|KEY\b|PRIMARY\b|UNIQUE\b|FOREIGN\b|CHECK\b|PARTITION\b)"
            rf"{_ID}\s*;?\s*$",
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
        # MySQL CHANGE COLUMN old new type — rename+retype; parse_ddl
        # normalizes the same-name case to modify_column (pure retype)
        "rename_column",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+CHANGE\s+(?:COLUMN\s+)?{_ID}\s+{_ID}\s+(.+?)\s*;?\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        # MySQL MODIFY [COLUMN] name type — in-place retype
        "modify_column",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+MODIFY\s+(?:COLUMN\s+)?{_ID}\s+(.+?)\s*;?\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        # PG ALTER COLUMN name TYPE type [USING ...]
        "modify_column",
        re.compile(
            rf"^\s*ALTER\s+TABLE\s+{_QID}\s+ALTER\s+(?:COLUMN\s+)?{_ID}\s+(?:SET\s+DATA\s+)?TYPE\s+(.+?)(?:\s+USING\s+.+)?\s*;?\s*$",
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
    (
        "truncate_table",
        re.compile(
            rf"^\s*TRUNCATE\s+(?:TABLE\s+)?{_QID}"
            rf"(?:\s+(?:RESTART|CONTINUE)\s+IDENTITY)?(?:\s+CASCADE|\s+RESTRICT)?\s*;?\s*$",
            re.IGNORECASE,
        ),
    ),
    (
        "drop_table",
        re.compile(
            rf"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?{_QID}(?:\s+CASCADE|\s+RESTRICT)?\s*;?\s*$",
            re.IGNORECASE,
        ),
    ),
    (
        # modifiers per the reference's own corpus (ddl_parser.rs
        # test_create_table_with_temporary_pg): TEMPORARY/TEMP with optional
        # GLOBAL/LOCAL, and PG UNLOGGED
        "create_table",
        re.compile(
            rf"^\s*CREATE\s+{_CT_MODS}TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QID}\s*\(.*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        # MySQL CREATE TABLE new LIKE template (clones structure)
        "create_table",
        re.compile(
            rf"^\s*CREATE\s+{_CT_MODS}TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QID}\s+(?:\(\s*)?LIKE\s+{_QID}\s*\)?\s*;?\s*$",
            re.IGNORECASE,
        ),
    ),
    (
        # CTAS (r13 grammar breadth): CREATE TABLE t AS SELECT ... — MySQL
        # also allows omitting AS; PG allows AS TABLE other and a
        # parenthesized subquery
        "create_table",
        re.compile(
            rf"^\s*CREATE\s+{_CT_MODS}TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QID}\s+"
            rf"(?:AS\s+)?(?:\(\s*)?(?:SELECT|TABLE)\b.*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        # reference-corpus breadth (ddl_parser.rs test_create_index_*): PG
        # CONCURRENTLY / IF NOT EXISTS / anonymous index / ON ONLY, MySQL
        # USING <type> before ON; expression index columns ride verbatim
        "create_index",
        re.compile(
            rf"^\s*CREATE\s+(?:UNIQUE\s+)?INDEX\s+(?:CONCURRENTLY\s+)?"
            rf"(?:IF\s+NOT\s+EXISTS\s+)?(?:{_ID}\s+)?(?:USING\s+\w+\s+)?"
            rf"ON\s+(?:ONLY\s+)?{_QID}\s*\((.+?)\)\s*;?\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
    ),
    (
        "drop_index",
        re.compile(
            rf"^\s*DROP\s+INDEX\s+(?:CONCURRENTLY\s+)?(?:IF\s+EXISTS\s+)?{_ID}"
            rf"(?:\s+ON\s+{_QID})?(?:\s+CASCADE|\s+RESTRICT)?\s*;?\s*$",
            re.IGNORECASE,
        ),
    ),
    (
        # PG allows CREATE SCHEMA [IF NOT EXISTS] name [AUTHORIZATION role]
        # and the name-less CREATE SCHEMA AUTHORIZATION role (schema named
        # after the role) — both in the reference's own corpus
        # (ddl_parser.rs test_create_schema_pg)
        "create_database",
        re.compile(
            rf"^\s*CREATE\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            rf"(?:AUTHORIZATION\s+)?{_ID}(?:\s+AUTHORIZATION\s+[\w$`\"]+)?\s*;?\s*$",
            re.IGNORECASE,
        ),
    ),
    (
        "drop_database",
        re.compile(rf"^\s*DROP\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+EXISTS\s+)?{_ID}\s*;?\s*$", re.IGNORECASE),
    ),
    (
        # ALTER DATABASE/SCHEMA name <options> (AlterDatabase/AlterSchema,
        # ddl_statement.rs:9,13) — options ride as args, never applied here
        "alter_database",
        re.compile(rf"^\s*ALTER\s+(?:DATABASE|SCHEMA)\s+{_ID}\s+(.+?)\s*;?\s*$", re.IGNORECASE | re.DOTALL),
    ),
    (
        # PG: ALTER TABLE s.t SET SCHEMA s2 (PgAlterTableSetSchema,
        # ddl_statement.rs:25)
        "set_schema",
        re.compile(rf"^\s*ALTER\s+TABLE\s+{_QID}\s+SET\s+SCHEMA\s+{_ID}\s*;?\s*$", re.IGNORECASE),
    ),
    (
        # generic ALTER TABLE fallback (MysqlAlterTable/PgAlterTable): the
        # target table is still recognized so barrier/filter semantics see
        # which table changed even when the operation itself isn't applied
        "alter_table",
        re.compile(rf"^\s*ALTER\s+TABLE\s+{_QID}\s+(.+?)\s*;?\s*$", re.IGNORECASE | re.DOTALL),
    ),
]


_CONSTRAINT_STARTERS = (
    "PRIMARY", "UNIQUE", "KEY", "INDEX", "CONSTRAINT", "FOREIGN", "CHECK",
    "FULLTEXT", "SPATIAL", "EXCLUDE", "LIKE", "PERIOD",
)


def parse_create_columns(text: str | None) -> tuple[tuple[str, str], ...]:
    """Extract the (name, type+attrs) column pairs from a CREATE TABLE
    statement's parenthesized body (r13). The body is located and split
    with the same string-aware scanner as the ALTER splitter, so commas
    inside DECIMAL(10,2) / ENUM('a','b') / DEFAULT 'x,y' never split, and
    table-level constraint entries (PRIMARY KEY (..), CONSTRAINT ...,
    KEY idx (..), LIKE tpl, ...) are skipped. Returns () when there is no
    column list (CTAS / LIKE forms) — the typed surface target-side schema
    bootstrap needs, one step past the reference (ddl_parser.rs keeps the
    whole body `unparsed`)."""
    if not text:
        return ()
    text = _normalize(text)
    m = re.match(
        rf"^\s*CREATE\s+{_CT_MODS}TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?{_QID}\s*\(",
        text,
        re.IGNORECASE,
    )
    if not m:
        return ()
    # walk to the matching close paren, string-aware
    depth = 1
    i = m.end(0)
    start = i
    in_str: str | None = None
    n = len(text)
    while i < n and depth:
        ch = text[i]
        if in_str:
            if ch == "\\" and in_str in ("'", '"'):
                i += 2
                continue
            if ch == in_str:
                if i + 1 < n and text[i + 1] == in_str:
                    i += 2
                    continue
                in_str = None
        elif ch in ("'", '"', "`"):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    if depth:
        return ()  # unbalanced: not a parseable column list
    body = text[start : i - 1]
    cols: list[tuple[str, str]] = []
    for entry in _split_top_level_commas(body):
        entry = entry.strip()
        if not entry:
            continue
        head = entry.split(None, 1)
        word = head[0].strip('`"').upper()
        if word in _CONSTRAINT_STARTERS:
            continue
        name = head[0].strip('`"')
        cols.append((name, head[1].strip() if len(head) > 1 else ""))
    return tuple(cols)


def _split_top_level_commas(body: str) -> list[str]:
    """Split on commas at paren depth 0, outside string literals (MySQL
    backslash escapes and doubled quotes honored)."""
    parts: list[str] = []
    depth = 0
    start = 0
    in_str: str | None = None
    i = 0
    n = len(body)
    while i < n:
        ch = body[i]
        if in_str:
            if ch == "\\" and in_str in ("'", '"'):
                i += 2
                continue
            if ch == in_str:
                if i + 1 < n and body[i + 1] == in_str:
                    i += 2
                    continue
                in_str = None
        elif ch in ("'", '"', "`"):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
        i += 1
    parts.append(body[start:])
    return parts


def parse_ddl(text: str | None) -> DdlStatement:
    """Recognize a DDL statement's kind and targets; 'other' when unknown.
    Comments are removed and trailing ALGORITHM/LOCK online-DDL hints
    stripped first (ddl_parser.rs:77-81 removes comments the same way; its
    own drop-index tests carry ``algorithm=default`` tails)."""
    if not text or not text.strip():
        return DdlStatement("other")
    text = _normalize(text)
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
            if len(g) == 5 and g[2] == g[3]:
                # MySQL CHANGE a a BIGINT: same-name CHANGE is a pure retype
                return DdlStatement("modify_column", g[0], g[1], (g[2], g[4].strip()))
            return DdlStatement(kind, g[0], g[1], (g[2], g[3]))
        if kind == "modify_column":
            return DdlStatement(kind, g[0], g[1], (g[2], g[3].strip()))
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
        if kind == "alter_database":
            return DdlStatement(kind, g[0], None, (g[1].strip(),))
        if kind == "set_schema":
            return DdlStatement(kind, g[0], g[1], (g[2],))
        if kind == "alter_partition":
            op = re.sub(r"\s+", " ", g[2].strip().upper())
            return DdlStatement(kind, g[0], g[1], (op, (g[3] or "").strip()))
        if kind == "alter_table":
            return DdlStatement(kind, g[0], g[1], (g[2].strip(),))
    return DdlStatement("other")


# multi-target statements that the reference splits into singles
# (DdlStatement::split_to_multi, ddl_statement.rs:44-90): DROP TABLE a, b;
# RENAME TABLE a TO b, c TO d; DROP INDEX i1, i2 (PG). Identifier lists are
# comma-split (quoted identifiers never contain commas in this vocabulary).
# PG allows a trailing CASCADE/RESTRICT, which belongs to the statement,
# not the last identifier — strip it like _MULTI_TRUNCATE does
_MULTI_DROP_TABLE = re.compile(
    r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?(.+,.+?)(?:\s+CASCADE|\s+RESTRICT)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MULTI_RENAME_TABLE = re.compile(
    r"^\s*RENAME\s+TABLE\s+(.+\bTO\b.+,.+\bTO\b.+?)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)
_MULTI_DROP_INDEX = re.compile(
    r"^\s*DROP\s+INDEX\s+(?:CONCURRENTLY\s+)?(IF\s+EXISTS\s+)?([^;]+,[^;]+?)"
    r"(?:\s+CASCADE|\s+RESTRICT)?\s*;?\s*$",
    re.IGNORECASE,
)
# PG: TRUNCATE [TABLE] a, b [RESTART IDENTITY | CONTINUE IDENTITY] [CASCADE]
_MULTI_TRUNCATE = re.compile(
    r"^\s*TRUNCATE\s+(?:TABLE\s+)?(.+,.+?)"
    r"(?:\s+(?:RESTART|CONTINUE)\s+IDENTITY)?(?:\s+CASCADE|\s+RESTRICT)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


# MySQL multi-action ALTER TABLE: actions separated by TOP-LEVEL commas
# (never inside type parens like DECIMAL(10,2) or ENUM('a','b')), each
# starting with an action keyword. The reference leaves the whole action
# list `unparsed` (ddl_parser.rs:410-465); splitting to typed singles is
# what target-side schema evolution actually needs.
_ALTER_HEAD = re.compile(rf"^\s*ALTER\s+TABLE\s+{_QID}\s+", re.IGNORECASE)
_ACTION_KEYWORDS = ("ADD", "DROP", "MODIFY", "CHANGE", "ALTER", "RENAME", "SET")


def _split_alter_actions(body: str) -> list[str]:
    """Split an ALTER action list on top-level commas followed by an action
    keyword. Returns [body] when there is nothing to split. The string
    scanner honors MySQL backslash escapes and doubled quotes (r13, ADVICE
    r12: ``DEFAULT 'x\\'y, DROP z'`` must not split inside the literal);
    if the scan ends still inside a string the text is malformed-or-beyond
    this splitter, so it bails to the single-statement path unsplit."""
    parts: list[str] = []
    depth = 0
    start = 0
    in_str: str | None = None
    i = 0
    n = len(body)
    while i < n:
        ch = body[i]
        if in_str:
            if ch == "\\" and in_str in ("'", '"'):
                i += 2  # MySQL backslash escape: skip the escaped char
                continue
            if ch == in_str:
                if i + 1 < n and body[i + 1] == in_str:  # doubled quote
                    i += 2
                    continue
                in_str = None
        elif ch in ("'", '"', "`"):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            rest = body[i + 1 :].lstrip()
            head = rest.split(None, 1)[0].upper() if rest else ""
            if head in _ACTION_KEYWORDS:
                parts.append(body[start:i].strip())
                start = i + 1
        i += 1
    if in_str is not None:
        return [body.strip()]
    parts.append(body[start:].strip().rstrip(";").strip())
    return [p for p in parts if p]


def split_ddl(text: str | None) -> list[DdlStatement]:
    """Parse a DDL statement, splitting multi-target forms into one
    DdlStatement per target like the reference's ``split_to_multi`` — a
    router/filter operates per (schema, table), so a two-table RENAME must
    produce two routable events — plus MySQL multi-action ALTER TABLE
    (ADD ..., DROP ..., ...) into one typed statement per action.
    Single-target text degrades to ``[parse_ddl(text)]``."""
    if not text or not text.strip():
        return [DdlStatement("other")]
    text = _normalize(text)
    m = _ALTER_HEAD.match(text)
    if m:
        head = text[: m.end(0)].rstrip()
        actions = _split_alter_actions(text[m.end(0) :])
        if len(actions) > 1:
            return [parse_ddl(f"{head} {a}") for a in actions]
    m = _MULTI_DROP_TABLE.match(text)
    if m:
        if_exists = "IF EXISTS " if m.group(1) else ""
        return [parse_ddl(f"DROP TABLE {if_exists}{p.strip()}") for p in m.group(2).split(",")]
    m = _MULTI_RENAME_TABLE.match(text)
    if m:
        return [parse_ddl(f"RENAME TABLE {p.strip()}") for p in m.group(1).split(",")]
    m = _MULTI_DROP_INDEX.match(text)
    if m:
        # multi-index drop is PG syntax (no ON clause); a single-index MySQL
        # DROP INDEX ... ON tbl never reaches here (no comma)
        if_exists = "IF EXISTS " if m.group(1) else ""
        return [parse_ddl(f"DROP INDEX {if_exists}{p.strip()}") for p in m.group(2).split(",")]
    m = _MULTI_TRUNCATE.match(text)
    if m:
        return [parse_ddl(f"TRUNCATE TABLE {p.strip()}") for p in m.group(1).split(",")]
    return [parse_ddl(text)]
