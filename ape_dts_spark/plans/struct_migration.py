"""Structure (schema) migration: neutral table model -> per-dialect DDL.

Reference: struct migration fetches catalog objects into a neutral model
(dt-common/src/meta/struct_meta/structure/structure_type.rs:5-30), routes /
renames them, and per-target "struct sinkers" emit translated DDL
(dt-connector/src/sinker/*/*_struct_sinker.rs, base_struct_sinker.rs). The
struct checker compares translated definitions source vs target
(dt-connector/src/checker/struct_checker.rs).

Spark-native: the neutral model is a ``StructType`` + key metadata (the same
registry the merge/checker operators use). Translation emits CREATE TABLE for
Spark SQL (parquet/Delta), MySQL, PostgreSQL, ClickHouse (ReplacingMergeTree
with the reference's soft-delete columns ``_ape_dts_is_deleted`` /
``_ape_dts_timestamp`` — clickhouse_sinker.rs:18-19,
docs/en/tutorial/mysql_to_clickhouse.md:73-76) and StarRocks (PRIMARY KEY
model — starrocks_sinker.rs:28-29).

The reference's 2,108-line *textual* DDL parser (ddl_parser.rs) has no Spark
equivalent by design: schemas here are structural objects, not SQL strings,
so translation is a total function over types instead of a parse.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

SOFT_DELETE_COL = "_ape_dts_is_deleted"
VERSION_COL = "_ape_dts_timestamp"

DIALECTS = ("sparksql", "mysql", "pg", "clickhouse", "starrocks")


@dataclass(frozen=True)
class IndexDef:
    """Secondary index / unique constraint (the reference migrates both as
    catalog objects: structure_type.rs Index + Constraint; a UNIQUE
    constraint is an IndexDef with unique=True, as in MySQL's catalog)."""

    name: str
    columns: tuple[str, ...]
    unique: bool = False


@dataclass(frozen=True)
class SequenceDef:
    """Sequence object (structure_type.rs Sequence/SequenceOwner): PG-world
    auto-increment state; other dialects emulate or decline."""

    name: str
    start: int = 1
    increment: int = 1
    owned_by: str | None = None  # "table.column"


@dataclass(frozen=True)
class UdfDef:
    """User-defined function (structure_type.rs:5-30 Udf): carried as its
    declared signature + source body. PG is the native home; dialects whose
    function bodies are not portable get a meta-log line instead of silently
    dropping the object."""

    name: str
    args: str = ""  # "a integer, b integer"
    returns: str = "integer"
    language: str = "sql"  # sql | plpgsql
    body: str = ""


@dataclass(frozen=True)
class UdtDef:
    """User-defined type (structure_type.rs Udt): enum or composite. PG-world
    object; MySQL inlines enums per column, Spark uses struct columns."""

    name: str
    kind: str = "enum"  # enum | composite
    values: tuple[str, ...] = ()  # enum labels
    attributes: tuple[tuple[str, str], ...] = ()  # composite (attr, pg type)


@dataclass(frozen=True)
class RbacDef:
    """Role + grants (structure_type.rs Rbac; dcl_type.rs:7-22 grant/revoke
    statement kinds): one role and the privileges it holds on this schema."""

    role: str
    grants: tuple[str, ...] = ()  # e.g. ("SELECT ON TABLE users", "USAGE ON SCHEMA demo")


@dataclass
class TableDef:
    """Neutral table definition: the Spark-side RdbTbMeta
    (dt-common/src/meta/rdb_tb_meta.rs:11-23) plus the index/constraint
    objects struct migration carries (structure_type.rs:5-30)."""

    schema: str
    tb: str
    columns: T.StructType
    primary_keys: list[str] = field(default_factory=list)
    comment: str | None = None
    indexes: list[IndexDef] = field(default_factory=list)

    @classmethod
    def from_dataframe(
        cls,
        df: DataFrame,
        schema: str,
        tb: str,
        primary_keys: list[str] | None = None,
        indexes: list[IndexDef] | None = None,
    ):
        return cls(
            schema=schema,
            tb=tb,
            columns=df.schema,
            primary_keys=primary_keys or [],
            indexes=indexes or [],
        )


def _mysql_type(dt: T.DataType, is_key: bool) -> str:
    m = {
        T.ByteType: "TINYINT",
        T.ShortType: "SMALLINT",
        T.IntegerType: "INT",
        T.LongType: "BIGINT",
        T.FloatType: "FLOAT",
        T.DoubleType: "DOUBLE",
        T.BooleanType: "TINYINT(1)",
        T.DateType: "DATE",
        T.TimestampType: "DATETIME(6)",
        T.TimestampNTZType: "DATETIME(6)",
        T.BinaryType: "LONGBLOB",
    }
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "VARCHAR(255)" if is_key else "TEXT"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "JSON"
    return m.get(type(dt), "TEXT")


def _pg_type(dt: T.DataType, is_key: bool) -> str:
    m = {
        T.ByteType: "SMALLINT",
        T.ShortType: "SMALLINT",
        T.IntegerType: "INTEGER",
        T.LongType: "BIGINT",
        T.FloatType: "REAL",
        T.DoubleType: "DOUBLE PRECISION",
        T.BooleanType: "BOOLEAN",
        T.DateType: "DATE",
        T.TimestampType: "TIMESTAMPTZ",
        T.TimestampNTZType: "TIMESTAMP",
        T.BinaryType: "BYTEA",
    }
    if isinstance(dt, T.DecimalType):
        return f"NUMERIC({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "TEXT"
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, (T.IntegerType, T.LongType)):
        return "BIGINT[]"
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StringType):
        return "TEXT[]"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "JSONB"
    return m.get(type(dt), "TEXT")


def _clickhouse_type(dt: T.DataType, nullable: bool) -> str:
    m = {
        T.ByteType: "Int8",
        T.ShortType: "Int16",
        T.IntegerType: "Int32",
        T.LongType: "Int64",
        T.FloatType: "Float32",
        T.DoubleType: "Float64",
        T.BooleanType: "Bool",
        T.DateType: "Date32",
        T.TimestampType: "DateTime64(6)",
        T.TimestampNTZType: "DateTime64(6)",
        T.BinaryType: "String",
    }
    if isinstance(dt, T.DecimalType):
        base = f"Decimal({dt.precision},{dt.scale})"
    elif isinstance(dt, T.StringType):
        base = "String"
    elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        base = "String"  # serialized JSON
    else:
        base = m.get(type(dt), "String")
    return f"Nullable({base})" if nullable else base


def _starrocks_type(dt: T.DataType, is_key: bool) -> str:
    m = {
        T.ByteType: "TINYINT",
        T.ShortType: "SMALLINT",
        T.IntegerType: "INT",
        T.LongType: "BIGINT",
        T.FloatType: "FLOAT",
        T.DoubleType: "DOUBLE",
        T.BooleanType: "BOOLEAN",
        T.DateType: "DATE",
        T.TimestampType: "DATETIME",
        T.TimestampNTZType: "DATETIME",
        T.BinaryType: "VARBINARY",
    }
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "VARCHAR(255)" if is_key else "STRING"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "JSON"
    return m.get(type(dt), "STRING")


def _sparksql_type(dt: T.DataType) -> str:
    return dt.simpleString().upper()




def _bt(name: str) -> str:
    """Backtick-quoted identifier, embedded backticks doubled (MySQL-family
    + Spark SQL; the reference's special-character-identifier tests)."""
    return "`" + str(name).replace("`", "``") + "`"


def _dq(name: str) -> str:
    """Double-quote-quoted identifier, embedded quotes doubled (PG)."""
    return '"' + str(name).replace('"', '""') + '"'


def _sq(text: str) -> str:
    """Single-quoted SQL string literal, embedded quotes doubled."""
    return "'" + str(text).replace("'", "''") + "'"


def _col_comment(f: T.StructField) -> str:
    """Inline column-comment suffix (mysql/clickhouse/starrocks/sparksql;
    PG uses out-of-line COMMENT ON via to_comment_ddl)."""
    c = (f.metadata or {}).get("comment")
    return f" COMMENT {_sq(c)}" if c else ""


def to_create_table(td: TableDef, dialect: str) -> str:
    """Translated CREATE TABLE DDL for the target dialect."""
    if dialect not in DIALECTS:
        raise ValueError(f"unsupported dialect {dialect!r}; one of {DIALECTS}")
    pks = set(td.primary_keys)
    lines: list[str] = []

    if dialect == "sparksql":
        for f in td.columns.fields:
            null = "" if f.nullable else " NOT NULL"
            lines.append(f"  {_bt(f.name)} {_sparksql_type(f.dataType)}{null}{_col_comment(f)}")
        body = ",\n".join(lines)
        return (
            f"CREATE TABLE {_bt(td.schema)}.{_bt(td.tb)} (\n{body}\n) USING parquet"
            + (f" COMMENT {_sq(td.comment)}" if td.comment else "")
        )

    if dialect == "mysql":
        for f in td.columns.fields:
            null = " NOT NULL" if (not f.nullable or f.name in pks) else ""
            lines.append(f"  {_bt(f.name)} {_mysql_type(f.dataType, f.name in pks)}{null}{_col_comment(f)}")
        if pks:
            lines.append("  PRIMARY KEY (" + ", ".join(_bt(k) for k in td.primary_keys) + ")")
        return f"CREATE TABLE {_bt(td.schema)}.{_bt(td.tb)} (\n" + ",\n".join(lines) + "\n)"

    if dialect == "pg":
        for f in td.columns.fields:
            null = " NOT NULL" if (not f.nullable or f.name in pks) else ""
            lines.append(f'  {_dq(f.name)} {_pg_type(f.dataType, f.name in pks)}{null}')
        if pks:
            lines.append('  PRIMARY KEY (' + ", ".join(_dq(k) for k in td.primary_keys) + ")")
        return f'CREATE TABLE {_dq(td.schema)}.{_dq(td.tb)} (\n' + ",\n".join(lines) + "\n)"

    if dialect == "clickhouse":
        # append-only upsert emulation: ReplacingMergeTree(version) + sign col
        for f in td.columns.fields:
            nullable = f.nullable and f.name not in pks
            lines.append(f"  {_bt(f.name)} {_clickhouse_type(f.dataType, nullable)}{_col_comment(f)}")
        lines.append(f"  `{SOFT_DELETE_COL}` UInt8")
        lines.append(f"  `{VERSION_COL}` UInt64")
        order_by = ", ".join(_bt(k) for k in td.primary_keys) or "tuple()"
        return (
            f"CREATE TABLE {_bt(td.schema)}.{_bt(td.tb)} (\n" + ",\n".join(lines) + "\n)"
            f"\nENGINE = ReplacingMergeTree(`{VERSION_COL}`)\nORDER BY ({order_by})"
        )

    # starrocks: PRIMARY KEY model; soft-delete column for delete propagation
    for f in td.columns.fields:
        null = " NOT NULL" if (not f.nullable or f.name in pks) else ""
        lines.append(f"  {_bt(f.name)} {_starrocks_type(f.dataType, f.name in pks)}{null}{_col_comment(f)}")
    lines.append(f"  `{SOFT_DELETE_COL}` BOOLEAN")
    lines.append(f"  `{VERSION_COL}` BIGINT")
    pk = ", ".join(_bt(k) for k in td.primary_keys)
    return (
        f"CREATE TABLE {_bt(td.schema)}.{_bt(td.tb)} (\n" + ",\n".join(lines) + "\n)"
        + (f"\nPRIMARY KEY ({pk})\nDISTRIBUTED BY HASH ({pk})" if pk else "")
    )


def to_database_ddl(schema: str, dialect: str) -> str:
    """CREATE DATABASE/SCHEMA for the target dialect (structure_type.rs
    Database; the reference's database struct sinker)."""
    if dialect not in DIALECTS:
        raise ValueError(f"unsupported dialect {dialect!r}; one of {DIALECTS}")
    if dialect == "pg":
        return f'CREATE SCHEMA IF NOT EXISTS {_dq(schema)}'
    if dialect == "sparksql":
        return f"CREATE DATABASE IF NOT EXISTS {_bt(schema)}"
    return f"CREATE DATABASE IF NOT EXISTS {_bt(schema)}"


def to_sequence_ddl(schema: str, seq: SequenceDef, dialect: str) -> list[str]:
    """Sequence translation. PG is the native home (CREATE SEQUENCE +
    OWNED BY); MySQL/StarRocks model it as table-side AUTO_INCREMENT and
    Spark/Delta as identity columns — emitted as explanatory comment lines
    (the table DDL owns the actual clause); ClickHouse has no sequences."""
    if dialect not in DIALECTS:
        raise ValueError(f"unsupported dialect {dialect!r}; one of {DIALECTS}")
    if dialect == "pg":
        out = [
            f'CREATE SEQUENCE IF NOT EXISTS {_dq(schema)}.{_dq(seq.name)}'
            f" START WITH {seq.start} INCREMENT BY {seq.increment}"
        ]
        if seq.owned_by:
            tb, col = seq.owned_by.split(".", 1)
            out.append(f'ALTER SEQUENCE {_dq(schema)}.{_dq(seq.name)} OWNED BY {_dq(schema)}.{_dq(tb)}.{_dq(col)}')
        return out
    if dialect in ("mysql", "starrocks"):
        return [f"-- sequence `{seq.name}`: modeled as AUTO_INCREMENT on {seq.owned_by or '<unowned>'}"]
    if dialect == "sparksql":
        return [f"-- sequence `{seq.name}`: use an identity column (GENERATED ALWAYS AS IDENTITY) on {seq.owned_by or '<unowned>'}"]
    return [f"-- skipped: sequence `{seq.name}` (ClickHouse has no sequence objects)"]


def to_comment_ddl(td: TableDef) -> list[str]:
    """PG-style out-of-line comments (structure_type.rs Comment): COMMENT ON
    for the table and every commented column (other dialects inline comments
    in CREATE TABLE)."""
    out = []
    if td.comment:
        out.append(f'COMMENT ON TABLE {_dq(td.schema)}.{_dq(td.tb)} IS {_sq(td.comment)}')
    for f in td.columns.fields:
        c = (f.metadata or {}).get("comment")
        if c:
            out.append(f'COMMENT ON COLUMN {_dq(td.schema)}.{_dq(td.tb)}.{_dq(f.name)} IS {_sq(c)}')
    return out


def to_index_ddl(td: TableDef, dialect: str) -> list[str]:
    """Translated secondary-index / unique-constraint DDL, one statement per
    IndexDef (emitted after the CREATE TABLE, matching the reference's
    index struct sinker ordering).

    Dialect notes:
    - mysql / pg: CREATE [UNIQUE] INDEX.
    - clickhouse: no unique constraints and no b-tree indexes — uniqueness is
      the ReplacingMergeTree key's job, so unique defs are skipped; plain
      indexes translate to data-skipping indexes (ADD INDEX ... TYPE minmax).
    - starrocks: PRIMARY KEY model enforces key uniqueness; other unique
      constraints are unsupported and skipped; plain single-column indexes
      translate to bitmap indexes, multi-column ones are skipped (engine
      limitation).
    - sparksql: parquet/Delta have no index objects; data layout (Z-ORDER /
      liquid clustering) replaces them — nothing to emit.
    Skipped objects are returned as '-- skipped: ...' comment lines so the
    migration report stays complete (nothing drops silently).
    """
    if dialect not in DIALECTS:
        raise ValueError(f"unsupported dialect {dialect!r}; one of {DIALECTS}")
    out: list[str] = []
    for ix in td.indexes:
        cols_bt = ", ".join(_bt(c) for c in ix.columns)
        if dialect == "mysql":
            u = "UNIQUE " if ix.unique else ""
            out.append(f"CREATE {u}INDEX {_bt(ix.name)} ON {_bt(td.schema)}.{_bt(td.tb)} ({cols_bt})")
        elif dialect == "pg":
            cols = ", ".join(_dq(c) for c in ix.columns)
            u = "UNIQUE " if ix.unique else ""
            out.append(f'CREATE {u}INDEX {_dq(ix.name)} ON {_dq(td.schema)}.{_dq(td.tb)} ({cols})')
        elif dialect == "clickhouse":
            if ix.unique:
                out.append(f"-- skipped: unique constraint `{ix.name}` (ReplacingMergeTree key handles uniqueness)")
            else:
                out.append(
                    f"ALTER TABLE {_bt(td.schema)}.{_bt(td.tb)} ADD INDEX {_bt(ix.name)} ({cols_bt}) TYPE minmax GRANULARITY 1"
                )
        elif dialect == "starrocks":
            if ix.unique:
                out.append(f"-- skipped: unique constraint `{ix.name}` (PRIMARY KEY model)")
            elif len(ix.columns) == 1:
                out.append(f"CREATE INDEX {_bt(ix.name)} ON {_bt(td.schema)}.{_bt(td.tb)} ({cols_bt}) USING BITMAP")
            else:
                out.append(f"-- skipped: multi-column index `{ix.name}` (bitmap indexes are single-column)")
        else:  # sparksql
            out.append(f"-- skipped: index `{ix.name}` (no index objects; use Z-ORDER/clustering on {cols_bt})")
    return out


def to_udt_ddl(schema: str, udt: UdtDef, dialect: str) -> list[str]:
    """User-defined type translation (structure_type.rs Udt). PG is the
    native home (CREATE TYPE AS ENUM / AS (...)); other dialects have no
    schema-level type objects — enums inline into column types (MySQL,
    ClickHouse Enum8) and composites become struct columns (Spark), so those
    emit meta-log lines rather than dropping the object silently."""
    if dialect not in DIALECTS:
        raise ValueError(f"unsupported dialect {dialect!r}; one of {DIALECTS}")
    if dialect == "pg":
        if udt.kind == "enum":
            labels = ", ".join(_sq(v) for v in udt.values)
            return [f'CREATE TYPE {_dq(schema)}.{_dq(udt.name)} AS ENUM ({labels})']
        attrs = ", ".join(f"{_dq(a)} {t}" for a, t in udt.attributes)
        return [f'CREATE TYPE {_dq(schema)}.{_dq(udt.name)} AS ({attrs})']
    hint = {
        "mysql": "inline ENUM(...) / JSON column types",
        "clickhouse": "inline Enum8/Tuple column types",
        "starrocks": "inline column types",
        "sparksql": "struct<...> columns",
    }[dialect]
    return [f"-- skipped: type `{udt.name}` ({udt.kind}; no schema-level type objects — use {hint})"]


def to_udf_ddl(schema: str, udf: UdfDef, dialect: str) -> list[str]:
    """User-defined function translation (structure_type.rs Udf). PG emits a
    full CREATE OR REPLACE FUNCTION with the carried body; function bodies
    are not portable across engines, so every other dialect gets a meta-log
    line naming the object and its signature (the reference migrates Udf
    objects only between same-kind databases)."""
    if dialect not in DIALECTS:
        raise ValueError(f"unsupported dialect {dialect!r}; one of {DIALECTS}")
    if dialect == "pg":
        return [
            f'CREATE OR REPLACE FUNCTION {_dq(schema)}.{_dq(udf.name)}({udf.args})'
            f" RETURNS {udf.returns} LANGUAGE {udf.language} AS $body$ {udf.body} $body$"
        ]
    porter = "a Python/Scala UDF registration" if dialect == "sparksql" else "a manual port"
    return [
        f"-- skipped: function `{udf.name}({udf.args}) RETURNS {udf.returns}`"
        f" (body is {udf.language}; needs {porter})"
    ]


def to_rbac_ddl(schema: str, r: RbacDef, dialect: str) -> list[str]:
    """Role/grant translation (structure_type.rs Rbac). PG/MySQL/ClickHouse/
    StarRocks all speak CREATE ROLE + GRANT; Spark SQL has no intrinsic RBAC
    objects (governance lives in the catalog layer), so it meta-logs."""
    if dialect not in DIALECTS:
        raise ValueError(f"unsupported dialect {dialect!r}; one of {DIALECTS}")
    if dialect == "sparksql":
        return [f"-- skipped: role `{r.role}` (catalog/governance layer owns grants)"]
    quote = _dq if dialect == "pg" else _bt
    out = [f"CREATE ROLE IF NOT EXISTS {quote(r.role)}"]
    if dialect == "pg":
        out[0] = f'CREATE ROLE {_dq(r.role)}'  # PG<16 lacks IF NOT EXISTS on roles
    out.extend(f"GRANT {g} TO {quote(r.role)}" for g in r.grants)
    return out


def migration_plan(
    schema: str,
    tables: list[TableDef],
    dialect: str,
    sequences: list[SequenceDef] | None = None,
    udts: list[UdtDef] | None = None,
    udfs: list[UdfDef] | None = None,
    rbac: list[RbacDef] | None = None,
    rdb_filter=None,
) -> list[str]:
    """Full ordered struct-migration script for one schema: database → types
    → sequences → tables → indexes → functions → comments → roles/grants
    (the reference's struct sinker ordering over structure_type.rs object
    kinds; types precede the tables that may use them, grants come last so
    every object they reference exists).

    ``rdb_filter.filter_structure(kind)`` gates each object family with the
    reference's ``do_structures`` semantics (rdb_filter.rs:130-134): empty
    config migrates everything, otherwise only the listed kinds
    (database/table/sequence/index/comment/udt/udf/rbac) are emitted.
    """

    def keep(kind: str) -> bool:
        return rdb_filter is None or not rdb_filter.filter_structure(kind)

    out: list[str] = []
    if keep("database"):
        out.append(to_database_ddl(schema, dialect))
    if keep("udt"):
        for udt in udts or []:
            out.extend(to_udt_ddl(schema, udt, dialect))
    if keep("sequence"):
        for seq in sequences or []:
            out.extend(to_sequence_ddl(schema, seq, dialect))
    if keep("table"):
        for td in tables:
            out.append(to_create_table(td, dialect))
    if keep("index"):
        for td in tables:
            out.extend(to_index_ddl(td, dialect))
    if keep("udf"):
        for udf in udfs or []:
            out.extend(to_udf_ddl(schema, udf, dialect))
    if keep("comment") and dialect == "pg":
        for td in tables:
            out.extend(to_comment_ddl(td))
    if keep("rbac"):
        for r in rbac or []:
            out.extend(to_rbac_ddl(schema, r, dialect))
    return out


def schema_object_check(
    src: dict[str, list], dst: dict[str, list]
) -> list[dict]:
    """Schema-level struct check over the non-table object families
    (struct_checker.rs parity for Udf/Udt/Rbac/Sequence): compares by object
    name within each family, reporting missing/extra/changed. ``src``/``dst``
    map family name ('udfs' | 'udts' | 'rbac' | 'sequences') to def lists."""
    issues: list[dict] = []
    singular = {"udfs": "udf", "udts": "udt", "rbac": "rbac", "sequences": "sequence"}
    for family, kind in singular.items():
        key = "role" if family == "rbac" else "name"
        s = {getattr(o, key): o for o in src.get(family, [])}
        d = {getattr(o, key): o for o in dst.get(family, [])}
        for name, obj in s.items():
            if name not in d:
                issues.append({"object": name, "kind": f"missing_{kind}", "detail": repr(obj)})
            elif obj != d[name]:
                issues.append(
                    {"object": name, "kind": f"{kind}_mismatch", "detail": f"{obj!r} != {d[name]!r}"}
                )
        for name in d:
            if name not in s:
                issues.append({"object": name, "kind": f"extra_{kind}", "detail": repr(d[name])})
    return issues


def struct_check(src: TableDef, dst: TableDef) -> list[dict]:
    """Structural diff source vs target (struct_checker.rs parity).

    Returns one record per discrepancy: missing/extra columns, type or
    nullability drift, primary-key mismatch. Empty list = structures match.
    """
    issues: list[dict] = []
    src_cols = {f.name: f for f in src.columns.fields}
    dst_cols = {f.name: f for f in dst.columns.fields}
    for name, f in src_cols.items():
        if name not in dst_cols:
            issues.append({"object": name, "kind": "missing_column", "detail": f.dataType.simpleString()})
        else:
            g = dst_cols[name]
            if f.dataType != g.dataType:
                issues.append(
                    {
                        "object": name,
                        "kind": "type_mismatch",
                        "detail": f"{f.dataType.simpleString()} != {g.dataType.simpleString()}",
                    }
                )
            if f.nullable != g.nullable:
                issues.append({"object": name, "kind": "nullable_mismatch", "detail": f"{f.nullable} != {g.nullable}"})
    for name in dst_cols:
        if name not in src_cols:
            issues.append({"object": name, "kind": "extra_column", "detail": dst_cols[name].dataType.simpleString()})
    if src.primary_keys != dst.primary_keys:
        issues.append(
            {"object": "PRIMARY KEY", "kind": "pk_mismatch", "detail": f"{src.primary_keys} != {dst.primary_keys}"}
        )
    src_ix = {i.name: i for i in src.indexes}
    dst_ix = {i.name: i for i in dst.indexes}
    for name, i in src_ix.items():
        if name not in dst_ix:
            issues.append({"object": name, "kind": "missing_index", "detail": f"{i.columns} unique={i.unique}"})
        elif (i.columns, i.unique) != (dst_ix[name].columns, dst_ix[name].unique):
            j = dst_ix[name]
            issues.append(
                {
                    "object": name,
                    "kind": "index_mismatch",
                    "detail": f"{i.columns} unique={i.unique} != {j.columns} unique={j.unique}",
                }
            )
    for name in dst_ix:
        if name not in src_ix:
            issues.append({"object": name, "kind": "extra_index", "detail": f"{dst_ix[name].columns}"})
    return issues


def _revise_col_type(dt, dialect: str) -> str:
    if dialect == "mysql":
        return _mysql_type(dt, False)
    if dialect == "pg":
        return _pg_type(dt, False)
    if dialect == "sparksql":
        return _sparksql_type(dt)
    if dialect == "clickhouse":
        return _clickhouse_type(dt, True)
    return _starrocks_type(dt, False)


def struct_revise_plan(src: TableDef, dst: TableDef, dialect: str) -> list[str]:
    """Corrective DDL bringing a drifted TARGET back to the SOURCE
    structure — the struct-side analogue of the data path's check -> revise
    loop (the reference stops at struct CHECK, struct_checker.rs; revise
    completes it the way data check -> revise already does).

    One statement per struct_check discrepancy, in report order:
    missing column -> ADD COLUMN; extra column -> DROP COLUMN; type drift ->
    dialect retype (MySQL/ClickHouse/StarRocks MODIFY COLUMN, PG/Spark SQL
    ALTER COLUMN TYPE); nullability drift -> SET/DROP NOT NULL (or a MODIFY
    re-statement where the dialect folds nullability into the type);
    missing index -> the index DDL; index drift -> drop + recreate; extra
    index -> DROP INDEX. A primary-key mismatch is emitted as a comment —
    rebuilding a PK rewrites the table and must be a human decision.
    """
    if dialect not in DIALECTS:
        raise ValueError(f"unsupported dialect {dialect!r}; one of {DIALECTS}")
    q = _dq if dialect == "pg" else _bt
    tbl = f"{q(src.schema)}.{q(src.tb)}"
    src_cols = {f.name: f for f in src.columns.fields}
    out: list[str] = []
    for issue in struct_check(src, dst):
        kind, obj = issue["kind"], issue["object"]
        f = src_cols.get(obj)
        if kind == "missing_column":
            null = "" if (f.nullable or dialect == "clickhouse") else " NOT NULL"
            out.append(f"ALTER TABLE {tbl} ADD COLUMN {q(obj)} {_revise_col_type(f.dataType, dialect)}{null}")
        elif kind == "extra_column":
            out.append(f"ALTER TABLE {tbl} DROP COLUMN {q(obj)}")
        elif kind == "type_mismatch":
            t = _revise_col_type(f.dataType, dialect)
            if dialect in ("mysql", "clickhouse", "starrocks"):
                # MODIFY COLUMN restates the FULL column definition — MySQL
                # resets nullability to NULL when omitted, so a type fix on a
                # NOT NULL column must restate the constraint or it would
                # silently introduce a new nullable drift
                null = "" if (f.nullable or dialect == "clickhouse") else " NOT NULL"
                out.append(f"ALTER TABLE {tbl} MODIFY COLUMN {q(obj)} {t}{null}")
            else:
                out.append(f"ALTER TABLE {tbl} ALTER COLUMN {q(obj)} TYPE {t}")
        elif kind == "nullable_mismatch":
            if dialect in ("pg", "sparksql"):
                verb = "DROP NOT NULL" if f.nullable else "SET NOT NULL"
                out.append(f"ALTER TABLE {tbl} ALTER COLUMN {q(obj)} {verb}")
            else:
                t = _revise_col_type(f.dataType, dialect)
                null = "" if f.nullable else " NOT NULL"
                out.append(f"ALTER TABLE {tbl} MODIFY COLUMN {q(obj)} {t}{null}")
        elif kind == "missing_index" or kind == "index_mismatch":
            ix = next(i for i in src.indexes if i.name == obj)
            if kind == "index_mismatch":
                out.append(_drop_index_ddl(src, obj, dialect))
            one = TableDef(schema=src.schema, tb=src.tb, columns=src.columns, indexes=[ix])
            out.extend(to_index_ddl(one, dialect))
        elif kind == "extra_index":
            out.append(_drop_index_ddl(src, obj, dialect))
        elif kind == "pk_mismatch":
            out.append(f"-- manual: PRIMARY KEY mismatch on {tbl}: {issue['detail']}")
    return out


def _drop_index_ddl(td: TableDef, name: str, dialect: str) -> str:
    if dialect == "mysql":
        return f"DROP INDEX {_bt(name)} ON {_bt(td.schema)}.{_bt(td.tb)}"
    if dialect == "pg":
        return f'DROP INDEX {_dq(td.schema)}.{_dq(name)}'
    if dialect in ("clickhouse", "starrocks"):
        return f"ALTER TABLE {_bt(td.schema)}.{_bt(td.tb)} DROP INDEX {_bt(name)}"
    return f"-- skipped: no index objects in {dialect} (drop of {name} is a no-op)"
