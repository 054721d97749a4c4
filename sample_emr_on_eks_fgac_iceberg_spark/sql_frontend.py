"""Producer-side SQL entry point (reference entry point C, SURVEY.md
§3.3): the reference's producer path is pure SQL — ``CREATE TABLE …
PARTITIONED BY …`` / ``INSERT INTO … VALUES`` run through Athena
(producer_account_setup/producer_iceberg_datalake_setup.sh:115-133,
142-159) and ``DROP TABLE`` through the cleanup script
(producer_clean_up.sh:92-103). ``FgacEngine.sql`` maps those statements
onto the Warehouse.

Parsing strategy: statement *shapes* (CREATE/INSERT/DROP/DESCRIBE) are
recognized with regexes + a balanced-paren scan, but every *literal*
inside ``VALUES (…)`` is parsed by Spark itself (``SELECT * FROM
VALUES …``) — DATE/TIMESTAMP/DECIMAL literals behave exactly as they
do in Spark SQL, with no bespoke literal grammar to drift. Anything
that isn't DDL/DML falls through to Spark SQL over the warehouse's
tables registered as views — this is the trusted producer surface
(no policy mediation; consumers go through SecureSession).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse

_CREATE_RE = re.compile(
    r"\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\(",
    re.I | re.S,
)
# partition specs may hold transform calls — allow one paren nesting
# level: day(ts), bucket(8, k), truncate(4, name)
_SPEC_BODY = r"((?:[^()]|\([^()]*\))*)"
_CTAS_RE = re.compile(
    r"\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
    rf"(?:PARTITIONED\s+BY\s*\({_SPEC_BODY}\)\s*)?AS\s+(SELECT\b.*)$",
    re.I | re.S,
)
_PARTITIONED_RE = re.compile(rf"PARTITIONED\s+BY\s*\({_SPEC_BODY}\)", re.I)
# CREATE TABLE new LIKE src — copy schema + partition spec, no data
_CREATE_VIEW_RE = re.compile(
    r"\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.]+)\s+AS\s+(.*)$", re.I | re.S
)
_DROP_VIEW_RE = re.compile(
    r"\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*$", re.I
)
_SHOW_VIEWS_RE = re.compile(r"\s*SHOW\s+VIEWS\s*;?\s*$", re.I)
_SHOW_CREATE_VIEW_RE = re.compile(
    r"\s*SHOW\s+CREATE\s+VIEW\s+([\w.]+)"
    r"(?:\s+(?:FOR\s+)?(?:SYSTEM_)?VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$",
    re.I,
)
# Iceberg-view-spec version audit: SHOW VIEW VERSIONS v lists every
# retained version (CREATE OR REPLACE versions forward, never erases)
_SHOW_VIEW_VERSIONS_RE = re.compile(
    r"\s*SHOW\s+VIEW\s+VERSIONS\s+([\w.]+)\s*;?\s*$", re.I
)
_CREATE_LIKE_RE = re.compile(
    r"\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+LIKE\s+([\w.]+)\s*;?\s*$",
    re.I,
)
_INSERT_RE = re.compile(
    r"\s*INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\)\s*)?VALUES\s+(.*)", re.I | re.S
)
_INSERT_SELECT_RE = re.compile(
    r"\s*INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\)\s*)?((?:SELECT|WITH|TABLE)\b.*)$",
    re.I | re.S,
)
# INSERT OVERWRITE [TABLE] t VALUES (…) | SELECT … — dynamic partition
# overwrite (Iceberg/Spark partitionOverwriteMode=dynamic semantics)
_INSERT_OVERWRITE_RE = re.compile(
    r"\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?([\w.]+)\s+(VALUES\s+.*|SELECT\b.*)$",
    re.I | re.S,
)
_CTE_START_RE = re.compile(r"\s*WITH\b", re.I)
# a subquery anywhere in a DML predicate/assignment — the cue to make
# warehouse tables resolvable in the executing session's catalog
_SUBQUERY_RE = re.compile(r"\(\s*SELECT\b", re.I)
_TRUNCATE_RE = re.compile(r"\s*TRUNCATE\s+TABLE\s+([\w.]+)\s*;?\s*$", re.I)
_DROP_RE = re.compile(r"\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*$", re.I)
_DESCRIBE_RE = re.compile(r"\s*DESCRIBE\s+(?:TABLE\s+)?([\w.]+)\s*;?\s*$", re.I)
_DESCRIBE_EXT_RE = re.compile(
    r"\s*DESCRIBE\s+(?:TABLE\s+)?EXTENDED\s+([\w.]+)\s*;?\s*$", re.I
)
_SHOW_CREATE_RE = re.compile(r"\s*SHOW\s+CREATE\s+TABLE\s+([\w.]+)\s*;?\s*$", re.I)
# EXPLAIN [EXTENDED|FORMATTED|SIMPLE] <query> — plan text, no execution
_EXPLAIN_RE = re.compile(
    r"\s*EXPLAIN\s+(EXTENDED\s+|FORMATTED\s+|SIMPLE\s+)?(.*)$", re.I | re.S
)
_ANALYZE_RE = re.compile(
    r"\s*ANALYZE\s+TABLE\s+([\w.]+)\s+COMPUTE\s+STATISTICS"
    r"(?:\s+FOR\s+COLUMNS\s+(.+?))?\s*;?\s*$",
    re.I | re.S,
)
_DELETE_RE = re.compile(
    r"\s*DELETE\s+FROM\s+([\w.]+)\s*(?:WHERE\s+(.*?))?\s*;?\s*$", re.I | re.S
)
_UPDATE_RE = re.compile(r"\s*UPDATE\s+([\w.]+)\s+SET\s+(.*)$", re.I | re.S)
_MERGE_RE = re.compile(
    r"\s*MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+USING\s+(.*)$", re.I | re.S
)
_ALTER_ADD_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMNS?\s*\((.*)\)\s*;?\s*$", re.I | re.S
)
_ALTER_DROP_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+`?(\w+)`?\s*;?\s*$", re.I
)
_ALTER_RENAME_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?\s*;?\s*$",
    re.I,
)
_ALTER_RENAME_TABLE_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+TO\s+([\w.]+)\s*;?\s*$", re.I
)
_ALTER_COL_TYPE_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+`?(\w+)`?\s+TYPE\s+"
    r"([\w]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*;?\s*$",
    re.I,
)
_ALTER_PARTITION_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+(?:WRITE\s+)?PARTITIONED\s+BY\s*"
    r"\(((?:[^()]|\([^()]*\))*)\)\s*;?\s*$",
    re.I,
)
_ALTER_TBLPROPS_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+TBLPROPERTIES\s*\((.*)\)\s*;?\s*$",
    re.I | re.S,
)
_ALTER_WRITE_ORDER_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+WRITE\s+ORDERED\s+BY\s*\(([^)]*)\)\s*;?\s*$",
    re.I,
)
# Iceberg branching/tagging DDL: ALTER TABLE t CREATE [OR REPLACE]
# TAG|BRANCH name [AS OF VERSION n]; REPLACE TAG|BRANCH name AS OF
# VERSION n; DROP TAG|BRANCH [IF EXISTS] name
_ALTER_CREATE_REF_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+(CREATE\s+(?:OR\s+REPLACE\s+)?|REPLACE\s+)"
    r"(TAG|BRANCH)\s+`?([\w.\-]+)`?(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$",
    re.I,
)
_ALTER_DROP_REF_RE = re.compile(
    r"\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+(TAG|BRANCH)\s+"
    r"(IF\s+EXISTS\s+)?`?([\w.\-]+)`?\s*;?\s*$",
    re.I,
)
# Iceberg time-travel SQL: SELECT … FROM t VERSION AS OF 3 /
# t TIMESTAMP AS OF '2026-01-01 00:00:00' (FOR SYSTEM_VERSION/
# SYSTEM_TIME spellings accepted)
_TIME_TRAVEL_RE = re.compile(
    r"([\w.]+)\s+(?:FOR\s+)?(?:SYSTEM_)?(VERSION|TIME(?:STAMP)?)\s+AS\s+OF\s+('[^']*'|\d+)",
    re.I,
)
# Spark 4 SQL-defined scalar functions: CREATE [OR REPLACE]
# [TEMPORARY] FUNCTION name(params) RETURNS type RETURN body
_CREATE_SQL_FUNC_RE = re.compile(
    r"\s*CREATE\s+(OR\s+REPLACE\s+)?(TEMPORARY\s+)?FUNCTION\s+`?(\w+)`?\s*"
    r"\(([^)]*)\)\s+RETURNS\s+([\w()\s,]+?)\s+RETURN\s+(.+?)\s*;?\s*$",
    re.I | re.S,
)
_DROP_SQL_FUNC_RE = re.compile(
    r"\s*DROP\s+(?:TEMPORARY\s+)?FUNCTION\s+(IF\s+EXISTS\s+)?`?(\w+)`?\s*;?\s*$",
    re.I,
)
_SHOW_TABLES_RE = re.compile(r"\s*SHOW\s+TABLES\s*;?\s*$", re.I)
_SHOW_PARTITIONS_RE = re.compile(r"\s*SHOW\s+PARTITIONS\s+([\w.]+)\s*;?\s*$", re.I)
_SHOW_TBLPROPS_RE = re.compile(
    r"\s*SHOW\s+TBLPROPERTIES\s+([\w.]+)(?:\s*\(\s*'([^']+)'\s*\))?\s*;?\s*$", re.I
)
# Glue-style database lifecycle (the reference: `aws glue
# create-database` / `delete-database`, producer setup + cleanup)
_CREATE_DB_RE = re.compile(
    r"\s*CREATE\s+(?:DATABASE|SCHEMA)\s+(IF\s+NOT\s+EXISTS\s+)?(\w+)\s*;?\s*$", re.I
)
_DROP_DB_RE = re.compile(
    r"\s*DROP\s+(?:DATABASE|SCHEMA)\s+(IF\s+EXISTS\s+)?(\w+)\s*(CASCADE)?\s*;?\s*$",
    re.I,
)
_SHOW_DBS_RE = re.compile(r"\s*SHOW\s+(?:DATABASES|SCHEMAS)\s*;?\s*$", re.I)
_SHOW_TABLES_IN_RE = re.compile(
    r"\s*SHOW\s+TABLES\s+(?:IN|FROM)\s+(\w+)\s*;?\s*$", re.I
)
# Lake Formation's list-permissions as SQL: SHOW GRANTS [ON t |
# ON DATABASE d] — the database form lists grants on the
# ``database:<d>`` resource
_SHOW_GRANTS_RE = re.compile(
    r"\s*SHOW\s+GRANTS"
    r"(?:\s+ON\s+(?:(?:DATABASE|SCHEMA)\s+(\w+)|(?:TABLE\s+)?([\w.]+)))?"
    r"\s*;?\s*$",
    re.I,
)
# Iceberg stored procedures: CALL [catalog.]system.<proc>(args) — the
# Spark-SQL spelling of table maintenance
# (expire_snapshots/remove_orphan_files/rollback_to_snapshot/
# cherrypick_snapshot/fast_forward/rewrite_data_files). Positional or
# named (`arg => value`) arguments.
_CALL_RE = re.compile(
    r"\s*CALL\s+(?:[\w]+\.)?system\.(\w+)\s*\((.*)\)\s*;?\s*$", re.I | re.S
)
# Compaction as SQL: Athena's `OPTIMIZE t REWRITE DATA USING BIN_PACK`
# (the maintenance statement the reference's Iceberg tables get) plus
# the ZORDER strategy spelling `… USING ZORDER (a, b)` / Delta-style
# `OPTIMIZE t ZORDER BY (a, b)`.
_OPTIMIZE_RE = re.compile(
    r"\s*OPTIMIZE\s+([\w.]+)\s*"
    r"(?:REWRITE\s+DATA\s+USING\s+(?:(BIN_PACK)|ZORDER\s*\(([^)]*)\))"
    r"|ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$",
    re.I,
)
# Lake Formation grant/revoke as SQL (A1/A2 — the reference drives
# these through `aws lakeformation grant-permissions` / `revoke-…`,
# producer_iceberg_datalake_setup.sh:221-229, producer_clean_up.sh:18-47)
_GRANT_RE = re.compile(
    r"\s*GRANT\s+([\w,\s]+?)\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+TO\s+`?([\w.-]+)`?"
    r"\s*(WITH\s+GRANT\s+OPTION)?\s*;?\s*$",
    re.I,
)
_REVOKE_RE = re.compile(
    r"\s*REVOKE\s+[\w,\s]+?\s+ON\s+(?:TABLE\s+)?([\w.]+)\s+FROM\s+`?([\w.-]+)`?\s*;?\s*$",
    re.I,
)
# Database-level grants (the reference's `--resource Database`
# DESCRIBE, producer_iceberg_datalake_setup.sh:221-229): DESCRIBE
# gates SHOW TABLES/DESCRIBE DATABASE discovery, CREATE TABLE lets the
# grantee create tables in the database.
_GRANT_DB_RE = re.compile(
    r"\s*GRANT\s+([\w,\s]+?)\s+ON\s+(?:DATABASE|SCHEMA)\s+(\w+)\s+TO\s+"
    r"`?([\w.-]+)`?\s*(WITH\s+GRANT\s+OPTION)?\s*;?\s*$",
    re.I,
)
_REVOKE_DB_RE = re.compile(
    r"\s*REVOKE\s+[\w,\s]+?\s+ON\s+(?:DATABASE|SCHEMA)\s+(\w+)\s+FROM\s+"
    r"`?([\w.-]+)`?\s*;?\s*$",
    re.I,
)
_ALL_GRANTABLE = {"SELECT", "DESCRIBE", "INSERT", "DELETE", "ALTER", "DROP"}
# Iceberg metadata tables: SELECT * FROM t.snapshots / t.files /
# t.history / t.partitions
_META_TABLE_RE = re.compile(
    r"([\w.]+)\.(snapshots|files|history|partitions|refs|manifests"
    r"|metadata_log_entries|entries|all_files|position_deletes)(?![\w.])",
    re.I,
)


def _split_top_and(text: str) -> list[str]:
    """Split a predicate on AND *outside* single-quoted literals — a
    literal containing the word ``and`` (``brand = 'A AND B'``) must
    stay one term (ADVICE r11). SQL escapes a quote by doubling it, so
    "inside a string" is exactly "odd number of quotes seen so far"."""
    parts, start = [], 0
    for m in re.finditer(r"\bAND\b", text, re.I):
        if text.count("'", 0, m.start()) % 2 == 0:
            parts.append(text[start : m.start()])
            start = m.end()
    parts.append(text[start:])
    return [p.strip() for p in parts]


def _parse_where_filters(text: str) -> list:
    """Parse a rewrite_data_files ``where`` predicate — conjunctions of
    ``col op literal`` with op in {=, <, <=, >, >=} — into the
    read_table/[(col, op, literal)] filter grammar the manifest-level
    file pruner consumes. Deliberately narrow: scan-scoping predicates
    are partition/column-bound comparisons; anything richer refuses
    loudly rather than silently rewriting the whole table."""
    import datetime as _dt

    out = []
    for part in _split_top_and(text.strip()):
        m = re.match(
            r"\s*`?(\w+)`?\s*(=|<=|>=|<|>)\s*(.+?)\s*$", part, re.S
        )
        if not m:
            raise ValueError(
                f"Cannot parse rewrite where-clause term: {part!r} "
                "(supported: col op literal AND …)"
            )
        col, op, lit = m.group(1), m.group(2), m.group(3).strip()
        dm = re.match(r"(?:DATE\s+)?'(\d{4}-\d{2}-\d{2})'$", lit, re.I)
        if dm:
            val: object = _dt.date.fromisoformat(dm.group(1))
        elif lit.startswith("'") and lit.endswith("'"):
            val = lit[1:-1]
        elif re.fullmatch(r"-?\d+", lit):
            val = int(lit)
        elif re.fullmatch(r"-?\d+\.\d+", lit):
            val = float(lit)
        else:
            raise ValueError(f"Cannot parse where literal: {lit!r}")
        out.append((col, op, val))
    return out


def _strip_parquet_path(source: str) -> str:
    """Accept Iceberg's path-table spellings for add_files/snapshot
    sources — ``parquet.`/path```, ```parquet`.`/path``` — or a plain
    directory path, returning the bare path."""
    m = re.match(r"`?parquet`?\s*\.\s*`([^`]+)`\s*$", source.strip(), re.I)
    return m.group(1) if m else source.strip().strip("`")


def _sub_outside_strings(pattern: str, repl: str, text: str, flags: int = 0) -> str:
    """``re.sub`` applied only OUTSIDE single-quoted SQL string
    literals (with '' escaping) — table-name rewrites must never
    corrupt a comparison value that happens to contain a table name
    (`WHERE v = 'db.t'`)."""
    out: list[str] = []
    i, seg_start, n = 0, 0, len(text)
    while i < n:
        if text[i] == "'":
            out.append(re.sub(pattern, repl, text[seg_start:i], flags=flags))
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(text[i : j + 1])
            i = j + 1
            seg_start = i
        else:
            i += 1
    out.append(re.sub(pattern, repl, text[seg_start:], flags=flags))
    return "".join(out)


def _split_cte_insert(query: str) -> tuple[str, str | None, str] | None:
    """For ``WITH … INSERT INTO t [(cols)] SELECT …`` find the
    top-level (paren-depth-0, outside strings) INSERT INTO clause and
    lift it out. Returns (target, col_list_inner, read_query) where
    read_query is the statement with the INSERT clause removed — a
    plain ``WITH … SELECT …`` the read path can evaluate — or None if
    no top-level INSERT clause exists."""
    depth, in_str, i, n = 0, None, 0, len(query)
    while i < n:
        ch = query[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch == "-" and query[i : i + 2] == "--":
            nl = query.find("\n", i)
            i = n if nl == -1 else nl
            continue
        elif ch == "/" and query[i : i + 2] == "/*":
            end = query.find("*/", i + 2)
            i = n if end == -1 else end + 2
            continue
        elif ch in ("'", '"', "`"):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and query[i : i + 6].upper() == "INSERT":
            m = re.match(
                r"INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\)\s*)?", query[i:], re.I
            )
            if m:
                return (
                    m.group(1),
                    m.group(2),
                    query[:i] + query[i + m.end():],
                )
        i += 1
    return None


def _split_top_level(text: str, keyword: str) -> tuple[str, str | None]:
    """Split ``text`` at the first whole-word occurrence of ``keyword``
    outside parentheses and string literals. Returns (head, tail) with
    the keyword consumed; tail is None when the keyword is absent."""
    depth = 0
    in_str: str | None = None
    kw = keyword.upper()
    n = len(kw)
    up = text.upper()
    for i, ch in enumerate(text):
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and up[i : i + n] == kw
            and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_"))
            and (
                i + n >= len(text)
                or not (text[i + n].isalnum() or text[i + n] == "_")
            )
        ):
            return text[:i], text[i + n :]
    return text, None


def _split_top_commas(text: str) -> list[str]:
    """Split on commas outside parentheses and string literals."""
    parts, depth, in_str, start = [], 0, None, 0
    for i, ch in enumerate(text):
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p for p in (p.strip() for p in parts) if p]


def _matching_paren(text: str, open_idx: int) -> int:
    """Index of the ')' closing the '(' at open_idx (handles nesting —
    column types like DECIMAL(10,2) — and quoted strings)."""
    depth = 0
    in_str: str | None = None
    for i in range(open_idx, len(text)):
        ch = text[i]
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"Unbalanced parentheses in: {text[:80]}…")


def rewrite_qualify(query: str) -> tuple[str, bool]:
    """Rewrite a top-level ``QUALIFY <pred>`` clause (DuckDB/Snowflake/
    BigQuery's post-window filter — Spark has no QUALIFY) into plain
    Spark SQL. Two shapes:

    - predicate over select-list aliases (``QUALIFY rk <= 2``): wrap
      the query and filter in an outer WHERE;
    - predicate containing its own window function (``QUALIFY
      row_number() OVER (…) = 1``): the predicate is INJECTED into the
      query's own select list as a helper boolean column ``__qualify``
      (so its window sees every FROM column, like DuckDB's QUALIFY,
      not just the projected ones), the wrapped query filters on it,
      and the caller drops the helper column (second return value
      True). For SELECT DISTINCT / set-operation heads — where
      touching the select list would change semantics — it falls back
      to projecting over the wrapped output, which then only resolves
      projected columns.

    Top-level only — a QUALIFY inside a subquery is not rewritten and
    fails loudly below rather than reaching Spark's parser."""
    head, tail = _split_top_level(query, "QUALIFY")
    if tail is None:
        if re.search(r"\bQUALIFY\b", _strip_sql_strings(query), re.I):
            raise ValueError(
                "QUALIFY is supported at the top level of the statement "
                "only — rewrite the subquery's QUALIFY as a wrapped WHERE"
            )
        return query, False
    if re.search(r"__qualify\b", _strip_sql_strings(query), re.I):
        # the rewrite introduces and then drops a __qualify helper
        # column — a statement already referencing that name would lose
        # its own column silently; refuse loudly instead (ADVICE r12)
        raise ValueError(
            "QUALIFY cannot be rewritten over a statement that already "
            "references a __qualify column name — rename it"
        )
    pred, suffix = tail, ""
    for kw in ("ORDER", "LIMIT", "OFFSET"):
        h, t = _split_top_level(pred, kw)
        if t is not None and len(h) < len(pred):
            pred, suffix = h, f"{kw} {t.strip()}"
    if not re.search(r"\bOVER\s*\(", pred, re.I):
        return (
            f"SELECT * FROM ({head.strip()}) AS __qsrc "
            f"WHERE ({pred.strip()}) {suffix}",
            False,
        )
    set_op = any(
        _split_top_level(head, k)[1] is not None
        for k in ("UNION", "INTERSECT", "EXCEPT")
    )
    prefix, body = _split_top_level(head, "SELECT")
    if (
        body is not None
        and not set_op
        and not re.match(r"\s*DISTINCT\b", body, re.I)
    ):
        sel, rest = _split_top_level(body, "FROM")
        if rest is not None:
            inner = (
                f"{prefix} SELECT {sel.strip()}, ({pred.strip()}) "
                f"AS __qualify FROM {rest.strip()}"
            )
            return (
                f"SELECT * FROM ({inner}) AS __qfil "
                f"WHERE __qualify {suffix}",
                True,
            )
    new = (
        f"SELECT * FROM (SELECT __qsrc.*, ({pred.strip()}) AS __qualify "
        f"FROM ({head.strip()}) AS __qsrc) AS __qfil "
        f"WHERE __qualify {suffix}"
    )
    return new, True


_DISTINCT_ON_RE = re.compile(
    r"(\bSELECT\s+)DISTINCT\s+ON\s*\(", re.I
)


def rewrite_distinct_on(query: str) -> tuple[str, bool]:
    """Rewrite Postgres/DuckDB ``SELECT DISTINCT ON (exprs) … ORDER BY
    exprs, tiebreaks`` (Spark has no DISTINCT ON) into the standard
    row_number window filter: partition by the ON exprs, order by the
    statement's own ORDER BY, keep rank 1. The ORDER BY is REQUIRED —
    without it DISTINCT ON returns an arbitrary row per group, which
    this engine's determinism rules refuse. Top-level only, same
    contract as rewrite_qualify. Returns (rewritten, needs_drop) —
    the caller drops the helper ``__don`` column."""
    # probe the BLANKED text (string literals spaced out, length
    # preserved so indices map back to the raw query): a literal
    # containing "SELECT DISTINCT ON (" must not trigger a rewrite,
    # and the paren-balance guard must not count literal parens
    # (ADVICE r12)
    blanked = _blank_sql_strings(query)
    m = _DISTINCT_ON_RE.search(blanked)
    if not m:
        return query, False
    if blanked.count("(", 0, m.start()) != blanked.count(")", 0, m.start()):
        raise ValueError(
            "DISTINCT ON is supported at the top level of the statement only"
        )
    if re.search(r"__don\b|__ob\d", blanked, re.I):
        # the rewrite introduces __don/__obN helper columns and drops
        # them from the result — a statement already carrying such
        # names would have its own columns silently removed; refuse
        # loudly instead (ADVICE r12)
        raise ValueError(
            "DISTINCT ON cannot be rewritten over a statement that "
            "already references __don/__obN column names — rename them"
        )
    close = _matching_paren(query, m.end() - 1)
    on_exprs = query[m.end() : close].strip()
    rest = query[close + 1 :]
    head, order_tail = _split_top_level(rest, "ORDER")
    if order_tail is None:
        raise ValueError(
            "DISTINCT ON requires an ORDER BY (an arbitrary row per "
            "group is not deterministic); add ORDER BY <on-exprs>, "
            "<tie-breakers>"
        )
    order_by = re.sub(r"^\s*BY\b", "", order_tail, flags=re.I).strip()
    # split LIMIT and OFFSET out of the order-item list (either may
    # appear without the other — `ORDER BY … OFFSET n` is valid SQL,
    # and leaving OFFSET inside the items would parse it as an order
    # expression; ADVICE r12)
    suffix_parts: list[str] = []
    limit_head, limit_tail = _split_top_level(order_by, "LIMIT")
    if limit_tail is not None:
        order_by = limit_head
        # OFFSET may trail the LIMIT clause (`LIMIT n OFFSET m`)
        lim, off = _split_top_level(limit_tail, "OFFSET")
        suffix_parts.append(f"LIMIT {lim.strip()}")
        if off is not None:
            suffix_parts.append(f"OFFSET {off.strip()}")
    off_head, off_tail = _split_top_level(order_by, "OFFSET")
    if off_tail is not None:
        order_by = off_head
        # OFFSET-first spelling (`OFFSET m LIMIT n` is not SQL; Spark
        # and DuckDB both take LIMIT first) — off_tail is the count
        suffix_parts.insert(0, f"OFFSET {off_tail.strip()}")
    suffix = " ".join(suffix_parts)
    order_by = order_by.strip()
    sel, from_tail = _split_top_level(head, "FROM")
    if from_tail is None:
        raise ValueError("DISTINCT ON requires a FROM clause")
    # the final sort runs OUTSIDE the select-list projection, so each
    # order expression is projected as a hidden __obN column (the
    # statement may order by columns it does not select) — the caller
    # drops __don and __ob* from the result
    inner_extra, outer_order = [], []
    for i, item in enumerate(_split_top_commas(order_by)):
        om = re.match(
            r"(.*?)(\s+(?:ASC|DESC))?(\s+NULLS\s+(?:FIRST|LAST))?\s*$",
            item,
            re.I | re.S,
        )
        inner_extra.append(f"({om.group(1).strip()}) AS __ob{i}")
        outer_order.append(
            f"__ob{i}{om.group(2) or ''}{om.group(3) or ''}"
        )
    inner = (
        f"{query[: m.start(1)]}SELECT {sel.strip()}, "
        f"{', '.join(inner_extra)}, "
        f"row_number() OVER (PARTITION BY {on_exprs} "
        f"ORDER BY {order_by}) AS __don FROM {from_tail.strip()}"
    )
    return (
        f"SELECT * FROM ({inner}) AS __dfil WHERE __don = 1 "
        f"ORDER BY {', '.join(outer_order)} {suffix}",
        True,
    )


def _blank_sql_noise(text: str) -> str:
    """Length-preserving blanking of single-quoted literals (contents →
    spaces, outer quotes kept, '' escapes blanked) AND SQL comments —
    ``--`` to end-of-line and bracketed ``/* */`` including Spark's
    nesting — in ONE left-to-right scan, so a quote inside a comment
    (``-- don't``) can't corrupt string state and a ``--`` inside a
    literal can't start a phantom comment (ADVICE r13: comment text
    containing parens / FETCH / EXCLUDE / quantifier keywords was
    visible to the positional scans). Newlines inside comments are
    kept so line-oriented probes stay aligned; double-quoted strings
    and backtick identifiers pass through unblanked (pre-existing
    probe behavior) but shield any comment markers inside them."""
    out = list(text)
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        out[j] = out[j + 1] = " "
                        j += 2
                        continue
                    break
                if text[j] != "\n":
                    out[j] = " "
                j += 1
            i = j + 1
        elif ch in ('"', "`"):
            j = i + 1
            while j < n and text[j] != ch:
                j += 1
            i = j + 1
        elif ch == "-" and i + 1 < n and text[i + 1] == "-":
            while i < n and text[i] != "\n":
                out[i] = " "
                i += 1
        elif ch == "/" and i + 1 < n and text[i + 1] == "*":
            depth = 0
            while i < n:
                if text[i] == "/" and i + 1 < n and text[i + 1] == "*":
                    depth += 1
                    out[i] = out[i + 1] = " "
                    i += 2
                elif text[i] == "*" and i + 1 < n and text[i + 1] == "/":
                    depth -= 1
                    out[i] = out[i + 1] = " "
                    i += 2
                    if depth == 0:
                        break
                else:
                    if text[i] != "\n":
                        out[i] = " "
                    i += 1
        else:
            i += 1
    return "".join(out)


def _strip_sql_strings(text: str) -> str:
    """Blank out single-quoted literals (with '' escaping) AND SQL
    comments so keyword probes can't false-positive on either. Not
    length-preserving (literals collapse to ``''``) — positional
    probes use _blank_sql_strings instead."""
    return re.sub(r"'[^']*'", "''", _blank_sql_noise(text))


def _balanced_end(text: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at ``open_idx`` (on blanked
    text — literals cannot unbalance the scan); -1 if unbalanced."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


_STAR_EXCLUDE_RE = re.compile(r"\*\s*(EXCLUDE)\b", re.I)
_SUGAR_KEYWORDS = {
    "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
    "UNION", "EXCEPT", "INTERSECT", "QUALIFY", "WINDOW", "FETCH", "AS",
}


def rewrite_star_exclude(query: str) -> str:
    """DuckDB/Snowflake's ``SELECT * EXCLUDE (a, b)`` (also the
    paren-less single-column form) → Spark's native ``* EXCEPT (…)``.
    Purely textual: only a ``*`` in PROJECTION position (preceded by
    SELECT/DISTINCT, ``,``, ``(`` or an ``alias.`` qualifier) triggers;
    ``a * exclude_col`` stays multiplication. Probes run on blanked
    text so literals can't trigger (the rewrite_distinct_on rule)."""
    blanked = _blank_sql_strings(query)
    out = query
    for m in reversed(list(_STAR_EXCLUDE_RE.finditer(blanked))):
        star = m.start()
        j = star - 1
        while j >= 0 and blanked[j].isspace():
            j -= 1
        prev_word = re.search(r"(\w+)\s*$", blanked[: j + 1])
        projection = (
            j < 0
            or blanked[j] in ",(."
            or (
                prev_word is not None
                and prev_word.group(1).upper() in ("SELECT", "DISTINCT")
            )
        )
        if not projection:
            continue
        kw_start, kw_end = m.start(1), m.end(1)
        rest = blanked[kw_end:]
        paren = re.match(r"\s*\(", rest)
        if paren:
            out = out[:kw_start] + "EXCEPT" + out[kw_end:]
            continue
        ident = re.match(r"\s+(`[^`]+`|[A-Za-z_][\w.]*)", rest)
        if not ident or ident.group(1).upper() in _SUGAR_KEYWORDS:
            raise ValueError(
                "EXCLUDE must be followed by a column list: "
                "* EXCLUDE (col, …) or * EXCLUDE col"
            )
        col = query[kw_end + ident.start(1) : kw_end + ident.end(1)]
        out = out[:kw_start] + f"EXCEPT ({col})" + out[kw_end + ident.end(1):]
    return out


_FETCH_RE = re.compile(
    r"\bFETCH\s+(?:FIRST|NEXT)\s+(\d+\s+)?ROWS?\s+"
    r"(ONLY|WITH\s+TIES)\s*;?\s*$",
    re.I,
)

_TIES_IDENT_RE = re.compile(
    r"^(?:[A-Za-z_]\w*|`[^`]+`)(?:\s*\.\s*(?:[A-Za-z_]\w*|`[^`]+`))*$"
)
_TIES_EXPR_KEYWORDS = {
    "AND", "OR", "NOT", "CASE", "WHEN", "THEN", "ELSE", "END", "NULL",
    "TRUE", "FALSE", "IS", "IN", "LIKE", "BETWEEN", "CAST", "AS",
    "INTERVAL", "DISTINCT", "FROM", "OVER", "DOUBLE", "INT", "BIGINT",
    "STRING", "DATE", "TIMESTAMP", "DECIMAL", "BOOLEAN", "FLOAT",
}


def _ties_select_items(body: str) -> list[str] | None:
    """Top-level select-list items of ``body`` (the first depth-0
    SELECT — a leading WITH clause keeps its CTE bodies inside parens,
    so the scan lands on the main query; a top-level set operation's
    FIRST branch names the output columns, which is the correct branch
    to check). None when the list can't be located textually."""
    blanked = _blank_sql_strings(body)
    depth, sel_end = 0, -1
    for m in re.finditer(r"[()]|\bSELECT\b", blanked, re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            sel_end = m.end()
            break
    if sel_end < 0:
        return None
    head, _ = _split_top_level(blanked[sel_end:], "FROM")
    head = re.sub(r"^\s*(DISTINCT|ALL)\b", "", head, flags=re.I)
    return _split_top_commas(head)


def _ties_outer_key(body: str, key: str) -> str:
    """The spelling of the WITH TIES ORDER BY key valid AGAINST the
    ``__wt_src`` CTE (whose columns are the body's projection): a
    qualified identifier drops its qualifier, an expression matching
    an aliased select item becomes the alias. Raises the explanatory
    ValueError (same pattern as the multi-key/OFFSET refusals) when
    the key is not derivable from the projected columns — previously
    a confusing downstream unresolved-column failure (ADVICE r13)."""
    refusal = ValueError(
        "FETCH … WITH TIES requires the ORDER BY key to be available "
        "from the query's projected columns — project the key (or "
        "alias the expression) in the select list"
    )
    blanked_key = _blank_sql_strings(key).strip()
    norm = lambda s: re.sub(r"\s+", " ", s).strip().lower()  # noqa: E731
    unq = lambda s: s.strip().strip("`").lower()  # noqa: E731
    items = _ties_select_items(body)
    if items is None:
        # unlocatable select list: permissive fallback (Spark's own
        # analyzer reports any genuinely unresolved column)
        return key
    # star forms: *, alias.*, and * EXCEPT/EXCLUDE (cols) — the except
    # list REMOVES columns from the projection, so a key named there
    # is not available downstream
    has_star, starred_out = False, set()
    for it in items:
        sm = re.match(
            r"(?:\w+\s*\.\s*)?\*\s*(?:(?:EXCEPT|EXCLUDE)\s*\(([^)]*)\))?\s*$",
            it,
            re.I,
        )
        if sm:
            has_star = True
            if sm.group(1):
                starred_out |= {unq(c) for c in sm.group(1).split(",")}
    exposed: set[str] = set()
    aliased: list[tuple[str, str]] = []  # (normalized expr, alias)
    for it in items:
        # explicit AS first — a greedy single pattern would swallow the
        # AS into the expression group and break verbatim alias matching
        # the implicit-alias fallback requires the expression to END in
        # an identifier/paren/literal character — otherwise a binary
        # operator's bare right operand ("a - b", "p || q") would be
        # misparsed as an alias of the truncated expression
        am = re.match(
            r"(.*\S)\s+AS\s+([A-Za-z_]\w*|`[^`]+`)\s*$", it, re.I | re.S
        ) or re.match(
            r"(.*[\w)\]`'\"])\s+([A-Za-z_]\w*|`[^`]+`)\s*$", it, re.I | re.S
        )
        if am and am.group(2).upper() not in _TIES_EXPR_KEYWORDS and not (
            _TIES_IDENT_RE.match(it)  # a bare (dotted) identifier has no alias
        ):
            exposed.add(unq(am.group(2)))
            aliased.append((norm(am.group(1)), am.group(2)))
        elif _TIES_IDENT_RE.match(it):
            exposed.add(unq(re.split(r"\s*\.\s*", it)[-1]))
    if _TIES_IDENT_RE.match(blanked_key):
        # identifier key: unqualify (the CTE's output column carries
        # only the last component) and require it projected
        parts = re.split(r"\s*\.\s*", key.strip())
        tail = unq(parts[-1])
        if len(parts) > 1:
            # a QUALIFIED key must not silently bind to a select-list
            # alias of a DIFFERENT expression once its qualifier drops
            # (`SELECT b AS a … ORDER BY o.a` — the CTE exposes alias
            # a = column b, not o's column a): refuse loudly instead
            # of returning a different top-n row set
            for expr_n, alias in aliased:
                if unq(alias) == tail and expr_n not in (
                    norm(blanked_key),
                    tail,
                ):
                    raise ValueError(
                        "FETCH … WITH TIES cannot order by the "
                        f"qualified key {key.strip()!r}: dropping its "
                        f"qualifier collides with the select-list "
                        f"alias {alias!r} of a different expression — "
                        "project the source column or rename the alias"
                    )
        if tail in exposed or (has_star and tail not in starred_out):
            return parts[-1]
        raise refusal
    # expression key: an aliased verbatim match orders by the alias
    for expr_n, alias in aliased:
        if expr_n == norm(blanked_key):
            return alias
    if has_star:
        return key
    # recomputable iff every referenced column is projected; qualified
    # refs inside the expression can never resolve against the CTE
    if re.search(r"[A-Za-z_]\w*\s*\.\s*[A-Za-z_`]", blanked_key):
        raise refusal
    for tm in re.finditer(r"\b([A-Za-z_]\w*)\b(\s*\()?", blanked_key):
        if tm.group(2):
            continue  # function call
        tok = tm.group(1)
        if tok.upper() in _TIES_EXPR_KEYWORDS or tok.lower() in exposed:
            continue
        raise refusal
    return key


def rewrite_fetch_first(query: str) -> tuple[str, bool]:
    """SQL-standard ``FETCH FIRST n ROWS ONLY`` → ``LIMIT n`` (Spark
    has no FETCH grammar), and ``FETCH FIRST n ROWS WITH TIES`` → the
    scale-safe two-pass plan: the n-th key via ORDER BY … LIMIT n
    (TakeOrderedAndProject — never a global rank window, the plan-gate
    rule) then ONE filter at that threshold. WITH TIES requires a
    single-key top-level ORDER BY (ASC/DESC, no NULLS override) whose
    key is a projected column; NULL keys sort last and never tie.
    Returns (rewritten, changed)."""
    blanked = _blank_sql_strings(query)
    m = _FETCH_RE.search(blanked)
    if m is None:
        return query, False
    n = int(m.group(1) or 1)
    if m.group(2).upper() == "ONLY":
        body = query[: m.start()].rstrip()
        # ISO pagination puts OFFSET m ROWS *before* FETCH; Spark only
        # parses LIMIT n OFFSET m, so lift a trailing standard OFFSET
        # into that spelling instead of emitting unparseable text
        om = re.search(
            r"\bOFFSET\s+(\d+)\s+ROWS?\s*$",
            _blank_sql_strings(body),
            re.I,
        )
        if om:
            return (
                body[: om.start()].rstrip()
                + f" LIMIT {n} OFFSET {om.group(1)}",
                True,
            )
        return body + f" LIMIT {n}", True
    # WITH TIES: locate the top-level ORDER BY feeding the fetch
    depth = 0
    ob_start = -1
    for om in re.finditer(r"[()]|\bORDER\s+BY\b", blanked[: m.start()], re.I):
        tok = om.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            ob_start = om.start()
    if ob_start < 0:
        raise ValueError("FETCH … WITH TIES requires a top-level ORDER BY")
    order_items = blanked[ob_start:m.start()]
    body = query[:ob_start].rstrip()
    items = re.sub(r"^\s*ORDER\s+BY\s*", "", order_items, flags=re.I)
    # depth-aware comma scan (ADVICE r13): a single key containing
    # commas inside parens — coalesce(a, b) — is one key, not multi-key
    if len(_split_top_commas(items)) > 1 or re.search(r"\bNULLS\b", items, re.I):
        raise ValueError(
            "FETCH … WITH TIES supports a single ORDER BY key without a "
            "NULLS override — rewrite multi-key ties as QUALIFY rank()"
        )
    if re.search(r"\bOFFSET\b", items, re.I):
        raise ValueError(
            "FETCH … WITH TIES cannot combine with OFFSET — apply the "
            "offset in an outer query over the tied result"
        )
    # whitespace REQUIRED before the direction keyword, or an
    # identifier ending in asc/desc ('salesasc') would be silently
    # truncated to a different column
    km = re.match(r"\s*(.*?)(?:\s+(ASC|DESC))?\s*$", items, re.I | re.S)
    prefix_len = len(order_items) - len(items)
    key = query[
        ob_start + prefix_len + km.start(1) : ob_start + prefix_len + km.end(1)
    ].strip()
    desc = (km.group(2) or "ASC").upper() == "DESC"
    direction = "DESC NULLS LAST" if desc else "ASC NULLS LAST"
    agg = "min" if desc else "max"
    cmp_op = ">=" if desc else "<="
    # every reference below runs AGAINST the __wt_src CTE, so the key
    # must be respelled for the body's projection (qualifier dropped,
    # aliased expression → alias) — or refused explanatorily when the
    # projection can't supply it (ADVICE r13)
    key = _ties_outer_key(body, key)
    # NULL keys sort LAST; when the top-n reaches into them (n exceeds
    # the non-null count, or every key is NULL) the NULL rows all tie
    # at the boundary rank, so rank() <= n admits them — the second
    # disjunct admits the NULL-key rows exactly then, keeping the
    # rewrite ≡ rank() <= n on every input (the first disjunct alone
    # would drop them: NULL comparisons are never true). A NULL is in
    # the NULLS-LAST top-n iff FEWER THAN n non-null keys exist, so
    # the probe is an early-exit LocalLimit count — no second sorted
    # pass over the source.
    topn = (
        f"SELECT {key} AS __wt_k FROM __wt_src "
        f"ORDER BY {key} {direction} LIMIT {n}"
    )
    nn_probe = (
        f"(SELECT count(1) FROM (SELECT 1 AS __wt_one FROM __wt_src "
        f"WHERE {key} IS NOT NULL LIMIT {n}) __wt_c) < {n}"
    )
    rewritten = (
        f"WITH __wt_src AS ({body}) SELECT * FROM __wt_src "
        f"WHERE {key} {cmp_op} (SELECT {agg}(__wt_k) FROM ({topn}) __wt_t) "
        f"OR ({key} IS NULL AND {nn_probe}) "
        f"ORDER BY {key} {direction}"
    )
    return rewritten, True


_QUANT_RE = re.compile(
    r"(>=|<=|<>|!=|>|<|=)\s*(ALL|ANY|SOME)\s*\(", re.I
)
_QUANT_LHS_RE = re.compile(
    r"(`[^`]+`|[A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*|\.`[^`]+`)*|"
    r"\d+(?:\.\d+)?|'\s*')\s*$"
)


def rewrite_quantified_subqueries(query: str) -> str:
    """SQL-standard quantified comparisons — ``x > ALL (SELECT …)``,
    ``x <= ANY/SOME (…)`` — which Spark's parser lacks. ``= ANY`` →
    ``IN``, ``<> ALL`` → ``NOT IN`` (identical NULL semantics by
    definition); the inequality forms become a CASE over three scalar
    subqueries (COUNT, the relevant non-NULL extreme via ORDER BY 1 …
    LIMIT 1, and a NULLS FIRST probe for NULL elements) that
    reproduces the standard's empty-set and NULL truth table exactly
    (brute-verified against DuckDB's native ALL/ANY in
    tests/test_sql_sugar.py). The LHS must be a column reference or
    literal (raise loudly otherwise); the subquery text is inlined up
    to three times — Spark dedups nothing here, so quantified probes
    over a large relation cost up to 3 bounded aggregate scans (each
    is a COUNT or a 1-row TakeOrderedAndProject — no global windows)."""
    while True:
        blanked = _blank_sql_strings(query)
        matches = list(_QUANT_RE.finditer(blanked))
        target = None
        for m in reversed(matches):
            open_idx = m.end() - 1
            close = _balanced_end(blanked, open_idx)
            if close < 0:
                raise ValueError("Unbalanced quantified subquery")
            head = blanked[open_idx + 1 : close].lstrip().upper()
            if head.startswith(("SELECT", "WITH", "VALUES")):
                target = (m, open_idx, close)
                break
        if target is None:
            return query
        m, open_idx, close = target
        op = {"!=": "<>"}.get(m.group(1), m.group(1))
        quant = m.group(2).upper()
        sq = query[open_idx + 1 : close]
        lhs_m = _QUANT_LHS_RE.search(blanked[: m.start()])
        if lhs_m is None:
            raise ValueError(
                f"Quantified {quant} supports a column or literal on "
                f"the left-hand side only (got …{query[max(0, m.start()-20):m.start()]!r})"
            )
        lhs = query[lhs_m.start(1) : lhs_m.end(1)]
        span_start = lhs_m.start(1)
        if quant == "SOME":
            quant = "ANY"
        if (op == "=" and quant == "ANY") or (op == "<>" and quant == "ALL"):
            # membership forms: IN decides the DEFINITE branch (a
            # non-NULL match is TRUE regardless of NULL elements), but
            # Spark's IN-subquery in PROJECTION position is not
            # null-aware (2 IN (1, NULL) evaluates FALSE, the standard
            # says UNKNOWN) — the CASE restores the standard's NULL
            # truth table in every context
            cnt = f"(SELECT COUNT(*) FROM ({sq}) __qt_c)"
            # probes order by the ALIASED column (AS __qt_n(__qt_v)) —
            # never ORDER BY 1, which silently becomes a constant sort
            # if a session disables spark.sql.orderByOrdinal (ADVICE r13)
            has_null = (
                f"(SELECT __qt_v FROM ({sq}) AS __qt_n(__qt_v) "
                f"ORDER BY __qt_v ASC NULLS FIRST LIMIT 1) IS NULL"
            )
            null_b = "CAST(NULL AS BOOLEAN)"
            hit, miss = ("TRUE", "FALSE") if op == "=" else ("FALSE", "TRUE")
            repl = (
                f"(CASE WHEN {cnt} = 0 THEN {miss} "
                f"WHEN {lhs} IN ({sq}) THEN {hit} "
                f"WHEN {lhs} IS NULL THEN {null_b} "
                f"WHEN {has_null} THEN {null_b} "
                f"ELSE {miss} END)"
            )
        else:
            cnt = f"(SELECT COUNT(*) FROM ({sq}) __qt_c)"
            # extreme/NULL probes order by the ALIASED column — never
            # ORDER BY 1, which becomes a constant sort (arbitrary row)
            # if a session disables spark.sql.orderByOrdinal (ADVICE r13)
            mx = (
                f"(SELECT __qt_v FROM ({sq}) AS __qt_x(__qt_v) "
                f"ORDER BY __qt_v DESC NULLS LAST LIMIT 1)"
            )
            mn = (
                f"(SELECT __qt_v FROM ({sq}) AS __qt_x(__qt_v) "
                f"ORDER BY __qt_v ASC NULLS LAST LIMIT 1)"
            )
            has_null = (
                f"(SELECT __qt_v FROM ({sq}) AS __qt_n(__qt_v) "
                f"ORDER BY __qt_v ASC NULLS FIRST LIMIT 1) IS NULL"
            )
            null_b = "CAST(NULL AS BOOLEAN)"
            if quant == "ALL":
                if op == "=":
                    repl = (
                        f"(CASE WHEN {cnt} = 0 THEN TRUE "
                        f"WHEN NOT ({lhs} = {mx}) THEN FALSE "
                        f"WHEN NOT ({lhs} = {mn}) THEN FALSE "
                        f"WHEN {lhs} IS NULL THEN {null_b} "
                        f"WHEN {has_null} THEN {null_b} "
                        f"ELSE TRUE END)"
                    )
                else:
                    ext = mx if op in (">", ">=") else mn
                    repl = (
                        f"(CASE WHEN {cnt} = 0 THEN TRUE "
                        f"WHEN NOT ({lhs} {op} {ext}) THEN FALSE "
                        f"WHEN {lhs} IS NULL THEN {null_b} "
                        f"WHEN {has_null} THEN {null_b} "
                        f"ELSE TRUE END)"
                    )
            else:  # ANY
                if op == "<>":
                    repl = (
                        f"(CASE WHEN {cnt} = 0 THEN FALSE "
                        f"WHEN {lhs} <> {mx} THEN TRUE "
                        f"WHEN {lhs} <> {mn} THEN TRUE "
                        f"WHEN {lhs} IS NULL THEN {null_b} "
                        f"WHEN {has_null} THEN {null_b} "
                        f"ELSE FALSE END)"
                    )
                else:
                    ext = mn if op in (">", ">=") else mx
                    repl = (
                        f"(CASE WHEN {cnt} = 0 THEN FALSE "
                        f"WHEN {lhs} {op} {ext} THEN TRUE "
                        f"WHEN {lhs} IS NULL THEN {null_b} "
                        f"WHEN {has_null} THEN {null_b} "
                        f"ELSE FALSE END)"
                    )
        query = query[:span_start] + repl + query[close + 1 :]


def rewrite_text_sugar(query: str) -> tuple[str, bool]:
    """The purely TEXTUAL SQL-sugar pass shared by both surfaces
    (producer frontend + SecureSession): ``* EXCLUDE`` → ``* EXCEPT``,
    ``FETCH FIRST … ONLY/WITH TIES``, and quantified ``ALL/ANY/SOME``
    subqueries. Unlike QUALIFY/DISTINCT ON these rewrites add no
    helper columns, so there is nothing to drop afterwards. Returns
    (rewritten, changed)."""
    probe = _strip_sql_strings(query)
    out = query
    if re.search(r"\bEXCLUDE\b", probe, re.I):
        out = rewrite_star_exclude(out)
    if re.search(r"\bFETCH\b", probe, re.I):
        out, _ = rewrite_fetch_first(out)
    if re.search(r"\b(ALL|ANY|SOME)\s*\(", _strip_sql_strings(out), re.I):
        out = rewrite_quantified_subqueries(out)
    return out, out != query


def _blank_sql_strings(text: str) -> str:
    """Like _strip_sql_strings but LENGTH-PRESERVING (literal contents
    and comments become spaces): match indices computed on the blanked
    text stay valid against the raw statement — required by probes
    that slice the original query at a match position
    (rewrite_distinct_on, rewrite_fetch_first, the quantifier scan)."""
    return _blank_sql_noise(text)


_SQL_KEYWORDS = {
    "FROM", "JOIN", "WHERE", "ON", "AND", "OR", "SELECT", "USING", "AS",
    "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "UNION", "ALL", "BY",
}

_ASOF_RE = re.compile(
    r"(?<![\w.`])(`?[\w.]+`?)(?:\s+(?:AS\s+)?(?!ASOF\b)(\w+))?"
    r"\s+ASOF\s+(LEFT\s+)?JOIN\s+"
    r"(`?[\w.]+`?)(?:\s+(?:AS\s+)?(\w+))?\s+ON\b",
    re.I,
)
_ASOF_STOP = (
    "WHERE",
    "GROUP",
    "HAVING",
    "WINDOW",
    "QUALIFY",
    "ORDER",
    "LIMIT",
    "OFFSET",
    "UNION",
    "EXCEPT",
    "INTERSECT",
    "JOIN",
    "LEFT",
    "RIGHT",
    "FULL",
    "INNER",
    "CROSS",
    "ASOF",
)


def _asof_condition_end(text: str, start: int) -> int:
    """End index (exclusive) of the ON condition beginning at ``start``:
    the first top-level clause keyword or unmatched ')'."""
    depth, in_str = 0, None
    i, n = start, len(text)
    while i < n:
        ch = text[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"', "`"):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return i
        elif depth == 0 and (ch.isalpha()) and (
            i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
        ):
            m = re.match(r"[A-Za-z_]+", text[i:])
            word = m.group(0).upper()
            if word in _ASOF_STOP:
                return i
            i += len(word)
            continue
        i += 1
    return n


def parse_asof_condition(cond: str, laliases: set, raliases: set):
    """Split an ASOF ON condition into equi-key pairs and THE single
    as-of inequality. Returns (on_pairs, left_ts, right_ts, op) with
    every referenced column unqualified. Conjuncts must each be
    ``x.col OP y.col`` with exactly one side per relation."""
    on: list[tuple[str, str]] = []
    ineq = None
    for term in _split_top_and(cond):
        m = re.match(
            r"\s*(\w+)\.`?(\w+)`?\s*(=|>=|<=|>|<)\s*(\w+)\.`?(\w+)`?\s*$",
            term,
        )
        if not m:
            raise ValueError(
                f"Cannot parse ASOF JOIN condition term: {term!r} "
                "(supported: alias.col OP alias.col AND …)"
            )
        q1, c1, op, q2, c2 = m.groups()
        if q1.lower() in laliases and q2.lower() in raliases:
            lcol, rcol = c1, c2
        elif q1.lower() in raliases and q2.lower() in laliases:
            lcol, rcol = c2, c1
            op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}.get(op, op)
        else:
            raise ValueError(
                f"ASOF JOIN term {term!r} must compare the two joined "
                "relations"
            )
        if op == "=":
            on.append((lcol, rcol))
        elif ineq is not None:
            raise ValueError("ASOF JOIN takes exactly one inequality")
        else:
            ineq = (lcol, rcol, op)
    if ineq is None:
        raise ValueError("ASOF JOIN requires one inequality condition")
    return on, ineq[0], ineq[1], ineq[2]


def rewrite_asof_joins(query: str, resolve) -> str:
    """Rewrite every ``l [a] ASOF [LEFT] JOIN r [b] ON <cond>``
    (DuckDB's as-of SQL — Spark has no ASOF grammar) into a
    materialized union+window as-of view (temporal.asof_join_frames)
    substituted as a plain relation, with the two aliases' qualifiers
    stripped (the joined view is flat; the sides' column names are
    disjoint by asof_join_frames' contract).

    ``resolve(name) -> DataFrame | None`` supplies each side's frame —
    None means "not a registered relation" (subquery sides are
    unsupported and fail loudly). A policy-mediated caller passes a
    resolver that vends SECURED frames and raises its own denial for
    relations the principal may not read (SecureSession: the rewrite
    reads frames directly, so the resolver IS the fence). The as-of
    views register in the resolved frames' own session catalog."""
    if not re.search(r"\bASOF\b", _strip_sql_strings(query), re.I):
        return query
    from sample_emr_on_eks_fgac_iceberg_spark.operators.temporal import (
        asof_join_frames,
    )

    count = 0
    while True:
        m = _ASOF_RE.search(query)
        if not m:
            break
        rel1, a1, left_kw, rel2, a2 = m.groups()
        seg_start = m.start(1)
        rel1, rel2 = rel1.strip("`"), rel2.strip("`")
        if rel1.upper() in _SQL_KEYWORDS and a1:
            # the relation pattern swallowed the preceding FROM/JOIN
            # keyword; the "alias" is the real (alias-less) relation
            seg_start = m.start(2)
            rel1, a1 = a1, None
        frames = []
        for rel, side in ((rel1, "left"), (rel2, "right")):
            frame = resolve(rel)
            if frame is None:
                raise ValueError(
                    f"ASOF JOIN {side} relation {rel!r} is not a "
                    "registered table/view (subquery sides are not "
                    "supported)"
                )
            frames.append(frame)
        cond_end = _asof_condition_end(query, m.end())
        on, lts, rts, op = parse_asof_condition(
            query[m.end() : cond_end],
            {x.lower() for x in (a1, rel1) if x},
            {x.lower() for x in (a2, rel2) if x},
        )
        joined = asof_join_frames(
            frames[0], frames[1], on, lts, rts, op,
            how="left" if left_kw else "inner",
        )
        view = f"__asof_{count}"
        count += 1
        joined.createOrReplaceTempView(view)
        query = query[:seg_start] + f"`{view}`" + query[cond_end:]
        for alias in {a1 or rel1, a2 or rel2}:
            # The qualifier strip below runs over the WHOLE remaining
            # statement (qualified references to the as-of columns
            # legitimately appear in the select list, WHERE, GROUP BY
            # …). If the SAME identifier is ALSO introduced as a
            # relation elsewhere — a second join or subquery reusing
            # the alias, or a table whose name equals it — the strip
            # would corrupt that relation's qualifiers; detect the
            # reuse on the post-substitution text and refuse loudly
            # (ADVICE r12).
            stripped = _strip_sql_strings(query)
            named = re.compile(
                rf"\b(?:FROM|JOIN)\s+(?:`?[\w.]+`?\s+(?:AS\s+)?)?"
                rf"`?{re.escape(alias)}`?(?![\w.])",
                re.I,
            )
            # the `(subquery) alias` form only introduces a relation
            # inside a FROM clause — scan from the first TOP-LEVEL
            # FROM onward so a parenthesized select-list expression
            # aliased to the same name (`(price * 2) a, …`) does not
            # trigger a spurious refusal
            depth, from_at = 0, len(stripped)
            for tm in re.finditer(r"[()]|\bFROM\b", stripped, re.I):
                t = tm.group(0)
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth -= 1
                elif depth == 0:
                    from_at = tm.start()
                    break
            paren = re.compile(
                rf"\)\s*(?:AS\s+)?`?{re.escape(alias)}`?(?![\w.])", re.I
            )
            if named.search(stripped) or paren.search(stripped[from_at:]):
                raise ValueError(
                    f"ASOF JOIN alias {alias!r} is reused as a relation "
                    "name/alias elsewhere in the statement — rename one "
                    "of them (the as-of rewrite strips this qualifier "
                    "statement-wide)"
                )
            query = _sub_outside_strings(
                rf"(?<![\w.`])`?{re.escape(alias)}`?\s*\.", "", query,
                flags=re.I,
            )
    if re.search(r"\bASOF\b", _strip_sql_strings(query), re.I):
        raise ValueError(
            "Unsupported ASOF JOIN shape — supported: "
            "table [alias] ASOF [LEFT] JOIN table [alias] ON "
            "equi-keys AND one ts inequality"
        )
    return query


def spj_candidate_tables(query: str, tables, layout_of) -> set:
    """Tables this query joins on their own ``bucket[N]`` keys with
    matching N — the storage-partitioned-join preconditions
    (VERDICT r11 missing #1). Registering these through their
    bucketed mirrors (instead of plain scans) lets Catalyst plan
    the SQL join with ZERO Exchange below it, transparently — the
    way the reference's Spark + Iceberg SparkCatalog pairing does
    (consumer_emr_on_eks_setup.sh:440-449): a user writing SQL
    never calls a special method. The check is deliberately
    conservative: a missed candidate falls back to the plain
    shuffled join (correct, just slower); mirrors are semantically
    identical to the plain scan, so a false positive costs only
    the one-time per-snapshot mirror materialization."""
    if not re.search(r"\bJOIN\b", query, re.I):
        return set()
    layouts = {}
    for name in tables:
        if not re.search(
            rf"(?<![\w.`]){re.escape(name)}(?![\w.])", query
        ):
            continue
        bl = layout_of(name)
        if bl is not None:
            layouts[name] = bl
    out: set = set()
    names = sorted(layouts)
    for i, a in enumerate(names):
        ka, na = layouts[a]
        for b in names[i:]:
            kb, nb = layouts[b]
            if na != nb:
                continue
            def _key(k: str) -> str:
                # whole-identifier match, optionally alias-qualified
                return rf"(?:[\w]+\.)?`?\b{re.escape(k)}\b`?"

            pat = (
                rf"{_key(ka)}\s*=\s*{_key(kb)}"
                rf"|{_key(kb)}\s*=\s*{_key(ka)}"
            )
            if re.search(pat, query, re.I):
                out.add(a)
                out.add(b)
    return out


class SqlFrontend:
    """Dispatches SQL statements onto a Warehouse."""

    def __init__(self, spark: SparkSession, warehouse: Warehouse, policy=None):
        self.spark = spark
        self.warehouse = warehouse
        self.policy = policy  # PolicyStore for GRANT/REVOKE statements
        # CALL system.create_changelog_view registrations: view name →
        # read_changes kwargs. Materialized lazily into each _query's
        # scratch session (a stored temp view would not survive the
        # per-query newSession isolation), so the view always reflects
        # the CURRENT snapshot range semantics of its registration.
        self._changelog_views: dict[str, dict] = {}
        # SQL-defined scalar functions (Spark 4 `CREATE FUNCTION …
        # RETURN expr`): name → normalized DDL. Replayed into each
        # _query scratch session (like changelog views) AND registered
        # on the primary session so DML predicates/assignments resolve
        # them through F.expr.
        self._sql_functions: dict[str, str] = {}
        # The frontend executes consumer-delegated DML on behalf of
        # SecureSession principals; path relations (``parquet.`/p```)
        # are never a legitimate spelling here — every source the
        # frontend needs is registered as a view. Leaving Spark's
        # default runSQLOnFiles=true would let a statement that slips
        # past the consumer-side relation authorization read arbitrary
        # warehouse files on this trusted session (round-3 verdict's
        # glob-path exfiltration).
        self.spark.conf.set("spark.sql.runSQLOnFiles", "false")

    def execute(self, query: str) -> DataFrame | None:
        m = _EXPLAIN_RE.match(query)
        if m:
            return self._explain((m.group(1) or "simple").strip().lower(), m.group(2))
        m = _CREATE_SQL_FUNC_RE.match(query)
        if m:
            replace, name = bool(m.group(1)), m.group(3)
            if not m.group(2):
                # fail loud, not silently session-scoped: a persistent
                # (catalog) SQL function outlives the session, which
                # this frontend's dict-backed registry cannot honor —
                # quietly downgrading it would drop the function on the
                # next session (ADVICE r11)
                raise ValueError(
                    "persistent CREATE FUNCTION is not supported — this "
                    "frontend registers session-scoped functions only; "
                    "spell it CREATE [OR REPLACE] TEMPORARY FUNCTION"
                )
            if not replace and name in self._sql_functions:
                raise ValueError(f"Function '{name}' already exists")
            ddl = (
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}"
                f"({m.group(4)}) RETURNS {m.group(5)} RETURN {m.group(6)}"
            )
            # validate + register on the primary session NOW (DML
            # predicate resolution); scratch sessions replay from the
            # stored DDL per query
            self.spark.sql(ddl)
            self._sql_functions[name] = ddl
            return None
        m = _DROP_SQL_FUNC_RE.match(query)
        if m:
            name, if_exists = m.group(2), bool(m.group(1))
            if name not in self._sql_functions:
                if if_exists:
                    return None
                raise ValueError(f"Unknown function '{name}'")
            del self._sql_functions[name]
            self.spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
            return None
        m = _CREATE_VIEW_RE.match(query)
        if m:
            replace, name = bool(m.group(1)), m.group(2)
            body = m.group(3).rstrip().rstrip(";")
            # A view body is a QUERY, never a statement: _query hands
            # the body to spark.sql, which EXECUTES DDL/DML eagerly —
            # a `CREATE VIEW v AS INSERT INTO t …` body would run its
            # side effect at validation and then again on every read.
            # Reject non-query shapes (textual allowlist + Spark's own
            # parsed-plan write classifier for CTE-smuggled DML) before
            # anything touches an executor (ADVICE r12).
            from sample_emr_on_eks_fgac_iceberg_spark.policy import (
                parsed_write_class,
            )

            if not re.match(
                r"\s*(\(|(SELECT|WITH|VALUES|TABLE)\b)", body, re.I
            ) or parsed_write_class(self.spark, body) is not None:
                raise ValueError(
                    f"View body must be a query (SELECT/WITH/VALUES/"
                    f"TABLE), got: {body[:60]!r}"
                )
            # validate NOW (plan only, nothing executes): syntax,
            # missing relations, and view-cycle checks all surface at
            # CREATE time instead of first read
            if not replace and self.warehouse.view_exists(name):
                raise ValueError(f"View '{name}' already exists")
            self._query(body)
            self.warehouse.create_view(name, body, replace=replace)
            return None
        m = _DROP_VIEW_RE.match(query)
        if m:
            self.warehouse.drop_view(m.group(2), if_exists=bool(m.group(1)))
            return None
        if _SHOW_VIEWS_RE.match(query):
            rows = []
            for v in self.warehouse.list_views():
                doc = self.warehouse.view_doc(v)
                rows.append(
                    (v, doc["current-version-id"], len(doc["versions"]))
                )
            return self.spark.createDataFrame(
                rows, "view_name string, current_version long, versions long"
            )
        m = _SHOW_VIEW_VERSIONS_RE.match(query)
        if m:
            rows = [
                (
                    v["version-id"],
                    v["timestamp-ms"],
                    v["is_current"],
                    v["sql"],
                )
                for v in self.warehouse.view_versions(m.group(1))
            ]
            return self.spark.createDataFrame(
                rows,
                "version_id long, timestamp_ms long, is_current boolean, "
                "view_sql string",
            )
        m = _SHOW_CREATE_VIEW_RE.match(query)
        if m:
            vid = int(m.group(2)) if m.group(2) else None
            sql = self.warehouse.view_sql(m.group(1), version_id=vid)
            return self.spark.createDataFrame(
                [(f"CREATE VIEW {m.group(1)} AS {sql}",)],
                "createview_stmt string",
            )
        m = _CREATE_LIKE_RE.match(query)
        if m:
            if_not_exists, new, src = bool(m.group(1)), m.group(2), m.group(3)
            if self.warehouse.table_exists(new):
                if if_not_exists:
                    return None
                raise ValueError(f"Table '{new}' already exists")
            src_meta = self.warehouse._read_meta(src)
            if src_meta.link_to:  # LIKE a resource link clones the TARGET
                src_meta = self.warehouse._read_meta(src_meta.link_to)
            self.warehouse.create_table(
                new,
                src_meta.schema,
                partition_by=list(src_meta.partition_by),
                properties=dict(src_meta.properties),
            )
            return None
        m = _CTAS_RE.match(query)
        if m:
            return self._ctas(m)
        m = _CREATE_RE.match(query)
        if m:
            return self._create(query, m)
        m = _INSERT_OVERWRITE_RE.match(query)
        if m:
            name, tail = m.group(1), m.group(2).strip()
            if tail.upper().startswith("VALUES"):
                src = self.spark.sql(f"SELECT * FROM {tail}")
                schema = self.warehouse.schema_of(name)
                src = src.toDF(*[f.name for f in schema.fields[: len(src.columns)]])
            else:
                src = self._query(tail)
            stats = self.warehouse.insert_overwrite(name, src)
            return self.spark.createDataFrame(
                [(stats["added_files"], stats["replaced_files"])],
                "added_files long, replaced_files long",
            )
        m = _INSERT_RE.match(query)
        if m:
            return self._insert(m.group(1), m.group(2), m.group(3))
        m = _INSERT_SELECT_RE.match(query)
        if m:
            src = self._query(m.group(3))
            if m.group(2):
                src = self._align_to_column_list(m.group(1), m.group(2), src)
            self.warehouse.insert_into(m.group(1), src)
            return None
        # CTE-prefixed DML: `WITH … INSERT INTO t SELECT …` parses to a
        # write wrapped in UnresolvedWith. The INSERT form is supported
        # (lift the clause out, evaluate the remaining WITH…SELECT on
        # the read path, append); other CTE-wrapped writes refuse with
        # a clear error instead of reaching the eagerly-executing read
        # fallthrough.
        if _CTE_START_RE.match(query):
            from sample_emr_on_eks_fgac_iceberg_spark.policy import (
                parsed_write_class,
            )

            wcls = parsed_write_class(self.spark, query)
            if wcls == "InsertIntoStatement":
                split = _split_cte_insert(query)
                if split is not None:
                    target, cols, read_part = split
                    src = self._query(read_part)
                    if cols:
                        src = self._align_to_column_list(target, cols, src)
                    self.warehouse.insert_into(target, src)
                    return None
            if wcls is not None:
                raise ValueError(
                    f"CTE-prefixed {wcls} is not supported; only "
                    "WITH … INSERT INTO t SELECT … is"
                )
        m = _DROP_RE.match(query)
        if m:
            if not (m.group(1) and not self.warehouse.table_exists(m.group(2))):
                self.warehouse.drop_table(m.group(2))
            return None
        m = _ANALYZE_RE.match(query)
        if m:
            cols = (
                [c.strip().strip("`") for c in m.group(2).split(",") if c.strip()]
                if m.group(2)
                else None
            )
            stats = self.warehouse.analyze_table(m.group(1), cols)
            return self.spark.createDataFrame(
                sorted(stats.items()), "key string, value string"
            )
        m = _DESCRIBE_EXT_RE.match(query)
        if m:
            return self._describe_extended(m.group(1))
        m = _SHOW_CREATE_RE.match(query)
        if m:
            return self._show_create(m.group(1))
        m = _DESCRIBE_RE.match(query)
        if m:
            rows = [
                (f.name, f.dataType.simpleString())
                for f in self.warehouse.schema_of(m.group(1)).fields
            ]
            return self.spark.createDataFrame(rows, "col_name string, data_type string")
        m = _TRUNCATE_RE.match(query)
        if m:
            self.warehouse.truncate_table(m.group(1))
            return None
        m = _DELETE_RE.match(query)
        if m:
            cond = m.group(2)
            if cond and _SUBQUERY_RE.search(cond):
                cond = self._resolve_dml_subqueries(cond)
            self.warehouse.delete_from(m.group(1), cond)
            return None
        m = _MERGE_RE.match(query)  # before UPDATE: MERGE bodies contain UPDATE SET
        if m:
            return self._merge(m.group(1), m.group(2), m.group(3))
        m = _UPDATE_RE.match(query)
        if m:
            set_part, where = _split_top_level(m.group(2), "WHERE")
            if _SUBQUERY_RE.search(set_part) or (
                where and _SUBQUERY_RE.search(where)
            ):
                set_part = self._resolve_dml_subqueries(set_part)
                if where:
                    where = self._resolve_dml_subqueries(where)
            assignments = {}
            for part in _split_top_commas(set_part):
                am = re.match(r"`?([\w]+)`?\s*=\s*(.+)$", part, re.S)
                if not am:
                    raise ValueError(f"Cannot parse SET assignment: {part!r}")
                assignments[am.group(1)] = am.group(2).strip()
            self.warehouse.update_where(
                m.group(1),
                assignments,
                where.rstrip().rstrip(";") if where else None,
            )
            return None
        m = _ALTER_ADD_RE.match(query)
        if m:
            self.warehouse.add_columns(m.group(1), m.group(2))
            return None
        m = _ALTER_DROP_RE.match(query)
        if m:
            self.warehouse.drop_column(m.group(1), m.group(2))
            return None
        m = _ALTER_RENAME_RE.match(query)
        if m:
            self.warehouse.rename_column(m.group(1), m.group(2), m.group(3))
            return None
        m = _ALTER_RENAME_TABLE_RE.match(query)
        if m:
            self.warehouse.rename_table(m.group(1), m.group(2))
            return None
        m = _ALTER_COL_TYPE_RE.match(query)
        if m:
            self.warehouse.alter_column_type(m.group(1), m.group(2), m.group(3))
            return None
        m = _ALTER_PARTITION_RE.match(query)
        if m:
            self.warehouse.alter_partition_spec(
                m.group(1),
                [c.strip().strip("`") for c in _split_top_commas(m.group(2)) if c.strip()],
            )
            return None
        m = _ALTER_WRITE_ORDER_RE.match(query)
        if m:
            self.warehouse.alter_write_order(
                m.group(1),
                [c.strip().strip("`") for c in m.group(2).split(",") if c.strip()],
            )
            return None
        m = _ALTER_CREATE_REF_RE.match(query)
        if m:
            table, verb, kind, ref, ver = (
                m.group(1),
                m.group(2).upper(),
                m.group(3).lower(),
                m.group(4),
                m.group(5),
            )
            sid = int(ver) if ver else None
            # bare REPLACE requires the ref to exist (Iceberg's
            # semantics); CREATE OR REPLACE upserts; bare CREATE
            # refuses an existing ref via _set_ref
            if "REPLACE" in verb:
                self.warehouse.drop_ref(
                    table, ref, kind=kind,
                    if_exists=verb.startswith("CREATE"),
                )
            if kind == "tag":
                self.warehouse.create_tag(table, ref, sid)
            else:
                self.warehouse.create_branch(table, ref, sid)
            return None
        m = _ALTER_DROP_REF_RE.match(query)
        if m:
            self.warehouse.drop_ref(
                m.group(1),
                m.group(4),
                kind=m.group(2).lower(),
                if_exists=bool(m.group(3)),
            )
            return None
        m = _ALTER_TBLPROPS_RE.match(query)
        if m:
            name = m.group(1)
            for kv in _split_top_commas(m.group(2)):
                pm = re.match(r"\s*'([^']+)'\s*=\s*'([^']*)'\s*$", kv)
                if not pm:
                    raise ValueError(f"Cannot parse TBLPROPERTIES entry: {kv!r}")
                key, value = pm.group(1), pm.group(2)
                if key == "write.delete.mode":
                    self.warehouse.set_delete_mode(name, value)
                elif key == "identifier_fields":
                    self.warehouse.set_identifier_fields(
                        name, [c.strip() for c in value.split(",") if c.strip()]
                    )
                else:
                    with self.warehouse._table_lock(name):
                        meta = self.warehouse._read_meta(name)
                        meta.properties[key] = value
                        self.warehouse._write_meta(meta)
            return None
        m = _CALL_RE.match(query)
        if m:
            return self._call_procedure(m.group(1).lower(), m.group(2))
        m = _OPTIMIZE_RE.match(query)
        if m:
            zcols = m.group(3) or m.group(4)
            stats = self.warehouse.compact_table(
                m.group(1),
                zorder_by=[c.strip().strip("`") for c in zcols.split(",") if c.strip()]
                if zcols
                else None,
            )
            return self.spark.createDataFrame(
                [
                    (
                        stats.get("rewritten_files", 0),
                        stats.get("added_files", 0),
                    )
                ],
                "rewritten_files long, added_files long",
            )
        m = _SHOW_GRANTS_RE.match(query)
        if m:
            if self.policy is None:
                raise ValueError("No policy store wired for SHOW GRANTS")
            if m.group(1):
                from sample_emr_on_eks_fgac_iceberg_spark.policy import (
                    database_resource,
                )

                table = database_resource(m.group(1))
            else:
                table = m.group(2)
            rows = [
                (
                    g.principal,
                    g.table,
                    ", ".join(sorted(g.permissions)),
                    g.grant_option,
                    g.filter_name or "",
                )
                for g in self.policy.list_grants(table)
            ]
            return self.spark.createDataFrame(
                sorted(rows),
                "principal string, table string, permissions string, "
                "grant_option boolean, data_cells_filter string",
            )
        if _SHOW_TABLES_RE.match(query):
            return self.spark.createDataFrame(
                [(t,) for t in self.warehouse.list_tables()], "table_name string"
            )
        m = _SHOW_PARTITIONS_RE.match(query)
        if m:
            return self.spark.createDataFrame(
                [(p,) for p in self.warehouse.show_partitions(m.group(1))],
                "partition string",
            )
        m = _SHOW_TBLPROPS_RE.match(query)
        if m:
            meta = self.warehouse._read_meta(m.group(1))
            props = sorted(meta.properties.items())
            if m.group(2) is not None:
                props = [(k, v) for k, v in props if k == m.group(2)]
                if not props:
                    raise ValueError(
                        f"Table {m.group(1)} does not have property: {m.group(2)}"
                    )
            return self.spark.createDataFrame(props, "key string, value string")
        m = _CREATE_DB_RE.match(query)
        if m:
            self.warehouse.create_database(m.group(2), if_not_exists=bool(m.group(1)))
            return None
        m = _DROP_DB_RE.match(query)
        if m:
            self.warehouse.drop_database(
                m.group(2), cascade=bool(m.group(3)), if_exists=bool(m.group(1))
            )
            return None
        if _SHOW_DBS_RE.match(query):
            return self.spark.createDataFrame(
                [(d,) for d in self.warehouse.list_databases()],
                "database_name string",
            )
        m = _SHOW_TABLES_IN_RE.match(query)
        if m:
            return self.spark.createDataFrame(
                [(t,) for t in self.warehouse.tables_in_database(m.group(1))],
                "table_name string",
            )
        m = _GRANT_DB_RE.match(query)
        if m:
            if self.policy is None:
                raise ValueError("No policy store wired for GRANT")
            from sample_emr_on_eks_fgac_iceberg_spark.policy import (
                DATABASE_PERMISSIONS,
            )

            perms = {p.strip().upper() for p in m.group(1).split(",") if p.strip()}
            if perms == {"ALL"}:
                perms = set(DATABASE_PERMISSIONS)
            # CREATE TABLE (two words) is the SQL spelling of the
            # CREATE_TABLE permission
            perms = {re.sub(r"\s+", "_", p) for p in perms}
            unknown = perms - DATABASE_PERMISSIONS
            if unknown:
                raise ValueError(
                    f"Unknown database permissions {sorted(unknown)} "
                    f"(grantable: {sorted(DATABASE_PERMISSIONS)})"
                )
            if m.group(2) not in self.warehouse.list_databases() and m.group(
                2
            ) != "default":
                raise ValueError(f"Database '{m.group(2)}' does not exist")
            self.policy.grant_database(
                m.group(3), m.group(2), perms, grant_option=bool(m.group(4))
            )
            return None
        m = _REVOKE_DB_RE.match(query)
        if m:
            if self.policy is None:
                raise ValueError("No policy store wired for REVOKE")
            self.policy.revoke_database(m.group(2), m.group(1))
            return None
        m = _GRANT_RE.match(query)
        if m:
            if self.policy is None:
                raise ValueError("No policy store wired for GRANT")
            perms = {p.strip().upper() for p in m.group(1).split(",") if p.strip()}
            if perms == {"ALL"}:
                perms = set(_ALL_GRANTABLE)
            unknown = perms - _ALL_GRANTABLE
            if unknown:
                raise ValueError(f"Unknown permissions {sorted(unknown)}")
            if not self.warehouse.table_exists(m.group(2)):
                raise ValueError(f"Table '{m.group(2)}' does not exist")
            self.policy.grant(
                m.group(3), m.group(2), perms, grant_option=bool(m.group(4))
            )
            return None
        m = _REVOKE_RE.match(query)
        if m:
            if self.policy is None:
                raise ValueError("No policy store wired for REVOKE")
            # LF's revoke removes the principal's grant on the table
            self.policy.revoke(m.group(2), m.group(1))
            return None
        return self._query(query)

    # ------------------------------------------------------------ pieces
    def _describe_extended(self, name: str) -> DataFrame:
        """DESCRIBE EXTENDED: schema rows, then the `# Detailed Table
        Information` block (partition spec, current snapshot, row
        properties) in Spark's two-column layout."""
        wh = self.warehouse
        meta = wh._read_meta(name)
        rows = [
            (f.name, f.dataType.simpleString())
            for f in wh.schema_of(name).fields
        ]
        rows += [("", ""), ("# Detailed Table Information", "")]
        rows.append(("Name", meta.name))
        if meta.link_to:
            rows.append(("Type", f"RESOURCE_LINK -> {meta.link_to}"))
        rows.append(("Partition Spec", ", ".join(meta.partition_by) or "(none)"))
        sid = wh.current_snapshot_id(name)
        rows.append(("Current Snapshot", str(sid) if sid is not None else "(none)"))
        rows.append(("Snapshots", str(len(wh.snapshots(name)))))
        for k in sorted(meta.properties):
            rows.append((f"Property: {k}", meta.properties[k]))
        return self.spark.createDataFrame(rows, "col_name string, data_type string")

    def _show_create(self, name: str) -> DataFrame:
        wh = self.warehouse
        meta = wh._read_meta(name)
        cols = ",\n  ".join(
            f"{f.name} {f.dataType.simpleString().upper()}"
            for f in wh.schema_of(name).fields
        )
        stmt = f"CREATE TABLE {meta.name} (\n  {cols})"
        if meta.partition_by:
            stmt += f"\nPARTITIONED BY ({', '.join(meta.partition_by)})"
        props = {k: v for k, v in sorted(meta.properties.items())}
        if props:
            kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
            stmt += f"\nTBLPROPERTIES ({kv})"
        return self.spark.createDataFrame([(stmt,)], "createtab_stmt string")

    def _explain(self, mode: str, rest: str) -> DataFrame:
        """EXPLAIN <query> (Athena/Spark parity): plan text without
        execution. Queries only — DDL/DML shapes route through the
        regex dispatch, and explaining them would require a dry-run
        surface the warehouse API doesn't pretend to have. A CTE prefix
        can hide DML (`WITH … INSERT INTO t SELECT …`, which Spark's
        sql() executes EAGERLY), so beyond the textual allowlist the
        statement's parsed plan class is checked with the same shared
        helper the consumer write guard uses
        (policy.py::parsed_write_class)."""
        from sample_emr_on_eks_fgac_iceberg_spark.plans import explain_str
        from sample_emr_on_eks_fgac_iceberg_spark.policy import parsed_write_class

        rest = rest.strip().rstrip(";")
        if not re.match(r"\s*(\(|(SELECT|WITH|VALUES|TABLE)\b)", rest, re.I):
            raise ValueError("EXPLAIN supports queries (SELECT/WITH/VALUES) only")
        if parsed_write_class(self.spark, rest) is not None:
            raise ValueError("EXPLAIN supports queries (SELECT/WITH/VALUES) only")
        return self.spark.createDataFrame(
            [(explain_str(self._query(rest), mode),)], "plan string"
        )

    def _call_procedure(self, proc: str, argtext: str) -> DataFrame:
        """Iceberg stored procedures over the warehouse's maintenance
        API. Mirrors the Spark-SQL `CALL catalog.system.<proc>(...)`
        surface (positional or `name => value` arguments)."""
        import datetime as _dt

        pos: list = []
        named: dict = {}
        for raw in _split_top_commas(argtext):
            raw = raw.strip()
            if not raw:
                continue
            am = re.match(r"(\w+)\s*=>\s*(.+)$", raw, re.S)
            key, val = (am.group(1).lower(), am.group(2).strip()) if am else (None, raw)
            if (val.startswith("'") and val.endswith("'")) or (
                val.startswith('"') and val.endswith('"')
            ):
                # Spark string literals: single- OR double-quoted (the
                # latter lets a where-predicate carry inner 'literals')
                parsed: object = val[1:-1]
            elif re.fullmatch(r"-?\d+", val):
                parsed = int(val)
            else:
                parsed = val
            if key:
                named[key] = parsed
            else:
                pos.append(parsed)

        def arg(name: str, idx: int, default=None):
            if name in named:
                return named[name]
            return pos[idx] if idx < len(pos) else default

        table = str(arg("table", 0))
        if proc == "expire_snapshots":
            older = arg("older_than", 1)
            keep = arg("retain_last", 2)
            older_ms = None
            if older is not None:
                older_ms = (
                    int(older)
                    if isinstance(older, int)
                    else int(
                        _dt.datetime.fromisoformat(str(older)).timestamp() * 1000
                    )
                )
            stats = self.warehouse.expire_snapshots(
                table,
                keep_last=int(keep) if keep is not None else None,
                older_than_ms=older_ms,
            )
            return self.spark.createDataFrame(
                [(stats["expired_snapshots"], stats["deleted_files"])],
                "expired_snapshots long, deleted_data_files_count long",
            )
        if proc == "remove_orphan_files":
            stats = self.warehouse.remove_orphan_files(table)
            return self.spark.createDataFrame(
                [(stats["deleted_files"],)], "orphan_file_location_count long"
            )
        if proc == "rollback_to_snapshot":
            sid = int(arg("snapshot_id", 1))
            prev = self.warehouse.current_snapshot_id(table)
            self.warehouse.rollback_to_snapshot(table, sid)
            return self.spark.createDataFrame(
                [(prev, self.warehouse.current_snapshot_id(table))],
                "previous_snapshot_id long, current_snapshot_id long",
            )
        if proc == "cherrypick_snapshot":
            sid = int(arg("snapshot_id", 1))
            new_sid = self.warehouse.publish_snapshot(table, sid)
            return self.spark.createDataFrame(
                [(sid, new_sid)], "source_snapshot_id long, current_snapshot_id long"
            )
        if proc == "fast_forward":
            branch = str(arg("branch", 1))
            self.warehouse.fast_forward(table, branch)
            return self.spark.createDataFrame(
                [(branch, self.warehouse.resolve_ref(table, branch))],
                "branch_updated string, latest_ref long",
            )
        if proc == "rewrite_position_delete_files":
            stats = self.warehouse.rewrite_position_delete_files(table)
            return self.spark.createDataFrame(
                [
                    (
                        stats["removed_delete_files"],
                        stats["added_delete_files"],
                        stats["remaining_rows"],
                    )
                ],
                "rewritten_delete_files_count long, "
                "added_delete_files_count long, remaining_position_deletes long",
            )
        if proc == "rewrite_manifests":
            stats = self.warehouse.rewrite_manifests(table)
            return self.spark.createDataFrame(
                [
                    (
                        stats["rewritten_manifests_count"],
                        stats["added_manifests_count"],
                    )
                ],
                "rewritten_manifests_count long, added_manifests_count long",
            )
        if proc == "rewrite_data_files":
            strategy = str(arg("strategy", 1, "binpack")).lower()
            sort_order = arg("sort_order", 2)
            zcols = None
            if sort_order:
                zm = re.match(r"zorder\s*\(([^)]*)\)", str(sort_order), re.I)
                if zm:
                    zcols = [
                        c.strip().strip("`")
                        for c in zm.group(1).split(",")
                        if c.strip()
                    ]
                elif strategy == "sort":
                    raise ValueError(
                        f"Unsupported sort_order {sort_order!r} (use zorder(cols))"
                    )
            where = arg("where", 3)
            stats = self.warehouse.compact_table(
                table,
                zorder_by=zcols,
                filters=_parse_where_filters(str(where)) if where else None,
            )
            return self.spark.createDataFrame(
                [(stats.get("rewritten_files", 0), stats.get("added_files", 0))],
                "rewritten_data_files_count long, added_data_files_count long",
            )
        if proc == "add_files":
            source = str(arg("source_table", 1))
            stats = self.warehouse.add_files(table, _strip_parquet_path(source))
            return self.spark.createDataFrame(
                [(stats["added_files"], stats["added_records"])],
                "added_files_count long, added_records_count long",
            )
        if proc == "create_changelog_view":
            # Iceberg's SQL front door for the CDC changelog read
            # (warehouse.read_changes mode='cdc'): registers a named
            # view over the change frame; SQL then queries it like any
            # relation. Options mirror Iceberg's: changelog_view,
            # options map('start-snapshot-id'/'end-snapshot-id'),
            # compute_updates, identifier_columns, net_changes.
            view = str(arg("changelog_view", 1, f"{table}_changes")).strip("`")
            if view in set(self.warehouse.list_tables()):
                raise ValueError(
                    f"changelog_view '{view}' collides with a table name"
                )

            def _bool(v, default=False) -> bool:
                if v is None:
                    return default
                return str(v).strip().lower() == "true"

            start = end = None
            opts_raw = named.get("options")
            if opts_raw is not None:
                om = re.match(r"map\s*\((.*)\)\s*$", str(opts_raw), re.S | re.I)
                if not om:
                    raise ValueError("options must be map('k','v', …)")
                kv = [
                    p.strip().strip("'")
                    for p in _split_top_commas(om.group(1))
                    if p.strip()
                ]
                if len(kv) % 2:
                    raise ValueError("options map needs key/value pairs")
                omap = dict(zip(kv[::2], kv[1::2]))
                unknown = set(omap) - {"start-snapshot-id", "end-snapshot-id"}
                if unknown:
                    raise ValueError(f"Unknown changelog options {sorted(unknown)}")
                if "start-snapshot-id" in omap:
                    start = int(omap["start-snapshot-id"])
                if "end-snapshot-id" in omap:
                    end = int(omap["end-snapshot-id"])
            id_cols = None
            ic_raw = named.get("identifier_columns")
            if ic_raw is not None:
                im = re.match(r"array\s*\((.*)\)\s*$", str(ic_raw), re.S | re.I)
                if not im:
                    raise ValueError("identifier_columns must be array('c', …)")
                id_cols = [
                    p.strip().strip("'`")
                    for p in _split_top_commas(im.group(1))
                    if p.strip()
                ]
            spec = dict(
                name=table,
                from_snapshot_id=start,
                to_snapshot_id=end,
                mode="cdc",
                compute_updates=_bool(named.get("compute_updates")),
                identifier_columns=id_cols,
                net_changes=_bool(named.get("net_changes")),
            )
            # validate eagerly: bad table/snapshot/option combinations
            # fail at CALL time, not at first SELECT
            self.warehouse.read_changes(**spec)
            self._changelog_views[view] = spec
            return self.spark.createDataFrame([(view,)], "changelog_view string")
        if proc == "snapshot":
            # Iceberg argument order: snapshot(source_table, table)
            source = str(named["source_table"]) if "source_table" in named else str(pos[0])
            dest = str(named["table"]) if "table" in named else str(pos[1])
            stats = self.warehouse.snapshot_table(
                _strip_parquet_path(source), dest
            )
            return self.spark.createDataFrame(
                [(stats["imported_files"], stats["imported_records"])],
                "imported_files_count long, imported_records_count long",
            )
        if proc in ("rollback_to_timestamp", "set_current_snapshot"):
            prev = self.warehouse.current_snapshot_id(table)
            if proc == "rollback_to_timestamp":
                ts = str(arg("timestamp", 1))
                ts = re.sub(r"^\s*TIMESTAMP\s+", "", ts, flags=re.I).strip("'")
                ms = int(_dt.datetime.fromisoformat(ts).timestamp() * 1000)
                self.warehouse.rollback_to_timestamp(table, ms)
            else:
                self.warehouse.set_current_snapshot(
                    table, int(arg("snapshot_id", 1))
                )
            cur = self.warehouse.current_snapshot_id(table)
            return self.spark.createDataFrame(
                [(prev, cur)],
                "previous_snapshot_id long, current_snapshot_id long",
            )
        if proc == "publish_changes":
            wap = arg("wap_id", 1)
            if wap is None:
                raise ValueError("publish_changes needs wap_id")
            new_id = self.warehouse.publish_changes(table, str(wap))
            return self.spark.createDataFrame(
                [(new_id,)], "current_snapshot_id long"
            )
        if proc == "ancestors_of":
            snap = arg("snapshot_id", 1)
            rows = self.warehouse.ancestors_of(
                table, int(snap) if snap is not None else None
            )
            return self.spark.createDataFrame(
                rows or [], "snapshot_id long, timestamp_ms long"
            )
        raise ValueError(f"Unknown procedure system.{proc}")

    def _ctas(self, m: re.Match) -> None:
        """CREATE [OR REPLACE] TABLE … [PARTITIONED BY (…)] AS SELECT —
        schema comes from the query, data lands as the table's first
        snapshot; OR REPLACE drops an existing table first (atomic
        within the statement's table lock scope)."""
        or_replace, if_not_exists, name = bool(m.group(1)), bool(m.group(2)), m.group(3)
        if or_replace and if_not_exists:
            raise ValueError("CREATE OR REPLACE cannot take IF NOT EXISTS")
        if if_not_exists and self.warehouse.table_exists(name):
            return None
        partition_by = (
            [c.strip().strip("`") for c in _split_top_commas(m.group(4)) if c.strip()]
            if m.group(4)
            else None
        )
        df = self._query(m.group(5).rstrip().rstrip(";"))
        # validate the full replacement definition BEFORE any drop — a
        # bad partition spec must never destroy the table it replaces
        self.warehouse.validate_table_definition(df.schema, partition_by)
        if or_replace and self.warehouse.table_exists(name):
            # a replace may SELECT from the table it replaces — pin the
            # source rows in executor storage BEFORE the old files go
            df = df.localCheckpoint(eager=True)
            self.warehouse.drop_table(name)
        self.warehouse.create_table(name, df.schema, partition_by=partition_by)
        self.warehouse.insert_into(name, df)
        return None

    def _create(self, query: str, m: re.Match) -> None:
        or_replace, if_not_exists, name = bool(m.group(1)), bool(m.group(2)), m.group(3)
        if or_replace and if_not_exists:
            raise ValueError("CREATE OR REPLACE cannot take IF NOT EXISTS")
        if if_not_exists and self.warehouse.table_exists(name):
            return None
        open_idx = m.end() - 1
        close_idx = _matching_paren(query, open_idx)
        col_ddl = query[open_idx + 1 : close_idx]
        tail = query[close_idx + 1 :]
        pm = _PARTITIONED_RE.search(tail)
        partition_by = (
            [c.strip().strip("`") for c in _split_top_commas(pm.group(1)) if c.strip()]
            if pm
            else None
        )
        # USING iceberg / LOCATION tails are accepted, not interpreted
        # (storage is the engine's own layout); a TBLPROPERTIES clause
        # is parsed and recorded on the table.
        properties = None
        tp = re.search(r"TBLPROPERTIES\s*\(([^)]*)\)", tail, re.I | re.S)
        if tp:
            properties = {"table_type": "PARQUET"}
            for kv in _split_top_commas(tp.group(1)):
                pm = re.match(r"\s*'([^']+)'\s*=\s*'([^']*)'\s*$", kv)
                if not pm:
                    raise ValueError(f"Cannot parse TBLPROPERTIES entry: {kv!r}")
                properties[pm.group(1)] = pm.group(2)
        # full validation BEFORE any drop — OR REPLACE must never lose
        # the old table to a definition that then fails to create
        schema, partition_by = self.warehouse.validate_table_definition(
            col_ddl, partition_by
        )
        if or_replace and self.warehouse.table_exists(name):
            self.warehouse.drop_table(name)
        self.warehouse.create_table(
            name, schema, partition_by=partition_by, properties=properties
        )
        return None

    def _insert(self, name: str, col_list: str | None, values_tail: str) -> None:
        schema = self.warehouse.schema_of(name)
        df = self.spark.sql(f"SELECT * FROM VALUES {values_tail.rstrip().rstrip(';')}")
        if col_list:
            df = self._align_to_column_list(name, col_list, df)
        else:
            cols = [f.name for f in schema.fields]
            if len(df.columns) != len(cols):
                raise ValueError(
                    f"INSERT INTO {name}: {len(df.columns)} values per row "
                    f"for {len(cols)} target columns"
                )
            df = df.toDF(*cols)
        self.warehouse.insert_into(name, df)
        return None

    def _align_to_column_list(
        self, name: str, col_list: str, src: DataFrame
    ) -> DataFrame:
        """Standard SQL INSERT column-list semantics: the source's
        output maps positionally onto the listed target columns;
        unlisted table columns are filled with typed NULLs."""
        schema = self.warehouse.schema_of(name)
        listed = [c.strip().strip("`") for c in col_list.split(",") if c.strip()]
        known = {f.name for f in schema.fields}
        unknown = [c for c in listed if c not in known]
        if unknown:
            raise ValueError(f"INSERT INTO {name}: unknown columns {unknown}")
        if len(src.columns) != len(listed):
            raise ValueError(
                f"INSERT INTO {name}: {len(src.columns)} source columns "
                f"for {len(listed)} target columns"
            )
        src = src.toDF(*listed)
        fill = [
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
            if f.name not in listed
        ]
        return src.select(*[F.col(c) for c in listed], *fill)

    @staticmethod
    def _parse_set_assignments(text: str) -> dict:
        """``a = expr, t.b = expr`` → {col: expr} (alias-qualified
        targets resolve to the bare column)."""
        out = {}
        for part in _split_top_commas(text):
            am = re.match(r"`?([\w.]+)`?\s*=\s*(.+)$", part, re.S)
            if not am:
                raise ValueError(f"Cannot parse SET assignment: {part[:60]}…")
            out[am.group(1).split(".")[-1]] = am.group(2).strip()
        return out

    def _merge(self, target: str, target_alias: str | None, tail: str) -> None:
        """MERGE INTO target [AS t] USING (source|(subquery)) [AS s]
        ON cond — full multi-clause form (first-match-wins, the
        Spark/Iceberg MERGE the reference runtime ships via the
        Iceberg Spark extensions):

          WHEN MATCHED [AND cond] THEN UPDATE SET … | DELETE   (×N)
          WHEN NOT MATCHED [BY TARGET] [AND cond]
            THEN INSERT *|(cols) VALUES (exprs)                (×N)
          WHEN NOT MATCHED BY SOURCE [AND cond]
            THEN UPDATE SET … | DELETE                         (×N)
        """
        src_text, after_on = _split_top_level(tail, "ON")
        if after_on is None:
            raise ValueError("MERGE requires an ON clause")
        source, source_alias = self._source_frame(src_text.strip())
        on_cond, clause_text = _split_top_level(after_on, "WHEN")
        matched: list[dict] = []
        inserts: list[dict] = []
        by_source: list[dict] = []
        while clause_text is not None:
            clause, clause_text = _split_top_level(clause_text, "WHEN")
            clause = clause.strip().rstrip(";").strip()
            hm = re.match(
                r"(NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED(?:\s+BY\s+TARGET)?"
                r"|MATCHED)\s*(.*)$",
                clause,
                re.I | re.S,
            )
            if not hm:
                raise ValueError(f"Unsupported MERGE clause: WHEN {clause[:60]}…")
            head = re.sub(r"\s+", " ", hm.group(1).upper())
            rest = hm.group(2)
            cond_text, body = _split_top_level(rest, "THEN")
            if body is None:
                raise ValueError(f"MERGE clause missing THEN: WHEN {clause[:60]}…")
            cond = None
            cond_text = cond_text.strip()
            if cond_text:
                cm = re.match(r"AND\s+(.*)$", cond_text, re.I | re.S)
                if not cm:
                    raise ValueError(
                        f"Cannot parse MERGE clause condition: {cond_text[:60]}…"
                    )
                cond = cm.group(1).strip()
            body = body.strip()
            if head == "MATCHED" or head == "NOT MATCHED BY SOURCE":
                dest = matched if head == "MATCHED" else by_source
                um = re.match(r"UPDATE\s+SET\s+(.*)$", body, re.I | re.S)
                if um:
                    dest.append(
                        {
                            "action": "update",
                            "set": self._parse_set_assignments(um.group(1)),
                            "condition": cond,
                        }
                    )
                elif re.match(r"DELETE$", body, re.I):
                    dest.append({"action": "delete", "condition": cond})
                else:
                    raise ValueError(
                        f"Unsupported MERGE clause body: {body[:60]}…"
                    )
            else:  # NOT MATCHED [BY TARGET] → INSERT
                im = re.match(
                    r"INSERT\s*(\*|\(([^)]*)\)\s*VALUES\s*\((.*)\))\s*$",
                    body,
                    re.I | re.S,
                )
                if not im:
                    raise ValueError(
                        f"Unsupported MERGE clause body: {body[:60]}…"
                    )
                if im.group(1) == "*":
                    inserts.append({"condition": cond, "values": True})
                else:
                    cols = [c.strip().strip("`") for c in im.group(2).split(",")]
                    exprs = _split_top_commas(im.group(3))
                    if len(cols) != len(exprs):
                        raise ValueError("INSERT column/value count mismatch")
                    inserts.append(
                        {"condition": cond, "values": dict(zip(cols, exprs))}
                    )
        self.warehouse.merge_into(
            target,
            source,
            on_cond.strip(),
            matched_clauses=matched,
            not_matched_clauses=inserts,
            not_matched_by_source=by_source,
            not_matched_insert=None,
            target_alias=target_alias or target,
            source_alias=source_alias,
        )
        return None

    def _source_frame(self, text: str) -> tuple[DataFrame, str]:
        """Resolve a MERGE USING source — a warehouse table name or a
        parenthesized subquery over warehouse tables — to a DataFrame in
        the main session, plus its alias."""
        if text.startswith("("):
            close = _matching_paren(text, 0)
            inner = text[1:close]
            am = re.match(r"\s*(?:AS\s+)?(\w+)\s*$", text[close + 1 :], re.I)
            alias = am.group(1) if am else "s"
            for name in sorted(self.warehouse.list_tables(), key=len, reverse=True):
                # both spellings: bare and backtick-quoted (`name`)
                pat = (
                    rf"`{re.escape(name)}`"
                    rf"|(?<![\w.`]){re.escape(name)}(?![\w.])"
                )
                if re.search(pat, inner):
                    view = f"__wh_{name.replace('.', '__')}"
                    self.warehouse.read_table(name).createOrReplaceTempView(view)
                    inner = _sub_outside_strings(pat, f"`{view}`", inner)
            return self.spark.sql(inner), alias
        m = re.match(r"([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s*$", text, re.I)
        if not m:
            raise ValueError(f"Cannot parse MERGE source: {text[:60]}…")
        return self.warehouse.read_table(m.group(1)), m.group(2) or m.group(1)

    def _resolve_dml_subqueries(self, text: str) -> str:
        """Make warehouse tables resolvable for a subquery inside a DML
        predicate/assignment (``DELETE … WHERE k IN (SELECT …)``,
        ``UPDATE … SET v = (SELECT max(…) …)``): the condition is later
        handed to ``F.expr`` against a scan in THIS session, where the
        analyzer resolves subquery relations through the session
        catalog. Register every table as a fresh temp view (current
        snapshot at statement start — the correct read-committed source
        for a self-referencing DML under copy-on-write) and rewrite
        dotted names to the view spelling. Views are re-registered per
        statement so they can never serve a stale snapshot."""
        tables = set(self.warehouse.list_tables())
        # drop views registered for since-dropped tables: a stale view
        # would silently serve the dropped table's last snapshot to a
        # later subquery instead of failing with table-not-found
        registered = getattr(self, "_dml_views", set())
        current = {n.replace(".", "__") for n in tables}
        for stale in registered - current:
            self.spark.catalog.dropTempView(stale)
        self._dml_views = current
        for name in tables:
            # registered on the warehouse's own session — the one whose
            # analyzer will resolve the subquery relations
            self.warehouse.read_table(name).createOrReplaceTempView(
                name.replace(".", "__")
            )
        for name in sorted(tables, key=len, reverse=True):
            if "." in name:
                text = _sub_outside_strings(
                    rf"(?<![\w.`]){re.escape(name)}(?![\w.])",
                    f"`{name.replace('.', '__')}`",
                    text,
                )
        return text

    # join-planning confs the isolated scratch session must share with
    # the caller's session — newSession() starts from the context
    # defaults, NOT the caller's runtime conf, so a broadcast threshold
    # or AQE toggle set by the operator would otherwise silently not
    # apply to frontend-planned queries
    _SCRATCH_CONF_ALLOWLIST = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled",
        "spark.sql.shuffle.partitions",
    )

    def _spj_candidate_tables(self, query: str, tables: set, wh) -> set:
        return spj_candidate_tables(query, tables, wh.bucket_layout)

    def _query(self, query: str) -> DataFrame:
        """Trusted read path: every warehouse table as an unmediated view
        in an isolated session (the producer role reads its own lake).
        ``t VERSION AS OF n`` / ``t TIMESTAMP AS OF 'ts'`` resolve
        through the warehouse's snapshot log (Iceberg time-travel SQL).
        Joins whose two sides are bucket[N] tables on the join keys
        resolve through bucketed mirrors and plan shuffle-free (SPJ)."""
        scratch = self.spark.newSession()
        for key in self._SCRATCH_CONF_ALLOWLIST:
            try:
                scratch.conf.set(key, self.spark.conf.get(key))
            except Exception:
                pass
        # Trusted ≠ path-addressable: the scratch session resolves every
        # legitimate source through registered views, so SQL-on-files
        # stays off (defense in depth behind the consumer-side
        # plan-relation authorization).
        scratch.conf.set("spark.sql.runSQLOnFiles", "false")
        wh = Warehouse(scratch, self.warehouse.root)
        tables = set(self.warehouse.list_tables())

        def _travel(m: re.Match) -> str:
            name = m.group(1)
            if name not in tables:
                return m.group(0)
            kind, literal = m.group(2).upper(), m.group(3)
            if kind == "VERSION":
                if literal.startswith("'"):  # named ref: tag or branch
                    ref = literal.strip("'")
                    df = wh.read_table(name, ref=ref)
                    view = f"__tt_{name.replace('.', '__')}_r{ref}"
                else:
                    df = wh.read_table(name, snapshot_id=int(literal))
                    view = f"__tt_{name.replace('.', '__')}_v{literal}"
            else:
                from datetime import datetime

                ts = datetime.fromisoformat(literal.strip("'"))
                ms = int(ts.timestamp() * 1000)
                df = wh.read_table(name, as_of_timestamp_ms=ms)
                view = f"__tt_{name.replace('.', '__')}_t{ms}"
            df.createOrReplaceTempView(view)
            return f"`{view}`"

        query = _TIME_TRAVEL_RE.sub(_travel, query)

        def _meta_table(m: re.Match) -> str:
            name, kind = m.group(1), m.group(2).lower()
            if name not in tables:
                return m.group(0)
            df = getattr(wh, f"{kind}_df")(name)
            view = f"__meta_{name.replace('.', '__')}_{kind}"
            df.createOrReplaceTempView(view)
            return f"`{view}`"

        query = _META_TABLE_RE.sub(_meta_table, query)
        # CloudTrail-style queryable audit: every authorization decision
        # the policy layer recorded, as SQL (producer-only — the scratch
        # session is the trusted surface)
        if self.policy is not None and re.search(
            r"\bsystem\.audit_log\b", query, re.I
        ):
            scratch.createDataFrame(
                list(self.policy.audit_log),
                "principal string, table_name string, action string, "
                "decision string",
            ).createOrReplaceTempView("__system_audit_log")
            query = re.sub(
                r"\bsystem\.audit_log\b", "`__system_audit_log`", query, flags=re.I
            )
        # changelog views registered via CALL system.create_changelog_view:
        # materialize the ones this query references into the scratch
        # session (manifest-planned CDC read — delta files only)
        # SQL-defined functions replay into the scratch session (cheap
        # catalog DDL; the stored form is CREATE OR REPLACE TEMPORARY,
        # so replay is idempotent)
        for ddl in self._sql_functions.values():
            scratch.sql(ddl)
        for view, spec in self._changelog_views.items():
            if re.search(rf"(?<![\w.`]){re.escape(view)}(?![\w.])", query):
                # the collision check at CALL time (create_changelog_view)
                # only covers tables that existed THEN; a table created
                # after the CALL with the same name would otherwise
                # silently shadow the changelog view here (changelog
                # views materialize before table views). Raising matches
                # the CALL-time contract (ADVICE r10).
                if view in tables:
                    raise ValueError(
                        f"changelog_view '{view}' collides with a table "
                        "created after the view was registered — drop or "
                        "rename one of them"
                    )
                wh.read_changes(**spec).createOrReplaceTempView(view)
        spj = self._spj_candidate_tables(query, tables, wh)
        # Register only the tables this statement can actually resolve
        # (optimization r14): building a warehouse read (file listing,
        # snapshot resolution, schema merge) costs ~0.1-0.2 s per table
        # per statement, and registering the WHOLE catalog made every
        # frontend query pay the full catalog's cost — ~0.8 s before
        # planning a single operator here, and on a real lake the
        # catalog is unbounded while a statement touches a handful of
        # relations. The needed set is a token scan over the statement
        # text plus, transitively, the bodies of every referenced
        # persistent view (their tables resolve during view
        # materialization below). The scan regex admits backticked
        # spellings (unlike the rewrite token, which must not match
        # inside quoted identifiers); over-matching (a name inside a
        # string literal or a shadowing CTE) merely registers an unused
        # view — harmless — while the full-catalog loop is the ONLY
        # path that could resolve a name this scan misses.
        def _scan_token(nm: str) -> str:
            return rf"(?<![\w.]){re.escape(nm)}(?![\w.])"

        wh_views = self.warehouse.list_views()
        needed = {n for n in tables if re.search(_scan_token(n), query)}
        seen_view_bodies: set = set()

        def _collect_view_tables(v: str) -> None:
            if v in seen_view_bodies:
                return
            seen_view_bodies.add(v)
            try:
                body = self.warehouse.view_sql(v)
            except Exception:
                return  # unreadable body fails later, loudly, in _materialize_view
            needed.update(
                n for n in tables if re.search(_scan_token(n), body)
            )
            for other in wh_views:
                if other != v and re.search(_scan_token(other), body):
                    _collect_view_tables(other)

        for v in wh_views:
            if re.search(_scan_token(v), query):
                _collect_view_tables(v)
        for name in needed:
            frame = (
                wh.bucketed_read(name) if name in spj else wh.read_table(name)
            )
            frame.createOrReplaceTempView(name.replace(".", "__"))
        def _rewrite_dotted(text: str) -> str:
            for name in sorted(tables, key=len, reverse=True):
                if "." in name:
                    text = _sub_outside_strings(
                        rf"(?<![\w.`]){re.escape(name)}(?![\w.])",
                        f"`{name.replace('.', '__')}`",
                        text,
                    )
            return text

        query = _rewrite_dotted(query)
        # persistent SQL views (warehouse._views_dir, Iceberg-view-spec
        # versioned): materialize the CURRENT version of every view the
        # query references — bodies resolve tables, other views
        # (recursively, cycle-guarded) and the frontend's SQL sugar
        def _token(nm: str) -> str:
            return rf"(?<![\w.`]){re.escape(nm)}(?![\w.])"

        wh_views = self.warehouse.list_views()
        materialized: set = set()

        def _materialize_view(v: str, stack: frozenset) -> None:
            if v in materialized:
                return
            if v in stack:
                raise ValueError(
                    f"View cycle detected through '{v}' — a REPLACE "
                    "made these views mutually recursive"
                )
            if v in tables:
                raise ValueError(
                    f"'{v}' is both a table and a view — drop one "
                    "(single catalog namespace)"
                )
            body = self.warehouse.view_sql(v)
            for other in wh_views:
                if other != v and re.search(_token(other), body):
                    _materialize_view(other, stack | {v})
            b = _rewrite_dotted(body)
            b, _ = rewrite_text_sugar(b)
            b = self._rewrite_asof_joins(b, scratch)
            b, dq = rewrite_qualify(b)
            b, dd = rewrite_distinct_on(b)
            bdf = scratch.sql(b)
            if dq:
                bdf = bdf.drop("__qualify")
            if dd:
                bdf = bdf.drop(
                    "__don",
                    *[c for c in bdf.columns if c.startswith("__ob")],
                )
            bdf.createOrReplaceTempView(v.replace(".", "__"))
            materialized.add(v)

        for v in wh_views:
            if re.search(_token(v), query):
                _materialize_view(v, frozenset())
        for v in sorted(materialized, key=len, reverse=True):
            if "." in v:
                query = _sub_outside_strings(
                    _token(v), f"`{v.replace('.', '__')}`", query
                )
        query, _ = rewrite_text_sugar(query)
        query = self._rewrite_asof_joins(query, scratch)
        query, drop_qualify = rewrite_qualify(query)
        query, drop_don = rewrite_distinct_on(query)
        df = scratch.sql(query)
        if drop_qualify:
            df = df.drop("__qualify")
        if drop_don:
            df = df.drop("__don", *[c for c in df.columns if c.startswith("__ob")])
        return df

    def _rewrite_asof_joins(self, query: str, scratch: SparkSession) -> str:
        def resolve(name: str):
            try:
                return scratch.table(name)
            except Exception:
                return None

        return rewrite_asof_joins(query, resolve)
