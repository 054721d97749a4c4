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

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse

_CREATE_RE = re.compile(r"\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\(", re.I | re.S)
_PARTITIONED_RE = re.compile(r"PARTITIONED\s+BY\s*\(([^)]*)\)", re.I)
_INSERT_RE = re.compile(
    r"\s*INSERT\s+INTO\s+([\w.]+)\s*(?:\(([^)]*)\)\s*)?VALUES\s+(.*)", re.I | re.S
)
_DROP_RE = re.compile(r"\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*$", re.I)
_DESCRIBE_RE = re.compile(r"\s*DESCRIBE\s+(?:TABLE\s+)?([\w.]+)\s*;?\s*$", re.I)


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


class SqlFrontend:
    """Dispatches SQL statements onto a Warehouse."""

    def __init__(self, spark: SparkSession, warehouse: Warehouse):
        self.spark = spark
        self.warehouse = warehouse

    def execute(self, query: str) -> DataFrame | None:
        m = _CREATE_RE.match(query)
        if m:
            return self._create(query, m)
        m = _INSERT_RE.match(query)
        if m:
            return self._insert(m.group(1), m.group(2), m.group(3))
        m = _DROP_RE.match(query)
        if m:
            if not (m.group(1) and not self.warehouse.table_exists(m.group(2))):
                self.warehouse.drop_table(m.group(2))
            return None
        m = _DESCRIBE_RE.match(query)
        if m:
            rows = [
                (f.name, f.dataType.simpleString())
                for f in self.warehouse.schema_of(m.group(1)).fields
            ]
            return self.spark.createDataFrame(rows, "col_name string, data_type string")
        return self._query(query)

    # ------------------------------------------------------------ pieces
    def _create(self, query: str, m: re.Match) -> None:
        if_not_exists, name = bool(m.group(1)), m.group(2)
        if if_not_exists and self.warehouse.table_exists(name):
            return None
        open_idx = m.end() - 1
        close_idx = _matching_paren(query, open_idx)
        col_ddl = query[open_idx + 1 : close_idx]
        tail = query[close_idx + 1 :]
        pm = _PARTITIONED_RE.search(tail)
        partition_by = (
            [c.strip().strip("`") for c in pm.group(1).split(",") if c.strip()]
            if pm
            else None
        )
        # USING iceberg / LOCATION / TBLPROPERTIES tails are accepted
        # and recorded as properties, not interpreted (storage is the
        # engine's own layout).
        self.warehouse.create_table(name, col_ddl, partition_by=partition_by)
        return None

    def _insert(self, name: str, col_list: str | None, values_tail: str) -> None:
        schema = self.warehouse.schema_of(name)
        df = self.spark.sql(f"SELECT * FROM VALUES {values_tail.rstrip().rstrip(';')}")
        cols = (
            [c.strip().strip("`") for c in col_list.split(",")]
            if col_list
            else [f.name for f in schema.fields]
        )
        if len(df.columns) != len(cols):
            raise ValueError(
                f"INSERT INTO {name}: {len(df.columns)} values per row "
                f"for {len(cols)} target columns"
            )
        self.warehouse.insert_into(name, df.toDF(*cols))
        return None

    def _query(self, query: str) -> DataFrame:
        """Trusted read path: every warehouse table as an unmediated view
        in an isolated session (the producer role reads its own lake)."""
        scratch = self.spark.newSession()
        wh = Warehouse(scratch, self.warehouse.root)
        for name in self.warehouse.list_tables():
            wh.read_table(name).createOrReplaceTempView(name.replace(".", "__"))
        for name in sorted(self.warehouse.list_tables(), key=len, reverse=True):
            if "." in name:
                query = re.sub(
                    rf"(?<![\w.`]){re.escape(name)}(?![\w.])",
                    f"`{name.replace('.', '__')}`",
                    query,
                )
        return scratch.sql(query)
