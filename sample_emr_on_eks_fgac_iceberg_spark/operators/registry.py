"""Query/oracle registry backing __spark_entry__.py.

Every operator lands here as a named query `(spark, sf_dir) ->
DataFrame` plus (where ANSI-SQL-expressible) a DuckDB oracle string.
Column names are aliased identically on both sides — the driver's
compare sorts columns by name before value-hashing.

Determinism rules used throughout (so value-hashes match DuckDB):

- Money/doubles are exact 2-decimal values in the testdata; aggregate
  them as DECIMAL (exact, order-independent) and cast the final result
  to DOUBLE — bit-identical in both engines. Never hash a raw
  SUM(double): partial-aggregation order differs between engines.
- Per-row double arithmetic (+,-,*,/,sqrt,round,abs) is IEEE-754
  deterministic and safe to hash; transcendentals (ln/exp/pow) are
  not correctly-rounded and are kept out of hashed outputs.
- Every ORDER BY … LIMIT k carries a unique tie-break key on both
  sides, and window ORDER BYs are total orders.
"""

from __future__ import annotations


# Shared session-gap constant for event sessionization — lives here
# (the one module with no intra-package imports) so operators/temporal
# and streaming/events can both use it without the import cycle
# streaming.events -> operators.__init__ -> temporal -> streaming.events
# that made `import ...streaming.ingest` fail when streaming loaded
# before operators.
SESSION_GAP_SECONDS = 1800


from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query and (optionally) its DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
