"""Driver-gate compatibility guards.

Two failure classes cost round 2 its artifacts (CORRECTNESS_r02
errors, BENCH_r02 rc=1):

1. The driver canonicalizes result rows with pandas `sort_values` +
   hashing — a cell holding a list/dict/Row is unhashable and the
   whole query is recorded as an error. So: no registered query may
   expose an array/map/struct column in its OUTPUT schema (internal
   plan stages may use them freely).
2. The driver's session reads parquet timestamps as TIMESTAMP_NTZ
   (`spark.sql.parquet.inferTimestampNTZ.enabled=true`, mirrored in
   build_session). NTZ has no cast to numeric, so any
   `ts.cast("long")`-style expression fails analysis only under that
   config. Building every query's plan under the same session config
   (conftest uses build_session) catches this class at test time.

Both checks run plan analysis only (no execution) so the whole
100-query sweep stays cheap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from sample_emr_on_eks_fgac_iceberg_spark.operators import QUERIES

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_analyzes_and_output_schema_is_scalar(name, spark, sf_dir):
    # .schema forces full analysis under the driver-matching session
    # config (TIMESTAMP_NTZ parquet reads included) without executing.
    schema = QUERIES[name](spark, sf_dir).schema
    complex_cols = [
        f.name for f in schema.fields if isinstance(f.dataType, COMPLEX)
    ]
    assert not complex_cols, (
        f"{name}: output columns {complex_cols} are array/map/struct — "
        "the driver's row canonicalizer cannot hash them; project to "
        "scalar columns (see approx_percentile_prices / "
        "multimodal_features)"
    )


def test_package_exports_pythonpath_for_workers():
    """Spark Python workers unpickle module-referenced pandas-UDFs by
    importing this package — which they can only do if PYTHONPATH
    carries the repo root (the driver's sys.path insert does not
    propagate to worker processes). The package exports it at import
    time; without this, applyInPandas/mapInPandas queries error with
    ModuleNotFoundError whenever the entry script runs from a cwd
    other than the repo root."""
    import os

    import sample_emr_on_eks_fgac_iceberg_spark as pkg

    root = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    assert root in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def _entry_module():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("spark_entry_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_driver_window_layout():
    """The correctness window contract (round 5): exactly DRIVER_WINDOW
    entries lead queries(); every one carries a DuckDB oracle (a window
    slot spent on a rows-only query is a slot without signal); the
    rows-only set sits at the very bottom; and every registered query
    is triaged into exactly one of _CORE / _ROTATION / _ROWS_ONLY so a
    new registration cannot silently skip the window (untriaged debuts
    are placed inside it)."""
    m = _entry_module()
    q = list(m.queries())
    o = m.oracle_sql()
    win = q[: m.DRIVER_WINDOW]
    assert len(win) == m.DRIVER_WINDOW
    assert all(n in o for n in win), [n for n in win if n not in o]
    assert set(m._ROWS_ONLY).isdisjoint(win)
    assert q[-len(m._ROWS_ONLY):] == [n for n in m._ROWS_ONLY if n in set(q)]
    # triage is total and disjoint
    core, rot, ro = set(m._CORE), set(m._ROTATION), set(m._ROWS_ONLY)
    assert not (core & rot) and not (core & ro) and not (rot & ro)
    assert set(q) <= core | rot | ro
    # every triaged name is a real registered query (no dead entries)
    assert (core | rot | ro) <= set(q)
    # rows-only names are exactly the oracle-less ones
    assert ro == set(q) - set(o)
    # queries() and oracle_sql() agree on ordering of shared keys
    oo = [n for n in q if n in o]
    assert oo == [n for n in m.oracle_sql() if n in set(q)]


def test_round14_layout_stale_rotation_block(monkeypatch):
    """Round-14 invariant (VERDICT r13 task 2): the window holds the
    core (flagships + r14-changed + r14 debuts), and a
    rotation block of >= 20 GENUINELY STALE entries — previously
    driver-green queries last checked in r12 or earlier, touching
    neither the r13-parked pool head nor the r13-core demotions at the
    pool tail.

    The offset is PINNED to 13 (the artifact count AT the r14 gate) so
    the test stays meaningful after CORRECTNESS_r14.json lands and the
    live rotation advances."""
    m = _entry_module()
    monkeypatch.setattr(m, "_rotation_offset", lambda: 13)
    q = list(m.queries())
    win = set(q[: m.DRIVER_WINDOW])
    reg = set(q)
    core = [n for n in m._CORE if n in reg]
    pool = [n for n in m._ROTATION if n in reg]
    debuts = [
        n
        for n in reg
        if n not in set(core) | set(pool) | set(m._ROWS_ONLY)
    ]
    # every r14 debut and every core (changed) entry is in-window
    assert set(core) <= win and set(debuts) <= win
    block = win - set(core) - set(debuts)
    assert len(block) >= 20
    # the block is genuinely stale: it avoids the r13-checked pool
    # head (parked wave-1..13 debuts + their wave-14/15 tail, now the
    # head block) and the r14-demoted r13 core at the pool tail
    r13_head = set(pool[:15])
    r13_tail = set(pool[-25:])
    assert not (block & r13_head), sorted(block & r13_head)
    assert not (block & r13_tail), sorted(block & r13_tail)
