"""Z-order compaction (Iceberg rewrite_data_files, zorder strategy):
output files must cover small hyper-rectangles of the key space so
min/max pruning works on EVERY z-ordered column, and the rewrite must
preserve rows + history like any other replace snapshot.

The behavioral contrast under test: on the same 32x32 uniform (a, b)
grid, bin-pack compaction hash-places rows so each output file spans
essentially the whole key space, while z-order bounds both dimensions
per file — the property that makes file-level min/max stats prune on
any z-ordered predicate column at 100 TB."""

import os

import pytest
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


GRID = 32  # 32x32 = 1024 rows over two independent uniform columns


def _load_grid(wh, name):
    wh.create_table(name, "a int, b int, payload string")
    rows = [(a, b, f"p{a}_{b}") for a in range(GRID) for b in range(GRID)]
    step = len(rows) // 4
    for i in range(4):
        wh.insert_values(name, rows[i * step : (i + 1) * step])
    return rows


def _extents(wh, name, cols):
    """Per live data file: (max-min+1) range of each column."""
    meta = wh._read_meta(name)
    data = wh.data_dir(name)
    out = []
    for f in sorted(wh._live_files(meta)):
        df = wh.spark.read.parquet(os.path.join(data, f))
        row = df.agg(
            *[
                fn
                for c in cols
                for fn in (F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}"))
            ]
        ).collect()[0]
        out.append({c: row[f"mx_{c}"] - row[f"mn_{c}"] + 1 for c in cols})
    return out


def _avg_area(extents):
    return sum(e["a"] * e["b"] for e in extents) / len(extents)


@pytest.mark.slow
def test_zorder_clusters_tighter_than_binpack(wh):
    rows = _load_grid(wh, "tz")
    _load_grid(wh, "tb")
    n_before = len(wh._live_files(wh._read_meta("tz")))

    stats_z = wh.compact_table("tz", target_file_bytes=4096, zorder_by=["a", "b"])
    stats_b = wh.compact_table("tb", target_file_bytes=4096)
    assert stats_z["rewritten_files"] == n_before
    assert stats_z["added_files"] > 1  # small target → several output files

    ez = _extents(wh, "tz", ["a", "b"])
    eb = _extents(wh, "tb", ["a", "b"])
    # bin-pack hash placement spans ~the full grid per file; the
    # z-curve bounds both dimensions, shrinking the per-file box
    assert _avg_area(ez) < _avg_area(eb) / 2, (ez, eb)
    assert _avg_area(ez) < (GRID * GRID) / 2

    # rows + history preserved like any replace commit
    got = sorted(tuple(r)[:2] for r in wh.read_table("tz").collect())
    assert got == sorted((a, b) for a, b, _ in rows)
    assert wh.snapshots("tz")[-1]["operation"] == "replace"
    assert len(wh.read_table("tz", snapshot_id=1).collect()) == len(rows) // 4


@pytest.mark.slow
def test_zorder_bounds_nonleading_column_for_pruning(wh):
    _load_grid(wh, "tz")
    _load_grid(wh, "tb")
    wh.compact_table("tz", target_file_bytes=4096, zorder_by=["a", "b"])
    wh.compact_table("tb", target_file_bytes=4096)
    # a predicate on b alone: count files whose [min_b, max_b] excludes
    # the bottom quarter of the domain — z-order must beat bin-pack
    prune_z = sum(1 for e in _extents(wh, "tz", ["a", "b"]) if e["b"] <= GRID // 2)
    prune_b = sum(1 for e in _extents(wh, "tb", ["a", "b"]) if e["b"] <= GRID // 2)
    assert prune_z > prune_b, (prune_z, prune_b)


def test_zorder_unknown_column_raises(wh):
    _load_grid(wh, "tz")
    with pytest.raises(ValueError, match="zorder_by"):
        wh.compact_table("tz", zorder_by=["nope"])


@pytest.mark.slow
def test_optimize_sql_statement(wh):
    """OPTIMIZE through the SQL frontend: bin-pack and z-order spellings."""
    from sample_emr_on_eks_fgac_iceberg_spark.sql_frontend import SqlFrontend

    _load_grid(wh, "tz")
    fe = SqlFrontend(wh.spark, wh)
    # sizing comes from the table property, as in Iceberg
    fe.execute(
        "ALTER TABLE tz SET TBLPROPERTIES ('write.target-file-size-bytes' = '4096')"
    )
    out = fe.execute("OPTIMIZE tz REWRITE DATA USING ZORDER (a, b)")
    row = out.collect()[0]
    assert row["rewritten_files"] > 0 and row["added_files"] > 0
    ez = _extents(wh, "tz", ["a", "b"])
    assert _avg_area(ez) < (GRID * GRID) / 2

    _load_grid(wh, "tb")
    out = fe.execute("OPTIMIZE tb REWRITE DATA USING BIN_PACK")
    assert out.collect()[0]["rewritten_files"] > 0


def test_zorder_string_column_rejected(wh):
    wh.create_table("ts", "a int, name string")
    wh.insert_values("ts", [(1, "x")])
    wh.insert_values("ts", [(2, "y")])
    with pytest.raises(ValueError, match="numeric/date/timestamp"):
        wh.compact_table("ts", zorder_by=["a", "name"])
