"""Round-11 regression tests for the r10 ADVICE items: the stale-claim
reclaim race (medium), empty-conversion-set oracle parity, changelog-view
shadowing by a later table, and the Welch zero-variance degeneracy guard."""

import os
import time as _time

import duckdb
import pytest

from sample_emr_on_eks_fgac_iceberg_spark.operators import ORACLE, QUERIES
from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse
from sample_emr_on_eks_fgac_iceberg_spark.sql_frontend import SqlFrontend


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_reclaim_revalidates_before_overwriting_committed_snapshot(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10 (medium): a reclaimer whose metadata read predates a
    slow holder's commit steals the >stale-bound claim — but the holder
    already PASSED _verify_claim and wrote metadata at that sequence.
    Without post-claim revalidation the reclaimer overwrites the file at
    the same sequence and the slow commit is silently lost."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.create_table("t", "k int, v string")
    wh.insert_values("t", [(1, "a")])
    real = Warehouse._claim_version
    state = {"fired": False}

    def interleaved(self, name, seq):
        if not state["fired"] and name == "t":
            state["fired"] = True
            # the slow holder — a committer on ANOTHER host (no flock)
            # whose verify_claim already passed — finishes NOW: after
            # our metadata read, before our claim. Its leftover claim
            # file ages past the staleness bound, so we will reclaim it.
            w2 = Warehouse(self.spark, self.root)
            meta2 = w2._read_meta("t")
            stage = os.path.join(self.root, "_slow_stage")
            self.spark.createDataFrame(
                [(2, "slow")], "k int, v string"
            ).coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(
                f for f in os.listdir(stage) if f.endswith(".parquet")
            )
            os.replace(
                os.path.join(stage, part),
                os.path.join(w2.data_dir("t"), "part-slow.parquet"),
            )
            w2._write_claimed_snapshot(
                meta2, seq, "append", {"part-slow.parquet"}, None, None,
                None, None, None, False, None, None,
            )
            claim = os.path.join(self._meta_dir, f".t.commit-{seq}")
            open(claim, "w").close()
            old = _time.time() - Warehouse._CLAIM_STALE_S - 10
            os.utime(claim, (old, old))
        return real(self, name, seq)

    monkeypatch.setattr(Warehouse, "_claim_version", interleaved)
    wh.insert_values("t", [(3, "c")])  # must NOT lose (2, "slow")
    assert _rows(wh.read_table("t")) == [(1, "a"), (2, "slow"), (3, "c")]
    assert [s["sequence_number"] for s in wh.snapshots("t")] == [1, 2, 3]


def test_changelog_view_shadowed_by_later_table_raises(spark, tmp_path):
    """ADVICE r10 (low): the name collision is checked at CALL time, but
    a table created AFTER the CALL with the view's name must not
    silently shadow the registered changelog view at query time."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    fe = SqlFrontend(spark, wh)
    fe.execute("CREATE TABLE t (k INT)")
    fe.execute("INSERT INTO t VALUES (1)")
    fe.execute("CALL system.create_changelog_view(table => 't')")
    assert _rows(
        fe.execute("SELECT k, _change_type FROM t_changes")
    ) == [(1, "insert")]
    fe.execute("CREATE TABLE t_changes (k INT)")
    fe.execute("INSERT INTO t_changes VALUES (99)")
    with pytest.raises(ValueError, match="collides"):
        fe.execute("SELECT k FROM t_changes")


@pytest.fixture()
def synth_events_dir(tmp_path):
    """events.parquet with (a) 'flat': BOTH variant arms constant at a
    large magnitude where float cancellation (q − s·(s/n)) leaks a tiny
    fake variance, (b) 'mixed': one arm constant, one varying, and NO
    click/purchase events at all (empty conversion set)."""
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
            SELECT i AS event_id,
                   TIMESTAMP '2025-01-01 00:00:00' + INTERVAL (i) MINUTE AS ts,
                   i AS user_id,
                   CASE WHEN i < 40 THEN 'flat' ELSE 'mixed' END AS event_type,
                   CASE WHEN i < 40 THEN 123456.78
                        WHEN i % 2 = 0 THEN 10.00
                        ELSE 10.00 + (i % 7) END AS value,
                   '{{}}' AS props
            FROM range(80) t(i)
        ) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)
        """
    )
    return str(tmp_path)


def test_welch_drops_truly_constant_arms(spark, synth_events_dir):
    """ADVICE r10 (low): 'flat' (both arms constant at a
    cancellation-prone magnitude) must be DROPPED — the old float
    v_a + v_b > 0 guard could keep it and report a garbage t² — while
    'mixed' (one varying arm) survives. Spark and DuckDB oracle agree."""
    got = QUERIES["stats_ab_welch_t2"](spark, synth_events_dir).toPandas()
    assert list(got["event_type"]) == ["mixed"]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{synth_events_dir}/events.parquet'"
    )
    exp = con.sql(ORACLE["stats_ab_welch_t2"]).df()
    assert list(exp["event_type"]) == ["mixed"]
    g = got.sort_values("event_type").reset_index(drop=True)
    e = exp.sort_values("event_type").reset_index(drop=True)
    assert float(g["t2"][0]) == pytest.approx(float(e["t2"][0]), rel=0, abs=0)


def test_conversion_latency_empty_conversions_zero_rows(
    spark, synth_events_dir
):
    """ADVICE r10 (low): with zero converting users the oracle's GROUP BY
    emits no rows; the Spark side must too (not a 1-row null agg)."""
    got = QUERIES["events_conversion_latency_quantiles"](
        spark, synth_events_dir
    )
    assert got.count() == 0
    assert got.columns == ["n_users", "mean_s", "p50_s", "p90_s", "p99_s"]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{synth_events_dir}/events.parquet'"
    )
    assert len(con.sql(ORACLE["events_conversion_latency_quantiles"]).df()) == 0
