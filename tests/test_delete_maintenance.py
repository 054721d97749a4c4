"""Round-9 delete-file scoping, maintenance, and commit-conflict
safety.

Scale contract under test (VERDICT r8 "What's missing" #3/#4): a
sustained CDC-upsert stream adds one positional delete file per batch;
scans must prune the delete application to delete files whose recorded
refs intersect the scanned data files (Iceberg scopes delete files to
data files via manifest stats), `rewrite_position_delete_files`
maintenance must drop dangling deletes, and cross-process commit races
must surface as a clean CommitConflictError instead of a lost update.
"""

import pytest
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import (
    CommitConflictError,
    Warehouse,
)


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _pos_mor(wh, name="t", partition_by=None):
    wh.create_table(name, "k int, v string, p int", partition_by=partition_by)
    wh.set_delete_mode(name, "merge-on-read")  # no identifier fields → positional
    return name


# ---------------------------------------------------------------- scoping
def test_positional_delete_commit_records_kind_and_refs(wh):
    _pos_mor(wh)
    wh.insert_values("t", [(1, "a", 1), (2, "b", 1)])
    wh.delete_from("t", "k = 1")
    snap = wh.snapshots("t")[-1]
    assert snap["operation"] == "delete"
    added = snap["added_delete_files"]
    assert added
    assert snap["delete_kinds"] == {f: "positional" for f in added}
    live = wh._live_files(wh._read_meta("t"))
    for f in added:
        refs = snap["delete_refs"][f]
        assert refs and set(refs) <= live


def test_scan_skips_delete_files_for_other_partitions(wh):
    """The inputFiles-style assertion from VERDICT r8 task 3: a scan of
    partition p=2 must not read a delete file referencing only p=1."""
    _pos_mor(wh, partition_by=["p"])
    wh.insert_values("t", [(1, "a", 1), (2, "b", 1), (3, "c", 2), (4, "d", 2)])
    wh.delete_from("t", "k = 1 and p = 1")  # delete file references p=1 only
    ddir = wh.delete_dir("t")

    pruned = wh.read_table("t", filters=[("p", "=", 2)])
    assert not any(ddir in f for f in pruned.inputFiles()), (
        "scan of p=2 read a delete file referencing only p=1"
    )
    assert _rows(pruned) == [(3, "c", 2), (4, "d", 2)]

    hit = wh.read_table("t", filters=[("p", "=", 1)])
    assert any(ddir in f for f in hit.inputFiles()), (
        "scan of p=1 must apply its own delete file"
    )
    assert _rows(hit) == [(2, "b", 1)]


def test_equality_delete_with_spec_reserved_column_names(wh):
    """ADVICE r8: an equality-delete table whose identifier fields are
    literally named file_path/pos must still apply as EQUALITY deletes
    (kind now comes from snapshot metadata, not a schema sniff)."""
    wh.create_table("t", "file_path string, pos bigint, v string")
    wh.set_identifier_fields("t", ["file_path", "pos"])
    wh.set_delete_mode("t", "merge-on-read")
    wh.insert_values("t", [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")])
    wh.delete_from("t", "pos = 2")
    snap = wh.snapshots("t")[-1]
    assert set(snap["delete_kinds"].values()) == {"equality"}
    assert _rows(wh.read_table("t")) == [("a", 1, "x"), ("c", 3, "z")]
    # sequence rule still holds: re-insert of the deleted key survives
    wh.insert_values("t", [("b", 2, "y2")])
    assert ("b", 2, "y2") in _rows(wh.read_table("t"))


# ------------------------------------------------------------ maintenance
def test_rewrite_position_delete_files_drops_dangling(wh):
    """After a CoW rewrite removes the referenced data files, the old
    positional delete file is dangling; maintenance drops it without
    touching data files, and the scan result is unchanged."""
    _pos_mor(wh)
    wh.insert_values("t", [(i, f"v{i}", i % 2) for i in range(8)])
    wh.delete_from("t", "k in (1, 3)")  # positional delete file #1
    before = _rows(wh.read_table("t"))
    # compaction materializes the deletes and removes the delete files
    # from the live set, but leaves them on disk for history; roll the
    # table forward with another MoR delete so a LIVE delete file
    # exists alongside files the compaction rewrote
    wh.delete_from("t", "k = 5")  # positional delete file #2
    wh.compact_table("t")  # live set: compacted files, no live deletes
    wh.delete_from("t", "k = 7")  # delete file #3 references compacted files
    data_before = wh._data_files("t")
    stats = wh.rewrite_position_delete_files("t")
    assert stats["removed_delete_files"] >= 1
    assert wh._data_files("t") == data_before, "maintenance must not touch data"
    want = [r for r in before if r[0] not in (5, 7)]
    assert _rows(wh.read_table("t")) == want


def test_rewrite_position_delete_files_compacts_many_into_fresh_set(wh):
    """N per-batch delete files (the CDC-upsert shape) compact into a
    fresh file set whose refs cover only live files; result unchanged."""
    _pos_mor(wh)
    wh.insert_values("t", [(i, f"v{i}", 0) for i in range(10)])
    for k in (0, 2, 4, 6):
        wh.delete_from("t", f"k = {k}")
    meta = wh._read_meta("t")
    assert len(wh._live_delete_files(meta)) == 4
    want = _rows(wh.read_table("t"))
    stats = wh.rewrite_position_delete_files("t")
    assert stats["removed_delete_files"] == 4
    assert stats["added_delete_files"] >= 1
    assert stats["remaining_rows"] == 4
    meta = wh._read_meta("t")
    live_dels = wh._live_delete_files(meta)
    assert len(live_dels) == stats["added_delete_files"]
    kinds = wh._delete_kinds_from_meta(meta)
    assert all(kinds[f] == "positional" for f in live_dels)
    assert _rows(wh.read_table("t")) == want
    # idempotent: a second pass keeps the same rows
    wh.rewrite_position_delete_files("t")
    assert _rows(wh.read_table("t")) == want


def test_rewrite_position_delete_files_noop_without_positional(wh):
    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1)])
    stats = wh.rewrite_position_delete_files("t")
    assert stats == {
        "removed_delete_files": 0,
        "added_delete_files": 0,
        "remaining_rows": 0,
    }


# --------------------------------------------------------- commit conflicts
def test_concurrent_rewrite_of_same_file_raises_conflict(wh, spark, tmp_path):
    """Two Warehouse instances plan a CoW rewrite of the same file; the
    second commit must raise CommitConflictError, not lose the first."""
    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1), (2, "b", 1)])
    other = Warehouse(spark, str(tmp_path / "wh"))
    meta = wh._read_meta("t")  # second writer's (stale) plan-time metadata
    live_before = wh._live_files(meta)
    # first writer wins: rewrites the file(s) containing k=1
    other.delete_from("t", "k = 1")
    rewritten = live_before - wh._live_files(wh._read_meta("t"))
    assert rewritten, "CoW delete must have rewritten at least one file"
    # second writer planned against the OLD live set; replay its commit
    with pytest.raises(CommitConflictError):
        wh._commit_snapshot(meta, "delete", added=set(), removed=rewritten)


def test_non_overlapping_commits_both_succeed(wh, spark, tmp_path):
    other = Warehouse(spark, str(tmp_path / "wh"))
    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1)])
    other.insert_values("t", [(2, "b", 2)])
    wh.insert_values("t", [(3, "c", 1)])
    assert _rows(wh.read_table("t")) == [(1, "a", 1), (2, "b", 2), (3, "c", 1)]
    assert len(wh.snapshots("t")) == 3


def test_stale_version_claim_raises_conflict(wh):
    """A claim file for the next version (as a cross-host racer would
    leave) surfaces as CommitConflictError instead of a lost update."""
    import os

    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1)])
    meta = wh._read_meta("t")
    nxt = meta.snapshots[-1]["sequence_number"] + 1
    claim = os.path.join(wh._meta_dir, f".t.commit-{nxt}")
    open(claim, "w").close()
    with pytest.raises(CommitConflictError):
        wh.insert_values("t", [(2, "b", 1)])
    os.remove(claim)
    wh.insert_values("t", [(2, "b", 1)])  # retry after refresh succeeds
    assert _rows(wh.read_table("t")) == [(1, "a", 1), (2, "b", 1)]


def test_drop_table_clears_claims_for_recreate(wh):
    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1)])
    wh.drop_table("t")
    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(9, "z", 1)])  # seq 1 again — no stale claim
    assert _rows(wh.read_table("t")) == [(9, "z", 1)]


# ------------------------------------------------- positional MoR survives
def test_scoped_deletes_preserve_time_travel(wh):
    _pos_mor(wh, partition_by=["p"])
    wh.insert_values("t", [(1, "a", 1), (2, "b", 2)])
    s1 = wh.current_snapshot_id("t")
    wh.delete_from("t", "k = 1")
    assert _rows(wh.read_table("t")) == [(2, "b", 2)]
    assert _rows(wh.read_table("t", snapshot_id=s1)) == [(1, "a", 1), (2, "b", 2)]


def test_expire_snapshots_carries_delete_kinds_and_refs(wh):
    """A collapsed base manifest must keep kind/refs so scoping and
    equality/positional split survive log collapse."""
    _pos_mor(wh, partition_by=["p"])
    wh.insert_values("t", [(1, "a", 1), (2, "b", 1), (3, "c", 2)])
    wh.delete_from("t", "k = 1")
    wh.insert_values("t", [(4, "d", 2)])
    wh.expire_snapshots("t", keep_last=1)
    meta = wh._read_meta("t")
    base = meta.snapshots[0]
    assert base["delete_kinds"] and set(base["delete_kinds"].values()) == {
        "positional"
    }
    assert base["delete_refs"]
    assert _rows(wh.read_table("t")) == [(2, "b", 1), (3, "c", 2), (4, "d", 2)]
    # scoping still works off the collapsed metadata
    ddir = wh.delete_dir("t")
    pruned = wh.read_table("t", filters=[("p", "=", 2)])
    assert not any(ddir in f for f in pruned.inputFiles())


# --------------------------------------- equality-delete refs (round 10)
def _eq_mor(wh, name="t", partition_by=None):
    wh.create_table(name, "k int, v string, p int", partition_by=partition_by)
    wh.set_identifier_fields(name, ["k"])
    wh.set_delete_mode(name, "merge-on-read")  # identifier fields → equality
    return name


def test_equality_delete_commit_records_kind_and_refs(wh):
    _eq_mor(wh)
    wh.insert_values("t", [(1, "a", 1), (2, "b", 1)])
    stats = wh.delete_from("t", "k = 1")
    assert stats["deleted_rows"] == 1
    snap = wh.snapshots("t")[-1]
    assert snap["operation"] == "delete"
    added = snap["added_delete_files"]
    assert added
    assert snap["delete_kinds"] == {f: "equality" for f in added}
    live = wh._live_files(wh._read_meta("t"))
    for f in added:
        refs = snap["delete_refs"][f]
        assert refs and set(refs) <= live


def test_scan_skips_equality_delete_files_for_other_partitions(wh):
    """VERDICT r9 task 2's done criterion: a scan of partition p=2 must
    not read an equality-delete file whose refs name only p=1 files."""
    _eq_mor(wh, partition_by=["p"])
    wh.insert_values("t", [(1, "a", 1), (2, "b", 1), (3, "c", 2), (4, "d", 2)])
    wh.delete_from("t", "k = 1")  # matched rows live in p=1 only
    ddir = wh.delete_dir("t")

    pruned = wh.read_table("t", filters=[("p", "=", 2)])
    assert not any(ddir in f for f in pruned.inputFiles()), (
        "scan of p=2 read an equality-delete file referencing only p=1"
    )
    assert _rows(pruned) == [(3, "c", 2), (4, "d", 2)]

    hit = wh.read_table("t", filters=[("p", "=", 1)])
    assert any(ddir in f for f in hit.inputFiles()), (
        "scan of p=1 must apply its own equality-delete file"
    )
    assert _rows(hit) == [(2, "b", 1)]


def test_equality_delete_stream_scan_cost_stays_scoped(wh):
    """The sustained-MoR-delete-stream shape (VERDICT r9 missing #1): N
    per-statement equality-delete files against p=1 must not be read by
    a p=2 scan at all."""
    _eq_mor(wh, partition_by=["p"])
    wh.insert_values("t", [(i, f"v{i}", 1) for i in range(6)] + [(10, "x", 2)])
    for k in range(4):
        wh.delete_from("t", f"k = {k}")
    ddir = wh.delete_dir("t")
    assert len(wh._live_delete_files(wh._read_meta("t"))) == 4
    pruned = wh.read_table("t", filters=[("p", "=", 2)])
    assert not any(ddir in f for f in pruned.inputFiles())
    assert _rows(pruned) == [(10, "x", 2)]
    assert _rows(wh.read_table("t")) == [(4, "v4", 1), (5, "v5", 1), (10, "x", 2)]


@pytest.mark.slow
def test_rewrite_drops_dangling_equality_deletes(wh):
    """A CoW UPDATE rewrites every data file the equality deletes
    reference (the rewritten copies carry a higher sequence, so the old
    delete files can never subtract anything again); the maintenance
    pass must drop them from the live set."""
    _eq_mor(wh)
    # ONE data file holding all rows: after the equality deletes, a CoW
    # update of the surviving rows rewrites that file, so the delete
    # files' refs point only at the dead pre-rewrite file
    df = wh.spark.createDataFrame(
        [(i, f"v{i}", i % 2) for i in range(8)], "k int, v string, p int"
    ).coalesce(1)
    wh.insert_into("t", df)
    wh.delete_from("t", "k = 1")
    wh.delete_from("t", "k = 3")
    wh.update_where("t", {"v": "concat(v, '!')"})
    want = _rows(wh.read_table("t"))
    # a fresh post-rewrite delete stays live (its refs hit live files)
    wh.delete_from("t", "k = 5")
    want = [r for r in want if r[0] != 5]
    meta = wh._read_meta("t")
    live_before = set(wh._live_delete_files(meta))
    stats = wh.rewrite_position_delete_files("t")
    assert stats["removed_delete_files"] >= 2
    meta = wh._read_meta("t")
    live_after = set(wh._live_delete_files(meta))
    assert len(live_after) < len(live_before)
    kinds = wh._delete_kinds_from_meta(meta)
    refs = wh._delete_refs_from_meta(meta)
    live_data = wh._live_files(meta)
    for f in live_after:
        if kinds.get(f) == "equality":
            assert f in refs and not refs[f].isdisjoint(live_data)
    assert _rows(wh.read_table("t")) == want


def test_rewrite_dangling_equality_only_no_positional(wh):
    """Maintenance with ONLY dangling equality deletes (no positional
    files at all) still commits the drop."""
    _eq_mor(wh)
    df = wh.spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k int, v string, p int"
    ).coalesce(1)
    wh.insert_into("t", df)  # one data file holding both rows
    wh.delete_from("t", "k = 1")
    wh.update_where("t", {"v": "concat(v, '!')"})  # CoW rewrite → dangling
    want = _rows(wh.read_table("t"))
    stats = wh.rewrite_position_delete_files("t")
    assert stats["removed_delete_files"] == 1
    assert stats["added_delete_files"] == 0
    assert wh._live_delete_files(wh._read_meta("t")) == {}
    assert _rows(wh.read_table("t")) == want


# ------------------------------------------ commit auto-retry (round 10)
def test_claim_race_auto_retries_append(wh, monkeypatch):
    """An append that loses the O_EXCL claim race succeeds on a later
    attempt without caller-side retry (Iceberg commit.retry semantics)."""
    from sample_emr_on_eks_fgac_iceberg_spark.sources import warehouse as W

    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1)])
    real = Warehouse._claim_version
    races = {"n": 0}

    def flaky(self, name, seq):
        if races["n"] < 2:
            races["n"] += 1
            raise W._CommitClaimRace("synthetic claim race")
        return real(self, name, seq)

    monkeypatch.setattr(Warehouse, "_claim_version", flaky)
    wh.insert_values("t", [(2, "b", 1)])  # no caller-side retry needed
    assert races["n"] == 2
    assert _rows(wh.read_table("t")) == [(1, "a", 1), (2, "b", 1)]


def test_genuine_conflict_not_retried(wh, spark, tmp_path, monkeypatch):
    """Validation conflicts (planned files no longer live) must raise
    immediately — re-planning, not retrying, is the fix."""
    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1), (2, "b", 1)])
    other = Warehouse(spark, str(tmp_path / "wh"))
    meta = wh._read_meta("t")
    live_before = wh._live_files(meta)
    other.delete_from("t", "k = 1")
    rewritten = live_before - wh._live_files(wh._read_meta("t"))
    calls = {"n": 0}
    real = Warehouse._commit_snapshot_attempt

    def counting(self, *a, **k):
        calls["n"] += 1
        return real(self, *a, **k)

    monkeypatch.setattr(Warehouse, "_commit_snapshot_attempt", counting)
    with pytest.raises(CommitConflictError):
        wh._commit_snapshot(meta, "delete", added=set(), removed=rewritten)
    assert calls["n"] == 1, "validation conflict must not be auto-retried"


def test_interleaved_writers_both_succeed_without_caller_retry(
    wh, spark, tmp_path
):
    """VERDICT r9 task 3's done shape: two writers interleaving appends
    (separate Warehouse instances) all land; none raises."""
    import threading

    wh.create_table("t", "k int, v string, p int")
    other = Warehouse(spark, str(tmp_path / "wh"))
    errs = []

    def writer(w, base):
        try:
            for i in range(3):
                w.insert_values("t", [(base + i, f"w{base}", 1)])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=writer, args=(wh, 0))
    t2 = threading.Thread(target=writer, args=(other, 100))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, f"interleaved appends failed: {errs}"
    assert len(wh.snapshots("t")) == 6
    assert len(_rows(wh.read_table("t"))) == 6


def test_failed_commit_releases_claim(wh):
    """ADVICE r9 (medium): a commit that fails AFTER claiming (footer
    read error) must release the claim so the retried statement
    succeeds instead of conflicting forever."""
    import os

    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1)])
    meta = wh._read_meta("t")
    nxt = meta.snapshots[-1]["sequence_number"] + 1
    claim = os.path.join(wh._meta_dir, f".t.commit-{nxt}")
    with pytest.raises(Exception):
        # nonexistent added file → pyarrow footer read fails post-claim
        wh._commit_snapshot(meta, "append", added={"no-such-file.parquet"})
    assert not os.path.exists(claim), "failed commit left its claim behind"
    wh.insert_values("t", [(2, "b", 1)])  # same seq now succeeds
    assert _rows(wh.read_table("t")) == [(1, "a", 1), (2, "b", 1)]


def test_abandoned_stale_claim_is_reclaimed(wh):
    """A crash leftover (claim older than the staleness bound with no
    metadata at its seq) must be reclaimed, not conflict forever."""
    import os, time as _time

    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1)])
    meta = wh._read_meta("t")
    nxt = meta.snapshots[-1]["sequence_number"] + 1
    claim = os.path.join(wh._meta_dir, f".t.commit-{nxt}")
    open(claim, "w").close()
    old = _time.time() - Warehouse._CLAIM_STALE_S - 10
    os.utime(claim, (old, old))
    wh.insert_values("t", [(2, "b", 1)])  # reclaims, no error
    assert _rows(wh.read_table("t")) == [(1, "a", 1), (2, "b", 1)]


def test_expire_snapshots_prunes_old_claims(wh):
    """ADVICE r9 (low): claims at or below the collapsed base sequence
    (and past the staleness bound) are pruned by expire_snapshots."""
    import os, time as _time

    wh.create_table("t", "k int, v string, p int")
    for i in range(4):
        wh.insert_values("t", [(i, f"v{i}", 1)])
    claims = [
        f for f in os.listdir(wh._meta_dir) if f.startswith(".t.commit-")
    ]
    assert len(claims) == 4
    old = _time.time() - Warehouse._CLAIM_STALE_S - 10
    for f in claims:
        p = os.path.join(wh._meta_dir, f)
        os.utime(p, (old, old))
    wh.expire_snapshots("t", keep_last=1)
    left = [f for f in os.listdir(wh._meta_dir) if f.startswith(".t.commit-")]
    assert left == [], f"claims not pruned: {left}"
    assert len(_rows(wh.read_table("t"))) == 4


# --------------------------- randomized writer interleaving (round 10)
@pytest.mark.slow
def test_randomized_interleaved_writers_converge(wh, spark, tmp_path):
    """Property: a seeded random interleaving of append / MoR-delete /
    maintenance operations from TWO Warehouse instances (same table)
    produces exactly the rows a serial dict-model predicts — commits
    auto-retry claim races, validation conflicts abort cleanly, and no
    update is ever lost."""
    import random

    rng = random.Random(1234)
    wh.create_table("t", "k int, v string, p int")
    wh.set_identifier_fields("t", ["k"])
    wh.set_delete_mode("t", "merge-on-read")
    other = Warehouse(spark, str(tmp_path / "wh"))
    writers = [wh, other]
    model: dict[int, tuple] = {}
    next_k = 0
    for step in range(14):
        w = writers[rng.randrange(2)]
        op = rng.choice(["insert", "insert", "delete", "maint"])
        if op == "insert":
            rows = [
                (next_k + i, f"s{step}", (next_k + i) % 3) for i in range(3)
            ]
            next_k += 3
            w.insert_values("t", rows)
            for r in rows:
                model[r[0]] = r
        elif op == "delete" and model:
            k = rng.choice(sorted(model))
            w.delete_from("t", f"k = {k}")
            del model[k]
        elif op == "maint":
            if rng.random() < 0.5:
                w.rewrite_position_delete_files("t")
            else:
                w.expire_snapshots("t", keep_last=3)
    got = sorted(tuple(r) for r in wh.read_table("t").collect())
    assert got == sorted(model.values())
    # the other instance (fresh metadata read) agrees
    got2 = sorted(tuple(r) for r in other.read_table("t").collect())
    assert got2 == got


def test_stolen_claim_aborts_without_lost_update(wh, monkeypatch):
    """If a reclaimer steals the claim between acquisition and the
    metadata write (this committer outlived the staleness bound), the
    commit must abort retryably WITHOUT writing metadata and WITHOUT
    unlinking the thief's claim."""
    import os

    wh.create_table("t", "k int, v string, p int")
    wh.insert_values("t", [(1, "a", 1)])
    with wh._table_lock("t"):
        meta = wh._read_meta("t")
        meta.properties["commit.retry.num-retries"] = "0"
        wh._write_meta(meta)
    real = Warehouse._claim_version
    state = {}

    def thieving(self, name, seq):
        claim, token = real(self, name, seq)
        with open(claim, "w") as f:
            f.write("thief")
        state["claim"] = claim
        return claim, token

    monkeypatch.setattr(Warehouse, "_claim_version", thieving)
    with pytest.raises(CommitConflictError):
        wh.insert_values("t", [(2, "b", 1)])
    monkeypatch.undo()
    assert len(wh.snapshots("t")) == 1, "stolen claim must not commit"
    with open(state["claim"]) as f:
        assert f.read() == "thief", "cleanup must not unlink the thief's claim"
    os.remove(state["claim"])
    wh.insert_values("t", [(2, "b", 1)])  # normal retry path succeeds
    assert _rows(wh.read_table("t")) == [(1, "a", 1), (2, "b", 1)]
