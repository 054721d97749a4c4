"""read_changes(mode='cdc') — the consumer-side counterpart of the
round-8 CDC-upsert sink (VERDICT r8 task 1): row-accurate _change_type
insert/delete rows per snapshot (update = delete+insert pair), computed
from each snapshot's added data files plus the pre-images of its added
delete files / removed data files. Iceberg parity: the semantics of
``create_changelog_view``.
"""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _changes(df):
    return sorted(
        (tuple(r)[: -3] + (r._change_type, r._change_ordinal, r._commit_snapshot_id))
        for r in df.collect()
    )


def _mor_merge_table(wh):
    wh.create_table("t", "id bigint, val string, amt bigint")
    with wh._table_lock("t"):
        meta = wh._read_meta("t")
        meta.properties["write.merge.mode"] = "merge-on-read"
        meta.properties["write.delete.mode"] = "merge-on-read"
        wh._write_meta(meta)
    return "t"


def test_cdc_mor_merge_emits_delete_insert_pairs(wh, spark):
    _mor_merge_table(wh)
    wh.insert_values("t", [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    s1 = wh.current_snapshot_id("t")
    src = spark.createDataFrame(
        [(2, "b2", 25, "U"), (3, None, 0, "D"), (4, "d", 40, "I")],
        "id bigint, val string, amt bigint, op string",
    )
    wh.merge_into(
        "t", src, "t.id = s.id",
        matched_clauses=[
            {"action": "delete", "condition": "s.op = 'D'"},
            {"action": "update", "set": {"val": "s.val", "amt": "s.amt"},
             "condition": None},
        ],
        not_matched_clauses=[{"condition": None, "values": True}],
        not_matched_insert=None,
    )
    got = _changes(wh.read_changes("t", from_snapshot_id=s1, mode="cdc"))
    assert got == sorted([
        (2, "b", 20, "delete", 0, 2),
        (3, "c", 30, "delete", 0, 2),
        (2, "b2", 25, "insert", 0, 2),
        (4, "d", 40, "insert", 0, 2),
    ])


def test_cdc_equality_delete_preimage(wh):
    wh.create_table("t", "k int, v string")
    wh.set_identifier_fields("t", ["k"])
    wh.set_delete_mode("t", "merge-on-read")
    wh.insert_values("t", [(1, "a"), (2, "b"), (3, "c")])
    s1 = wh.current_snapshot_id("t")
    wh.delete_from("t", "k = 2")
    got = _changes(wh.read_changes("t", from_snapshot_id=s1, mode="cdc"))
    assert got == [(2, "b", "delete", 0, 2)]


def test_cdc_cow_delete_emits_pairs_for_carried_rows(wh):
    """Copy-on-write rewrites emit removed-file rows as deletes and
    added-file rows as inserts — carried rows appear as a delete+insert
    pair, exactly as Iceberg's changelog represents a CoW commit."""
    wh.create_table("t", "k int, v string")
    wh.insert_values("t", [(1, "a"), (2, "b")])
    s1 = wh.current_snapshot_id("t")
    wh.delete_from("t", "k = 1")
    rows = wh.read_changes("t", from_snapshot_id=s1, mode="cdc").collect()
    dels = sorted((r.k, r.v) for r in rows if r._change_type == "delete")
    ins = sorted((r.k, r.v) for r in rows if r._change_type == "insert")
    # every removed-file row deleted; survivors re-inserted (the pair)
    assert (1, "a") in dels
    assert ins == [r for r in dels if r != (1, "a")]


def test_cdc_ordinals_and_multi_snapshot_range(wh):
    wh.create_table("t", "k int, v string")
    wh.insert_values("t", [(1, "a")])
    wh.insert_values("t", [(2, "b")])
    wh.insert_values("t", [(3, "c")])
    got = _changes(wh.read_changes("t", mode="cdc"))
    assert got == [
        (1, "a", "insert", 0, 1),
        (2, "b", "insert", 1, 2),
        (3, "c", "insert", 2, 3),
    ]
    # bounded range: only snapshot 2
    got = _changes(
        wh.read_changes("t", from_snapshot_id=1, to_snapshot_id=2, mode="cdc")
    )
    assert got == [(2, "b", "insert", 0, 2)]


def test_cdc_skips_compaction_and_maintenance(wh):
    _mor_merge_table(wh)
    wh.insert_values("t", [(1, "a", 10), (2, "b", 20)])
    wh.delete_from("t", "id = 1")
    s = wh.current_snapshot_id("t")
    wh.compact_table("t")  # replace snapshot: net-zero for a consumer
    got = wh.read_changes("t", from_snapshot_id=s, mode="cdc")
    assert got.count() == 0
    assert "_change_type" in got.columns


def test_cdc_empty_table_schema(wh):
    wh.create_table("t", "k int, v string")
    df = wh.read_changes("t", mode="cdc")
    assert df.count() == 0
    assert df.columns == ["k", "v", "_change_type", "_change_ordinal",
                          "_commit_snapshot_id"]


def test_changelog_tail_cdc_mode_no_duplicate_changes(wh, spark, tmp_path):
    """VERDICT r8 task 1 'done' criterion: a replayed (un-acked) poll
    returns the same changes; after ack the next poll is empty — the
    consumer never emits duplicate changes across restarts."""
    from sample_emr_on_eks_fgac_iceberg_spark.streaming.ingest import ChangelogTail

    _mor_merge_table(wh)
    wh.insert_values("t", [(1, "a", 10), (2, "b", 20)])
    ckpt = str(tmp_path / "cdc.ckpt")
    tail = ChangelogTail(wh, "t", ckpt, mode="cdc")
    df1, head1 = tail.poll()
    first = _changes(df1)
    assert head1 is not None and len(first) == 2
    # crash before ack: a fresh consumer re-polls the SAME delta
    again = ChangelogTail(wh, "t", ckpt, mode="cdc")
    df2, head2 = again.poll()
    assert head2 == head1 and _changes(df2) == first
    again.ack(head2)
    # after ack: nothing new, no re-emission
    df3, head3 = again.poll()
    assert head3 is None and df3.count() == 0
    # an upsert batch later: only ITS changes appear
    src = spark.createDataFrame([(2, "B", 21)], "id bigint, val string, amt bigint")
    wh.merge_into("t", src, "t.id = s.id",
                  matched_update={"val": "s.val", "amt": "s.amt"})
    df4, head4 = again.poll()
    got = _changes(df4)
    assert [g[:4] for g in got] == [(2, "B", 21, "insert"), (2, "b", 20, "delete")]
    again.ack(head4)
    assert again.poll()[1] is None


def test_changelog_tail_cdc_never_raises_rewrite_error(wh):
    from sample_emr_on_eks_fgac_iceberg_spark.streaming.ingest import ChangelogTail

    wh.create_table("t", "k int, v string")
    wh.insert_values("t", [(1, "a"), (2, "b")])
    wh.update_where("t", {"v": "'z'"}, "k = 1")  # CoW rewrite commit
    tail = ChangelogTail(wh, "t", "/dev/null/nope", mode="cdc")
    tail.checkpoint_path = None  # force fresh
    tail._committed = lambda: None
    df, head = tail.poll()  # append-mode would raise ChangelogRewriteError
    assert head is not None
    assert {r._change_type for r in df.collect()} == {"insert", "delete"}


@pytest.mark.slow
def test_cdc_replication_loop_replica_converges(wh, spark, tmp_path):
    """The full round-trip: upsert producer (merge-on-read MERGE) →
    ChangelogTail(mode='cdc') → apply_changelog onto a replica — after
    every acked poll the replica equals the source, including deletes,
    and a replayed apply (same txn batch) is a no-op."""
    from sample_emr_on_eks_fgac_iceberg_spark.streaming.ingest import (
        ChangelogTail,
        apply_changelog,
    )

    _mor_merge_table(wh)
    wh.create_table("replica", "id bigint, val string, amt bigint")
    with wh._table_lock("replica"):
        meta = wh._read_meta("replica")
        meta.properties["write.merge.mode"] = "merge-on-read"
        wh._write_meta(meta)
    tail = ChangelogTail(wh, "t", str(tmp_path / "rep.ckpt"), mode="cdc")

    def rows(name):
        return sorted(tuple(r) for r in wh.read_table(name).collect())

    def drain(batch_id):
        df, head = tail.poll()
        if head is None:
            return
        apply_changelog(wh, "replica", df, ["id"], txn=("rep", batch_id))
        tail.ack(head)

    # batch 1: initial load
    wh.insert_values("t", [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    drain(0)
    assert rows("replica") == rows("t")

    # batch 2: update + delete + insert in one MERGE
    src = spark.createDataFrame(
        [(2, "B", 25, "U"), (3, None, 0, "D"), (4, "d", 40, "I")],
        "id bigint, val string, amt bigint, op string",
    )
    wh.merge_into(
        "t", src, "t.id = s.id",
        matched_clauses=[
            {"action": "delete", "condition": "s.op = 'D'"},
            {"action": "update", "set": {"val": "s.val", "amt": "s.amt"},
             "condition": None},
        ],
        not_matched_clauses=[{"condition": None, "values": True}],
        not_matched_insert=None,
    )
    drain(1)
    assert rows("replica") == rows("t") == [
        (1, "a", 10), (2, "B", 25), (4, "d", 40)
    ]

    # replayed apply of the same batch id: fenced no-op
    df, head = ChangelogTail(wh, "t", str(tmp_path / "rep2.ckpt"), mode="cdc").poll()
    r = apply_changelog(wh, "replica", df, ["id"], txn=("rep", 1))
    assert r.get("skipped") is True
    assert rows("replica") == rows("t")

    # batch 3: plain delete, then another update — multi-snapshot poll
    wh.set_delete_mode("t", "merge-on-read")
    wh.delete_from("t", "id = 1")
    wh.update_where("t", {"amt": "amt + 1"}, "id = 2")
    drain(2)
    assert rows("replica") == rows("t") == [(2, "B", 26), (4, "d", 40)]


def test_cdc_compute_updates_pairs_become_updates(wh, spark):
    _mor_merge_table(wh)
    wh.set_identifier_fields("t", ["id"])
    wh.insert_values("t", [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    s1 = wh.current_snapshot_id("t")
    src = spark.createDataFrame(
        [(2, "b2", 25, "U"), (3, None, 0, "D"), (4, "d", 40, "I")],
        "id bigint, val string, amt bigint, op string",
    )
    wh.merge_into(
        "t", src, "t.id = s.id",
        matched_clauses=[
            {"action": "delete", "condition": "s.op = 'D'"},
            {"action": "update", "set": {"val": "s.val", "amt": "s.amt"},
             "condition": None},
        ],
        not_matched_clauses=[{"condition": None, "values": True}],
        not_matched_insert=None,
    )
    got = sorted(
        (r.id, r.val, r._change_type)
        for r in wh.read_changes(
            "t", from_snapshot_id=s1, mode="cdc", compute_updates=True
        ).collect()
    )
    assert got == [
        (2, "b", "update_before"),
        (2, "b2", "update_after"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]


def test_cdc_net_changes_cancels_within_range(wh):
    wh.create_table("t", "k int, v string")
    wh.set_delete_mode("t", "merge-on-read")
    wh.insert_values("t", [(1, "a"), (2, "b")])
    wh.insert_values("t", [(3, "c")])
    wh.delete_from("t", "k = 3")  # inserted then deleted inside range
    got = sorted(
        (r.k, r.v, r._change_type)
        for r in wh.read_changes("t", mode="cdc", net_changes=True).collect()
    )
    assert got == [(1, "a", "insert"), (2, "b", "insert")]


def test_cdc_option_validation(wh):
    wh.create_table("t", "k int, v string")
    with pytest.raises(ValueError):
        wh.read_changes("t", mode="append", compute_updates=True)
    with pytest.raises(ValueError):
        wh.read_changes("t", mode="cdc", compute_updates=True, net_changes=True)
    with pytest.raises(ValueError):
        wh.read_changes("t", mode="cdc", compute_updates=True)  # no keys


def test_incremental_agg_maintenance_equals_rescan(wh, spark):
    """The maintained rollup (base agg + CDC delta fold) must equal a
    direct rescan of the current table — across updates, deletes, and
    inserts, and across MULTIPLE maintenance cycles."""
    from pyspark.sql import functions as F

    wh.create_table("m", "grp string, k bigint, amt bigint")
    with wh._table_lock("m"):
        meta = wh._read_meta("m")
        meta.properties["write.merge.mode"] = "merge-on-read"
        meta.properties["write.delete.mode"] = "merge-on-read"
        wh._write_meta(meta)
    wh.insert_values("m", [("a", 1, 5), ("a", 2, 7), ("b", 3, 11)])
    snap = wh.current_snapshot_id("m")
    base = wh.read_table("m", snapshot_id=snap).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amt").alias("s")
    )

    def maintain(base, from_snap, to_snap):
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = (
            wh.read_changes("m", from_snapshot_id=from_snap,
                            to_snapshot_id=to_snap, mode="cdc")
            .groupBy("grp")
            .agg(F.sum(sign).alias("dn"), F.sum(sign * F.col("amt")).alias("ds"))
        )
        return (
            base.join(delta, "grp", "full_outer")
            .select(
                "grp",
                (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
                (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("s"),
            )
            .filter(F.col("n") > 0)
        )

    # cycle 1: upsert batch
    src = spark.createDataFrame(
        [("a", 2, 9), ("b", 4, 13)], "grp string, k bigint, amt bigint"
    )
    wh.merge_into("m", src, "t.k = s.k", matched_update={"amt": "s.amt"})
    head = wh.current_snapshot_id("m")
    got = maintain(base, snap, head).localCheckpoint()
    want = wh.read_table("m").groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amt").alias("s")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # cycle 2: delete a whole group, maintain from the previous head
    wh.delete_from("m", "grp = 'a'")
    got2 = maintain(got, head, wh.current_snapshot_id("m"))
    want2 = wh.read_table("m").groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("amt").alias("s")
    )
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, want2.collect()))


@pytest.mark.slow
def test_streaming_rollup_maintenance_loop(wh, spark, tmp_path):
    """ChangelogTail(mode='cdc') + maintain_rollup: a stored per-group
    rollup stays equal to a direct rescan across upserts, deletes, and
    group birth/death, with exactly-once replay fencing."""
    from pyspark.sql import functions as F

    from sample_emr_on_eks_fgac_iceberg_spark.streaming.ingest import (
        ChangelogTail,
        maintain_rollup,
    )

    _mor_merge_table(wh)
    wh.create_table("rollup", "val string, n_rows bigint, sum_amt bigint")
    tail = ChangelogTail(wh, "t", str(tmp_path / "roll.ckpt"), mode="cdc")
    batch = [0]

    def drain():
        df, head = tail.poll()
        if head is not None:
            maintain_rollup(
                wh, "rollup", df, ["val"], ["amt"], txn=("roll", batch[0])
            )
            tail.ack(head)
            batch[0] += 1

    def rescan():
        return sorted(
            map(
                tuple,
                wh.read_table("t")
                .groupBy("val")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("amt").alias("sum_amt"),
                )
                .collect(),
            )
        )

    def stored():
        return sorted(map(tuple, wh.read_table("rollup").collect()))

    wh.insert_values("t", [(1, "a", 10), (2, "a", 20), (3, "b", 30)])
    drain()
    assert stored() == rescan() == [("a", 2, 30), ("b", 1, 30)]

    # upsert batch: group 'b' dies (delete), 'a' shrinks+grows, 'c' born
    src = spark.createDataFrame(
        [(3, None, 0, "D"), (2, "a", 25, "U"), (4, "c", 40, "I")],
        "id bigint, val string, amt bigint, op string",
    )
    wh.merge_into(
        "t", src, "t.id = s.id",
        matched_clauses=[
            {"action": "delete", "condition": "s.op = 'D'"},
            {"action": "update", "set": {"val": "s.val", "amt": "s.amt"},
             "condition": None},
        ],
        not_matched_clauses=[{"condition": None, "values": True}],
        not_matched_insert=None,
    )
    drain()
    assert stored() == rescan() == [("a", 2, 35), ("c", 1, 40)]

    # replayed frame with the same txn: fenced no-op
    df, head = ChangelogTail(
        wh, "t", str(tmp_path / "roll2.ckpt"), mode="cdc"
    ).poll()
    r = maintain_rollup(wh, "rollup", df, ["val"], ["amt"], txn=("roll", 1))
    assert r.get("skipped") is True
    assert stored() == rescan()

    # a delete emptying another group, multi-snapshot drain
    wh.delete_from("t", "val = 'c'")
    wh.update_where("t", {"amt": "amt + 5"}, "id = 2")
    drain()
    assert stored() == rescan() == [("a", 2, 40)]


@pytest.mark.slow
def test_apply_changelog_compute_updates_frame_post_image_wins(wh, spark):
    """ADVICE r9: a compute_updates frame (update_before/update_after)
    applied through apply_changelog must land the POST-image —
    lexicographic _change_type ordering would pick 'update_before' and
    regress the replica to stale values."""
    from sample_emr_on_eks_fgac_iceberg_spark.streaming.ingest import (
        apply_changelog,
    )

    _mor_merge_table(wh)
    wh.set_identifier_fields("t", ["id"])
    wh.create_table("replica", "id bigint, val string, amt bigint")
    wh.insert_values("t", [(1, "a", 10), (2, "b", 20)])
    wh.insert_values("replica", [(1, "a", 10), (2, "b", 20)])
    s1 = wh.current_snapshot_id("t")
    wh.update_where("t", {"val": "'b2'", "amt": "25"}, "id = 2")
    changes = wh.read_changes(
        "t", from_snapshot_id=s1, mode="cdc", compute_updates=True
    )
    assert {r._change_type for r in changes.collect()} == {
        "update_before", "update_after"
    }
    apply_changelog(wh, "replica", changes, ["id"])
    assert sorted(tuple(r) for r in wh.read_table("replica").collect()) == [
        (1, "a", 10), (2, "b2", 25)
    ]
    # a key ABSENT from the replica upserts from its update_after row
    wh.create_table("replica2", "id bigint, val string, amt bigint")
    wh.insert_values("replica2", [(1, "a", 10)])
    apply_changelog(wh, "replica2", changes, ["id"])
    assert sorted(tuple(r) for r in wh.read_table("replica2").collect()) == [
        (1, "a", 10), (2, "b2", 25)
    ]


def test_cdc_equality_preimage_scoped_to_refs(wh, spark):
    """Round 10: the equality-delete pre-image read must be restricted
    to the data files the delete commit recorded — a changelog read
    after deleting p=1 rows must not open p=2's data files."""
    wh.create_table("t", "k bigint, v string, p int", partition_by=["p"])
    wh.set_identifier_fields("t", ["k"])
    wh.set_delete_mode("t", "merge-on-read")
    wh.insert_values("t", [(1, "a", 1), (2, "b", 1), (3, "c", 2), (4, "d", 2)])
    s1 = wh.current_snapshot_id("t")
    wh.delete_from("t", "k = 1")  # matched rows live in p=1 only
    df = wh.read_changes("t", from_snapshot_id=s1, mode="cdc")
    files = df.inputFiles()
    data_files = [f for f in files if "/data/" in f]
    assert data_files, "pre-image read must open the referenced file"
    assert not any("p=2" in f for f in data_files), (
        "equality pre-image read opened a non-referenced partition"
    )
    got = sorted((r.k, r.v, r._change_type) for r in df.collect())
    assert got == [(1, "a", "delete")]
