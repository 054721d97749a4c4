"""Write-audit-publish (Iceberg's WAP / cherrypick_snapshot workflow).

The pattern a production lakehouse uses to gate data quality: write a
batch as a STAGED snapshot (invisible to consumers), audit it by
reading the staged snapshot directly, then publish (cherry-pick) to
make it the table head — or walk away and let expiry reclaim it.
"""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.warehouse import (
    SnapshotNotFoundError,
    Warehouse,
)


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    w.create_table("t", "k int, v string")
    w.insert_values("t", [(1, "live")])
    return w


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _stage(wh, rows):
    df = wh.spark.createDataFrame(rows, wh.schema_of("t"))
    return wh.insert_into("t", df, staged=True)


def test_staged_write_invisible_until_published(wh):
    sid = _stage(wh, [(2, "staged")])
    assert isinstance(sid, int)
    # consumers see only the live data
    assert _rows(wh.read_table("t")) == [(1, "live")]
    # the audit read targets the staged snapshot and sees both
    assert _rows(wh.read_table("t", snapshot_id=sid)) == [(1, "live"), (2, "staged")]
    wh.publish_snapshot("t", sid)
    assert _rows(wh.read_table("t")) == [(1, "live"), (2, "staged")]


def test_publish_guards(wh):
    sid = _stage(wh, [(2, "x")])
    with pytest.raises(SnapshotNotFoundError):
        wh.publish_snapshot("t", 99)
    with pytest.raises(ValueError, match="not staged"):
        wh.publish_snapshot("t", 1)
    wh.publish_snapshot("t", sid)
    with pytest.raises(ValueError, match="already published"):
        wh.publish_snapshot("t", sid)


def test_unpublished_stage_is_abandonable(wh):
    _stage(wh, [(2, "bad")])
    wh.insert_values("t", [(3, "more")])  # live append after staging
    assert _rows(wh.read_table("t")) == [(1, "live"), (3, "more")]
    # expiry reclaims the staged files once the snapshot leaves history
    stats = wh.expire_snapshots("t", keep_last=1)
    assert stats["deleted_files"] >= 1
    assert _rows(wh.read_table("t")) == [(1, "live"), (3, "more")]


def test_staged_snapshot_is_not_table_head(wh):
    _stage(wh, [(2, "staged")])
    assert wh.current_snapshot_id("t") == 1
    # tags/branches created now pin the live head, not the staged one
    wh.create_tag("t", "audit-point")
    assert wh.resolve_ref("t", "audit-point") == 1


def test_publish_resequences_past_equality_deletes(wh):
    wh.set_identifier_fields("t", ["k"])
    wh.set_delete_mode("t", "merge-on-read")
    sid = _stage(wh, [(9, "staged")])
    # a delete of k=9 committed while the batch sits in staging
    wh.insert_values("t", [(9, "pre")])
    wh.delete_from("t", "k = 9")
    assert _rows(wh.read_table("t")) == [(1, "live")]
    # publish assigns the staged files a sequence AFTER the delete, so
    # the published rows survive (Iceberg cherry-pick semantics)
    wh.publish_snapshot("t", sid)
    assert _rows(wh.read_table("t")) == [(1, "live"), (9, "staged")]
