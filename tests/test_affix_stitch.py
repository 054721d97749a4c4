"""dedup_affix_stitch: seam detection plus the round-10 star-edge head
report (VERDICT r9 task 6 — the pairwise head branch was quadratic on a
hot boilerplate prefix; star edges keep identical connected components
with linear output)."""

import os

from sample_emr_on_eks_fgac_iceberg_spark.operators.dedup import (
    dedup_affix_stitch,
    _AFFIX_W,
)


def _docs_dir(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(sf, "documents.parquet"))
    return sf


def _words(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_hot_boilerplate_prefix_emits_linear_star(spark, tmp_path):
    """10³ docs sharing one scraped-page preamble: output must be
    n-1 star edges from the min-id exemplar, not ~n²/2 pairs."""
    n = 1000
    preamble = _words("p", _AFFIX_W)
    rows = [
        (i, f"{preamble} {_words(f'body{i}_', _AFFIX_W + 3)}")
        for i in range(n)
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = dedup_affix_stitch(spark, sf).collect()
    heads = [r for r in out if r.kind == "head"]
    assert len(heads) == n - 1, "head branch must be linear in members"
    assert all(r.a_id == 0 for r in heads), "exemplar is the min doc_id"
    assert sorted(r.b_id for r in heads) == list(range(1, n))
    assert not [r for r in out if r.kind == "seam"]


def test_seam_and_head_detection(spark, tmp_path):
    """A seam (doc A's suffix == doc B's prefix) and a 3-doc head
    cluster, with an unrelated singleton emitting nothing."""
    overlap = _words("ov", _AFFIX_W)
    boiler = _words("bo", _AFFIX_W)
    rows = [
        (1, f"{_words('a', _AFFIX_W + 2)} {overlap}"),      # ends with overlap
        (2, f"{overlap} {_words('b', _AFFIX_W + 2)}"),      # starts with it
        (10, f"{boiler} {_words('x', _AFFIX_W)}"),
        (11, f"{boiler} {_words('y', _AFFIX_W)}"),
        (12, f"{boiler} {_words('z', _AFFIX_W)}"),
        (99, _words("solo", 2 * _AFFIX_W)),
        (100, _words("tiny", 3)),                            # below length floor
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = sorted(
        (r.kind, r.a_id, r.b_id)
        for r in dedup_affix_stitch(spark, sf).collect()
    )
    assert out == [
        ("head", 10, 11),
        ("head", 10, 12),
        ("seam", 1, 2),
    ]
