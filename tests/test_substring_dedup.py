"""dedup_substring_exact on a fixture with PLANTED cross-doc substrings
(VERDICT r10 next-round #4): exact thresholds, boundary-straddling runs
fixed chunking misses, and oracle parity on the same fixture."""

import duckdb
import pytest

from sample_emr_on_eks_fgac_iceberg_spark.operators import ORACLE, QUERIES
from sample_emr_on_eks_fgac_iceberg_spark.operators.dedup import _SUBSTR_W

W = _SUBSTR_W


def _tok(prefix, n, start=0):
    return " ".join(f"{prefix}{i}" for i in range(start, start + n))


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted")
    run20 = _tok("shared", 20)        # 20-token planted run
    run_w = _tok("exact", W)          # exactly W tokens
    run_w1 = _tok("below", W - 1)     # W-1 tokens: must NOT match
    docs = [
        # doc 0/1: the 20-token run embedded at DIFFERENT offsets, deep
        # inside unrelated filler — straddles any fixed chunk grid
        (0, _tok("azero", 7) + " " + run20 + " " + _tok("tailzero", 9)),
        (1, _tok("bone", 13) + " " + run20 + " " + _tok("tailone", 5)),
        # doc 2: shares exactly W tokens with doc 0's filler? no — with
        # doc 3 via run_w
        (2, _tok("ctwo", 10) + " " + run_w + " " + _tok("tailtwo", 4)),
        (3, run_w + " " + _tok("dthree", 12)),
        # docs 4/5: share only W-1 tokens — below threshold, invisible
        (4, _tok("efour", 6) + " " + run_w1),
        (5, run_w1 + " " + _tok("ffive", 8)),
        # doc 6: unique noise
        (6, _tok("gsix", 30)),
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    for i, t in docs:
        con.execute(
            "INSERT INTO t VALUES (?, ?, 'en', 'synth', ?)", [i, t, len(t)]
        )
    con.sql(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return str(d)


def test_planted_substrings_detected_exactly(spark, planted_dir):
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared_windows"], r["max_match_tokens"])
        for r in QUERIES["dedup_substring_exact"](spark, planted_dir).collect()
    }
    # 20-token run: 20-W+1 shared windows, max match exactly 20
    assert set(got) == {(0, 1), (2, 3)}
    assert got[(0, 1)] == (20 - W + 1, 20)
    # exactly-W run: one window, max match exactly W
    assert got[(2, 3)] == (1, W)


def test_planted_fixture_oracle_parity(spark, planted_dir):
    got = sorted(
        tuple(r)
        for r in QUERIES["dedup_substring_exact"](spark, planted_dir).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{planted_dir}/documents.parquet'"
    )
    exp = sorted(tuple(r) for r in con.sql(ORACLE["dedup_substring_exact"]).fetchall())
    assert got == exp
