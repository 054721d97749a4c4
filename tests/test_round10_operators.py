"""Edge cases for the round-10 operator wave: empty/degenerate inputs,
bucket boundaries, and the determinism contracts the oracles rely on."""

import os

import pytest
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.operators import QUERIES
from sample_emr_on_eks_fgac_iceberg_spark.operators.text import (
    _GQ_MIN_WORDS,
    quality_gopher_rules,
    text_tokenizer_fertility,
)
from sample_emr_on_eks_fgac_iceberg_spark.operators.relational import (
    customers_gini_revenue,
    stats_ab_welch_t2,
)
from sample_emr_on_eks_fgac_iceberg_spark.operators.similarity import (
    similarity_knn_graph,
    _KNN_GRAPH_K,
)


def _sf(spark, tmp_path, **tables):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            os.path.join(sf, f"{name}.parquet")
        )
    return sf


def test_gopher_rules_thresholds_fire(spark, tmp_path):
    short = "the a " + " ".join(f"w{i}" for i in range(10))
    spam = "the a " + " ".join(["buy"] * 60)
    good = "the a of " + " ".join(f"word{i}" for i in range(60))
    sf = _sf(spark, tmp_path, documents=(
        [(1, short, "en", "s", len(short)),
         (2, spam, "en", "s", len(spam)),
         (3, good, "en", "s", len(good))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ))
    got = {r.doc_id: r for r in quality_gopher_rules(spark, sf).collect()}
    assert not got[1].ok_length and got[1].n_words < _GQ_MIN_WORDS
    assert not got[2].ok_top_share and not got[2].passes  # 'buy' dominates
    assert got[3].ok_length and got[3].ok_top_share and got[3].ok_stopwords
    assert got[3].passes


def test_fertility_skips_empty_docs(spark, tmp_path):
    sf = _sf(spark, tmp_path, documents=(
        [(1, "hello world", "en", "s", 11),
         (2, "   ", "en", "s", 3),          # whitespace only → skipped
         (3, "a1b2", "fr", "s", 4)],         # 1 word, 4 bpe tokens
        "doc_id long, text string, lang string, source string, n_chars long",
    ))
    got = {r.lang: r for r in text_tokenizer_fertility(spark, sf).collect()}
    assert got["en"].n_docs == 1 and got["en"].fertility == 1.0
    assert got["fr"].total_words == 1 and got["fr"].total_tokens == 4
    assert got["fr"].min_fert_ppm == 4_000_000


def test_welch_t2_requires_both_arms(spark, tmp_path):
    import datetime as dt
    ts = dt.datetime(2024, 1, 1)
    rows = [(i, ts, i, "solo", 1.0, "{}") for i in range(0, 8, 2)]  # A only
    # both arms constant → statistic undefined → group dropped
    rows += [(100 + i, ts, i, "flat", 5.0, "{}") for i in range(12)]
    # arm A (even users): 9/11 alternating (mean 10); arm B: 20/24 (mean 22)
    rows += [
        (200 + i, ts, i, "ab",
         float([9, 20, 11, 24][i % 4]), "{}")
        for i in range(12)
    ]
    sf = _sf(spark, tmp_path, events=(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ))
    got = {r.event_type: r for r in stats_ab_welch_t2(spark, sf).collect()}
    assert "solo" not in got, "single-arm event type must be filtered"
    assert "flat" not in got, "zero-variance groups must be dropped"
    ab = got["ab"]
    assert ab.n_a == 6 and ab.n_b == 6
    assert ab.mean_a == 10.0 and ab.mean_b == 22.0
    assert ab.t2 > 100  # separated means, small within-arm variance


def test_gini_extremes(spark, tmp_path):
    import datetime as dt
    ts = dt.datetime(2024, 1, 1)
    # perfectly equal revenue → gini 0
    eq = [(i, i, "O", 100.0, ts, "p") for i in range(10)]
    sf = _sf(spark, tmp_path, orders=(
        eq,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ))
    r = customers_gini_revenue(spark, sf).collect()[0]
    assert r.n_customers == 10 and abs(r.gini) < 1e-12
    # one customer holds everything → gini → (n-1)/n
    skew = [(0, 0, "O", 1000.0, ts, "p")] + [
        (i, i, "O", 0.0, ts, "p") for i in range(1, 10)
    ]
    sf2 = _sf(spark, tmp_path / "b", orders=(
        skew,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ))
    r2 = customers_gini_revenue(spark, sf2).collect()[0]
    assert abs(r2.gini - 0.9) < 1e-12


def test_knn_graph_degrees_and_symmetric_dots(spark, tmp_path):
    import random
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)], i % 3)
        for i in range(60)
    ]
    sf = _sf(spark, tmp_path, embeddings=(
        rows, "vec_id long, embedding array<float>, label int",
    ))
    out = similarity_knn_graph(spark, sf).collect()
    by_node = {}
    for r in out:
        by_node.setdefault(r.vec_id, []).append(r)
    for node, edges in by_node.items():
        assert len(edges) <= _KNN_GRAPH_K
        ranks = sorted(e.rank for e in edges)
        assert ranks == list(range(1, len(edges) + 1))
        assert node not in {e.neighbor_id for e in edges}, "self edge"
    # dot products are symmetric where both directions were kept
    dots = {(r.vec_id, r.neighbor_id): r.dot_fixed for r in out}
    for (a, b), d in dots.items():
        if (b, a) in dots:
            assert dots[(b, a)] == d


def test_vad_segments_cover_only_active_windows(spark, tmp_path):
    # craft PCM-ish text: loud run, quiet run, loud run → 2 segments
    loud = chr(120) * 512   # high byte pairs → high energy
    quiet = chr(1) * 512
    text = loud + quiet + loud
    sf = _sf(spark, tmp_path, documents=(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ))
    segs = sorted(
        (r.seg_start, r.n_windows)
        for r in QUERIES["multimodal_audio_vad_segments"](spark, sf).collect()
    )
    assert len(segs) == 2, segs
    assert segs[0][0] == 0 and segs[1][0] > segs[0][1]


def test_cusum_matches_textbook_recursion(spark, tmp_path):
    """The window-transform CUSUM (P_t − min(0, P_<t)) must equal the
    textbook recursion S_t = max(0, S_(t-1) + x_t − μ − k) — a bug both
    the Spark and oracle sides would SHARE, so parity can't catch it."""
    import datetime as dt

    from sample_emr_on_eks_fgac_iceberg_spark.operators.temporal import (
        _CUSUM_H,
        _CUSUM_SLACK,
        events_cusum_changepoint,
    )

    counts = [3, 3, 3, 9, 9, 9, 9, 1, 1, 12]  # shift up, dip, spike
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, dt.datetime(2024, 1, 1, h), eid, "t", 1.0, "{}")
            )
            eid += 1
    sf = _sf(spark, tmp_path, events=(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ))
    got = events_cusum_changepoint(spark, sf).collect()[0]

    n, total = len(counts), sum(counts)
    s, peak, alarms, first = 0, 0, 0, None
    for h, c in enumerate(counts):
        d = n * c - total - n * _CUSUM_SLACK
        s = max(0, s + d)
        peak = max(peak, s)
        if s >= n * _CUSUM_H:
            alarms += 1
            if first is None:
                first = dt.datetime(2024, 1, 1, h)
    assert got.peak_s_scaled == peak
    assert got.n_alarm_hours == alarms
    assert got.first_alarm_hr == first
