"""True Structured Streaming tests: the streaming plans must produce
exactly what their batch mirrors produce (Spark's unified model), via
file sources + availableNow triggers + memory sinks."""

import pytest

from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import load_table
from sample_emr_on_eks_fgac_iceberg_spark.streaming import (
    dedup_within_watermark,
    read_event_stream,
    run_to_memory,
    session_window_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events written to a directory the file stream source can tail."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(path)
    return path


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_stream_tumbling_matches_batch(spark, sf_dir, events_dir):
    stream = tumbling_counts(
        read_event_stream(spark, events_dir).withWatermark("ts", "2 hours")
    )
    run_to_memory(stream, "tumbling_out", output_mode="complete")
    got = spark.table("tumbling_out")
    batch = tumbling_counts(load_table(spark, sf_dir, "events"))
    assert _rows(got) == _rows(batch)


def test_stream_session_window_matches_batch(spark, sf_dir, events_dir):
    stream = session_window_counts(
        read_event_stream(spark, events_dir).withWatermark("ts", "2 hours")
    )
    run_to_memory(stream, "session_out", output_mode="complete")
    got = spark.table("session_out")
    batch = session_window_counts(load_table(spark, sf_dir, "events"))
    assert _rows(got) == _rows(batch)


def test_stream_dedup_within_watermark(spark, sf_dir, events_dir):
    stream = dedup_within_watermark(read_event_stream(spark, events_dir))
    run_to_memory(stream, "dedup_out", output_mode="append")
    got = spark.table("dedup_out")
    batch = load_table(spark, sf_dir, "events")
    n_keys = batch.select("user_id", "event_type").distinct().count()
    # one survivor per (user_id, event_type); keys must match exactly
    assert got.count() == n_keys
    assert _rows(got.select("user_id", "event_type")) == _rows(
        batch.select("user_id", "event_type").distinct()
    )


def test_stream_foreach_batch_sink(spark, events_dir, tmp_path):
    """foreachBatch → parquet (the production sink pattern)."""
    out = str(tmp_path / "sink")
    stream = tumbling_counts(
        read_event_stream(spark, events_dir).withWatermark("ts", "2 hours")
    )

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() > 0
