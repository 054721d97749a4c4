from sample_emr_on_eks_fgac_iceberg_spark.streaming.events import (
    dedup_within_watermark,
    enrich_with_segments,
    read_event_stream,
    run_to_memory,
    running_user_totals,
    session_window_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "dedup_within_watermark",
    "enrich_with_segments",
    "read_event_stream",
    "run_to_memory",
    "running_user_totals",
    "session_window_counts",
    "sliding_counts",
    "tumbling_counts",
]
