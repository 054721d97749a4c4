"""Skew-mitigation utilities — the explicit counterpart to AQE's
runtime skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on
in session.py).

AQE rescues skewed *sort-merge joins* after a shuffle has already
materialized; salting avoids building the hot partition in the first
place, which is the better posture when the skew is known (power-law
user_ids, a null-heavy foreign key, one giant tenant). For skewed
joins where the small side fits in memory, `F.broadcast` already *is*
the fix — no shuffle of the big side at all — so the utility here
covers the remaining case: aggregation over a skewed key.

At 100 TB the salt count is sized so hot-key-rows / N fits one
executor's aggregate hash map (e.g. a 10⁹-row key with N=1024 → ~10⁶
rows per bucket).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (phase-1 aggregate over input rows, phase-2 combiner over partials)
AggSpec = tuple[Column, Callable[[str], Column]]


def two_phase_salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, AggSpec],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    ``aggs`` maps output name → (phase1 aggregate, phase2 combiner):
    decomposable pairs like ``(F.sum(x), F.sum)``, ``(F.count(x),
    F.sum)``, ``(F.min(x), F.min)``, ``(F.max(x), F.max)``. Phase 1
    groups on (key, salt) so the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 re-combines the per-bucket
    partials by key. Both phases are ordinary hash aggregates with
    map-side combine.
    """
    # pmod keeps the salt domain at exactly [0, salt_buckets) — Spark's
    # % preserves the dividend's sign, which would double the bucket
    # count and break the sizing contract above.
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(*[phase1.alias(name) for name, (phase1, _) in aggs.items()])
    )
    return partial.groupBy(key).agg(
        *[combine(name).alias(name) for name, (_, combine) in aggs.items()]
    )
