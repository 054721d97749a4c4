"""Hotspot-avoidance utilities — the explicit counterparts to the two
single-task bottlenecks Spark plans by default: the hot aggregation
key (AQE's skew-join splitting rescues joins, not aggregates) and the
global-order window (`Window.orderBy` with no partitionBy = exchange
to ONE partition + a full sort there).

AQE rescues skewed *sort-merge joins* after a shuffle has already
materialized; salting avoids building the hot partition in the first
place, which is the better posture when the skew is known (power-law
user_ids, a null-heavy foreign key, one giant tenant). For skewed
joins where the small side fits in memory, `F.broadcast` already *is*
the fix — no shuffle of the big side at all — so the utilities here
cover the remaining cases: aggregation over a skewed key, and exact
global order statistics (NTILE cut-points) without a single-partition
sort.

At 100 TB the salt count is sized so hot-key-rows / N fits one
executor's aggregate hash map (e.g. a 10⁹-row key with N=1024 → ~10⁶
rows per bucket).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Row
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


# monotonically_increasing_id layout: partition id in the upper 31
# bits, per-partition record number in the lower 33.
_MID_LOCAL_BITS = 33
_MID_LOCAL_MASK = (1 << _MID_LOCAL_BITS) - 1


def ntile_cutpoints(
    df: DataFrame,
    order_cols: Sequence[str],
    buckets: int,
    n_parts: int | None = None,
) -> list[Row]:
    """Exact NTILE(buckets) cut-point tuples over the total order
    ``order_cols`` — WITHOUT the single-partition global sort Spark
    plans for ``Window.orderBy`` with no partitionBy.

    Returns the ``buckets - 1`` rows sitting at the NTILE bucket
    boundaries (the last row of each of the first ``buckets - 1``
    buckets, per NTILE's front-loaded sizing: with n rows, q = n ÷ b
    and r = n mod b, bucket k ends at global position k·q + min(k, r)).
    A row's bucket is then ``1 + Σₖ [row > cutpoint_k]`` with plain
    tuple comparisons — broadcastable literals, no join, no window.

    Plan: one ``repartitionByRange`` of (only) the order columns + a
    per-partition sort, then ``monotonically_increasing_id`` yields
    (partition id, local index) per row. Per-partition counts — one
    scalar per partition, the only thing the driver ever holds —
    locate each boundary position's (partition, local index), and one
    filter fetches exactly ``buckets - 1`` rows. Range partition ids
    ascend with the range boundaries, so offset arithmetic over the
    counts is the global rank. At 1000 executors this is a narrow
    2-column range exchange plus two tiny actions — the shape that
    replaces the one-task global sort.

    ``order_cols`` must be a total order (include a unique tie-break
    column) with no nulls; ties straddling a range boundary would
    otherwise make ranks nondeterministic.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    ranked = (
        df.select(*order_cols)
        .repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        # freeze the nondeterministic ids so the counts action and the
        # boundary fetch below see the same assignment
        .localCheckpoint(eager=False)
    )
    pid = F.shiftrightunsigned("__mid", _MID_LOCAL_BITS)
    local = F.col("__mid").bitwiseAND(F.lit(_MID_LOCAL_MASK))
    sizes = {
        r["__pid"]: r["count"]
        for r in ranked.groupBy(pid.alias("__pid")).count().collect()
    }
    total = sum(sizes.values())
    if total == 0:
        return []
    offsets, acc = {}, 0
    for p in sorted(sizes):
        offsets[p] = acc
        acc += sizes[p]
    q, r = divmod(total, buckets)
    ends = [k * q + min(k, r) for k in range(1, buckets)]
    targets = set()
    for pos in ends:  # always >= 1 once total >= 1 (ends[k] = min(k, n) when n < b)
        for p in sorted(sizes):
            if pos <= offsets[p] + sizes[p]:
                targets.add((p, pos - offsets[p] - 1))
                break
    cond = F.lit(False)
    for p, j in targets:
        cond = cond | ((pid == F.lit(p)) & (local == F.lit(j)))
    picked = {row["__mid"]: row for row in ranked.where(cond).collect()}
    by_pos = {
        offsets[p] + j + 1: picked[(p << _MID_LOCAL_BITS) + j]
        for p, j in targets
    }
    return [by_pos[pos] for pos in ends]


def ntile_assign(
    cutpoints: Sequence[Row], order_cols: Sequence[str]
) -> Column:
    """Bucket-assignment column for `ntile_cutpoints` output: score =
    1 + number of cut-point tuples strictly below this row, evaluated
    as literal lexicographic comparisons (pure codegen arithmetic —
    no exchange of any kind in the consuming plan)."""
    score = F.lit(1)
    for b in cutpoints:
        gt = F.lit(False)
        eq = F.lit(True)
        for c in order_cols:
            gt = gt | (eq & (F.col(c) > F.lit(b[c])))
            eq = eq & (F.col(c) == F.lit(b[c]))
        score = score + gt.cast("int")
    return score
