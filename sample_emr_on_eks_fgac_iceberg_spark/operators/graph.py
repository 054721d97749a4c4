"""Graph analytics over the star schema's implicit graphs (SURVEY.md
§2.B event-analytics/dedup tier; sibling of dedup.graph_triangle_count
and dedup.dedup_connected_components).

Determinism: ranks are integers scaled by 10^12 and every step is
integer division / integer sums — order-free, bit-exact across Spark
and DuckDB with zero float accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_emr_on_eks_fgac_iceberg_spark.operators.registry import register
from sample_emr_on_eks_fgac_iceberg_spark.sources.tables import (
    load_table,
    materialize_once,
)

_PR_SCALE = 10**12
_PR_ITERS = 3
# rank-table rows above which the per-iteration join stops
# broadcasting and degrades to a shuffle hash join on src (the edge
# list is pre-partitioned by src once); ~10M (node, contrib) int pairs
# ≈ 160 MB — the practical broadcast ceiling. Override with the
# spark_graft.pagerank.broadcast_max_nodes conf.
_PR_BROADCAST_MAX = 10_000_000
# damping 0.85 as the exact rational 85/100 — applied in integer math
_PR_D_NUM, _PR_D_DEN = 85, 100

# node ids stay BIGINT through every shuffle (customer k -> 2k,
# supplier k -> 2k+1); the display string is built once at output.
# Strings in the edge shuffle measured 3x the cost of ints at sf0.1.
_PR_EDGE_CTE = """
    pairs AS (
        SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS ck,
                        CAST(l.l_suppkey AS BIGINT) AS sk
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    edges AS (
        SELECT 2 * ck AS src, 2 * sk + 1 AS dst FROM pairs
        UNION ALL
        SELECT 2 * sk + 1 AS src, 2 * ck AS dst FROM pairs),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    n AS (SELECT COUNT(*) AS n FROM deg)
"""


def _pr_iter_sql(prev: str, it: int) -> str:
    """One unrolled integer PageRank step as a CTE pair."""
    return f"""
    contrib{it} AS (
        SELECT e.dst AS node, SUM(r.r // r.deg) AS s
        FROM {prev} r JOIN edges e ON e.src = r.node
        GROUP BY e.dst),
    it{it} AS (
        SELECT d.node, d.deg,
               ({_PR_D_DEN - _PR_D_NUM} * {_PR_SCALE}) // ({_PR_D_DEN} * n.n)
                   + ({_PR_D_NUM} * c.s) // {_PR_D_DEN} AS r
        FROM deg d JOIN contrib{it} c ON c.node = d.node CROSS JOIN n)
    """


@register(
    "graph_pagerank_trade",
    oracle=f"""
    WITH {_PR_EDGE_CTE},
    it0 AS (SELECT d.node, d.deg, {_PR_SCALE} // n.n AS r
            FROM deg d CROSS JOIN n),
    {_pr_iter_sql("it0", 1)},
    {_pr_iter_sql("it1", 2)},
    {_pr_iter_sql("it2", 3)}
    SELECT CASE WHEN node % 2 = 0 THEN 'c' || CAST(node // 2 AS VARCHAR)
                ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
           CAST(deg AS BIGINT) AS degree,
           CAST(r AS BIGINT) AS rank_scaled
    FROM it{_PR_ITERS}
    """,
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer–supplier trade graph (undirected:
    each distinct (customer, supplier) trading pair is an edge both
    ways, so no dangling-mass correction is needed), {_PR_ITERS} fixed
    iterations, damping 0.85 — the 'which suppliers sit at the center
    of the purchasing network' centrality query.

    All-integer arithmetic: ranks are scaled by 10^12; each step is
    contrib = r div deg (integer), partial-aggregated sums, and an
    integer damping blend — bit-exact vs the DuckDB oracle with zero
    float accumulation, like dedup_connected_components' label algebra.

    100 TB posture: the edge list is built once — the distinct runs on
    the INT key pair (string node ids measured 3× the shuffle cost)
    and is checkpointed; every iteration is one src-keyed join of the
    |V|-row rank table against edges plus one dst-keyed partial-agg
    shuffle. The rank side BROADCASTS while |V| ≤
    ``spark_graft.pagerank.broadcast_max_nodes`` (default {_PR_BROADCAST_MAX:,})
    and falls back to a shuffle hash join on ``src`` beyond it, with
    the edge list pre-partitioned by src ONCE at build time so each
    iteration shuffles only the rank table (VERDICT r9: a billion-node
    graph must degrade to the one-sided shuffle, not die on the
    broadcast limit). |V| itself is one 1-row scalar read — the
    strategy gate plus the exact integer teleport term. Skewed hubs
    partial-aggregate map-side before the dst shuffle."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # both direction branches reference pairs; no barrier needed below
    # the union — the distinct's exchange is physically deduplicated
    # (ReusedExchange; A/B-measured identical at sf0.1)
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (2 * F.col("o_custkey").cast("bigint")).alias("ck2"),
            (2 * F.col("l_suppkey").cast("bigint") + 1).alias("sk2"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("ck2").alias("src"), F.col("sk2").alias("dst")
    ).unionAll(
        pairs.select(F.col("sk2").alias("src"), F.col("ck2").alias("dst"))
    )
    edges = materialize_once(edges)
    deg = materialize_once(
        edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
    )
    # |V|: allowlisted 1-row scalar (strategy gate + teleport term)
    n_nodes = int(deg.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"])  # scale-ok: 1-row |V| broadcast-gate scalar
    broadcast_max = int(
        spark.conf.get(
            "spark_graft.pagerank.broadcast_max_nodes", str(_PR_BROADCAST_MAX)
        )
    )
    if n_nodes <= broadcast_max:
        rank_side = F.broadcast
    else:
        rank_side = lambda df: df  # noqa: E731 — shuffle hash join on src
        # one-time src partitioning: every iteration's join reuses it,
        # so only the (small) rank side shuffles per step
        edges = materialize_once(edges.repartition("src"))
    # empty graph: deg has no rows — short-circuit before the integer
    # divisions (the lazy Spark-side formulation returned empty too)
    n_div = max(n_nodes, 1)
    teleport = ((_PR_D_DEN - _PR_D_NUM) * _PR_SCALE) // (_PR_D_DEN * n_div)
    ranks = deg.select(
        "node", "deg", F.lit(_PR_SCALE // n_div).cast("bigint").alias("r")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(
                rank_side(ranks.select("node", F.expr("r div deg").alias("c"))),
                F.col("src") == F.col("node"),
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        # blend join: contrib comes out of its agg already partitioned
        # by node; deg rides the SAME broadcast gate as the rank side
        # (it IS |V| rows), so under the gate the blend is a
        # BroadcastHashJoin against contrib's existing agg partitioning
        # (r14). NOTE, measured r15 three-way bench-harness A/B at
        # sf0.1 AND sf1: this shape ties-or-beats BOTH the r13
        # SortMergeJoin blend and an r15 prototype that folded deg onto
        # the edge table once (the prototype materializes the edge list
        # twice and probes deg per |E| row per iteration — strictly
        # worse, reverted; see OPTIMIZATION_r15.md). The r14 −15%
        # in-suite reading did not reproduce under interleaved A/B.
        ranks = contrib.join(rank_side(deg), "node").select(
            "node",
            "deg",
            (
                F.lit(teleport).cast("bigint")
                + F.expr(f"({_PR_D_NUM} * s) div {_PR_D_DEN}")
            ).alias("r"),
        )
    return ranks.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), F.expr("node div 2")),
        )
        .otherwise(F.concat(F.lit("s"), F.expr("node div 2")))
        .alias("node"),
        F.col("deg").cast("bigint").alias("degree"),
        F.col("r").cast("bigint").alias("rank_scaled"),
    )


_REACH_TOP_OUT = 2  # per-src out-degree cap → a sparse, deterministic graph
_REACH_MAX_HOPS = 3


def _reach_edge_ctes(edges_rel: str) -> str:
    """The non-recursive seed CTEs — the heavy part: one (src, dst)
    hash agg over the 4-way fact join + a per-src top-{_REACH_TOP_OUT}
    window."""
    return f"""pairs AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               COUNT(*) AS n
        FROM {edges_rel[0]} l
        JOIN {edges_rel[1]} o ON l.l_orderkey = o.o_orderkey
        JOIN {edges_rel[2]} c ON o.o_custkey = c.c_custkey
        JOIN {edges_rel[3]} s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY s.s_nationkey, c.c_nationkey),
    ranked AS (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY n DESC, dst) AS rk
        FROM pairs)"""


_REACH_EDGE_SELECT = f"SELECT src, dst FROM ranked WHERE rk <= {_REACH_TOP_OUT}"


def _reach_closure_body(edges: str, nation: str) -> str:
    """The recursive traversal over a (src, dst) edge relation — the
    SAME text runs on Spark (>=4.0 ships SQL:1999 WITH RECURSIVE) and
    DuckDB, so the traversal semantics stay cross-engine."""
    return f"""r AS (
        SELECT src, dst, 1 AS hops FROM {edges}
        UNION ALL
        SELECT r.src, e.dst, r.hops + 1
        FROM r JOIN {edges} e ON r.dst = e.src
        WHERE r.hops < {_REACH_MAX_HOPS}),
    closure AS (
        SELECT src, dst, MIN(hops) AS min_hops
        FROM r WHERE src <> dst GROUP BY src, dst)
    SELECT ns.n_name AS src_nation, nd.n_name AS dst_nation,
           CAST(closure.min_hops AS INT) AS min_hops
    FROM closure
    JOIN {nation} ns ON closure.src = ns.n_nationkey
    JOIN {nation} nd ON closure.dst = nd.n_nationkey
    """


def _reach_seed_sql(edges_rel: str) -> str:
    """Seed as a standalone statement (the Spark side materializes its
    result once before the recursion — see nation_trade_reachability)."""
    return f"WITH {_reach_edge_ctes(edges_rel)}\n    {_REACH_EDGE_SELECT}"


def _reach_closure_sql(edges: str, nation: str) -> str:
    return f"WITH RECURSIVE {_reach_closure_body(edges, nation)}"


def _reach_sql(edges_rel: str) -> str:
    """Seed + traversal composed as ONE statement — the oracle spelling
    (DuckDB materializes each CTE once, so the composed text is safe
    there; Spark's UnionLoop would re-run the seed per hop — the reason
    the engine side splits it, optimization r14)."""
    return (
        f"WITH RECURSIVE {_reach_edge_ctes(edges_rel)},\n"
        f"    edges AS ({_REACH_EDGE_SELECT}),\n"
        f"    {_reach_closure_body('edges', edges_rel[4])}"
    )


@register(
    "nation_trade_reachability",
    oracle=_reach_sql(("lineitem", "orders", "customer", "supplier", "nation")),
)
def nation_trade_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded transitive closure over the nation-level trade
    graph via SQL:1999 ``WITH RECURSIVE`` (Spark 4.0's recursive-CTE
    support — the classic reachability shape that previously required
    a driver-side iteration loop like dedup_connected_components).
    Edges keep each supplier-nation's top-{_REACH_TOP_OUT} customer
    nations by trade count (deterministic (n DESC, dst) tie-break), so
    the graph is sparse at every SF; reachability is min-hops within
    {_REACH_MAX_HOPS} hops. The IDENTICAL recursive SQL text runs on
    Spark and DuckDB — traversal parity by construction.

    Plan shape at 100 TB: the heavy work is the non-recursive seed —
    one (src, dst) hash agg over the fact join (map-side partials) and
    a per-src window over ≤ |nations|² rows; the recursion itself
    iterates on the EDGE table (≤ |nations|·{_REACH_TOP_OUT} rows), so
    each UnionLoop step is metadata-sized regardless of corpus scale.

    The seed is MATERIALIZED (localCheckpoint) before the recursion
    (optimization r14): Spark's UnionLoop re-plans the anchor/step
    relations per iteration, so an inline seed CTE re-ran the whole
    4-way fact join + window EVERY hop — measured 53 jobs / 2.6-3.0 s
    at sf0.1, vs ~30 jobs / 1.2 s with the barrier, identical rows; at
    corpus scale the re-run would be {_REACH_MAX_HOPS}× the dominant
    stage. The recursion text itself is still shared with the DuckDB
    oracle (_reach_closure_body), which composes seed + traversal as
    one statement — DuckDB materializes each CTE once, so the split
    changes nothing there."""
    views = {}
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        v = f"__reach_{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(v)
        views[t] = v
    seed = spark.sql(
        _reach_seed_sql(
            (
                views["lineitem"],
                views["orders"],
                views["customer"],
                views["supplier"],
                views["nation"],
            )
        )
    )
    materialize_once(seed).createOrReplaceTempView("__reach_edges")
    return spark.sql(_reach_closure_sql("__reach_edges", views["nation"]))


@register(
    "part_supplier_degree_assortativity",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    pd AS (SELECT p, CAST(COUNT(*) AS HUGEINT) AS dp
           FROM edges GROUP BY p),
    sd AS (SELECT s, CAST(COUNT(*) AS HUGEINT) AS ds
           FROM edges GROUP BY s),
    e AS (
        SELECT pd.dp, sd.ds
        FROM edges JOIN pd ON pd.p = edges.p JOIN sd ON sd.s = edges.s),
    m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(dp) AS sx, SUM(ds) AS sy,
               SUM(dp * dp) AS sxx, SUM(ds * ds) AS syy,
               SUM(dp * ds) AS sxy
        FROM e)
    SELECT CAST(n AS BIGINT) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pd) AS n_parts,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM sd) AS n_suppliers,
           CAST(round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1000)
                AS BIGINT) AS mean_part_degree_milli,
           CAST(round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) * 1000)
                AS BIGINT) AS mean_supplier_degree_milli,
           CAST(round(
               CAST(n * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               / sqrt(CAST(n * syy - sy * sy AS DOUBLE))
               * 1000000) AS BIGINT) AS assortativity_ppm
    FROM m
    """,
)
def part_supplier_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the part–supplier bipartite graph (the
    supply network implied by lineitem): Pearson correlation between
    the part's degree and the supplier's degree across all DISTINCT
    edges. Negative assortativity = high-fan parts source from
    low-fan (specialist) suppliers — the supply-concentration
    structure a resilience audit looks for; completes the graph shelf
    (PageRank = importance, triangles = clustering, reachability =
    connectivity, assortativity = MIXING).

    Plan shape at 100 TB: the fact table collapses to DISTINCT edges
    in one hash agg (map-side partial dedup); the edge-level Pearson
    moments FACTOR through per-node sums (optimization r14), so no
    corpus-keyed join remains: over edges, Σdp = Σ_p dp², Σdp² = Σ_p
    dp³, Σds = Σ_s ds², Σds² = Σ_s ds³, and the cross moment Σ dp·ds
    = Σ_p dp·t_p with t_p = Σ_{s∈N(p)} ds — so ONE broadcast of the
    supplier-degree table into the edge frame plus ONE p-keyed hash
    agg (computing dp and t_p together) replaces the previous
    part-degree join (a full edge shuffle); both folds are exact
    DECIMAL(38,0) integer moments with the shared double spelling,
    ppm-rounded. Never all-pairs, no windows."""
    edges = materialize_once(
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
        )
        .distinct()
    )
    sd = edges.groupBy("s").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ds")
    )
    g = (
        edges.join(F.broadcast(sd), "s")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("dp"),
            F.sum("ds").alias("t"),
        )
    )
    m = g.agg(
        # coalesce: Σdp counts edges, and over an empty edge set the
        # pre-r14 COUNT(*) spelling returned n_edges = 0, not NULL
        # (ADVICE r14)
        F.coalesce(
            F.sum("dp"), F.lit(0).cast("decimal(38,0)")
        ).alias("n"),
        F.sum(F.col("dp") * F.col("dp")).alias("sx"),
        F.sum(F.col("dp") * F.col("dp") * F.col("dp")).alias("sxx"),
        F.sum(F.col("dp") * F.col("t")).alias("sxy"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    ss = sd.agg(
        F.sum(F.col("ds") * F.col("ds")).alias("sy"),
        F.sum(F.col("ds") * F.col("ds") * F.col("ds")).alias("syy"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return (
        m.crossJoin(F.broadcast(ss))
        .select(
            n.cast("bigint").alias("n_edges"),
            "n_parts",
            "n_suppliers",
            F.round(sx.cast("double") / n.cast("double") * 1000)
            .cast("bigint")
            .alias("mean_part_degree_milli"),
            F.round(sy.cast("double") / n.cast("double") * 1000)
            .cast("bigint")
            .alias("mean_supplier_degree_milli"),
            F.round(
                (n * sxy - sx * sy).cast("double")
                / F.sqrt((n * sxx - sx * sx).cast("double"))
                / F.sqrt((n * syy - sy * sy).cast("double"))
                * 1000000
            )
            .cast("bigint")
            .alias("assortativity_ppm"),
        )
    )
