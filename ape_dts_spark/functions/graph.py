"""Link-graph operators for web-corpus curation.

PageRank (Page et al. 1999) is the classic page-quality prior behind
web-corpus seed selection (e.g. the OpenWebText "karma" filter and
CommonCrawl harmonic/centrality rankings); the reference engine moves rows
and has no graph surface at all, so this is pure extension-surface
(BASELINE.json names large-scale curation ops as first-class).

The twist that makes it GATEABLE: all arithmetic is FIXED-POINT INTEGER
(ranks scaled by 10^12, floor division everywhere). Floating-point PageRank
cannot be oracle-checked across engines — a distributed SUM adds in shuffle
order and the last ulp differs run to run — but integer sums are
order-independent and floor division is floor division everywhere, so the
rank vector after K iterations is bit-exact on Spark AND DuckDB.

Scale shape: each iteration is one shuffle join (edges x ranks on src) and
one hash aggregation (sum contributions by dst) — the canonical iterative
join-agg. Out-degrees are computed once. At 100 TB the edge relation is
pre-partitioned by src so every iteration reuses the partitioning; a real
deployment checkpoints the rank relation every few iterations to truncate
lineage (documented, not needed at gate scale).

Dangling nodes (out-degree 0) follow the standard correction: their whole
rank mass is redistributed uniformly — as integers: floor(dangling_sum / N)
added inside the damped term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12  # fixed-point: rank 1.0 == 10^12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
) -> DataFrame:
    """Fixed-point integer PageRank over an edge list. Nodes are the union
    of src and dst values; returns (node, rank_fp) with rank_fp summing to
    ~PR_SCALE (floor-division dust stays behind, deterministically).

    r_0(v)   = PR_SCALE // N
    contrib  = r_k(u) // outdeg(u)  summed over in-edges of v
    r_{k+1}(v) = (PR_SCALE - damp) // N              [teleport]
               + damp * (sum_contrib + floor(dangling_sum / N)) // DEN
    with damp = PR_DAMP_NUM/PR_DAMP_DEN applied as * NUM // DEN.
    """
    # Materialize the loop-invariant relations once, and truncate the rank
    # relation's lineage every iteration — iterative DataFrame loops
    # otherwise re-execute all prior iterations at every action (each rank
    # relation is referenced 2-3x per iteration, so evaluation would be
    # exponential in depth). localCheckpoint is the local[*] stand-in for
    # the reliable-storage checkpoint a 100 TB run would take every few
    # iterations anyway.
    # all checkpoints below are LAZY (eager=False): the plan stays flat (the
    # DataFrame wraps the checkpoint RDD either way) but materialization rides
    # the first consuming action — n = nodes.count() pays for e+nodes, the
    # first iteration's join for outdeg, the caller's action for the rank
    # chain — instead of one scheduling round trip per checkpoint
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=False
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).localCheckpoint(
        eager=False
    )
    # N is a driver-side scalar: one tiny count, read once, reused each
    # iteration (keeps every iteration's plan free of an extra join)
    n = nodes.count()
    if n == 0:
        # empty edge relation: an empty (node, rank_fp) result, not a
        # ZeroDivisionError (r13, ADVICE r12)
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    teleport = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN // n
    ranks = nodes.withColumn(
        "rank_fp", F.lit(PR_SCALE // n).cast("long")
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("rank_fp div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # dangling mass: total rank minus what out-edged nodes hold. Kept
        # as a 1-row relation crossJoined into the update (broadcast — one
        # job per iteration instead of a separate driver readout)
        share_df = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(
                F.expr(
                    f"CAST(coalesce(sum(rank_fp), CAST(0 AS BIGINT))"
                    f" div {n} AS BIGINT)"
                ).alias("share")
            )
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(share_df))
            .select(
                "node",
                F.expr(
                    f"CAST({teleport} + ((coalesce(contrib, CAST(0 AS BIGINT))"
                    f" + share) * {PR_DAMP_NUM}) div {PR_DAMP_DEN} AS BIGINT)"
                ).alias("rank_fp"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_sql(
    edges_sql: str,
    iterations: int = 8,
) -> str:
    """DuckDB twin: the same fixed-point iterations unrolled as a CTE chain
    (bit-exact — integer sums are order-free, floor division is floor
    division). ``edges_sql`` must yield (src, dst)."""
    damp_n, damp_d, scale = PR_DAMP_NUM, PR_DAMP_DEN, PR_SCALE
    parts = [
        f"WITH e AS MATERIALIZED ({edges_sql})",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "n AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({scale} // NULLIF((SELECT n FROM n), 0) AS BIGINT) AS rank_fp FROM nodes)",
    ]
    prev = "r0"
    for k in range(1, iterations + 1):
        parts.append(
            f"""c{k} AS (
  SELECT e.dst, SUM(r.rank_fp // o.outdeg) AS contrib
  FROM e JOIN {prev} r ON e.src = r.node JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst),
d{k} AS (
  SELECT COALESCE(SUM(r.rank_fp), 0) // NULLIF((SELECT n FROM n), 0) AS share
  FROM {prev} r LEFT JOIN outdeg o ON r.node = o.src WHERE o.src IS NULL),
r{k} AS (
  SELECT nodes.node,
         CAST({scale} * {damp_d - damp_n} // {damp_d} // NULLIF((SELECT n FROM n), 0)
              + (COALESCE(c{k}.contrib, 0) + (SELECT share FROM d{k}))
                * {damp_n} // {damp_d} AS BIGINT) AS rank_fp
  FROM nodes LEFT JOIN c{k} ON nodes.node = c{k}.dst)"""
        )
        prev = f"r{k}"
    body = ",\n".join(parts)
    return f"{body}\nSELECT node, rank_fp FROM {prev}"


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected simple graph (parallel
    edges and self-loops dropped), degree-ordered orientation per Suri &
    Vassilvitskii 2011 ("Counting triangles and the curse of the last
    reducer"): every edge points from the (degree, id)-smaller endpoint to
    the larger, so each triangle materializes as exactly ONE wedge a->b,
    b->c closed by a->c, and the wedge fan-out of a hub is bounded by its
    ORIENTED out-degree (O(sqrt(m)) on any graph) instead of its raw degree
    — the difference between a last-reducer blowup and an even shuffle at
    100 TB. All integers; bit-exact cross-engine. Returns (node, tri_cnt)
    for nodes in at least one triangle."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("a", "n")
    oriented = (
        und.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
        .filter("da < db OR (da = db AND a < b)")
        .select("a", "b")
    )
    x = oriented.select(F.col("a").alias("w_a"), F.col("b").alias("w_b"))
    y = oriented.select(F.col("a").alias("y_a"), F.col("b").alias("y_c"))
    wedges = x.join(y, x["w_b"] == y["y_a"]).select("w_a", "w_b", F.col("y_c").alias("w_c"))
    closed = wedges.join(
        oriented,
        (wedges["w_a"] == oriented["a"]) & (wedges["w_c"] == oriented["b"]),
        "left_semi",
    )
    return (
        closed.select(F.explode(F.array("w_a", "w_b", "w_c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_cnt"))
    )


def triangle_counts_sql(edges_sql: str) -> str:
    """DuckDB twin of triangle_counts (same orientation and joins)."""
    return f"""
WITH raw AS MATERIALIZED ({edges_sql}),
e AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM raw WHERE src <> dst
    UNION
    SELECT dst AS a, src AS b FROM raw WHERE src <> dst)),
deg AS MATERIALIZED (SELECT a AS n, COUNT(*) AS d FROM e GROUP BY a),
oriented AS MATERIALIZED (
  SELECT e.a, e.b
  FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
  WHERE da.d < db.d OR (da.d = db.d AND e.a < e.b)),
closed AS (
  SELECT x.a AS w_a, x.b AS w_b, y.b AS w_c
  FROM oriented x JOIN oriented y ON x.b = y.a
  WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.a = x.a AND o.b = y.b))
SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
FROM (SELECT unnest([w_a, w_b, w_c]) AS node FROM closed)
GROUP BY node"""
