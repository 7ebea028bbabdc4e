"""Fixed-point PageRank: cross-engine bit-exactness is the whole design
(functions/graph.py) — verify Spark == DuckDB twin == a plain-python
reference on a graph with hubs, parallel edges, and a dangling node."""

import duckdb

from ape_dts_spark.functions import graph as G

EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1), (4, 3), (5, 4), (3, 6), (4, 1)]
# node 6 dangles (no out-edges); (4, 1) is a parallel edge


def _py_reference(edges, iterations):
    SCALE, NUM, DEN = G.PR_SCALE, G.PR_DAMP_NUM, G.PR_DAMP_DEN
    nodes = sorted({x for ab in edges for x in ab})
    n = len(nodes)
    out: dict[int, int] = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    r = {v: SCALE // n for v in nodes}
    tel = SCALE * (DEN - NUM) // DEN // n
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for a, b in edges:
            contrib[b] += r[a] // out[a]
        share = sum(r[v] for v in nodes if v not in out) // n
        r = {v: tel + (contrib[v] + share) * NUM // DEN for v in nodes}
    return r


def test_pagerank_three_way_exact(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank_fp"] for r in G.pagerank(e, iterations=6).collect()}
    sql = G.pagerank_sql(
        "SELECT * FROM (VALUES "
        + ", ".join(f"({a},{b})" for a, b in EDGES)
        + ") AS t(src,dst)",
        iterations=6,
    )
    oracle = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    ref = _py_reference(EDGES, 6)
    assert got == oracle == ref
    # rank mass conserved up to floor dust; hub 3 outranks leaf 5
    assert 0 <= G.PR_SCALE - sum(got.values()) < 6 * len(got) * 2
    assert got[3] > got[5]


def test_pagerank_parallel_edges_weigh_double(spark):
    """A doubled edge must carry twice the contribution (multiset
    semantics, matching the SQL twin's row-based outdeg)."""
    single = [(1, 2), (1, 3), (2, 1), (3, 1)]
    doubled = single + [(1, 2)]  # 1 now links 2 twice: outdeg 3, 2 gets 2/3
    e1 = spark.createDataFrame(single, "src long, dst long")
    e2 = spark.createDataFrame(doubled, "src long, dst long")
    r1 = {r["node"]: r["rank_fp"] for r in G.pagerank(e1, iterations=4).collect()}
    r2 = {r["node"]: r["rank_fp"] for r in G.pagerank(e2, iterations=4).collect()}
    assert r2[2] > r1[2] and r2[3] < r1[3]
