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


def _tri_reference(edges):
    import itertools

    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    nodes = sorted({x for ab in und for x in ab})
    adj = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    counts: dict[int, int] = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangle_counts_three_way_exact(spark):
    """triangle_counts == DuckDB twin == brute-force reference on a graph
    with a hub, parallel edges (deduped), self-loops (dropped), and nodes
    in no triangle (absent from the output)."""
    import duckdb

    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 2), (4, 4), (2, 1), (5, 6),
             (1, 5), (5, 2), (6, 1), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["tri_cnt"] for r in G.triangle_counts(e).collect()}
    sql = G.triangle_counts_sql(
        "SELECT * FROM (VALUES "
        + ", ".join(f"({a},{b})" for a, b in edges)
        + ") AS t(src,dst)"
    )
    oracle = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    ref = _tri_reference(edges)
    assert got == oracle == ref and got, got
    # K4 sanity: complete graph on 4 nodes = 4 triangles, 3 per node
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got4 = {r["node"]: r["tri_cnt"] for r in G.triangle_counts(
        spark.createDataFrame(k4, "src long, dst long")).collect()}
    assert got4 == {0: 3, 1: 3, 2: 3, 3: 3}


def test_pagerank_empty_edges(spark):
    # ADVICE r12: an empty edge relation returns an empty (node, rank_fp)
    # result instead of ZeroDivisionError
    e = spark.createDataFrame([], "src long, dst long")
    out = G.pagerank(e, iterations=2)
    assert out.columns == ["node", "rank_fp"] and out.count() == 0
    # the SQL twin stays runnable on empty edges too
    import duckdb
    sql = G.pagerank_sql("SELECT CAST(NULL AS BIGINT) AS src, CAST(NULL AS BIGINT) AS dst WHERE 1=0", iterations=2)
    assert duckdb.sql(sql).fetchall() == []
