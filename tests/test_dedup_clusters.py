"""Duplicate-cluster resolution: large-star/small-star connected
components verified against (a) a pure-Python union-find and (b) a
DuckDB recursive-CTE oracle, then composed end-to-end with the
MinHash-LSH pair stage on the documents table."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from big_data_bowl___2023_spark import dedup as dd
from big_data_bowl___2023_spark.sources.io import load_table


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _spark_components(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    return {r.node: r.component
            for r in dd.connected_components(pairs).collect()}


def test_components_chain_triangle_star(spark):
    """Chain 1-2-3-4, triangle 5-6-7, hub star 10-{11..15}, plus a
    cross edge merging chain+triangle via 4-5."""
    edges = [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7), (4, 5),
             (10, 11), (10, 12), (10, 13), (10, 14), (10, 15)]
    got = _spark_components(spark, edges)
    nodes = sorted({n for e in edges for n in e})
    want = _union_find(nodes, edges)
    assert got == want
    assert got[7] == 1          # transitive: triangle reached the chain
    assert got[15] == 10


def test_components_random_graph_vs_union_find(spark):
    """Seeded pseudo-random sparse graph, compared node-for-node."""
    nodes = list(range(120))
    edges = []
    x = 1234567
    for _ in range(90):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = x % 120
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % 120
        if a != b:
            edges.append((a, b))
    got = _spark_components(spark, edges)
    want = _union_find(sorted({n for e in edges for n in e}), edges)
    assert got == want


def test_components_vs_duckdb_recursive_cte(spark):
    """Cross-engine: DuckDB computes the same closure with a recursive
    CTE (iterated min-label propagation to fixpoint)."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8), (9, 9 + 0),
             (20, 25), (25, 21), (21, 24), (24, 20)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _spark_components(spark, edges)

    con = duckdb.connect()
    con.execute("CREATE TABLE e(u BIGINT, v BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = dict(con.execute("""
        WITH RECURSIVE
        sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        lab(node, comp) AS (
            SELECT u, LEAST(u, MIN(v)) FROM sym GROUP BY u
            UNION
            SELECT s.u, l.comp FROM sym s JOIN lab l ON s.v = l.node
            WHERE l.comp < s.u
        )
        SELECT node, MIN(comp) FROM lab GROUP BY node
    """).fetchall())
    con.close()
    assert got == want


def test_resolve_and_canonical_on_documents(spark, sf_dir):
    """End-to-end: MinHash-LSH pairs -> clusters -> one canonical doc
    per cluster; every emitted pair must land in one cluster and the
    survivor count must equal n_docs - (cluster members beyond one)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_band_pairs(docs, 0.5).localCheckpoint()
    labeled = dd.resolve_clusters(docs, pairs).localCheckpoint()

    lab = {r.doc_id: r.cluster_id
           for r in labeled.select("doc_id", "cluster_id").collect()}
    for r in pairs.collect():
        assert lab[r.doc_a] == lab[r.doc_b]

    n_docs = docs.count()
    n_clusters = labeled.select("cluster_id").distinct().count()
    kept = dd.canonical_docs(docs, pairs)
    assert kept.count() == n_clusters
    assert kept.count() <= n_docs
    # canonical-by-min-id: every survivor is the min of its cluster
    mins = {min(ids) for cid, ids in
            _group_by_cluster(lab).items()}
    assert {r.doc_id for r in kept.select("doc_id").collect()} == mins

    # prefer_col variant keeps the longest text instead
    docs_len = docs.withColumn("n_chars", F.length("text"))
    best = dd.canonical_docs(docs_len, pairs, prefer_col="n_chars")
    assert best.count() == n_clusters


def _group_by_cluster(lab):
    out = {}
    for node, cid in lab.items():
        out.setdefault(cid, []).append(node)
    return out


def test_components_early_star_stop_rounds_and_equivalence(spark,
                                                           monkeypatch):
    """r16: a round output that is already a union of disjoint stars
    is a fixpoint (every round orients target < source), so the loop
    stops WITHOUT the extra confirm-identity round. Pin both the
    round count and the bit-identical output."""
    from big_data_bowl___2023_spark.dedup import clusters as CL

    calls = {"n": 0}
    orig = CL._large_star

    def counted(edges):
        calls["n"] += 1
        return orig(edges)

    monkeypatch.setattr(CL, "_large_star", counted)
    # force the DISTRIBUTED tier: this test pins the star LOOP's
    # round behavior, which the r16 small-graph driver tier would
    # otherwise bypass entirely at these edge counts
    monkeypatch.setattr(CL, "DRIVER_EDGE_BOUND", -1)

    # triangle + hub: one round collapses both to stars rooted at
    # the component min — the early test must fire after round 1
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (10, 12), (10, 13)]
    got = _spark_components(spark, edges)
    want = _union_find(sorted({n for e in edges for n in e}), edges)
    assert got == want
    assert calls["n"] == 1

    # the star test must NOT shortcut the unoriented INPUT: a single
    # edge listing the root as the SOURCE shape-checks as a star but
    # is not a fixpoint of the round function
    calls["n"] = 0
    got = _spark_components(spark, [(1, 2)])
    assert got == {1: 1, 2: 1}
    assert calls["n"] >= 1

    # seeded random graphs, star-heavy and chain-heavy, node-for-node
    x = 424242
    for trial in range(3):
        es = []
        for _ in range(40):
            x = (1103515245 * x + 12345) % (1 << 31)
            a = x % 60
            x = (1103515245 * x + 12345) % (1 << 31)
            b = x % 60
            if a != b:
                es.append((a, b))
        got = _spark_components(spark, es)
        want = _union_find(sorted({n for e in es for n in e}), es)
        assert got == want


def test_components_driver_tier_matches_star_loop(spark, monkeypatch):
    """r16: the size-gated driver union-find tier must return
    bit-identical (node, component) rows to the distributed star
    loop — same graphs through both tiers, long AND string ids,
    including the empty edge set."""
    from big_data_bowl___2023_spark.dedup import clusters as CL

    graphs = [
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7), (4, 5),
         (10, 11), (10, 12), (10, 13)],          # chain+triangle+star
        [(1, 2)],
        [(2, 1), (3, 2), (4, 3)],                # reversed chain
        [],
    ]
    x = 999331
    for _ in range(2):                           # seeded random mixes
        es = []
        for _ in range(60):
            x = (1103515245 * x + 12345) % (1 << 31)
            a = x % 50
            x = (1103515245 * x + 12345) % (1 << 31)
            b = x % 50
            if a != b:
                es.append((a, b))
        graphs.append(es)

    for edges in graphs:
        pairs = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
        got_driver = sorted(
            (r.node, r.component)
            for r in dd.connected_components(pairs).collect())
        monkeypatch.setattr(CL, "DRIVER_EDGE_BOUND", -1)
        got_loop = sorted(
            (r.node, r.component)
            for r in dd.connected_components(pairs).collect())
        monkeypatch.setattr(CL, "DRIVER_EDGE_BOUND", 100_000)
        assert got_driver == got_loop

    # string ids: binary-vs-codepoint ordering must agree on min-roots
    sedges = [("b", "a"), ("c", "b"), ("zz", "z"), ("Z", "a9")]
    pairs = spark.createDataFrame(sedges, "doc_a: string, doc_b: string")
    got_driver = sorted((r.node, r.component)
                        for r in dd.connected_components(pairs).collect())
    monkeypatch.setattr(CL, "DRIVER_EDGE_BOUND", -1)
    got_loop = sorted((r.node, r.component)
                      for r in dd.connected_components(pairs).collect())
    assert got_driver == got_loop
