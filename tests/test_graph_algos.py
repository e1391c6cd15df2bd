"""PageRank vs a pure-Python reference power iteration."""

from __future__ import annotations


def reference_pagerank(edges, damping=0.85, n_iter=4):
    nodes = sorted({n for e in edges for n in e[:2]})
    n = len(nodes)
    out_w = {}
    for s, d, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    rank = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            contrib[d] += rank[s] * w / out_w[s]
        dangling = sum(rank[v] for v in nodes if v not in out_w)
        rank = {v: base + damping * (contrib[v] + dangling / n)
                for v in nodes}
    return rank


def test_pagerank_matches_reference(spark):
    from ehr_relation_extraction_spark.operators.graph_algos import pagerank

    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
             ("a", "c", 2.0), ("d", "a", 1.0), ("e", "a", 1.0)]
    # note: no out-edges from nowhere -> d, e are sources; add a sink
    edges.append(("c", "sink", 0.5))
    df = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=4).collect()}
    want = reference_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6  # mass conserved


def test_pagerank_empty(spark):
    from ehr_relation_extraction_spark.operators.graph_algos import pagerank

    df = spark.createDataFrame([], "src string, dst string, weight double")
    assert pagerank(df).count() == 0


def test_pagerank_on_kg_edges(spark):
    """Runs on the real materialized edges table."""
    from ehr_relation_extraction_spark.operators.graph_algos import pagerank
    from ehr_relation_extraction_spark import driver_queries as dq

    edges = dq.QUERIES["graph_edges"](spark, "/root/testdata/sf0.001") \
        .selectExpr("subj_node AS src", "obj_node AS dst",
                    "CAST(weight AS DOUBLE) AS weight")
    pr = pagerank(edges, n_iter=3).collect()
    assert len(pr) > 5
    assert abs(sum(r["rank"] for r in pr) - 1.0) < 1e-6


def test_bfs_distances_vs_reference(spark):
    import collections
    import random

    from ehr_relation_extraction_spark.operators.graph_algos import (
        bfs_distances)

    rng = random.Random(11)
    nodes = [f"n{i:02d}" for i in range(25)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(30)]
    src = min(nodes)

    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    want, frontier, d = {src: 0}, {src}, 0
    while frontier:
        d += 1
        frontier = {y for x in frontier for y in adj[x] if y not in want}
        for y in frontier:
            want[y] = d

    e_df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(e_df, src).collect()}
    assert got == want


def test_bfs_distances_isolated_source(spark):
    from ehr_relation_extraction_spark.operators.graph_algos import (
        bfs_distances)

    e_df = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r["node"]: r["dist"] for r in bfs_distances(e_df, "z").collect()}
    assert got == {"z": 0}


def test_pagerank_fixed_tracks_float_variant(spark):
    """The oracle-exact integer fixed-point form must agree with the
    float power method to fixed-point truncation error (~1e-9/rank at
    scale=1e12) and conserve mass up to the same truncation."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        pagerank, pagerank_fixed)

    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
             ("a", "c", 2.0), ("d", "a", 1.0), ("e", "a", 1.0),
             ("c", "sink", 0.5)]
    # fixed-point needs integer weights; scale by 2 (ratios unchanged
    # except vs the 0.5 edge, so compare against float on the SAME ints)
    int_edges = [(s, d, int(w * 2)) for s, d, w in edges]
    df_f = spark.createDataFrame(
        int_edges, "src string, dst string, weight long")
    got_fx = {r["node"]: r["rank_u"] / 1e12
              for r in pagerank_fixed(df_f, n_iter=4).collect()}
    got_fl = {r["node"]: r["rank"]
              for r in pagerank(
                  df_f.withColumn("weight", df_f.weight.cast("double")),
                  n_iter=4).collect()}
    assert set(got_fx) == set(got_fl)
    for v in got_fl:
        assert abs(got_fx[v] - got_fl[v]) < 1e-8, (v, got_fx[v], got_fl[v])
    assert abs(sum(got_fx.values()) - 1.0) < 1e-6


def test_pagerank_fixed_partition_invariant(spark):
    """Integer arithmetic => identical rank_u under different
    parallelism (the property the float variant cannot give)."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        pagerank_fixed)

    import random
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(20)]
    edges = [(rng.choice(nodes), rng.choice(nodes), rng.randint(1, 5))
             for _ in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    a = {(r["node"], r["rank_u"])
         for r in pagerank_fixed(df.repartition(1), n_iter=4).collect()}
    b = {(r["node"], r["rank_u"])
         for r in pagerank_fixed(df.repartition(13), n_iter=4).collect()}
    assert a == b


def test_label_propagation_matches_serial_replica(spark):
    """Sync LPA with min-label tie-break vs a serial Python replica on
    a two-community graph with a weak bridge — deterministic round for
    round."""
    from collections import Counter

    from ehr_relation_extraction_spark.operators.graph_algos import (
        label_propagation)

    # K4 on a..d, K4 on w..z, one bridge d-w, isolated node q
    cliq1 = ["a", "b", "c", "d"]
    cliq2 = ["w", "x", "y", "z"]
    e = [(u, v) for i, u in enumerate(cliq1) for v in cliq1[i + 1:]]
    e += [(u, v) for i, u in enumerate(cliq2) for v in cliq2[i + 1:]]
    e += [("d", "w")]
    ns = cliq1 + cliq2 + ["q"]
    adj: dict[str, set] = {n: set() for n in ns}
    for u, v in e:
        adj[u].add(v)
        adj[v].add(u)

    def serial(n_rounds):
        lab = {n: n for n in ns}
        for _ in range(n_rounds):
            new = {}
            for n in ns:
                if not adj[n]:
                    new[n] = lab[n]
                    continue
                cnt = Counter(lab[m] for m in adj[n])
                best = max(cnt.values())
                new[n] = min(l for l, c in cnt.items() if c == best)
            lab = new
        return lab

    edges = spark.createDataFrame(e, "src string, dst string")
    nodes = spark.createDataFrame([(n,) for n in ns], "node string")
    for rounds in (1, 3, 5):
        got = {r["node"]: r["label"]
               for r in label_propagation(edges, nodes, rounds).collect()}
        assert got == serial(rounds), rounds
    # at 5 rounds the two cliques hold distinct communities and the
    # isolated node keeps its own label
    lab5 = serial(5)
    assert len({lab5[n] for n in cliq1}) == 1
    assert len({lab5[n] for n in cliq2}) == 1
    assert lab5["a"] != lab5["w"] and lab5["q"] == "q"
