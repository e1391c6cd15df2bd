"""Cross-engine parity + serial ground truth for continuation
batch 144 (operators/graph_algos.rich_club)."""

from __future__ import annotations

from itertools import combinations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["rich_club"](spark, SF),
                      con.sql(ORACLE["rich_club"]).df())
    assert ok, msg


def test_core_periphery_fixture(spark):
    """K5 core, each core node also serving 3 pendant spokes: the
    k=4-club is exactly the core at density 1.0; every row equals a
    serial replay."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        rich_club)

    core = [f"c{i}" for i in range(5)]
    edges = [(a, b) for a, b in combinations(core, 2)]
    for i, c in enumerate(core):
        for j in range(3):
            edges.append((c, f"p{i}_{j}"))
        # chain the spokes so they reach degree 2 and join the k=1
        # club (degree exactly 1 would exclude them from EVERY club)
        edges.append((f"p{i}_0", f"p{i}_1"))
        edges.append((f"p{i}_1", f"p{i}_2"))
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.k: (r.n_rich, r.e_rich, r.possible_pairs, r.phi_micro6)
           for r in rich_club(df).collect()}

    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    eset = {tuple(sorted(e)) for e in edges}
    for k in (1, 2, 4):        # k=8 club has <2 members (max deg 7)
        club = {n for n, d in deg.items() if d > k}
        e_rich = sum(1 for a, b in eset if a in club and b in club)
        n = len(club)
        assert got[k] == (n, e_rich, n * (n - 1) // 2,
                          (2000000 * e_rich) // (n * (n - 1)))
    assert 8 not in got
    # the core IS a rich club: k=4 club = K5 at exact density 1.0
    assert got[4] == (5, 10, 10, 1000000)
    # low-k clubs include pendants -> density strictly below 1
    assert got[1][3] < 1000000
