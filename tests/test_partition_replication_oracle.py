"""Cross-engine parity + serial ground truth for continuation
batch 111 (operators/graph_algos.partition_replication)."""

from __future__ import annotations

import hashlib

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

    ok, msg = compare(QUERIES["partition_replication"](spark, SF),
                      con.sql(ORACLE["partition_replication"]).df())
    assert ok, msg


def _h16(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _serial(edges, rows=3, cols=3):
    P = rows * cols
    out = {}
    for label, part_of in [
            ("hash_1d_src", lambda s, d: _h16(s) % P),
            ("grid_2d", lambda s, d: (_h16(s) % rows) * cols
             + (_h16(d) % cols))]:
        counts, pairs = {}, set()
        for s, d in edges:
            p = part_of(s, d)
            counts[p] = counts.get(p, 0) + 1
            pairs.add((p, s))
            pairs.add((p, d))
        nodes = {n for _, n in pairs}
        n_edges = len(edges)
        mx = max(counts.values())
        replicas = len(pairs)
        out[label] = (P, n_edges, mx,
                      (1000000 * mx * P) // n_edges,
                      len(nodes), replicas,
                      (1000000 * replicas) // len(nodes))
    return out


def test_matches_serial_audit(spark):
    """Star-plus-ring fixture: a hub with 40 spokes (worst case for
    1D in-edge scatter) plus a 12-ring — the audit must equal a
    serial replay exactly, and the grid must bound the hub's
    replication where 1D cannot."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        partition_replication)

    edges = [(f"n{i}", "hub") for i in range(40)] \
        + [(f"r{i}", f"r{(i + 1) % 12}") for i in range(12)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.strategy: (r.n_partitions, r.n_edges, r.max_part_edges,
                        r.balance_micro6, r.n_nodes, r.replicas,
                        r.replication_micro6)
           for r in partition_replication(df).collect()}
    assert got == _serial(edges)
    # the hub's in-edges: 1D scatters them across up to P partitions,
    # the grid bounds any vertex to rows + cols - 1 = 5
    hub_parts_1d = {_h16(s) % 9 for s, d in edges if d == "hub"}
    hub_parts_2d = {(_h16(s) % 3) * 3 + (_h16("hub") % 3)
                    for s, d in edges if d == "hub"}
    assert len(hub_parts_2d) <= 3 < len(hub_parts_1d)
