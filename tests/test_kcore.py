"""k-core peeling kernel vs the set-peeling oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph import graph as G, oracle
from linkgraph.kcore import kcore


def planted_kcore_graph() -> pa.Table:
    """Clique K6 (core 5) + cycle C8 (core 2) + star20 (core 1) + path6."""
    src, dst = [], []
    cl = np.arange(100, 106)
    for i in range(6):
        for j in range(i + 1, 6):
            src.append(cl[i]); dst.append(cl[j])
    cyc = np.arange(200, 208)
    for i in range(8):
        src.append(cyc[i]); dst.append(cyc[(i + 1) % 8])
    for leaf in range(301, 321):
        src.append(300); dst.append(leaf)
    for i in range(400, 405):
        src.append(i); dst.append(i + 1)
    return pa.table(
        {"src": np.array(src, dtype=np.int64), "dst": np.array(dst, dtype=np.int64)}
    )


@pytest.mark.parametrize("k", [1, 2, 3, 5, 6])
def test_kcore_planted_shapes(k):
    t = planted_kcore_graph()
    exp = oracle.kcore_vertices(t["src"].to_numpy(), t["dst"].to_numpy(), k)
    res = kcore(G.from_arrow_edges(t).repartition(4), k)
    got = {int(r["vertex"]) for r in res.vertices.take_all()}
    assert got == exp, k
    assert res.num_vertices == len(exp)


def test_kcore_random_vs_oracle():
    rng = np.random.default_rng(9)
    n_e, n_v = 500, 80
    t = pa.table(
        {
            "src": rng.integers(0, n_v, n_e).astype(np.int64),
            "dst": rng.integers(0, n_v, n_e).astype(np.int64),
        }
    )
    for k in (2, 3, 4):
        exp = oracle.kcore_vertices(t["src"].to_numpy(), t["dst"].to_numpy(), k)
        res = kcore(G.from_arrow_edges(t).repartition(4), k)
        got = {int(r["vertex"]) for r in res.vertices.take_all()}
        assert got == exp, k


def test_kcore_deterministic_across_partitioning():
    t = planted_kcore_graph()
    a = kcore(G.from_arrow_edges(t).repartition(1), 2)
    b = kcore(G.from_arrow_edges(t).repartition(7), 2)
    va = sorted(int(r["vertex"]) for r in a.vertices.take_all())
    vb = sorted(int(r["vertex"]) for r in b.vertices.take_all())
    assert va == vb
    assert a.num_rounds == b.num_rounds


def test_kcore_int32_straddling_ids():
    hi = (np.int64(1) << 31) + 11
    # straddling triangle (3-clique) + a pendant: 2-core = the triangle
    t = pa.table(
        {
            "src": np.array([5, 5, hi, 5], dtype=np.int64),
            "dst": np.array([9, hi, 9, 777], dtype=np.int64),
        }
    )
    res = kcore(G.from_arrow_edges(t).repartition(2), 2)
    got = {int(r["vertex"]) for r in res.vertices.take_all()}
    assert got == {5, 9, int(hi)}
