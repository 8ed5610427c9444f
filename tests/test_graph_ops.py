"""Edge-table ops: canonicalize/symmetrize/dedup/degrees/fingerprint."""

import numpy as np
import pyarrow as pa

from linkgraph import graph as G, synth


def rows(ds):
    return sorted((r["src"], r["dst"]) for r in ds.take_all())


def test_canonicalize_drops_loops_orients_dedups():
    edges = pa.table(
        {
            "src": np.array([1, 2, 2, 3, 5, 4], dtype=np.int64),
            "dst": np.array([2, 1, 2, 4, 4, 5], dtype=np.int64),
        }
    )
    out = G.canonicalize(G.from_arrow_edges(edges), global_dedup=True)
    assert rows(out) == [(1, 2), (3, 4), (4, 5)]


def test_symmetrize_both_directions():
    edges = pa.table(
        {"src": np.array([0], dtype=np.int64), "dst": np.array([1], dtype=np.int64)}
    )
    assert rows(G.symmetrize(G.from_arrow_edges(edges))) == [(0, 1), (1, 0)]


def test_degrees():
    edges, _ = synth.golden_micro()
    canon = G.canonicalize(G.from_arrow_edges(edges), global_dedup=True)
    deg = {r["vertex"]: r["degree"] for r in G.undirected_degrees(canon).take_all()}
    assert deg == {0: 2, 1: 2, 2: 2, 3: 1, 4: 2, 5: 1}


def test_vertices_of():
    edges = pa.table(
        {"src": np.array([5, 9], dtype=np.int64), "dst": np.array([9, 2], dtype=np.int64)}
    )
    vs = sorted(r["vertex"] for r in G.vertices_of(G.from_arrow_edges(edges)).take_all())
    assert vs == [2, 5, 9]


def test_fingerprint_order_invariant():
    t1 = pa.table(
        {"src": np.array([1, 2, 3], dtype=np.int64), "dst": np.array([4, 5, 6], dtype=np.int64)}
    )
    t2 = pa.table(
        {"src": np.array([3, 1, 2], dtype=np.int64), "dst": np.array([6, 4, 5], dtype=np.int64)}
    )
    a = G.fingerprint(G.from_arrow_edges(t1))
    b = G.fingerprint(G.from_arrow_edges(t2).repartition(3))
    assert a == b
    t3 = pa.table(
        {"src": np.array([1, 2, 3], dtype=np.int64), "dst": np.array([4, 5, 7], dtype=np.int64)}
    )
    assert G.fingerprint(G.from_arrow_edges(t3)) != a
