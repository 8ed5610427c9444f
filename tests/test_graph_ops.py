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


def test_modularity_matches_brute_force():
    """Newman Q vs a dict-based brute force on a random labeling, with
    duplicate and self-loop edges that must not double count."""
    import ray.data as rd

    from linkgraph.graph import modularity

    rng = np.random.default_rng(61)
    src = rng.integers(0, 40, 150)
    dst = rng.integers(0, 40, 150)
    # inject duplicates (same pair, both orders) and self loops
    src = np.concatenate([src, src[:20], dst[:10], np.arange(5)])
    dst = np.concatenate([dst, dst[:20], src[:10], np.arange(5)])
    labels = {v: int(v) % 4 for v in range(40)}

    pairs = {(min(int(a), int(b)), max(int(a), int(b)))
             for a, b in zip(src, dst) if a != b}
    m = len(pairs)
    intra = sum(1 for u, v in pairs if labels[u] == labels[v])
    dc = {}
    for u, v in pairs:
        dc[labels[u]] = dc.get(labels[u], 0) + 1
        dc[labels[v]] = dc.get(labels[v], 0) + 1
    q_exp = intra / m - sum(d * d for d in dc.values()) / (4.0 * m * m)

    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(3)
    lab = rd.from_arrow(
        pa.table(
            {
                "vertex": pa.array(sorted(labels), pa.int64()),
                "label": pa.array([labels[v] for v in sorted(labels)], pa.int64()),
            }
        )
    )
    out = modularity(edges, lab)
    assert out["m"] == m and out["intra"] == intra
    assert abs(out["modularity"] - q_exp) < 1e-12


def test_modularity_extremes():
    """All-one-community Q = 1 − 1 = 0; the perfect 2-clique split is the
    textbook positive case; empty graph well-defined."""
    import ray.data as rd

    from linkgraph.graph import modularity

    def clique(base, k):
        s, t = [], []
        for i in range(k):
            for j in range(i + 1, k):
                s.append(base + i)
                t.append(base + j)
        return s, t

    s1, t1 = clique(0, 4)
    s2, t2 = clique(10, 4)
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(s1 + s2 + [0], pa.int64()),
                "dst": pa.array(t1 + t2 + [10], pa.int64()),
            }
        )
    )
    verts = list(range(4)) + list(range(10, 14))
    one = rd.from_arrow(
        pa.table(
            {
                "vertex": pa.array(verts, pa.int64()),
                "label": pa.array([0] * 8, pa.int64()),
            }
        )
    )
    out_one = modularity(edges, one)
    assert abs(out_one["modularity"] - 0.0) < 1e-12
    split = rd.from_arrow(
        pa.table(
            {
                "vertex": pa.array(verts, pa.int64()),
                "label": pa.array([0] * 4 + [1] * 4, pa.int64()),
            }
        )
    )
    out_split = modularity(edges, split)
    # 13 edges, 12 intra, each community degree sum 13
    exp = 12 / 13 - 2 * (13 / 26) ** 2
    assert abs(out_split["modularity"] - exp) < 1e-12

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    assert modularity(empty, one)["modularity"] == 0.0
