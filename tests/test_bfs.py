"""BFS hop distances vs a pure-Python BFS oracle on adversarial shapes."""

from collections import deque

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import graph as G, synth
from linkgraph.bfs import bfs_hops


def _py_bfs(src_arr, dst_arr, source):
    adj = {}
    for s, d in zip(src_arr, dst_arr):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    dist = {source: 0}
    q = deque([source])
    while q:
        v = q.popleft()
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


def _check(tbl, source, num_partitions=4):
    got_ds, metrics = bfs_hops(
        G.from_arrow_edges(tbl), source, num_partitions=num_partitions
    )
    got = got_ds.to_pandas().set_index("vertex")["dist"].to_dict()
    want = _py_bfs(
        tbl["src"].to_numpy(), tbl["dst"].to_numpy(), source
    )
    assert got == want
    # frontier supersteps = eccentricity + 1 (the settle check round)
    ecc = max(want.values())
    assert len(metrics) == ecc + 1
    return metrics


def test_bfs_chain():
    n = 24
    t = pa.table(
        {
            "src": np.arange(n - 1, dtype=np.int64),
            "dst": np.arange(1, n, dtype=np.int64),
        }
    )
    _check(t, 0)
    _check(t, n // 2)


def test_bfs_hub_graph():
    t, _ = synth.make_hub_graph(2000, 3, seed=7)
    _check(t, 0)  # source at the hub — frontier of 2000 in one superstep


def test_bfs_random_with_unreachable():
    rng = np.random.default_rng(43)
    # two islands: vertices 0-99 and 1000-1099; source in island 1
    a = rng.integers(0, 100, 400)
    b = rng.integers(0, 100, 400)
    c = rng.integers(1000, 1100, 300)
    d = rng.integers(1000, 1100, 300)
    t = pa.table(
        {
            "src": np.concatenate([a, c]).astype(np.int64),
            "dst": np.concatenate([b, d]).astype(np.int64),
        }
    )
    got_ds, _ = bfs_hops(G.from_arrow_edges(t), 0, num_partitions=3)
    got = got_ds.to_pandas()
    # island 2 must be absent from the output
    assert (got["vertex"] < 1000).all()
    want = _py_bfs(t["src"].to_numpy(), t["dst"].to_numpy(), 0)
    assert got.set_index("vertex")["dist"].to_dict() == want


def test_bfs_deterministic_across_partitioning():
    rng = np.random.default_rng(47)
    t = pa.table(
        {
            "src": rng.integers(0, 300, 2000).astype(np.int64),
            "dst": rng.integers(0, 300, 2000).astype(np.int64),
        }
    )
    a, _ = bfs_hops(G.from_arrow_edges(t), 5, num_partitions=1)
    b, _ = bfs_hops(G.from_arrow_edges(t), 5, num_partitions=9)
    pa_, pb = a.to_pandas().sort_values("vertex"), b.to_pandas().sort_values("vertex")
    assert pa_.reset_index(drop=True).equals(pb.reset_index(drop=True))


def test_bfs_nearest_ties_and_labels():
    from linkgraph.bfs import bfs_nearest

    # path graph 0-1-2-3-4 with sources {0, 4}: vertex 2 ties -> source 0
    t = pa.table(
        {
            "src": np.array([0, 1, 2, 3], dtype=np.int64),
            "dst": np.array([1, 2, 3, 4], dtype=np.int64),
        }
    )
    out, _ = bfs_nearest(G.from_arrow_edges(t), [4, 0], num_partitions=3)
    got = out.to_pandas().set_index("vertex").sort_index()
    assert got["dist"].tolist() == [0, 1, 2, 1, 0]
    assert got["nearest"].tolist() == [0, 0, 0, 4, 4]


def test_bfs_nearest_matches_per_source_bfs():
    from linkgraph.bfs import bfs_nearest

    rng = np.random.default_rng(67)
    t = pa.table(
        {
            "src": rng.integers(0, 150, 1200).astype(np.int64),
            "dst": rng.integers(0, 150, 1200).astype(np.int64),
        }
    )
    sources = [3, 77, 142]
    out, _ = bfs_nearest(G.from_arrow_edges(t), sources, num_partitions=4)
    got = out.to_pandas().set_index("vertex").sort_index()
    dists = {
        s: _py_bfs(t["src"].to_numpy(), t["dst"].to_numpy(), s) for s in sources
    }
    for v, row in got.iterrows():
        best = min(
            (d.get(v, 1 << 60), s) for s, d in dists.items()
        )
        assert (row["dist"], row["nearest"]) == best, v


def _py_dijkstra(src_arr, dst_arr, w_arr, source):
    import heapq

    adj = {}
    for s, d, w in zip(src_arr, dst_arr, w_arr):
        if s == d:
            continue
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        dv, v = heapq.heappop(pq)
        if dv > dist.get(v, 1 << 60):
            continue
        for u, w in adj.get(v, ()):
            nd = dv + w
            if nd < dist.get(u, 1 << 60):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))
    return dist


def test_sssp_vs_dijkstra():
    from linkgraph.bfs import sssp

    rng = np.random.default_rng(71)
    n = 1_500
    t = pa.table(
        {
            "src": rng.integers(0, 120, n).astype(np.int64),
            "dst": rng.integers(0, 120, n).astype(np.int64),
            "w": rng.integers(1, 10, n).astype(np.int64),
        }
    )
    out, _ = sssp(rd_from(t), 7, num_partitions=4)
    got = out.to_pandas().set_index("vertex")["dist"].to_dict()
    want = _py_dijkstra(
        t["src"].to_numpy(), t["dst"].to_numpy(), t["w"].to_numpy(), 7
    )
    assert got == want


def test_sssp_parallel_edges_keep_lightest():
    from linkgraph.bfs import sssp

    t = pa.table(
        {
            "src": pa.array([0, 0, 1], pa.int64()),
            "dst": pa.array([1, 1, 2], pa.int64()),
            "w": pa.array([5, 2, 3], pa.int64()),
        }
    )
    out, _ = sssp(rd_from(t), 0, num_partitions=2)
    got = out.to_pandas().set_index("vertex")["dist"].to_dict()
    assert got == {0: 0, 1: 2, 2: 5}


def rd_from(t):
    import ray.data as rd

    return rd.from_arrow(t)


def test_bfs_checkpoint_resume(tmp_path):
    from linkgraph.bfs import bfs_hops
    from linkgraph.checkpoint import Checkpointer

    rng = np.random.default_rng(73)
    t = pa.table(
        {
            "src": rng.integers(0, 200, 1500).astype(np.int64),
            "dst": rng.integers(0, 200, 1500).astype(np.int64),
        }
    )
    ck = Checkpointer(str(tmp_path), "bfsjob")
    full, _ = bfs_hops(
        G.from_arrow_edges(t), 3, num_partitions=3, checkpointer=ck
    )
    want = full.to_pandas().sort_values("vertex").reset_index(drop=True)
    # resume from the saved state: must converge immediately to the same map
    ck2 = Checkpointer(str(tmp_path), "bfsjob")
    again, metrics = bfs_hops(
        G.from_arrow_edges(t), 3, num_partitions=5,
        checkpointer=ck2, resume=True,
    )
    got = again.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert got.equals(want)


def test_closeness_centrality_exhaustive_matches_brute():
    """Path graph 0-1-2-3-4: closed-form closeness per source."""
    from linkgraph.bfs import closeness_centrality

    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 4], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    stats, metrics = closeness_centrality(edges, [0, 1, 2, 3, 4])
    got = {r["source"]: r for r in stats.take_all()}
    # sum of hop distances from each position on a 5-path
    exp_sum = {0: 10, 1: 7, 2: 6, 3: 7, 4: 10}
    h = lambda *ds: sum(1.0 / d for d in ds)
    exp_harm = {
        0: h(1, 2, 3, 4), 1: h(1, 1, 2, 3), 2: h(2, 1, 1, 2),
        3: h(3, 2, 1, 1), 4: h(4, 3, 2, 1),
    }
    for v, s in exp_sum.items():
        assert got[v]["n_reachable"] == 5
        assert got[v]["sum_dist"] == s
        assert abs(got[v]["closeness"] - 4 / s) < 1e-12
        assert abs(got[v]["harmonic"] - exp_harm[v]) < 1e-12
    assert metrics[0]["sampled"] is False


def test_closeness_centrality_sampled_mode_deterministic():
    from linkgraph.bfs import closeness_centrality

    edges_t, _ = synth.make_planted_graph(400, 4, 4, seed=51)
    edges = rd.from_arrow(edges_t)
    s1, m1 = closeness_centrality(edges, max_sources=6, seed=9)
    s2, m2 = closeness_centrality(edges, max_sources=6, seed=9)
    r1 = sorted(tuple(r.values()) for r in s1.take_all())
    r2 = sorted(tuple(r.values()) for r in s2.take_all())
    assert r1 == r2 and len(r1) == 6
    assert m1[0]["sampled"] is True
    # a different seed picks a different sample (overwhelmingly likely);
    # checked on the sampler directly — no need to pay 6 more BFS runs
    from linkgraph.bfs import _bottom_k_sample_sources

    assert _bottom_k_sample_sources(edges, 6, 10) != _bottom_k_sample_sources(
        edges, 6, 9
    )
    # sampled per-source values are EXACT: spot-check one source
    some = s1.take_all()[0]
    exact, _ = closeness_centrality(edges, [some["source"]])
    er = exact.take_all()[0]
    assert (er["n_reachable"], er["sum_dist"]) == (
        some["n_reachable"], some["sum_dist"]
    )


def test_closeness_centrality_caps_explicit_sources():
    from linkgraph.bfs import closeness_centrality

    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 4], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    stats, metrics = closeness_centrality(
        edges, [0, 1, 2, 3, 4], max_sources=3, seed=1
    )
    rows = stats.take_all()
    assert len(rows) == 3 and metrics[0]["sampled"] is True
    import pytest

    with pytest.raises(ValueError):
        closeness_centrality(edges)  # unbounded exhaustive sweep refused
