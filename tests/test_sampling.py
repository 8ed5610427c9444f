"""GNN neighbor-fanout sampling vs a pure-Python replay oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import synth
from linkgraph.sampling import neighbor_sample
from linkgraph.walks import _A, _B, _C, _D, _M


def _py_sample(src, dst, seeds, fanouts, seed):
    adj = {}
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    adj = {v: sorted(ns) for v, ns in adj.items()}
    rows = []
    frontier = sorted({int(s) for s in seeds} & set(adj))
    for layer, k in enumerate(fanouts, start=1):
        nxt = set()
        for v in frontier:
            ns = adj[v]
            for j in range(k):
                r = ((v % _M) * _A + j * _C + layer * _B + seed * _D) % _M
                u = ns[r % len(ns)]
                rows.append((layer, v, u, j))
                nxt.add(u)
        frontier = sorted(nxt)
    return sorted(rows)


def _engine_rows(ds):
    return sorted(
        (r["layer"], r["src"], r["dst"], r["draw"]) for r in ds.take_all()
    )


def test_neighbor_sample_matches_replay():
    rng = np.random.default_rng(67)
    src = rng.integers(0, 80, 300)
    dst = rng.integers(0, 80, 300)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    seeds = [0, 17, 999]  # 999 absent → dropped
    sampled, metrics = neighbor_sample(edges, seeds, fanouts=[3, 2], seed=5)
    assert _engine_rows(sampled) == _py_sample(src, dst, seeds, [3, 2], seed=5)
    assert metrics[1]["layer"] == 1 and metrics[2]["layer"] == 2


def test_neighbor_sample_deterministic_across_partitioning():
    edges_t, _ = synth.make_planted_graph(300, 3, 4, seed=71)
    seeds = list(range(0, 300, 43))
    r1, _ = neighbor_sample(
        rd.from_arrow(edges_t).repartition(2), seeds, fanouts=[4, 3]
    )
    r2, _ = neighbor_sample(
        rd.from_arrow(edges_t).repartition(9), seeds, fanouts=[4, 3]
    )
    assert _engine_rows(r1) == _engine_rows(r2)  # exact integer equality


def test_neighbor_sample_frontier_shared_and_hub():
    """Overlapping frontiers share per-(vertex, layer) draws; a hub with
    ids straddling 2^31 samples from its full reassembled run."""
    big = (np.int64(1) << 31) + 11
    n = 200
    leaves = np.arange(n, dtype=np.int64) * 5
    src = np.concatenate([leaves, leaves[: n // 2]])
    dst = np.concatenate(
        [np.full(n, big, dtype=np.int64), leaves[n // 2 :]]
    )
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    seeds = [0, 5, int(big)]
    sampled, _ = neighbor_sample(
        edges.repartition(5), seeds, fanouts=[5, 2], seed=3
    )
    rows = _engine_rows(sampled)
    assert rows == _py_sample(src, dst, seeds, [5, 2], seed=3)
    # hub vertex appears once per draw index in layer 1, with identical
    # draws regardless of how many seeds reached it
    hub_l1 = [r for r in rows if r[0] == 1 and r[1] == big]
    assert len(hub_l1) == 5 and len({r[3] for r in hub_l1}) == 5


def test_neighbor_sample_validates_args():
    import pytest

    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array([0], pa.int64()), "dst": pa.array([1], pa.int64())}
        )
    )
    with pytest.raises(ValueError):
        neighbor_sample(edges, [0], fanouts=[])
    with pytest.raises(ValueError):
        neighbor_sample(edges, [0], fanouts=[2], seed=-1)
