"""Hash-driven random-walk corpus vs a pure-Python replay oracle."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import synth
from linkgraph.walks import _A, _B, _C, _D, _M, random_walks


def _py_walks(src, dst, starts, length, walks_per_start, seed):
    """Replay the exact hash-walk contract: symmetrized distinct adjacency
    sorted by neighbor id; step t of walk (s, w) picks index
    ((s%M)*A + w*C + t*B + seed*D) % M % deg."""
    adj = {}
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    adj = {v: sorted(ns) for v, ns in adj.items()}
    rows = []
    for s in sorted(set(int(x) for x in starts)):
        if s not in adj:
            continue
        for w in range(walks_per_start):
            cur = s
            rows.append((s, w, 0, cur))
            for t in range(1, length + 1):
                ns = adj[cur]
                r = ((s % _M) * _A + w * _C + t * _B + seed * _D) % _M
                cur = ns[r % len(ns)]
                rows.append((s, w, t, cur))
    return sorted(rows)


def _engine_rows(walks):
    return sorted(
        (r["start"], r["widx"], r["step"], r["vertex"]) for r in walks.take_all()
    )


def test_walks_match_python_replay():
    rng = np.random.default_rng(37)
    src = rng.integers(0, 60, 200)
    dst = rng.integers(0, 60, 200)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    starts = [0, 7, 13, 59]
    walks, metrics = random_walks(
        edges, starts, length=5, walks_per_start=3, seed=4
    )
    assert _engine_rows(walks) == _py_walks(src, dst, starts, 5, 3, seed=4)
    assert metrics[0]["num_starts"] == 4


def test_walks_exactly_deterministic_across_partitioning():
    """Integer-only kernel: EXACT equality at different parallelism (no
    float drift — stronger than the kernel 1e-12 bar)."""
    edges_t, _ = synth.make_planted_graph(300, 3, 4, seed=43)
    starts = list(range(0, 300, 37))
    r1, _ = random_walks(
        rd.from_arrow(edges_t).repartition(2), starts, length=4, walks_per_start=2
    )
    r2, _ = random_walks(
        rd.from_arrow(edges_t).repartition(9), starts, length=4, walks_per_start=2
    )
    assert _engine_rows(r1) == _engine_rows(r2)


def test_walks_absent_starts_dropped_and_seed_matters():
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 0], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    walks, _ = random_walks(edges, [0, 999], length=3, walks_per_start=1)
    rows = _engine_rows(walks)
    assert {r[0] for r in rows} == {0}  # start 999 not in graph → dropped
    assert len(rows) == 4  # steps 0..3
    assert rows == _py_walks(src, dst, [0, 999], 3, 1, seed=0)
    w2, _ = random_walks(edges, [0], length=3, walks_per_start=1, seed=77)
    assert _engine_rows(w2) == _py_walks(src, dst, [0], 3, 1, seed=77)


def test_walks_hub_skew_and_straddle():
    """Hub adjacency reassembles across sub-blocks; ids straddle 2^31."""
    big = (np.int64(1) << 31) + 7
    n = 300
    leaves = np.arange(n, dtype=np.int64) * 3
    src = np.concatenate([leaves, leaves[: n // 4]])
    dst = np.concatenate(
        [np.full(n, big, dtype=np.int64), leaves[n // 4 : n // 2]]
    )
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    starts = [int(big), 0, 3]
    walks, _ = random_walks(
        edges.repartition(5), starts, length=6, walks_per_start=2, seed=2
    )
    assert _engine_rows(walks) == _py_walks(src, dst, starts, 6, 2, seed=2)


def test_walks_validates_args():
    import pytest

    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([0], pa.int64()),
                "dst": pa.array([1], pa.int64()),
            }
        )
    )
    with pytest.raises(ValueError):
        random_walks(edges, [0], seed=-1)
    with pytest.raises(ValueError):
        random_walks(edges, [0], walks_per_start=0)
