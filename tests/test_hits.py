"""HITS hubs/authorities vs dense NumPy iteration (Kleinberg, JACM 1999)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph.hits import hits


def _dense_hits(src, dst, iters):
    pairs = {(int(s), int(t)) for s, t in zip(src, dst) if s != t}
    verts = sorted({u for u, v in pairs} | {v for u, v in pairs})
    vi = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for u, v in pairs:
        A[vi[u], vi[v]] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = A.T @ h
        a = a / np.sqrt((a * a).sum())
        h = A @ a
        h = h / np.sqrt((h * h).sum())
    return verts, vi, h, a


def test_hits_matches_dense_oracle():
    rng = np.random.default_rng(13)
    src = rng.integers(0, 70, 280)
    dst = rng.integers(0, 70, 280)
    verts, vi, h, a = _dense_hits(src, dst, iters=4)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    res = hits(edges, max_iters=4)
    rows = res.scores.take_all()
    assert len(rows) == len(verts)
    gh = {r["vertex"]: r["hub"] for r in rows}
    ga = {r["vertex"]: r["authority"] for r in rows}
    assert np.allclose([gh[v] for v in verts], [h[vi[v]] for v in verts], atol=1e-12)
    assert np.allclose([ga[v] for v in verts], [a[vi[v]] for v in verts], atol=1e-12)


def test_hits_bipartite_structure():
    """On a pure bipartite fan (many hubs → one popular page), the popular
    page takes all the authority and pure sinks have zero hub score."""
    n = 20
    src = np.arange(n, dtype=np.int64)
    dst = np.full(n, 1000, dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    res = hits(edges, max_iters=3)
    rows = {r["vertex"]: r for r in res.scores.take_all()}
    assert abs(rows[1000]["authority"] - 1.0) < 1e-12
    assert rows[1000]["hub"] == 0.0
    for v in range(n):
        assert rows[v]["authority"] == 0.0
        assert abs(rows[v]["hub"] - 1.0 / np.sqrt(n)) < 1e-12


def test_hits_deterministic_across_partitioning():
    rng = np.random.default_rng(17)
    src = rng.integers(0, 50, 200)
    dst = rng.integers(0, 50, 200)
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    r1 = hits(rd.from_arrow(t).repartition(2), max_iters=3)
    r2 = hits(rd.from_arrow(t).repartition(9), max_iters=3)
    s1 = sorted((r["vertex"], r["hub"], r["authority"]) for r in r1.scores.take_all())
    s2 = sorted((r["vertex"], r["hub"], r["authority"]) for r in r2.scores.take_all())
    # partial-sum order varies with sub-block grouping → ulp-level float
    # drift; 1e-12 equality is the repo-wide float-kernel determinism bar
    # (test_pagerank_deterministic_across_partitioning)
    assert [x[0] for x in s1] == [x[0] for x in s2]
    assert np.allclose([x[1] for x in s1], [x[1] for x in s2], atol=1e-12)
    assert np.allclose([x[2] for x in s1], [x[2] for x in s2], atol=1e-12)


def test_hits_reciprocal_edges_survive_dedup():
    """u→v and v→u are distinct directed edges — the exchange's full-row
    dedup must keep both (the f flag is part of the row identity)."""
    src = np.array([1, 2, 2, 3], dtype=np.int64)
    dst = np.array([2, 1, 3, 2], dtype=np.int64)
    verts, vi, h, a = _dense_hits(src, dst, iters=3)
    res = hits(rd.from_arrow(pa.table({"src": src, "dst": dst})), max_iters=3)
    rows = {r["vertex"]: r for r in res.scores.take_all()}
    for v in verts:
        assert abs(rows[v]["hub"] - h[vi[v]]) < 1e-12
        assert abs(rows[v]["authority"] - a[vi[v]]) < 1e-12


def test_hits_hub_skew_and_straddle():
    """A high-degree vertex with ids straddling 2^31."""
    big = (np.int64(1) << 31) + 5
    n = 120
    leaves = np.arange(n, dtype=np.int64) * 13
    src = np.concatenate([leaves, np.full(n // 2, big, dtype=np.int64)])
    dst = np.concatenate([np.full(n, big, dtype=np.int64), leaves[: n // 2]])
    verts, vi, h, a = _dense_hits(src, dst, iters=3)
    res = hits(
        rd.from_arrow(
            pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
        ).repartition(4),
        max_iters=3,
    )
    rows = {r["vertex"]: r for r in res.scores.take_all()}
    assert len(rows) == len(verts)
    for v in verts:
        assert abs(rows[v]["hub"] - h[vi[v]]) < 1e-12
        assert abs(rows[v]["authority"] - a[vi[v]]) < 1e-12
