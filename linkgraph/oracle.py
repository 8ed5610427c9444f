"""Driver-side NumPy oracles used by the test suite.

Reimplements the reference's sequential baselines in ~30 lines of NumPy each
(SURVEY.md §5): union-find with union-by-minimum and path halving
(``src/cc_sequential.c:264-368``) so labels are the min vertex id per
component — the canonical labeling all four sequential reference variants
agree on bit-identically (``benchmarks/benchmark_sequential.c:84-97``) —
plus a dense PageRank power iteration and a brute-force triangle counter
(north-star additions; not in the reference).
"""

from __future__ import annotations

import numpy as np


def cc_labels(
    src: np.ndarray, dst: np.ndarray, num_vertices: int | None = None
) -> np.ndarray:
    """Min-id component labels via union-find (ref ``src/cc_sequential.c:273-368``).

    Self-loops are ignored (ref ``src/graph.c:71-73``); parallel edges are
    harmless.  ``labels[v] == min(component(v))``.
    """
    if num_vertices is None:
        num_vertices = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    parent = np.arange(num_vertices, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for u, v in zip(src.tolist(), dst.tolist()):
        if u == v:
            continue
        ru, rv = find(u), find(v)
        if ru != rv:
            if ru < rv:  # union by minimum root => root is the component min
                parent[rv] = ru
            else:
                parent[ru] = rv
    return np.array([find(v) for v in range(num_vertices)], dtype=np.int64)


def component_sizes(labels: np.ndarray) -> dict[int, int]:
    """Component size histogram (ref ``src/cc_common.c:40-94``)."""
    uniq, counts = np.unique(labels, return_counts=True)
    return {int(k): int(c) for k, c in zip(uniq, counts)}


def pagerank(
    src: np.ndarray,
    dst: np.ndarray,
    num_vertices: int,
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iters: int = 500,
) -> np.ndarray:
    """Dense power iteration with uniform teleport + dangling redistribution.

    Operates on the *deduplicated directed* edge set implied by (src, dst)
    with self-loops removed — the same canonicalization the engine applies.
    """
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    s, d = pairs[:, 0], pairs[:, 1]
    outdeg = np.bincount(s, minlength=num_vertices).astype(np.float64)
    r = np.full(num_vertices, 1.0 / num_vertices)
    dangling = outdeg == 0
    inv = np.zeros(num_vertices)
    inv[~dangling] = 1.0 / outdeg[~dangling]
    for _ in range(max_iters):
        contrib = np.zeros(num_vertices)
        np.add.at(contrib, d, r[s] * inv[s])
        dm = r[dangling].sum()
        r_new = (1 - damping) / num_vertices + damping * (contrib + dm / num_vertices)
        delta = np.abs(r_new - r).sum()
        r = r_new
        if delta < tol:
            break
    return r


def weighted_pagerank(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    num_vertices: int,
    damping: float = 0.85,
    tol: float = 1e-12,
    max_iters: int = 500,
) -> np.ndarray:
    """Dense weighted power iteration on DIRECTED rows (no dedup: parallel
    rows are additive — the engine's ``weighted_pagerank`` semantics).
    Self-loops removed.  A vertex with zero out-weight keeps only its
    teleport mass (no dangling redistribution — matches the engine's
    symmetrized-input regime where the case cannot occur)."""
    keep = src != dst
    s, d, ww = src[keep], dst[keep], np.asarray(w, dtype=np.float64)[keep]
    W = np.zeros(num_vertices)
    np.add.at(W, s, ww)
    inv = np.zeros(num_vertices)
    nz = W > 0
    inv[nz] = 1.0 / W[nz]
    r = np.full(num_vertices, 1.0 / num_vertices)
    for _ in range(max_iters):
        contrib = np.zeros(num_vertices)
        np.add.at(contrib, d, r[s] * ww * inv[s])
        r_new = (1 - damping) / num_vertices + damping * contrib
        delta = np.abs(r_new - r).sum()
        r = r_new
        if delta < tol:
            break
    return r


def triangle_count(src: np.ndarray, dst: np.ndarray) -> int:
    """Exact triangle count on the undirected simple graph of (src, dst)."""
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep])
    hi = np.maximum(src[keep], dst[keep])
    pairs = set(zip(lo.tolist(), hi.tolist()))
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # each triangle {a<b<c} is counted once per edge => divide by 3
    total = 0
    for u, v in pairs:
        total += len(adj[u] & adj[v])
    return total // 3


def local_clustering(
    src: np.ndarray, dst: np.ndarray
) -> dict[int, tuple[int, int, float]]:
    """vertex -> (degree, n_triangles, lcc) on the simple undirected graph."""
    pairs = {
        (min(int(u), int(v)), max(int(u), int(v)))
        for u, v in zip(src.tolist(), dst.tolist())
        if u != v
    }
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out: dict[int, tuple[int, int, float]] = {}
    for v, nb in adj.items():
        nbl = sorted(nb)
        t = sum(
            len(adj[a] & nb) for a in nbl
        ) // 2  # each triangle at v counted once per ordered neighbor pair
        d = len(nb)
        lcc = (2.0 * t) / (d * (d - 1)) if d >= 2 else 0.0
        out[v] = (d, t, lcc)
    return out


def kcore_vertices(src: np.ndarray, dst: np.ndarray, k: int) -> set[int]:
    """Vertices of the k-core of the simple undirected graph (peeling)."""
    pairs = {
        (min(int(u), int(v)), max(int(u), int(v)))
        for u, v in zip(src.tolist(), dst.tolist())
        if u != v
    }
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    while True:
        dead = {v for v in alive if len(adj[v] & alive) < k}
        if not dead:
            return alive
        alive -= dead
