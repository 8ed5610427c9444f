"""Single-source BFS hop distances as frontier supersteps.

The fifth iterative kernel on the engine's superstep machinery: BFS is
min-label propagation (``labelprop.py``, ref ``src/cc_openmp.c:38-142``)
with the emitted value incremented per hop — dist(v) = min(dist(v),
min_u dist(u) + 1) — so the loop below mirrors the labelprop shuffle-mode
sweep exactly, with two BFS-specific strengthenings:

- **Frontier-only gather.** Only vertices whose distance changed last
  superstep join against the edge table (the queue-based frontier of the
  reference's ``label_propagation_min``, ``src/cc_sequential.c:130-153``).
  For BFS this is not an optimization but the actual algorithm: the
  frontier is exactly one hop level, so each superstep's join touches
  O(|level k| + deg(level k)) rows, never the whole graph.
- **Settled vertices never re-emit.** Hop distances only decrease when
  first set (unweighted edges), so a vertex leaves the frontier after one
  superstep and the total work across ALL supersteps is O(E) — the same
  bound as the sequential algorithm, paid as one bounded hash join per
  level.

Scale shape: state is a (vertex, dist, changed) Dataset, hash-partitioned
by vertex; each superstep is ONE bucketed hash join (frontier ⋈ edges) +
one groupby-min; convergence is a changed-count aggregate
(``reduction(||:changed)``, ``src/cc_openmp.c:92-94``).  O(diameter)
supersteps — the right kernel for the low-diameter web graphs this engine
targets (effective diameter < 20 at any crawl size).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min, Sum

from linkgraph import graph as G
from linkgraph.partition import bucket_join

_INF = np.iinfo(np.int64).max


def _min_propagate(
    edges: rd.Dataset,
    seed_values: dict[int, int],
    incr: int,
    num_partitions: int | None,
    max_iters: int,
    weight_col: str | None = None,
    checkpointer=None,
    resume: bool = False,
) -> tuple[rd.Dataset, list[dict[str, Any]]]:
    """Shared frontier min-propagation: state[v] starts at
    ``seed_values[v]`` (INF elsewhere) and every superstep takes
    ``min(state[v], min_u state[u] + incr)`` over neighbors — BFS for
    ``incr=1``, multi-source nearest-seed for packed ``(dist, seed-index)``
    values with ``incr = n_seeds`` (the +incr bumps the packed dist and
    preserves the index).  With ``weight_col`` set, ``edges`` must carry a
    non-negative int64 weight column and the update becomes
    ``min(state[v], min_u state[u] + w(u,v))`` — Bellman-Ford supersteps
    (SSSP); ``incr`` is ignored.  Returns the final ``(vertex, dist,
    changed)`` state (dist = the packed value) and per-superstep metrics."""
    from linkgraph.runtime import tune_context

    tune_context()
    num_partitions = num_partitions or G.default_partitions()
    if weight_col is None:
        sym = G.symmetrize_block(G.canonicalize(edges)).materialize()
    else:
        def sym_w(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            w = t[weight_col].to_numpy(zero_copy_only=False)
            keep = s != d  # self loops never improve a distance
            s, d, w = s[keep], d[keep], w[keep]
            return pa.table(
                {
                    "src": pa.array(np.concatenate([s, d])),
                    "dst": pa.array(np.concatenate([d, s])),
                    "w": pa.array(np.concatenate([w, w]).astype(np.int64)),
                }
            )

        sym = edges.map_batches(sym_w, batch_format="pyarrow").materialize()
    verts = G.vertices_of(sym, num_partitions)

    seed_v = np.fromiter(seed_values.keys(), dtype=np.int64)
    seed_d = np.fromiter(
        (seed_values[int(v)] for v in seed_v), dtype=np.int64
    )
    order = np.argsort(seed_v, kind="stable")
    seed_v, seed_d = seed_v[order], seed_d[order]

    def init(t: pa.Table) -> pa.Table:
        v = t["vertex"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(seed_v, v)
        idx_c = np.minimum(idx, len(seed_v) - 1)
        hit = seed_v[idx_c] == v
        d = np.where(hit, seed_d[idx_c], _INF).astype(np.int64)
        return pa.table(
            {
                "vertex": t["vertex"],
                "dist": pa.array(d),
                "changed": pa.array(hit.astype(np.int8)),
            }
        )

    metrics: list[dict[str, Any]] = []
    state = None
    start = 0
    if resume and checkpointer is not None:
        latest = checkpointer.latest()
        if latest is not None:
            it0, state, meta = latest
            start = it0 + 1
            metrics.append(meta)
    if state is None:
        state = verts.map_batches(init, batch_format="pyarrow")
        if checkpointer is not None:
            state = checkpointer.save(0, state, {"phase": "init"})
            start = 1
        else:
            state = state.materialize()

    for it in range(start, start + max_iters):
        t0 = time.perf_counter()
        frontier = state.map_batches(
            lambda t: pa.table(
                {
                    "src": t.filter(pc.equal(t["changed"], 1))["vertex"],
                    "dist": t.filter(pc.equal(t["changed"], 1))["dist"],
                }
            ),
            batch_format="pyarrow",
        )
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        lpay = {"dst": pa.int64()}
        if weight_col is not None:
            lpay["w"] = pa.int64()

        def to_cand(t: pa.Table) -> pa.Table:
            bump = t["w"] if weight_col is not None else incr
            return pa.table(
                {
                    "vertex": t["dst"],
                    "dist": pc.add(t["dist"], bump),
                    "old": pa.array(np.full(len(t), _INF, dtype=np.int64)),
                }
            )

        cand = bucket_join(
            sym,
            frontier,
            ["src"],
            num_buckets=num_partitions,
            left_payload=lpay,
            right_payload={"dist": pa.int64()},
        ).map_batches(to_cand, batch_format="pyarrow")
        own = state.map_batches(
            lambda t: pa.table(
                {"vertex": t["vertex"], "dist": t["dist"], "old": t["dist"]}
            ),
            batch_format="pyarrow",
        )
        reduced = (
            cand.union(own)
            .groupby("vertex", num_partitions=num_partitions)
            .aggregate(Min("dist", alias_name="dist"), Min("old", alias_name="old"))
        )
        mat = reduced.map_batches(
            lambda t: pa.table(
                {
                    "vertex": t["vertex"],
                    "dist": t["dist"],
                    "changed": pc.cast(
                        pc.less(t["dist"], t["old"]), pa.int8()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        step_meta = {
            "superstep": it,
            "frontier": int(n_frontier),
        }
        if checkpointer is not None:
            # Checkpointer.save also severs lineage (Parquet re-read or
            # block-ref rebuild), so the loop stays recursion-safe
            state = checkpointer.save(it, mat, step_meta)
        else:
            mat = mat.materialize()
            # re-root the state on the materialized blocks: materialize()
            # keeps the full logical plan, and O(diameter) supersteps of
            # accreted lineage overflow the recursion limit on plan walks
            state = rd.from_arrow_refs(mat.to_arrow_refs())
        metrics.append({**step_meta, "sec": time.perf_counter() - t0})

    dists = state.map_batches(
        lambda t: t.filter(pc.less(t["dist"], _INF)).select(["vertex", "dist"]),
        batch_format="pyarrow",
    )
    return dists, metrics


def bfs_hops(
    edges: rd.Dataset,
    source: int,
    *,
    num_partitions: int | None = None,
    max_iters: int = 1000,
    checkpointer=None,
    resume: bool = False,
) -> tuple[rd.Dataset, list[dict[str, Any]]]:
    """Hop distance from ``source`` to every reachable vertex.

    Returns ``(dists, metrics)``: ``dists`` has columns
    ``(vertex: int64, dist: int64)`` and contains REACHED vertices only
    (the SQL recursive-walk convention); ``metrics`` has one row per
    superstep with the frontier size and wall time.  ``checkpointer`` /
    ``resume`` follow the kernel-family contract (``Checkpointer`` per
    superstep; resume restarts from the latest saved state)."""
    return _min_propagate(
        edges, {int(source): 0}, 1, num_partitions, max_iters,
        checkpointer=checkpointer, resume=resume,
    )


def bfs_nearest(
    edges: rd.Dataset,
    sources: list[int],
    *,
    num_partitions: int | None = None,
    max_iters: int = 1000,
) -> tuple[rd.Dataset, list[dict[str, Any]]]:
    """Multi-source BFS: for every reachable vertex, the hop distance to
    the CLOSEST source and which source it is (ties → smallest source id)
    — the nearest-hub / nearest-replica assignment, one propagation for
    ALL sources instead of |sources| separate BFS runs.

    Mechanism: values are packed as ``dist · P + source_index`` with the
    sources sorted ascending and ``P = len(sources)``, so the shared
    min-propagation's ``+P`` bumps the distance while preserving the
    index, and the plain integer min IS the lexicographic
    ``(dist, source)`` min.  Output columns ``(vertex, dist, nearest)``.
    """
    srcs = sorted(int(s) for s in sources)
    if len(set(srcs)) != len(srcs):
        raise ValueError("bfs_nearest: duplicate sources")
    P = len(srcs)
    seeds = {s: i for i, s in enumerate(srcs)}
    packed, metrics = _min_propagate(edges, seeds, P, num_partitions, max_iters)
    src_arr = np.asarray(srcs, dtype=np.int64)

    def unpack(t: pa.Table) -> pa.Table:
        p = t["dist"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vertex": t["vertex"],
                "dist": pa.array(p // P),
                "nearest": pa.array(src_arr[p % P]),
            }
        )

    return packed.map_batches(unpack, batch_format="pyarrow"), metrics


def sssp(
    edges: rd.Dataset,
    source: int,
    *,
    weight_col: str = "w",
    num_partitions: int | None = None,
    max_iters: int = 1000,
    checkpointer=None,
    resume: bool = False,
) -> tuple[rd.Dataset, list[dict[str, Any]]]:
    """Single-source shortest paths over non-negative int64 edge weights
    (undirected; parallel edges are all propagated, so the min naturally
    keeps the lightest).  Bellman-Ford frontier supersteps: converges in
    as many rounds as the longest HOP count of any shortest path — the
    BFS bound, not V — because frontiers only carry improved vertices.
    Output ``(vertex, dist)``, reached vertices only."""
    return _min_propagate(
        edges, {int(source): 0}, 0, num_partitions, max_iters,
        weight_col=weight_col, checkpointer=checkpointer, resume=resume,
    )


def _bottom_k_sample_sources(
    edges: rd.Dataset, k: int, seed: int
) -> list[int]:
    """Deterministic seeded sample of ``k`` vertices: the k smallest
    ``splitmix64(id XOR mix(seed))`` values over the vertex set — a
    uniform-without-replacement sample that is identical at any
    parallelism (the KMV bottom-k recipe applied to sampling).  Per-block
    bottom-k partials (≤ k rows per block leave the worker) fold on the
    driver; the vertex set never materializes anywhere."""
    from linkgraph.sketch import _mix64

    salt = _mix64(np.array([seed], dtype=np.int64).view(np.uint64))[0]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {"v": pa.array([], pa.int64()), "h": pa.array([], pa.uint64())}
            )
        v = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        ).astype(np.int64, copy=False)
        h = _mix64(v.view(np.uint64) ^ salt)
        if len(v) > k:
            idx = np.argpartition(h, k)[:k]
            v, h = v[idx], h[idx]
        return pa.table({"v": pa.array(v), "h": pa.array(h, pa.uint64())})

    rows = edges.map_batches(partial, batch_format="pyarrow").take_all()
    v = np.array([r["v"] for r in rows], dtype=np.int64)
    h = np.array([r["h"] for r in rows], dtype=np.uint64)
    # blocks overlap in vertices — dedup by id keeping one hash (hashes are
    # a pure function of the id, so duplicates agree)
    v, uniq_idx = np.unique(v, return_index=True)
    h = h[uniq_idx]
    if len(v) > k:
        idx = np.argpartition(h, k)[:k]
        v = v[idx]
    return sorted(int(x) for x in v)


def closeness_centrality(
    edges: rd.Dataset,
    sources: list[int] | None = None,
    *,
    max_sources: int | None = None,
    seed: int = 0,
    num_partitions: int | None = None,
    max_iters: int = 1000,
) -> tuple[rd.Dataset, list[dict[str, Any]]]:
    """Closeness centrality by per-source BFS: for each source, the
    reachable-vertex count, total hop distance, and closeness
    ``(n_reachable − 1) / sum_dist`` (the Wasserman–Faust per-component
    convention; 0.0 for isolated sources).

    ``sources=None`` samples ``max_sources`` vertices with the seeded
    deterministic bottom-k recipe — the sampled-sources estimator of
    Eppstein & Wang (SODA 2001): per-source closeness is exact, the
    SAMPLE bounds total work at ``max_sources`` BFS runs on a graph whose
    vertex count makes the exhaustive sweep (|V| BFS runs) infeasible.
    An explicit ``sources`` list larger than ``max_sources`` is sampled
    the same way.  Each BFS is the standard frontier kernel
    (``bfs_hops``); its per-source stats fold to three scalars via a
    per-block partial — the distance table never lands on the driver.

    Returns ``(stats, metrics)``: stats has one row per (sampled) source
    ``(source, n_reachable, sum_dist, closeness, harmonic)`` — harmonic
    is the Σ 1/d variant (Boldi & Vigna 2014), robust to disconnected
    graphs, from the same fold; metrics records the source count and
    whether sampling was applied."""
    t0 = time.perf_counter()
    sampled = False
    if sources is None:
        if max_sources is None:
            raise ValueError(
                "closeness_centrality needs sources or max_sources — an "
                "unbounded exhaustive sweep is |V| BFS runs"
            )
        sources = _bottom_k_sample_sources(edges, max_sources, seed)
        sampled = True
    else:
        sources = sorted({int(s) for s in sources})
        if max_sources is not None and len(sources) > max_sources:
            from linkgraph.sketch import _mix64

            salt = _mix64(np.array([seed], dtype=np.int64).view(np.uint64))[0]
            v = np.asarray(sources, dtype=np.int64)
            h = _mix64(v.view(np.uint64) ^ salt)
            idx = np.argpartition(h, max_sources)[:max_sources]
            sources = sorted(int(x) for x in v[idx])
            sampled = True

    edges = edges.materialize()  # one read/build for all |sources| runs

    def stats_partial(t: pa.Table) -> pa.Table:
        n = len(t) if t.num_columns else 0
        s = int(pc.sum(t["dist"]).as_py() or 0) if n else 0
        # harmonic term Σ 1/d over reached vertices (d > 0) — the
        # disconnection-robust centrality (Boldi & Vigna 2014) falls out
        # of the same per-block fold for free
        if n:
            d = t["dist"].to_numpy(zero_copy_only=False).astype(np.float64)
            h = float((1.0 / d[d > 0]).sum())
        else:
            h = 0.0
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s], pa.int64()),
                "h": pa.array([h], pa.float64()),
            }
        )

    rows = []
    metrics: list[dict[str, Any]] = [
        {"phase": "sources", "num_sources": len(sources), "sampled": sampled,
         "seed": seed, "wall_s": time.perf_counter() - t0}
    ]
    for src in sources:
        t1 = time.perf_counter()
        dists, bfs_metrics = bfs_hops(
            edges, src, num_partitions=num_partitions, max_iters=max_iters
        )
        parts = dists.map_batches(stats_partial, batch_format="pyarrow").take_all()
        n = sum(r["n"] for r in parts)
        total = sum(r["s"] for r in parts)
        harm = sum(r["h"] for r in parts)
        clo = (n - 1) / total if total else 0.0
        rows.append((src, n, total, clo, harm))
        metrics.append(
            {"source": src, "n_reachable": n, "sum_dist": total,
             "supersteps": len(bfs_metrics),
             "wall_s": time.perf_counter() - t1}
        )
    stats = rd.from_arrow(
        pa.table(
            {
                "source": pa.array([x[0] for x in rows], pa.int64()),
                "n_reachable": pa.array([x[1] for x in rows], pa.int64()),
                "sum_dist": pa.array([x[2] for x in rows], pa.int64()),
                "closeness": pa.array([x[3] for x in rows], pa.float64()),
                "harmonic": pa.array([x[4] for x in rows], pa.float64()),
            }
        )
    )
    return stats, metrics
