"""GNN neighbor-fanout sampling (GraphSAGE-style minibatch subgraphs).

GraphSAGE (Hamilton et al., NeurIPS 2017) trains on L-layer sampled
neighborhoods: layer 1 draws ``fanouts[0]`` neighbors of each seed,
layer 2 draws ``fanouts[1]`` neighbors of each layer-1 vertex, and so on
— the sampled edge lists ARE the training minibatch.  This module
generates them over the same one-exchange sharded adjacency the walk
corpus uses (``linkgraph/walks.py``): the symmetrized deduped edge table
exchanges once, each owner group holds its vertices' id-sorted neighbor
runs as a local CSR, and each layer is one round of per-group sample
tasks — only the frontier vertex ids move between layers, the adjacency
never reshuffles.

Draws are HASH-driven with replacement, per (vertex, layer, draw):
``((v%M)·A + j·C + L·B + seed·D) % M % deg`` over the id-sorted neighbor
list — the same determinism contract as the walk corpus: the sample is a
pure function of (graph, seeds, fanouts, seed), identical at any
parallelism (exact integer equality) and bit-replayable in SQL.
Sampling WITH replacement (duplicate draws possible, standard for
GraphSAGE) keeps both the kernel and the oracle twin closed-form;
consumers dedup downstream if their aggregator wants unique neighbors.
Per-(vertex, layer) draws are shared across seeds whose frontiers
overlap — the standard implementation trick that bounds work by
|frontier|, not |seeds| × |frontier|.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from linkgraph.walks import _A, _B, _C, _D, _M, _walk_group_prep


@ray.remote(num_cpus=1, num_returns=2)
def _sample_layer(gprep, frontier: np.ndarray, layer: int, k: int, seed: int):
    """Sample ``k`` neighbors (with replacement) for every frontier vertex
    owned by this group.  Returns ``(edges_table, next_frontier_partial)``
    — the partial is this group's unique sampled dst ids (≤ |local
    frontier| × k, typically far fewer after unique)."""
    vids, off, nbrs = gprep
    empty = pa.table(
        {
            "layer": pa.array([], pa.int32()),
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "draw": pa.array([], pa.int32()),
        }
    )
    if len(frontier) == 0 or len(vids) == 0:
        return empty, np.empty(0, np.int64)
    idx = np.searchsorted(vids, frontier)
    in_range = idx < len(vids)
    hit = np.zeros(len(frontier), dtype=bool)
    hit[in_range] = vids[idx[in_range]] == frontier[in_range]
    v = frontier[hit]
    ipos = idx[hit]
    if len(v) == 0:
        return empty, np.empty(0, np.int64)
    deg = off[ipos + 1] - off[ipos]
    # one vectorized pass over all k draws: rows repeat per draw index
    vv = np.repeat(v, k)
    oo = np.repeat(off[ipos], k)
    dd = np.repeat(deg, k)
    jj = np.tile(np.arange(k, dtype=np.int64), len(v))
    r = ((vv % _M) * _A + jj * _C + layer * _B + seed * _D) % _M
    dst = nbrs[oo + (r % dd)]
    out = pa.table(
        {
            "layer": pa.array(np.full(len(vv), layer, dtype=np.int32)),
            "src": pa.array(vv),
            "dst": pa.array(dst),
            "draw": pa.array(jj.astype(np.int32)),
        }
    )
    return out, np.unique(dst)


def neighbor_sample(
    edges: rd.Dataset,
    seeds,
    *,
    fanouts: list[int],
    seed: int = 0,
) -> tuple[rd.Dataset, list[dict[str, Any]]]:
    """L-layer neighbor-fanout sample from ``seeds`` over the undirected
    (symmetrized, deduped, self-loop-free) graph.

    Returns ``(sampled, metrics)``: sampled has one row per draw,
    ``(layer: int32, src: int64, dst: int64, draw: int32)`` — layer ``l``
    rows are the ``fanouts[l-1]`` draws of every layer-``l`` frontier
    vertex (layer-1 frontier = seeds present in the graph; layer-``l+1``
    frontier = the distinct dst ids of layer ``l``).  Seeds absent from
    the graph are dropped.  ``seeds`` is driver-bounded (a minibatch);
    frontier ids are the only cross-layer traffic.  ``seed`` must fit in
    int31 (the hash overflow bound shared with the walk corpus)."""
    from linkgraph import bsp
    from linkgraph import graph as G
    from linkgraph.runtime import tune_context

    tune_context()
    if not 0 <= seed < 2**31:
        raise ValueError("seed must fit in int31 (hash overflow bound)")
    if not fanouts or any(k < 1 for k in fanouts):
        raise ValueError("fanouts must be a non-empty list of k >= 1")
    t0 = time.perf_counter()
    frontier = np.unique(np.asarray(list(seeds), dtype=np.int64))
    groups, _n_rows, _n_vert = bsp.raw_map_dst_exchange(
        edges, G.sym_prep_batch, dedup_sort_src=True, grouped=True
    )
    gps = [_walk_group_prep.options(num_returns=2).remote(*g) for g in groups]
    metas = ray.get([p[1] for p in gps])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    gpreps = [gps[i][0] for i in keep]
    k_groups = len(gpreps)
    metrics: list[dict[str, Any]] = [
        {"phase": "prep", "num_groups": k_groups,
         "num_seeds": int(len(frontier)), "fanouts": list(fanouts),
         "wall_s": time.perf_counter() - t0}
    ]
    empty = pa.table(
        {
            "layer": pa.array([], pa.int32()),
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "draw": pa.array([], pa.int32()),
        }
    )
    if k_groups == 0:
        return rd.from_arrow(empty), metrics

    row_refs: list = []
    for layer, k in enumerate(fanouts, start=1):
        t1 = time.perf_counter()
        frontier_ref = ray.put(frontier)
        outs = [
            _sample_layer.options(num_returns=2).remote(
                gpreps[j], frontier_ref, layer, k, seed
            )
            for j in range(k_groups)
        ]
        row_refs.extend(o[0] for o in outs)
        partials = ray.get([o[1] for o in outs])
        frontier = (
            np.unique(np.concatenate(partials))
            if any(len(p) for p in partials)
            else np.empty(0, np.int64)
        )
        metrics.append(
            {"layer": layer, "fanout": k,
             "next_frontier": int(len(frontier)),
             "wall_s": time.perf_counter() - t1}
        )
    sampled = rd.from_arrow_refs(row_refs).materialize()
    return sampled, metrics
