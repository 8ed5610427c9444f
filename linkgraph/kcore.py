"""k-core: the maximal subgraph where every vertex has degree ≥ k.

North-star addition (the reference has no k-core; it supplies the same
CSR/partitioning substrate the other kernels build on — SURVEY.md §2.10).
Synchronous peeling as supersteps over the shared range-exchange machinery
(``linkgraph.bsp``): ONE fused exchange builds the dst-sorted, globally
deduped symmetric incidence blocks and their owner groups; per-group state
is the (vids, live_degree, alive) triple sharded in the object store; each
superstep every sub-block pushes, along its rows, the count of its
NEWLY-DEAD dst endpoints to each src target (the same static emit index
CC/LP/PageRank use — ``bsp.sub_emit_prep`` — with ``np.add.reduceat`` in
the role of the min), owners subtract the received decrements and kill
vertices that drop below ``k``.  Deaths only ever decrease degrees, so the
sync sweep reaches the unique k-core fixed point deterministically at any
parallelism; rounds = the graph's peeling depth for this ``k``.

Scale shape: nothing per-vertex touches the driver (only per-group changed
counts); a hub's sub-split rows emit bounded per-sub-block decrements that
combine additively at the owner (exact — addition is associative).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from linkgraph import bsp
from linkgraph import graph as G


@dataclass
class KCoreResult:
    vertices: rd.Dataset  # (vertex) — members of the k-core
    num_vertices: int  # size of the k-core
    num_rounds: int
    metrics: list[dict[str, Any]] = field(default_factory=list)


@ray.remote(num_cpus=1)
def _kc_init(gv, k: int):
    """(deg, alive, newly_dead) from the group's (vids, deg)."""
    deg = gv[1].astype(np.int64, copy=True)
    newly_dead = deg < k
    alive = ~newly_dead
    return deg, alive, newly_dead


@ray.remote(num_cpus=1)
def _kc_emit(sub, state, firsts):
    """Push decrements along one sub-block's rows: each src target receives
    the count of its newly-dead dst endpoints (``num_returns=K``)."""
    tgt_unique, tgt_starts, i_local = sub
    k = len(firsts)
    if len(tgt_unique) == 0:
        outs = [(np.empty(0, np.int64), np.empty(0, np.int64))] * k
        return outs if k > 1 else outs
    _, _, newly_dead = state
    c = newly_dead[i_local].astype(np.int64)
    partial = np.add.reduceat(c, tgt_starts)
    return bsp._owner_split(tgt_unique, partial, firsts)


@ray.remote(num_cpus=1, num_returns=2)
def _kc_apply(gv, state, k: int, *chunks):
    """Subtract received decrements, kill vertices that drop below ``k``.
    Chunks from two sub-blocks of a split hub may repeat a target — the
    sequential per-chunk subtract combines them exactly (additive)."""
    vids = gv[0]
    deg, alive, _ = state
    deg = deg.copy()
    for ch in chunks:
        pairs = ch if isinstance(ch, list) else [ch]
        for tgt_c, dec_c in pairs:
            if len(tgt_c):
                pos = np.searchsorted(vids, tgt_c)
                deg[pos] -= dec_c
    newly_dead = alive & (deg < k)
    alive = alive & ~newly_dead
    return (deg, alive, newly_dead), int(newly_dead.sum())


@ray.remote(num_cpus=1)
def _kc_table(gv, state) -> pa.Table:
    _, alive, _ = state
    return pa.table({"vertex": gv[0][alive]})


@ray.remote(num_cpus=1)
def _kc_alive_count(state) -> int:
    return int(state[1].sum())


def kcore(
    edges: rd.Dataset,
    k: int,
    *,
    max_rounds: int = 10_000,
) -> KCoreResult:
    """Vertices of the k-core of the SIMPLE undirected graph of ``edges``
    (self-loops dropped, parallel edges collapsed — the same
    canonicalization the other kernels apply)."""
    from linkgraph.runtime import tune_context

    tune_context()
    metrics: list[dict[str, Any]] = []
    t0 = time.perf_counter()
    groups, _n_rows, _n_vert = bsp.raw_map_dst_exchange(
        edges, G.sym_prep_batch, dedup_sort_src=True, grouped=True
    )
    gvs = [bsp.group_vertices.options(num_returns=2).remote(*g) for g in groups]
    metas = ray.get([p[1] for p in gvs])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    gv_refs = [gvs[i][0] for i in keep]
    firsts = np.asarray([metas[i][1] for i in keep], dtype=np.int64)
    kk = len(gv_refs)
    if kk == 0:
        empty = rd.from_arrow(pa.table({"vertex": pa.array([], pa.int64())}))
        return KCoreResult(empty, 0, 0, metrics)
    sub_owner: list[int] = []
    subs: list = []
    for gi, i in enumerate(keep):
        for b in groups[i]:
            sub_owner.append(gi)
            subs.append(
                bsp.sub_emit_prep.remote(b, gvs[i][0], True, len(groups[i]) == 1)
            )
    firsts_ref = ray.put(firsts)
    states = [_kc_init.remote(gv_refs[j], k) for j in range(kk)]
    metrics.append(
        {"phase": "kcore_prep", "num_groups": kk, "num_subblocks": len(subs),
         "wall_s": time.perf_counter() - t0}
    )
    rounds = 0
    for it in range(1, max_rounds + 1):
        t1 = time.perf_counter()
        emits = [
            _kc_emit.options(num_returns=kk).remote(
                subs[e], states[sub_owner[e]], firsts_ref
            )
            for e in range(len(subs))
        ]
        if kk == 1:
            emits = [[e] for e in emits]
        outs = [
            _kc_apply.options(num_returns=2).remote(
                gv_refs[j], states[j], k,
                *[emits[e][j] for e in range(len(subs))]
            )
            for j in range(kk)
        ]
        states = [o[0] for o in outs]
        changed = int(sum(ray.get([o[1] for o in outs])))
        rounds += 1
        metrics.append(
            {"round": it, "newly_dead": changed, "wall_s": time.perf_counter() - t1}
        )
        if changed == 0:
            break
    else:
        raise RuntimeError(f"k-core peeling exceeded {max_rounds} rounds")

    n_alive = int(sum(ray.get([_kc_alive_count.remote(s) for s in states])))
    tables = [_kc_table.remote(gv_refs[j], states[j]) for j in range(kk)]
    return KCoreResult(
        rd.from_arrow_refs(tables).materialize(), n_alive, rounds, metrics
    )
