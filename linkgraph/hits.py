"""HITS (hubs & authorities) over the object-store-sharded BSP machinery.

Kleinberg's algorithm (JACM 1999): on the directed link graph iterate
``a(v) = Σ_{u→v} h(u)`` then L2-normalize, ``h(u) = Σ_{u→v} a(v)`` then
L2-normalize.  The natural companion of PageRank for web link analysis —
not in the reference (which computes CC only, ``src/cc_sequential.c``);
built here on the same one-exchange sharded-state superstep plan as the
directed PageRank path (``linkgraph/pagerank.py``): the fused directed
exchange runs ONCE, both per-vertex score vectors live sharded in the
object store (one shard per owner group), and each half-step is one round
of emit tasks (one per sub-block) + one apply task per group + one scalar
norm fold on the driver.  Nothing per-vertex ever touches the driver.

Directionality: after ``_dir_sym_batch`` each owner group holds, for its
vertices v, both the in-edge rows (f=1: src = an in-neighbor u of v) and
the out-edge rows (f=0: src = an out-neighbor).  The a-update emits h
along the f=0 rows (u's group pushes h(u) to each out-neighbor v); the
h-update emits a along the f=1 rows (v's group pushes a(v) back to each
in-neighbor u) — two static emission indexes built once, reused every
superstep.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from linkgraph.pagerank import (
    _DIR_SCHEMA,
    _dir_sym_batch,
    _pr_dir_group_prep,
)


@dataclass
class HITSResult:
    scores: rd.Dataset  # (vertex, hub, authority)
    num_vertices: int
    num_iterations: int
    metrics: list[dict[str, Any]] = field(default_factory=list)


@ray.remote(num_cpus=1)
def _hits_sub_prep(block, gprep, flag: int, whole_group: bool = False):
    """One directed sub-block → emission index over rows with ``f == flag``:
    target = the row's src (the remote endpoint), ``i_local`` = the local
    vertex's position in the group vids (run-length in the common unsplit
    case, searchsorted when the group was hub-sub-split).  Same shape as
    the PageRank out-index (``pagerank._dir_sub_prep``), parameterized by
    direction flag so both HITS half-steps get a static index."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int32))
    if block.num_columns == 0 or len(block) == 0:
        return empty
    vids = gprep[0]
    s = block["src"].to_numpy(zero_copy_only=False)
    d = block["dst"].to_numpy(zero_copy_only=False)
    f = block["f"].to_numpy(zero_copy_only=False)
    mask = f == flag
    tgt = s[mask]
    if len(tgt) == 0:
        return empty
    if whole_group:
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        np.not_equal(d[1:], d[:-1], out=change[1:])
        i_local = (np.cumsum(change) - 1).astype(np.int32)[mask]
    else:
        i_local = np.searchsorted(vids, d[mask]).astype(np.int32)
    order = np.argsort(tgt, kind="stable")
    tgt = tgt[order]
    i_local = i_local[order]
    tchange = np.empty(len(tgt), dtype=bool)
    tchange[0] = True
    np.not_equal(tgt[1:], tgt[:-1], out=tchange[1:])
    tgt_starts = np.flatnonzero(tchange).astype(np.int32)
    return (tgt[tgt_starts].astype(np.int64, copy=False), tgt_starts, i_local)


@ray.remote(num_cpus=1)
def _hits_emit(sub, vec, firsts):
    """Half-step emit for one sub-block: gather the group's score vector
    through the static row index, segment-sum per target, split the
    (target, partial) arrays by owner range (one searchsorted)."""
    tgt_unique, tgt_starts, i_local = sub
    k = len(firsts)
    if len(tgt_unique) == 0:
        return [(np.empty(0, np.int64), np.empty(0, np.float64))] * k
    partial = np.add.reduceat(vec[i_local], tgt_starts)
    cuts = np.searchsorted(tgt_unique, firsts[1:])
    bounds = np.concatenate([[0], cuts, [len(tgt_unique)]])
    return [
        (tgt_unique[bounds[i] : bounds[i + 1]], partial[bounds[i] : bounds[i + 1]])
        for i in range(k)
    ]


@ray.remote(num_cpus=1, num_returns=2)
def _hits_apply(gprep, *chunks):
    """Half-step apply for one owner group: sum received partials into the
    dense raw score vector; also return the local sum of squares so the
    driver can fold the global L2 norm without seeing the vector."""
    vids = gprep[0]
    raw = np.zeros(len(vids))
    for ch in chunks:
        pairs = ch if isinstance(ch, list) else [ch]
        for tgt_c, p_c in pairs:
            if len(tgt_c):
                raw[np.searchsorted(vids, tgt_c)] += p_c
    return raw, float((raw * raw).sum())


@ray.remote(num_cpus=1, num_returns=2)
def _hits_norm(raw, norm: float, prev) -> tuple:
    """Divide by the global L2 norm (guarding the empty-scores case) and
    return the per-group L1 delta vs the previous normalized vector.
    Division (not multiply-by-reciprocal) so the scalar op sequence is the
    oracle SQL's ``x / sqrt(sum(x*x))`` exactly."""
    scaled = raw / norm if norm > 0 else raw
    return scaled, float(np.abs(scaled - prev).sum())


@ray.remote(num_cpus=1)
def _hits_full_vec(n: int, val: float) -> np.ndarray:
    return np.full(n, val)


@ray.remote(num_cpus=1)
def _hits_table(gprep, hub, auth) -> pa.Table:
    return pa.table({"vertex": gprep[0], "hub": hub, "authority": auth})


def hits(
    edges: rd.Dataset,
    *,
    max_iters: int = 20,
    tol: float = 0.0,
) -> HITSResult:
    """Run HITS to ``max_iters`` full iterations (or until the combined L1
    delta of both normalized vectors drops below ``tol``, when > 0).

    Semantics: distinct directed edges, self-loops dropped (the exchange's
    full-row dedup), ``h0 = 1`` (the initial scale cancels at the first
    normalization).  Deterministic at any parallelism to the float-kernel
    bar (≤1e-12 drift: partial-sum order varies with sub-block grouping);
    both half-step sums are per-target segment sums merged per owner
    group, and normalization is a single global scalar.
    """
    from linkgraph import bsp
    from linkgraph.runtime import tune_context

    tune_context()
    t0 = time.perf_counter()
    metrics: list[dict[str, Any]] = []
    groups, _n_rows, _n_vert = bsp.raw_map_dst_exchange(
        edges, _dir_sym_batch, dedup_sort_src=True, schema=_DIR_SCHEMA,
        grouped=True,
    )
    gps = [_pr_dir_group_prep.options(num_returns=2).remote(*g) for g in groups]
    metas = ray.get([p[1] for p in gps])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    gpreps = [gps[i][0] for i in keep]
    counts = [metas[i][0] for i in keep]
    firsts = np.asarray([metas[i][1] for i in keep], dtype=np.int64)
    num_v = int(sum(counts))
    k = len(gpreps)
    if k == 0:
        empty = rd.from_arrow(
            pa.table(
                {
                    "vertex": pa.array([], pa.int64()),
                    "hub": pa.array([], pa.float64()),
                    "authority": pa.array([], pa.float64()),
                }
            )
        )
        return HITSResult(empty, 0, 0, metrics)
    out_subs: list = []  # f==0 rows: push h(u) → out-neighbors (a-update)
    in_subs: list = []  # f==1 rows: push a(v) → in-neighbors (h-update)
    sub_owner: list[int] = []
    for gi, i in enumerate(keep):
        whole = len(groups[i]) == 1
        for b in groups[i]:
            sub_owner.append(gi)
            out_subs.append(_hits_sub_prep.remote(b, gps[i][0], 0, whole))
            in_subs.append(_hits_sub_prep.remote(b, gps[i][0], 1, whole))
    firsts_ref = ray.put(firsts)
    hub = [_hits_full_vec.remote(n, 1.0) for n in counts]
    auth = [_hits_full_vec.remote(n, 0.0) for n in counts]
    metrics.append(
        {"phase": "bsp_prep", "num_vertices": num_v, "mode": "hits",
         "num_groups": k, "num_subblocks": len(out_subs),
         "wall_s": time.perf_counter() - t0}
    )

    def half_step(subs: list, vec: list, prev: list) -> tuple[list, float, float]:
        emits = [
            _hits_emit.options(num_returns=k).remote(
                subs[e], vec[sub_owner[e]], firsts_ref
            )
            for e in range(len(subs))
        ]
        if k == 1:
            emits = [[e] for e in emits]
        outs = [
            _hits_apply.remote(gpreps[j], *[emits[e][j] for e in range(len(subs))])
            for j in range(k)
        ]
        norm = float(np.sqrt(sum(ray.get([o[1] for o in outs]))))
        scaled = [
            _hits_norm.options(num_returns=2).remote(outs[j][0], norm, prev[j])
            for j in range(k)
        ]
        delta = float(sum(ray.get([s[1] for s in scaled])))
        return [s[0] for s in scaled], norm, delta

    iters = 0
    for it in range(1, max_iters + 1):
        t1 = time.perf_counter()
        auth, a_norm, a_delta = half_step(out_subs, hub, auth)
        hub, h_norm, h_delta = half_step(in_subs, auth, hub)
        iters += 1
        delta = a_delta + h_delta
        metrics.append(
            {"iteration": it, "l1_delta": delta, "a_norm": a_norm,
             "h_norm": h_norm, "mode": "hits",
             "wall_s": time.perf_counter() - t1}
        )
        if tol > 0 and delta < tol:
            break

    tables = [_hits_table.remote(gpreps[j], hub[j], auth[j]) for j in range(k)]
    return HITSResult(
        rd.from_arrow_refs(tables).materialize(), num_v, iters, metrics
    )
