"""Deterministic random-walk corpus generation (DeepWalk / node2vec-style).

Graph-embedding training pipelines (DeepWalk, KDD 2014; node2vec, KDD
2016) consume a corpus of fixed-length random walks — typically
``walks_per_start`` walks from each seed vertex — fed to a skip-gram
model exactly like text.  This module generates that corpus over the
one-exchange sharded-adjacency plan: the symmetrized deduped edge table
exchanges ONCE (the same fused range exchange every kernel uses,
``bsp.raw_map_dst_exchange``); each owner group keeps its vertices' full
sorted neighbor runs as a local CSR; and each step moves only the live
walk heads — ``(start, widx, next-vertex)`` triples routed to the next
vertex's owner by one ``searchsorted`` against the group boundaries.
The adjacency never reshuffles; emitted walk rows stream to the result
as per-group Arrow refs, never through the driver.

Walks are HASH-DRIVEN, not RNG-driven: step ``t`` of walk ``(s, w)``
picks neighbor index ``((s%M)·A + w·C + t·B + seed·D) % M % deg`` over
the id-sorted neighbor list (M = 2^31−1; 64-bit-safe by construction).
That makes the corpus a pure function of (graph, starts, seed) —
identical at any parallelism, across reruns, and bit-replayable in SQL
(the reproducibility contract every other sampling recipe in this repo
follows; a seeded RNG gives none of those).  The reference has no walk
generator — its only sampling is the seeded giant-component sampler
(``src/cc_openmp.c:422-496``); same determinism ruling as there
(SURVEY §4 determinism hazards).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_M = 2_147_483_647  # 2^31 − 1
_A = 1_103_515_245
_B = 747_796_405
_C = 12_345
_D = 69_069


@ray.remote(num_cpus=1, num_returns=2)
def _walk_group_prep(*blocks):
    """One owner group's dst-sorted sub-blocks → local CSR ``(vids, off,
    nbrs)`` + ``(n, first)``.  The exchange merge sorts rows by (dst, src)
    and dedups, so concatenating the group's sub-blocks yields each
    vertex's neighbor run contiguous and id-sorted — even for hubs whose
    runs the exchange sub-split across blocks."""
    dparts, sparts = [], []
    for b in blocks:
        if b.num_columns == 0 or len(b) == 0:
            continue
        dparts.append(b["dst"].to_numpy(zero_copy_only=False))
        sparts.append(b["src"].to_numpy(zero_copy_only=False))
    if not dparts:
        return (
            np.empty(0, np.int64),
            np.empty(1, np.int64),
            np.empty(0, np.int64),
        ), (0, 0)
    d = np.concatenate(dparts)
    nbrs = np.concatenate(sparts).astype(np.int64, copy=False)
    change = np.empty(len(d), dtype=bool)
    change[0] = True
    np.not_equal(d[1:], d[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    vids = d[starts].astype(np.int64, copy=False)
    off = np.append(starts, len(d)).astype(np.int64, copy=False)
    return (vids, off, nbrs), (int(len(vids)), int(vids[0]))


def _owner_chunks(order_vals: np.ndarray, firsts: np.ndarray, *payload):
    """Split payload arrays (sorted by ``order_vals``) into one chunk per
    owner group (owners are ranges — one searchsorted)."""
    k = len(firsts)
    cuts = np.searchsorted(order_vals, firsts[1:])
    bounds = np.concatenate([[0], cuts, [len(order_vals)]])
    return [
        tuple(p[bounds[i] : bounds[i + 1]] for p in payload) for i in range(k)
    ]


@ray.remote(num_cpus=1)
def _walk_step(gprep, state, step: int, seed: int, firsts):
    """Advance every walk head in one group by one step: pick the
    hash-indexed neighbor, then split the moved heads by next-owner.
    Returns ``k`` chunks of ``(start, widx, vertex)`` (num_returns set by
    the caller)."""
    vids, off, nbrs = gprep
    starts_arr, widx, ipos = state
    k = len(firsts)
    if len(starts_arr) == 0:
        out = [
            (np.empty(0, np.int64), np.empty(0, np.int32), np.empty(0, np.int64))
        ] * k
        return out if k > 1 else out
    deg = off[ipos + 1] - off[ipos]
    r = (
        (starts_arr % _M) * _A
        + widx.astype(np.int64) * _C
        + step * _B
        + seed * _D
    ) % _M
    nxt = nbrs[off[ipos] + (r % deg)]
    order = np.argsort(nxt, kind="stable")
    starts_arr, widx, nxt = starts_arr[order], widx[order], nxt[order]
    out = _owner_chunks(nxt, firsts, starts_arr, widx, nxt)
    return out if k > 1 else out


@ray.remote(num_cpus=1, num_returns=2)
def _walk_apply(gprep, *chunks):
    """Receive moved heads for one group → new local state + the step's
    emitted walk rows (as one Arrow table ref that goes straight into the
    result Dataset)."""
    vids = gprep[0]
    ss, ws, vs = [], [], []
    for ch in chunks:
        trips = ch if isinstance(ch, list) else [ch]
        for s_c, w_c, v_c in trips:
            if len(s_c):
                ss.append(s_c)
                ws.append(w_c)
                vs.append(v_c)
    if not ss:
        state = (np.empty(0, np.int64), np.empty(0, np.int32), np.empty(0, np.int32))
        return state, None
    s = np.concatenate(ss)
    w = np.concatenate(ws)
    v = np.concatenate(vs)
    ipos = np.searchsorted(vids, v).astype(np.int32)
    return (s, w, ipos), (s, w, v)


@ray.remote(num_cpus=1)
def _rows_table(emitted, step: int) -> pa.Table:
    if emitted is None:
        return pa.table(
            {
                "start": pa.array([], pa.int64()),
                "widx": pa.array([], pa.int32()),
                "step": pa.array([], pa.int32()),
                "vertex": pa.array([], pa.int64()),
            }
        )
    s, w, v = emitted
    return pa.table(
        {
            "start": s,
            "widx": w,
            "step": pa.array(np.full(len(s), step, dtype=np.int32)),
            "vertex": v,
        }
    )


def random_walks(
    edges: rd.Dataset,
    starts,
    *,
    length: int = 10,
    walks_per_start: int = 1,
    seed: int = 0,
) -> tuple[rd.Dataset, list[dict[str, Any]]]:
    """Generate ``walks_per_start`` hash-driven walks of ``length`` steps
    from each start vertex over the undirected (symmetrized, deduped,
    self-loop-free) graph.

    Returns ``(walks, metrics)``: walks has one row per visited position,
    ``(start: int64, widx: int32, step: int32, vertex: int64)`` with step
    0 the start itself — the long-form corpus a skip-gram trainer windows
    over.  Starts absent from the graph are dropped (isolated vertices
    have no outgoing step on a symmetrized graph).  ``starts`` is
    driver-bounded (walk corpora are seeded from a vertex sample; use
    ``bfs._bottom_k_sample_sources`` for a deterministic sample at
    scale).  ``seed`` must fit in int32 (the 64-bit-overflow-safety bound
    of the hash)."""
    from linkgraph import bsp
    from linkgraph import graph as G
    from linkgraph.runtime import tune_context

    tune_context()
    if not 0 <= seed < 2**31:
        raise ValueError("seed must fit in int31 (hash overflow bound)")
    if walks_per_start < 1 or length < 0:
        raise ValueError("walks_per_start >= 1 and length >= 0 required")
    t0 = time.perf_counter()
    starts = np.unique(np.asarray(list(starts), dtype=np.int64))
    groups, _n_rows, _n_vert = bsp.raw_map_dst_exchange(
        edges, G.sym_prep_batch, dedup_sort_src=True, grouped=True
    )
    gps = [_walk_group_prep.options(num_returns=2).remote(*g) for g in groups]
    metas = ray.get([p[1] for p in gps])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    gpreps = [gps[i][0] for i in keep]
    firsts = np.asarray([metas[i][1] for i in keep], dtype=np.int64)
    k = len(gpreps)
    metrics: list[dict[str, Any]] = []
    if k == 0:
        return rd.from_arrow(ray.get(_rows_table.remote(None, 0))), metrics

    # expand (start × walks_per_start), route to owner groups; walks whose
    # start is not a graph vertex are dropped by the apply's searchsorted
    # guard below — filter here instead so step-0 rows are exact
    firsts_ref = ray.put(firsts)
    s_exp = np.repeat(starts, walks_per_start)
    w_exp = np.tile(
        np.arange(walks_per_start, dtype=np.int32), len(starts)
    )
    init_chunks = _owner_chunks(s_exp, firsts, s_exp, w_exp, s_exp)
    states, row_refs = [], []
    for j in range(k):
        st, rows = _walk_apply.options(num_returns=2).remote(
            gpreps[j], [init_chunks[j]]
        )
        states.append(st)
        row_refs.append(_rows_table.remote(rows, 0))
    # drop heads whose start isn't owned anywhere (searchsorted would
    # misplace them): validate per group against its vid set
    states = [
        _validate_state.remote(gpreps[j], states[j]) for j in range(k)
    ]
    row_refs = [
        _revalidate_rows.remote(gpreps[j], row_refs[j]) for j in range(k)
    ]
    metrics.append(
        {"phase": "prep", "num_groups": k, "num_starts": int(len(starts)),
         "walks_per_start": walks_per_start,
         "wall_s": time.perf_counter() - t0}
    )

    for step in range(1, length + 1):
        t1 = time.perf_counter()
        emits = [
            _walk_step.options(num_returns=k).remote(
                gpreps[j], states[j], step, seed, firsts_ref
            )
            for j in range(k)
        ]
        if k == 1:
            emits = [[e] for e in emits]
        outs = [
            _walk_apply.options(num_returns=2).remote(
                gpreps[j], *[emits[g][j] for g in range(k)]
            )
            for j in range(k)
        ]
        states = [o[0] for o in outs]
        row_refs.extend(_rows_table.remote(outs[j][1], step) for j in range(k))
        metrics.append({"step": step, "wall_s": time.perf_counter() - t1})

    walks = rd.from_arrow_refs(row_refs).materialize()
    return walks, metrics


@ray.remote(num_cpus=1)
def _validate_state(gprep, state):
    """Drop heads whose vertex is not in this group's vid set (start ids
    that aren't graph vertices land in some group's range but match no
    vid)."""
    vids = gprep[0]
    s, w, ipos = state
    if len(s) == 0:
        return state
    ok = (ipos < len(vids)) & (vids[np.minimum(ipos, len(vids) - 1)] == s)
    return (s[ok], w[ok], ipos[ok])


@ray.remote(num_cpus=1)
def _revalidate_rows(gprep, rows: pa.Table) -> pa.Table:
    """Step-0 twin of ``_validate_state`` for the emitted rows."""
    vids = gprep[0]
    if len(rows) == 0:
        return rows
    v = rows["vertex"].to_numpy(zero_copy_only=False)
    ipos = np.searchsorted(vids, v)
    ok = (ipos < len(vids)) & (vids[np.minimum(ipos, len(vids) - 1)] == v)
    return rows.filter(pa.array(ok))
