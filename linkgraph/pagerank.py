"""PageRank as power-iteration supersteps over the edge table.

Not present in the reference (north-star addition; SURVEY.md §2.10): the
reference supplies only the CSR/partitioning substrate.  Design:

- one-time: dedup the directed edge table (``src/graph.c:75-104`` keeps
  parallel edges, so dedup is explicit here — SURVEY.md §2.7), compute
  out-degrees, attach ``1/outdeg`` to every edge (bucketed hash join), and
  initialise per-vertex state ``(vertex, rank=1/V, outdeg)``.
- per superstep: ``r' = (1-d)/V + d·(Σ_in rank/outdeg + dangling/V)``;
  convergence = L1 delta < tol (``tol <= 0`` → run exactly ``max_iters``
  supersteps — the fixed-iteration mode used for oracle comparisons and
  per-superstep throughput benchmarks).

Two execution modes (``mode="auto"`` picks by vertex count):

- **shuffle** — the 10^12-scale path: edges ⋈ ranks on ``src`` via the
  bucketed hash join, block-local combiners by ``dst``, then
  ``groupby(vertex).Sum`` carrying the previous rank in the same shuffle
  (union trick) so the L1 delta and next dangling mass cost no extra pass.
  Vertex state never leaves the cluster; two hash shuffles per superstep.
- **broadcast** — the dataflow analogue of the reference's
  full-``MPI_Allgatherv``-of-state variants (``src/mpi/cc_mpi.c:388-571``):
  the rank vector is ``ray.put`` once per superstep, every edge block
  computes block-local partial sums against it (vectorized searchsorted
  gather + per-dst combine), and the small partials are reduced on the
  driver in a deterministic order (lexsort + reduceat — byte-stable
  regardless of block arrival).  One distributed pass per superstep.
  Only *efficient* while the rank vector fits in memory
  (``BROADCAST_MAX_VERTICES``); beyond that ``auto`` switches to shuffle.

Checkpointing: every ``checkpoint_every``-th superstep persists state with
lineage + metrics (including the carried dangling mass) for resume.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Max, Sum

from linkgraph import bsp
from linkgraph import graph as G
from linkgraph.checkpoint import Checkpointer
from linkgraph.partition import bucket_join
from linkgraph.runtime import broadcast_gate_rows

BROADCAST_MAX_VERTICES = 50_000_000  # ~1.2 GB of (id, rank, outdeg) per replica
# measured crossover vs broadcast mode (which round-trips the rank vector
# through the driver every superstep): broadcast wins at 6.4 M vertices,
# loses 2× at 25.6 M; the BSP sharded-state path also scales 0.72 vs 0.40
# from 8 to 32 CPUs at 64 M edges
BSP_MIN_VERTICES = 8_000_000


@dataclass
class PageRankResult:
    ranks: rd.Dataset  # (vertex, rank)
    num_vertices: int
    num_iterations: int
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _prepare_edges(edges: rd.Dataset, directed: bool, num_partitions: int) -> rd.Dataset:
    """Simple (deduped, loop-free) directed edge set used by the iteration."""
    if directed:
        return G.dedup_edges(G.drop_self_loops(edges), num_partitions)
    # one-pass symmetrize: the union form would execute the global-dedup
    # sort shuffle twice (lazy input consumed by both union branches)
    return G.symmetrize_block(G.canonicalize(edges, global_dedup=True))


_EMPTY_WEIGHTED = pa.table(
    {
        "src": pa.array([], pa.int64()),
        "dst": pa.array([], pa.int64()),
        "inv": pa.array([], pa.float64()),
    }
)
_EMPTY_DEG = pa.table(
    {"vertex": pa.array([], pa.int64()), "outdeg": pa.array([], pa.int64())}
)


@ray.remote(num_cpus=1)
def _deg_dst_task(block):
    """(vertex, degree) arrays from one dst-sorted dst-disjoint block —
    global because dst values are block-disjoint."""
    if block.num_columns == 0 or len(block) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    d = block["dst"].to_numpy(zero_copy_only=False)
    change = np.empty(len(d), dtype=bool)
    change[0] = True
    change[1:] = d[1:] != d[:-1]
    starts = np.flatnonzero(change)
    # blocks may be int32-compacted (bsp compact-output contract)
    return d[starts].astype(np.int64, copy=False), np.diff(
        np.append(starts, len(d))
    )


@ray.remote(num_cpus=1, num_returns=2)
def _pr_group_prep(*blocks):
    """One owner GROUP (the dst-sorted sub-blocks of one key range) →
    per-group state arrays ``(vids, inv_out, dangling_idx)`` + ``(n,
    first)`` metadata.

    Undirected reuse: every (src, dst) row is re-read as the directed edge
    dst→src — valid because the symmetrized table carries both directions.
    The group's vertex set = its unique dst values; its out-degrees = the
    dst segment lengths SUMMED across sub-blocks (a hub's run may span
    several sub-blocks after the exchange's sub-split).  Post-symmetrize
    every vertex has degree ≥ 1, so ``dangling_idx`` is empty."""
    vparts, cparts = [], []
    for b in blocks:
        if b.num_columns == 0 or len(b) == 0:
            continue
        d = b["dst"].to_numpy(zero_copy_only=False)
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        np.not_equal(d[1:], d[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        vparts.append(d[starts])
        cparts.append(np.diff(np.append(starts, len(d))))
    if not vparts:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.float64),
            np.empty(0, np.int64),
        ), (0, 0)
    v = np.concatenate(vparts)
    c = np.concatenate(cparts)
    change = np.empty(len(v), dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    # int64 state vids (bsp compact-output contract; blocks may be int32)
    vids = v[starts].astype(np.int64, copy=False)
    deg = np.add.reduceat(c, starts)
    return (vids, 1.0 / deg, np.empty(0, np.int64)), (
        int(len(vids)),
        int(vids[0]),
    )


@ray.remote(num_cpus=1)
def _bsp_shuffle_emit(sub, gprep, rank_vec, firsts):
    """One superstep emit for one SUB-BLOCK: gather the group's per-vertex
    ``rank × 1/outdeg`` through the row index, segment-sum per contribution
    target, and split the (target, partial) arrays by owner group (targets
    are sorted, owners are ranges — a single ``searchsorted``).  Called with
    ``num_returns=K`` so each owner fetches only its slice."""
    tgt_unique, tgt_starts, i_local = sub
    k = len(firsts)
    if len(tgt_unique) == 0:
        outs = [(np.empty(0, np.int64), np.empty(0, np.float64))] * k
        return outs if k > 1 else outs
    c = (rank_vec * gprep[1])[i_local]
    partial = np.add.reduceat(c, tgt_starts)
    cuts = np.searchsorted(tgt_unique, firsts[1:])
    bounds = np.concatenate([[0], cuts, [len(tgt_unique)]])
    outs = [
        (tgt_unique[bounds[i] : bounds[i + 1]], partial[bounds[i] : bounds[i + 1]])
        for i in range(k)
    ]
    return outs


@ray.remote(num_cpus=1, num_returns=2)
def _bsp_shuffle_apply(gprep, rank_vec, teleport, damping, *chunks):
    """One superstep apply for one owner group: sum the received partials
    into the local dense contribution vector (chunk targets are unique
    within a chunk → plain indexed add per chunk; chunks from two
    sub-blocks of a split hub may repeat a target — the sequential
    per-chunk add combines them exactly), then the PageRank update.
    Returns the new rank vector (stays in the object store; the ref chains
    into the next iteration's emit) and the local L1 delta."""
    vids = gprep[0]
    contrib = np.zeros(len(vids))
    for ch in chunks:
        pairs = ch if isinstance(ch, list) else [ch]
        for tgt_c, p_c in pairs:
            if len(tgt_c):
                contrib[np.searchsorted(vids, tgt_c)] += p_c
    new = teleport + damping * contrib
    return new, float(np.abs(new - rank_vec).sum())


@ray.remote(num_cpus=1)
def _bsp_full_vec(n: int, val: float) -> np.ndarray:
    return np.full(n, val)


@ray.remote(num_cpus=1)
def _bsp_ranks_table(gprep, rank_vec) -> pa.Table:
    return pa.table({"vertex": gprep[0], "rank": rank_vec})


def _pagerank_bsp_shuffle(
    groups: list,
    damping: float,
    tol: float,
    max_iters: int,
    checkpointer: Checkpointer | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> PageRankResult:
    """Scale-path PageRank over the dst-sorted incidence blocks: per-vertex
    state lives sharded in the object store (one shard per owner GROUP —
    a key range of the exchange; a hub's sub-split adds bounded sub-blocks
    to the group without replicating any vertex) and every superstep is
    one round of emit tasks (one per sub-block) + one round of apply tasks
    (one per group) — the only data moved per iteration is the (target,
    partial-sum) chunks, and nothing per-vertex ever touches the driver.
    This is the ≥ ``BROADCAST_MAX_VERTICES`` regime (rank vector too big
    for one heap); the prior design re-shuffled the full weighted edge
    table through a bucket join every superstep (~335 s/superstep at 64 M
    edges vs ~2 s here).  Ref parity: the owner-computes update exchange
    of the MPI union-find/LP variants (``src/mpi/cc_mpi.c:2091-2206`` —
    local work immediate, remote updates routed to owners once per
    round)."""
    t0 = time.perf_counter()
    metrics: list[dict[str, Any]] = []
    gps = [_pr_group_prep.options(num_returns=2).remote(*g) for g in groups]
    metas = ray.get([p[1] for p in gps])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    gpreps = [gps[i][0] for i in keep]
    counts = [metas[i][0] for i in keep]
    firsts = np.asarray([metas[i][1] for i in keep], dtype=np.int64)
    num_v = int(sum(counts))
    k = len(gpreps)
    if k == 0:
        empty = rd.from_arrow(
            pa.table({"vertex": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
        )
        return PageRankResult(empty, 0, 0, metrics)
    from linkgraph import bsp

    sub_owner: list[int] = []
    subs: list = []
    for gi, i in enumerate(keep):
        for b in groups[i]:
            sub_owner.append(gi)
            subs.append(
                bsp.sub_emit_prep.remote(b, gps[i][0], True, len(groups[i]) == 1)
            )
    firsts_ref = ray.put(firsts)
    r0 = 1.0 / num_v
    start = 1
    ranks = None
    if resume and checkpointer is not None:
        # state is re-matched by vertex id, so the checkpoint's shard
        # layout (or mode) need not match this run's
        latest = checkpointer.load_shards(gpreps, firsts, "rank", default=r0)
        if latest is not None:
            last_it, ranks, meta = latest
            start = last_it + 1
            metrics.append(meta)
    if ranks is None:
        ranks = [_bsp_full_vec.remote(n, r0) for n in counts]
    metrics.append(
        {"phase": "bsp_prep", "num_vertices": num_v, "num_groups": k,
         "num_subblocks": len(subs), "wall_s": time.perf_counter() - t0}
    )

    teleport = (1.0 - damping) / num_v  # no dangling mass post-symmetrize
    iters = 0
    for it in range(start, start + max_iters):
        t1 = time.perf_counter()
        emits = [
            _bsp_shuffle_emit.options(num_returns=k).remote(
                subs[e], gpreps[sub_owner[e]], ranks[sub_owner[e]], firsts_ref
            )
            for e in range(len(subs))
        ]
        if k == 1:
            emits = [[e] for e in emits]
        outs = [
            _bsp_shuffle_apply.remote(
                gpreps[j], ranks[j], teleport, damping,
                *[emits[e][j] for e in range(len(subs))]
            )
            for j in range(k)
        ]
        ranks = [o[0] for o in outs]
        delta = float(sum(ray.get([o[1] for o in outs])))
        iters += 1
        metrics.append(
            {"iteration": it, "l1_delta": delta, "dangling_mass": 0.0,
             "mode": "shuffle", "wall_s": time.perf_counter() - t1}
        )
        converged = tol > 0 and delta < tol
        if checkpointer is not None and (converged or it % checkpoint_every == 0):
            checkpointer.save_shards(
                it,
                [_bsp_ranks_table.remote(gpreps[j], ranks[j]) for j in range(k)],
                {"iteration": it, "l1_delta": delta, "dangling_mass": 0.0,
                 "num_vertices": num_v, "mode": "shuffle"},
            )
        if converged:
            break
    else:
        if tol > 0:
            raise RuntimeError(f"pagerank exceeded {max_iters} iterations")

    tables = [_bsp_ranks_table.remote(gpreps[j], ranks[j]) for j in range(k)]
    ranks_ds = rd.from_arrow_refs(tables).materialize()
    return PageRankResult(ranks_ds, num_v, iters, metrics)


_DIR_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("f", pa.int8())])


def _dir_sym_batch(t: pa.Table) -> pa.Table:
    """Directed prep for the fused exchange: drop self-loops and emit each
    true edge u→v twice with a direction flag — fwd ``(u, v, 1)`` (an
    in-edge row in v's owner block) and rev ``(v, u, 0)`` (an out-edge row
    in u's owner block).  The dst set then covers src ∪ dst, so the state
    shards span every vertex, and per-block ``f==0`` segment counts are the
    exact out-degrees — directionality survives the exchange at the cost of
    one int8 column."""
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    keep = s != d
    s, d = s[keep], d[keep]
    n = len(s)
    return pa.table(
        {
            "src": np.concatenate([s, d]),
            "dst": np.concatenate([d, s]),
            "f": pa.array(
                np.concatenate(
                    [np.ones(n, dtype=np.int8), np.zeros(n, dtype=np.int8)]
                ),
                pa.int8(),
            ),
        }
    )


@ray.remote(num_cpus=1, num_returns=2)
def _pr_dir_group_prep(*blocks):
    """One owner GROUP of dst-sorted (dst, src, f)-deduped directed
    sub-blocks → ``(vids, inv_out, dangling_idx)`` + ``(n, first)``.

    Out-edges of a local vertex u are its ``f==0`` rows (rev rows land in
    u's owner group), so out-degrees need no extra exchange; a hub's rows
    may span several sub-blocks, so per-sub-block (vid, out-count)
    partials are summed per vid here.  Dangling vertices (out-degree 0)
    are exactly the vids with no ``f==0`` row anywhere in the group."""
    vparts, cparts = [], []
    for b in blocks:
        if b.num_columns == 0 or len(b) == 0:
            continue
        d = b["dst"].to_numpy(zero_copy_only=False)
        f = b["f"].to_numpy(zero_copy_only=False)
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        np.not_equal(d[1:], d[:-1], out=change[1:])
        seg = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        vparts.append(d[starts])
        cparts.append(np.bincount(seg[f == 0], minlength=len(starts)))
    if not vparts:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.float64),
            np.empty(0, np.int64),
        ), (0, 0)
    v = np.concatenate(vparts)
    c = np.concatenate(cparts)
    change = np.empty(len(v), dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    # int64 state vids (bsp compact-output contract; blocks may be int32)
    vids = v[starts].astype(np.int64, copy=False)
    outdeg = np.add.reduceat(c, starts).astype(np.float64)
    dangling_idx = np.flatnonzero(outdeg == 0)
    inv_out = np.zeros(len(vids))
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]
    return (vids, inv_out, dangling_idx), (int(len(vids)), int(vids[0]))


@ray.remote(num_cpus=1)
def _dir_sub_prep(block, gprep, whole_group: bool = False):
    """One directed sub-block → emission index into its group's vids:
    one row per out-edge (``f==0``), target = the src column of the rev
    row, ``i_local`` = the owning vertex's position in the group vids
    (run-length derived in the common unsplit case, searchsorted when the
    group was hub-sub-split)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int32))
    if block.num_columns == 0 or len(block) == 0:
        return empty
    vids = gprep[0]
    s = block["src"].to_numpy(zero_copy_only=False)
    d = block["dst"].to_numpy(zero_copy_only=False)
    f = block["f"].to_numpy(zero_copy_only=False)
    out_mask = f == 0
    tgt = s[out_mask]
    if len(tgt) == 0:
        return empty
    if whole_group:
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        np.not_equal(d[1:], d[:-1], out=change[1:])
        i_local = (np.cumsum(change) - 1).astype(np.int32)[out_mask]
    else:
        i_local = np.searchsorted(vids, d[out_mask]).astype(np.int32)
    order = np.argsort(tgt, kind="stable")
    tgt = tgt[order]
    i_local = i_local[order]
    tchange = np.empty(len(tgt), dtype=bool)
    tchange[0] = True
    np.not_equal(tgt[1:], tgt[:-1], out=tchange[1:])
    tgt_starts = np.flatnonzero(tchange).astype(np.int32)
    # int64 emit targets (bsp compact-output contract)
    return (tgt[tgt_starts].astype(np.int64, copy=False), tgt_starts, i_local)


@ray.remote(num_cpus=1)
def _dangling_sum(gprep, rank_vec: np.ndarray) -> float:
    return float(rank_vec[gprep[2]].sum())


def _pagerank_bsp_directed(
    groups: list,
    damping: float,
    tol: float,
    max_iters: int,
    checkpointer: Checkpointer | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> PageRankResult:
    """Directed PageRank over object-store-sharded state — the same
    emit/apply machinery as the undirected BSP path (one state shard per
    owner group, one emit task per sub-block), plus one cheap scalar round
    per superstep that sums the dangling ranks (``r' = (1-d)/V +
    d·(contrib + dm/V)``, exactly the oracle's update).  Replaces the
    bucket-join dataflow for vertex-implicit directed runs at every
    size."""
    t0 = time.perf_counter()
    metrics: list[dict[str, Any]] = []
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
            pa.table({"vertex": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
        )
        return PageRankResult(empty, 0, 0, metrics)
    sub_owner: list[int] = []
    subs: list = []
    for gi, i in enumerate(keep):
        for b in groups[i]:
            sub_owner.append(gi)
            subs.append(_dir_sub_prep.remote(b, gps[i][0], len(groups[i]) == 1))
    firsts_ref = ray.put(firsts)
    r0 = 1.0 / num_v
    start = 1
    ranks = None
    if resume and checkpointer is not None:
        latest = checkpointer.load_shards(gpreps, firsts, "rank", default=r0)
        if latest is not None:
            last_it, ranks, meta = latest
            start = last_it + 1
            metrics.append(meta)
    if ranks is None:
        ranks = [_bsp_full_vec.remote(n, r0) for n in counts]
    metrics.append(
        {"phase": "bsp_prep", "num_vertices": num_v, "mode": "bsp_directed",
         "num_groups": k, "num_subblocks": len(subs),
         "wall_s": time.perf_counter() - t0}
    )

    iters = 0
    for it in range(start, start + max_iters):
        t1 = time.perf_counter()
        dm = float(
            sum(ray.get([_dangling_sum.remote(gpreps[j], ranks[j]) for j in range(k)]))
        )
        base = (1.0 - damping) / num_v + damping * dm / num_v
        emits = [
            _bsp_shuffle_emit.options(num_returns=k).remote(
                subs[e], gpreps[sub_owner[e]], ranks[sub_owner[e]], firsts_ref
            )
            for e in range(len(subs))
        ]
        if k == 1:
            emits = [[e] for e in emits]
        outs = [
            _bsp_shuffle_apply.remote(
                gpreps[j], ranks[j], base, damping,
                *[emits[e][j] for e in range(len(subs))]
            )
            for j in range(k)
        ]
        ranks = [o[0] for o in outs]
        delta = float(sum(ray.get([o[1] for o in outs])))
        iters += 1
        metrics.append(
            {"iteration": it, "l1_delta": delta, "dangling_mass": dm,
             "mode": "bsp_directed", "wall_s": time.perf_counter() - t1}
        )
        converged = tol > 0 and delta < tol
        if checkpointer is not None and (converged or it % checkpoint_every == 0):
            checkpointer.save_shards(
                it,
                [_bsp_ranks_table.remote(gpreps[j], ranks[j]) for j in range(k)],
                {"iteration": it, "l1_delta": delta, "dangling_mass": dm,
                 "num_vertices": num_v, "mode": "bsp_directed"},
            )
        if converged:
            break
    else:
        if tol > 0:
            raise RuntimeError(f"pagerank exceeded {max_iters} iterations")

    tables = [_bsp_ranks_table.remote(gpreps[j], ranks[j]) for j in range(k)]
    ranks_ds = rd.from_arrow_refs(tables).materialize()
    return PageRankResult(ranks_ds, num_v, iters, metrics)


def _count_dst_block(t: pa.Table) -> pa.Table:
    if t.num_columns == 0 or len(t) == 0:
        return pa.table({"n": pa.array([], pa.int64())})
    d = t["dst"].to_numpy(zero_copy_only=False)
    n = 1 + int((d[1:] != d[:-1]).sum())
    return pa.table({"n": pa.array([n], pa.int64())})


def _weight_block(t: pa.Table) -> pa.Table:
    """Whole-block (src-partitioned, symmetrized): dedup + degree + 1/deg.

    All copies of an undirected edge (u, v) land in the block owning src=u,
    so block-local adjacent-dedup IS global dedup, and the per-src segment
    length IS the global degree — one shuffle replaces the dedup groupby +
    degree groupby + edge⋈degree join chain.
    """
    if t.num_columns == 0 or len(t) == 0:
        return _EMPTY_WEIGHTED
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    keep = np.empty(len(s), dtype=bool)
    keep[0] = True
    keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
    s, d = s[keep], d[keep]
    change = np.empty(len(s), dtype=bool)
    change[0] = True
    change[1:] = s[1:] != s[:-1]
    starts = np.flatnonzero(change)
    seg = np.cumsum(change) - 1
    counts = np.diff(np.append(starts, len(s)))
    inv = (1.0 / counts)[seg]
    return pa.table({"src": s, "dst": d, "inv": inv})


def _deg_block(t: pa.Table) -> pa.Table:
    """(vertex, outdeg) from a src-partitioned weighted block — no shuffle:
    src values are globally partitioned, so block-local uniques are global."""
    if t.num_columns == 0 or len(t) == 0:
        return _EMPTY_DEG
    s = t["src"].to_numpy(zero_copy_only=False)
    order = np.argsort(s, kind="stable")
    s = s[order]
    change = np.empty(len(s), dtype=bool)
    change[0] = True
    change[1:] = s[1:] != s[:-1]
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, len(s)))
    return pa.table({"vertex": s[starts], "outdeg": counts})


def _pull_columns(ds: rd.Dataset, cols: list[str]) -> list[np.ndarray]:
    parts: list[list[np.ndarray]] = [[] for _ in cols]
    for b in ds.select_columns(cols).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        for i, c in enumerate(cols):
            parts[i].append(b[c].to_numpy(zero_copy_only=False))
    return [
        np.concatenate(p) if p else np.empty(0, dtype=np.int64) for p in parts
    ]



def _vector_state_ds(ids: np.ndarray, ranks: np.ndarray, outdeg: np.ndarray) -> rd.Dataset:
    """Driver vectors → Dataset in ~4M-row blocks (no giant single block)."""
    chunk = 1 << 22
    tables = [
        pa.table(
            {
                "vertex": ids[i : i + chunk],
                "rank": ranks[i : i + chunk],
                "outdeg": outdeg[i : i + chunk],
            }
        )
        for i in range(0, max(len(ids), 1), chunk)
    ]
    return rd.from_arrow(tables if len(tables) > 1 else tables[0])


def pagerank(
    edges: rd.Dataset,
    *,
    directed: bool = True,
    vertices: rd.Dataset | None = None,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iters: int = 200,
    num_partitions: int | None = None,
    checkpointer: Checkpointer | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    mode: str = "auto",
) -> PageRankResult:
    from linkgraph.runtime import tune_context

    tune_context()
    num_partitions = num_partitions or G.default_partitions()
    ckpt = checkpointer or Checkpointer(None)

    # undirected + implicit vertex set: ONE dst-keyed shuffle builds the
    # deduped (dst, src)-sorted incidence table; degrees, the vertex count,
    # and the broadcast-mode gather index all fall out of it shuffle-free
    fast_undirected = not directed and vertices is None
    if fast_undirected and mode in ("auto", "broadcast", "shuffle"):
        # fused raw-task range exchange by dst (bsp.raw_map_dst_exchange):
        # self-loop drop + orientation + one-pass symmetrize run inside the
        # exchange's own tasks, and dedup_sort_src folds the global dedup +
        # (dst, src) block order into the merge — the per-range owner holds
        # every copy of its dst values, so the merge-local dedup is global
        groups, _n_rows, n_vert = bsp.raw_map_dst_exchange(
            edges, G.sym_prep_batch, dedup_sort_src=True, grouped=True
        )
        parted_refs = [b for g in groups for b in g]
        # raw-task degree extraction over the sorted block refs (no extra
        # execution): per-block (vertex, degree) segments are exact and
        # disjoint except at hub sub-split cuts, where the cut vertex's
        # partial counts are summed in the driver combine below.  The
        # exchange merge already measured the exact vertex count, so the
        # beyond-gate handoff to BSP costs no degree pull at all.
        if mode != "shuffle":
            gate = broadcast_gate_rows(24, BROADCAST_MAX_VERTICES)
            cap = None if mode == "broadcast" else gate
            if mode == "auto":
                # hand off to BSP at the measured crossover, but never
                # broadcast past the per-node memory envelope
                cap = min(BSP_MIN_VERTICES, gate)
            fits = cap is None or n_vert <= cap
            if fits:
                futs = [_deg_dst_task.remote(b) for b in parted_refs]
                vparts, dparts = [], []
                for i in range(0, len(futs), 16):
                    for v_arr, d_arr in ray.get(futs[i : i + 16]):
                        vparts.append(v_arr)
                        dparts.append(d_arr)
                vid = np.concatenate(vparts) if vparts else np.empty(0, np.int64)
                degv = np.concatenate(dparts) if dparts else np.empty(0, np.int64)
                if len(vid) > 1:
                    # combine cut-duplicate partial degrees (sub-split hubs)
                    change = np.empty(len(vid), dtype=bool)
                    change[0] = True
                    np.not_equal(vid[1:], vid[:-1], out=change[1:])
                    if not change.all():
                        starts = np.flatnonzero(change)
                        vid = vid[starts]
                        degv = np.add.reduceat(degv, starts)
                return _pagerank_broadcast_indexed(
                    parted_refs, vid, degv, ckpt, damping, tol, max_iters,
                    checkpointer, checkpoint_every, resume,
                )
        # >gate vertex count (or forced shuffle): BSP over the same
        # dst-sorted owner groups — state sharded in the object store, no
        # re-shuffle of the edge table per superstep; checkpoints are
        # per-shard raw-task Parquet writes (Checkpointer.save_shards)
        return _pagerank_bsp_shuffle(
            groups, damping, tol, max_iters,
            checkpointer, checkpoint_every, resume,
        )
    if directed and vertices is None and mode in ("auto", "broadcast", "shuffle"):
        # vertex-implicit directed runs: flagged fused exchange + BSP with
        # a per-superstep dangling-mass scalar round (oracle-identical
        # update); the bucket-join dataflow below remains for explicit
        # vertex sets
        groups, _n_rows, _n_vert = bsp.raw_map_dst_exchange(
            edges, _dir_sym_batch, dedup_sort_src=True, schema=_DIR_SCHEMA,
            grouped=True,
        )
        return _pagerank_bsp_directed(
            groups, damping, tol, max_iters,
            checkpointer, checkpoint_every, resume,
        )
    if fast_undirected:
        # shuffle-mode prep (>50M vertices): src-keyed weighted edge table
        sym = G.symmetrize_block(G.dedup_block(G.orient_lo_hi(G.drop_self_loops(edges))))
        weighted_src = weighted = (
            sym.repartition(num_partitions, keys=["src"])
            .map_batches(_weight_block, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        deg = None
    else:
        simple = _prepare_edges(edges, directed, num_partitions).materialize()
        deg = G.out_degrees(simple, num_partitions)
        # attach 1/outdeg to every edge once; static across supersteps
        weighted = bucket_join(
            simple,
            deg.map_batches(
                lambda t: pa.table({"src": t["vertex"], "outdeg": t["degree"]}),
                batch_format="pyarrow",
            ),
            ["src"],
            num_buckets=num_partitions,
            left_payload={"dst": pa.int64()},
            right_payload={"outdeg": pa.int64()},
        ).map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "inv": pa.compute.divide(pa.scalar(1.0), t["outdeg"].cast(pa.float64())),
                }
            ),
            batch_format="pyarrow",
        ).repartition(num_partitions, keys=["dst"]).materialize()
        # keyed by dst: coalesces join fragments AND makes broadcast-mode
        # per-block partials globally disjoint (required by the driver
        # combine's direct assignment)

    metrics: list[dict[str, Any]] = []
    state: rd.Dataset | None = None
    start, num_v, dm = 0, 0, 0.0
    if resume and checkpointer is not None:
        latest = checkpointer.latest()
        if latest is not None:
            it, state, meta = latest
            start = it + 1
            num_v = int(meta["num_vertices"])
            dm = float(meta["dangling_mass"])
            metrics.append(meta)

    if state is None:
        if fast_undirected:
            # src-partitioned blocks → block-local uniques are global; every
            # vertex has degree ≥ 1 (it appears as src post-symmetrize)
            with_deg = weighted_src.map_batches(
                _deg_block, batch_format="pyarrow", batch_size=None
            ).materialize()
        else:
            verts = vertices if vertices is not None else G.vertices_of(simple, num_partitions)
            # R0: every vertex with rank 1/V and its outdeg (0 when dangling)
            with_deg = (
                deg.map_batches(
                    lambda t: pa.table({"vertex": t["vertex"], "outdeg": t["degree"]}),
                    batch_format="pyarrow",
                )
                .union(
                    verts.map_batches(
                        lambda t: pa.table(
                            {
                                "vertex": t["vertex"],
                                "outdeg": pa.array(np.zeros(len(t), dtype=np.int64)),
                            }
                        ),
                        batch_format="pyarrow",
                    )
                )
                .groupby("vertex", num_partitions=num_partitions)
                .aggregate(Max("outdeg", alias_name="outdeg"))
                .materialize()
            )
        num_v = with_deg.count()
        r0 = 1.0 / num_v

        def init(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vertex": t["vertex"],
                    "rank": pa.array(np.full(len(t), r0)),
                    "outdeg": t["outdeg"],
                }
            )

        state = with_deg.map_batches(init, batch_format="pyarrow")
        if fast_undirected:
            dm = 0.0  # post-symmetrize every vertex has outdeg ≥ 1
        else:
            n_dangling = with_deg.map_batches(
                lambda t: t.filter(pa.compute.equal(t["outdeg"], 0)),
                batch_format="pyarrow",
            ).count()
            dm = n_dangling * r0
        state = ckpt.save(
            0, state, {"phase": "init", "num_vertices": num_v, "dangling_mass": dm}
        )
        start = 1

    if mode == "auto":
        gate = broadcast_gate_rows(24, BROADCAST_MAX_VERTICES)
        mode = "broadcast" if num_v <= gate else "shuffle"

    if mode == "broadcast":
        return _pagerank_broadcast(
            weighted, state, ckpt, metrics, start, num_v, dm,
            damping, tol, max_iters, checkpointer, checkpoint_every,
        )
    if mode != "shuffle":
        raise ValueError(f"unknown mode {mode!r}")
    return _pagerank_shuffle(
        weighted, state, ckpt, metrics, start, num_v, dm,
        damping, tol, max_iters, num_partitions, checkpointer, checkpoint_every,
    )


# ---------------------------------------------------------------------------
# shuffle mode (scale path)
# ---------------------------------------------------------------------------

def _pagerank_shuffle(
    weighted, state, ckpt, metrics, start, num_v, dm,
    damping, tol, max_iters, num_partitions, checkpointer, checkpoint_every,
) -> PageRankResult:
    iters = 0
    for it in range(start, start + max_iters):
        t0 = time.perf_counter()
        joined = bucket_join(
            weighted,
            state.map_batches(
                lambda t: pa.table({"src": t["vertex"], "rank": t["rank"]}),
                batch_format="pyarrow",
            ),
            ["src"],
            num_buckets=num_partitions,
            left_payload={"dst": pa.int64(), "inv": pa.float64()},
            right_payload={"rank": pa.float64()},
        )

        def emit(t: pa.Table) -> pa.Table:
            dst = t["dst"].to_numpy(zero_copy_only=False)
            c = t["rank"].to_numpy(zero_copy_only=False) * t["inv"].to_numpy(
                zero_copy_only=False
            )
            return _partial_by_dst(dst, c)

        contrib = joined.map_batches(emit, batch_format="pyarrow")
        base = state.map_batches(
            lambda t: pa.table(
                {
                    "vertex": t["vertex"],
                    "contrib": pa.array(np.zeros(len(t))),
                    "rank_old": t["rank"],
                    "outdeg": t["outdeg"],
                }
            ),
            batch_format="pyarrow",
        )
        reduced = (
            contrib.union(base)
            .groupby("vertex", num_partitions=num_partitions)
            .aggregate(
                Sum("contrib", alias_name="contrib"),
                Sum("rank_old", alias_name="rank_old"),
                Max("outdeg", alias_name="outdeg"),
            )
        )
        teleport = (1.0 - damping) / num_v
        dshare = damping * dm / num_v

        def step(t: pa.Table, teleport=teleport, dshare=dshare) -> pa.Table:
            c = t["contrib"].to_numpy(zero_copy_only=False)
            old = t["rank_old"].to_numpy(zero_copy_only=False)
            outdeg = t["outdeg"].to_numpy(zero_copy_only=False)
            r_new = teleport + damping * c + dshare
            return pa.table(
                {
                    "vertex": t["vertex"],
                    "rank": pa.array(r_new),
                    "outdeg": t["outdeg"],
                    "delta": pa.array(np.abs(r_new - old)),
                    "dmass": pa.array(np.where(outdeg == 0, r_new, 0.0)),
                }
            )

        new_state = reduced.map_batches(step, batch_format="pyarrow").materialize()
        agg = new_state.aggregate(
            Sum("delta", alias_name="delta"), Sum("dmass", alias_name="dmass")
        )
        delta = float(agg["delta"] or 0.0)
        dm = float(agg["dmass"] or 0.0)
        state = new_state.select_columns(["vertex", "rank", "outdeg"])
        iters += 1
        converged = tol > 0 and delta < tol
        if checkpointer is not None and (converged or it % checkpoint_every == 0):
            state = ckpt.save(
                it, state,
                {"phase": "superstep", "iteration": it, "num_vertices": num_v,
                 "dangling_mass": dm, "l1_delta": delta},
            )
        metrics.append(
            {"iteration": it, "l1_delta": delta, "dangling_mass": dm,
             "mode": "shuffle", "wall_s": time.perf_counter() - t0}
        )
        if converged:
            break
    else:
        if tol > 0:
            raise RuntimeError(f"pagerank exceeded {max_iters} iterations")

    ranks = state.select_columns(["vertex", "rank"]).materialize()
    return PageRankResult(ranks, num_v, iters, metrics)


def _partial_by_dst(dst: np.ndarray, c: np.ndarray) -> pa.Table:
    """Block-local combiner: sum contributions per dst before the shuffle."""
    uniq, inv = np.unique(dst, return_inverse=True)
    sums = np.zeros(len(uniq))
    np.add.at(sums, inv, c)
    return pa.table(
        {
            "vertex": uniq,
            "contrib": sums,
            "rank_old": np.zeros(len(uniq)),
            "outdeg": np.full(len(uniq), -1, dtype=np.int64),
        }
    )


# ---------------------------------------------------------------------------
# broadcast mode, indexed (fast_undirected path)
# ---------------------------------------------------------------------------

@ray.remote(num_cpus=1)
def _superstep_task(block, w: np.ndarray):
    """One dst-disjoint index block × weighted-rank vector → (dst positions,
    partial sums).  ``block`` arrives as the materialized Arrow table
    (zero-copy from the object store); ``w`` is the per-superstep
    ``ranks/outdeg`` broadcast."""
    if block.num_columns == 0 or len(block) == 0:
        return np.empty(0, np.int64), np.empty(0)
    i_s = block["i_src"].to_numpy(zero_copy_only=False)
    i_d = block["i_dst"].to_numpy(zero_copy_only=False)
    c = w[i_s]
    change = np.empty(len(i_d), dtype=bool)
    change[0] = True
    np.not_equal(i_d[1:], i_d[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    return i_d[starts].astype(np.int64), np.add.reduceat(c, starts)

def _pagerank_broadcast_indexed(
    parted_refs: list,
    vid: np.ndarray,
    degv: np.ndarray,
    ckpt: Checkpointer,
    damping: float,
    tol: float,
    max_iters: int,
    checkpointer: Checkpointer | None,
    checkpoint_every: int,
    resume: bool,
) -> PageRankResult:
    """Broadcast mode over a pre-indexed incidence table.

    ``parted_refs`` are the block refs of the dst-keyed, (dst, src)-sorted,
    globally-deduped symmetric incidence table.  A one-time pass converts (src, dst) into
    int32 positions in the sorted vertex-id vector, so every superstep is a
    single distributed map (vectorized gather + segment ``reduceat`` — no
    sort, no searchsorted) plus a driver combine over globally-disjoint
    per-block partials.  The dataflow analogue of the reference's
    full-Allgatherv label exchange (``src/mpi/cc_mpi.c:388-571``) with the
    rank vector in the role of the gathered state.  Post-symmetrize every
    vertex has degree ≥ 1, so the dangling mass is identically zero.
    """
    metrics: list[dict[str, Any]] = []
    t0 = time.perf_counter()
    num_v = len(vid)
    start = 1
    state_loaded = False
    ids = ranks = outdeg = None
    if resume and checkpointer is not None:
        latest = checkpointer.latest()
        if latest is not None:
            it0, state, meta = latest
            ids, ranks, outdeg = _pull_columns(state, ["vertex", "rank", "outdeg"])
            order = np.argsort(ids, kind="stable")
            ids, ranks, outdeg = ids[order], np.asarray(ranks)[order], outdeg[order]
            num_v = len(ids)
            start = it0 + 1
            metrics.append(meta)
            state_loaded = True
    if not state_loaded:
        order = np.argsort(vid, kind="stable")
        ids, outdeg = vid[order], np.asarray(degv)[order]
        ranks = np.full(num_v, 1.0 / num_v) if num_v else np.empty(0)
        if checkpointer is not None:
            ckpt.save(
                0,
                _vector_state_ds(ids, ranks, outdeg),
                {"phase": "init", "num_vertices": num_v, "dangling_mass": 0.0},
            )
        metrics.append(
            {"phase": "prep_ckpt0", "wall_s": time.perf_counter() - t0}
        )
    if num_v == 0:
        empty = rd.from_arrow(
            pa.table({"vertex": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
        )
        return PageRankResult(empty, 0, 0, metrics)
    inv = 1.0 / outdeg  # degree ≥ 1 everywhere post-symmetrize

    t_idx0 = time.perf_counter()
    # positional index as raw tasks over the sorted block refs (see
    # linkgraph.bsp): the index tables live in the object store as task
    # returns — no Ray Data execution, nothing touches the driver
    block_refs = bsp.positional_index(parted_refs, ids)
    metrics.append(
        {"phase": "prep_index", "wall_s": time.perf_counter() - t_idx0}
    )
    metrics.append(
        {"phase": "prep", "num_vertices": num_v, "wall_s": time.perf_counter() - t0}
    )

    # superstep inner loop = raw Ray tasks over the index block refs: a
    # Ray Data execution costs ~2 s of executor/actor-pool startup per
    # superstep while the actual per-block work is milliseconds; plain
    # tasks schedule in ~100 ms total.  This is the documented raw-task
    # exception (driver-held vector state round-trips every superstep
    # anyway, so there is no streaming pipeline to preserve).
    # Partitioning assumption: blocks are dst-disjoint (the one sort
    # exchange above), so per-block partials never overlap.
    iters = 0
    for it in range(start, start + max_iters):
        t0 = time.perf_counter()
        ref = ray.put(ranks * inv)
        t_put = time.perf_counter()
        futs = [_superstep_task.remote(b, ref) for b in block_refs]
        contrib = np.zeros(num_v)
        # per-block partials are unique within a block; a sub-split hub may
        # repeat a position across adjacent sub-blocks — the sequential
        # per-block indexed add combines those partials exactly, and the
        # fixed block order keeps the float sum deterministic
        for i_arr, c_arr in ray.get(futs):
            contrib[i_arr] += c_arr
        t_pull = time.perf_counter()
        r_new = (1.0 - damping) / num_v + damping * contrib
        delta = float(np.abs(r_new - ranks).sum())
        ranks = r_new
        iters += 1
        converged = tol > 0 and delta < tol
        if checkpointer is not None and (converged or it % checkpoint_every == 0):
            ckpt.save(
                it,
                _vector_state_ds(ids, ranks, outdeg),
                {"phase": "superstep", "iteration": it, "num_vertices": num_v,
                 "dangling_mass": 0.0, "l1_delta": delta},
            )
        metrics.append(
            {"iteration": it, "l1_delta": delta, "dangling_mass": 0.0,
             "mode": "broadcast", "wall_s": time.perf_counter() - t0,
             "put_s": t_put - t0, "exec_s": t_pull - t_put}
        )
        if converged:
            break
    else:
        if tol > 0:
            raise RuntimeError(f"pagerank exceeded {max_iters} iterations")

    out = _vector_state_ds(ids, ranks, outdeg).select_columns(["vertex", "rank"])
    return PageRankResult(out.materialize(), num_v, iters, metrics)


# ---------------------------------------------------------------------------
# broadcast mode (Allgatherv analogue; rank vector on the driver)
# ---------------------------------------------------------------------------

def _pagerank_broadcast(
    weighted, state, ckpt, metrics, start, num_v, dm,
    damping, tol, max_iters, checkpointer, checkpoint_every,
) -> PageRankResult:
    ids, ranks, outdeg = _pull_columns(state, ["vertex", "rank", "outdeg"])
    order = np.argsort(ids, kind="stable")
    ids, ranks, outdeg = ids[order], np.asarray(ranks)[order], outdeg[order]
    dangling_mask = outdeg == 0

    iters = 0
    for it in range(start, start + max_iters):
        t0 = time.perf_counter()
        ref = ray.put((ids, ranks))

        def emit(t: pa.Table, ref=ref) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return pa.table(
                    {
                        "vertex": pa.array([], pa.int64()),
                        "contrib": pa.array([], pa.float64()),
                    }
                )
            ids_, ranks_ = ray.get(ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            inv = t["inv"].to_numpy(zero_copy_only=False)
            c = ranks_[np.searchsorted(ids_, src)] * inv
            # sort + reduceat, NOT np.add.at (ufunc.at is ~10x slower)
            order = np.argsort(dst, kind="stable")
            d, c = dst[order], c[order]
            change = np.empty(len(d), dtype=bool)
            change[0] = True
            np.not_equal(d[1:], d[:-1], out=change[1:])
            starts = np.flatnonzero(change)
            return pa.table(
                {"vertex": d[starts], "contrib": np.add.reduceat(c, starts)}
            )

        contrib = np.zeros(num_v)
        # per-block partials are globally DISJOINT (weighted is
        # dst-partitioned), so direct indexed assignment is exact and
        # deterministic regardless of block arrival order
        for b in weighted.map_batches(
            emit, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            v = b["vertex"].to_numpy(zero_copy_only=False)
            c = b["contrib"].to_numpy(zero_copy_only=False)
            contrib[np.searchsorted(ids, v)] = c

        r_new = (1.0 - damping) / num_v + damping * (contrib + dm / num_v)
        delta = float(np.abs(r_new - ranks).sum())
        ranks = r_new
        dm = float(ranks[dangling_mask].sum())
        iters += 1
        converged = tol > 0 and delta < tol
        if checkpointer is not None and (converged or it % checkpoint_every == 0):
            ckpt.save(
                it,
                _vector_state_ds(ids, ranks, outdeg),
                {"phase": "superstep", "iteration": it, "num_vertices": num_v,
                 "dangling_mass": dm, "l1_delta": delta},
            )
        metrics.append(
            {"iteration": it, "l1_delta": delta, "dangling_mass": dm,
             "mode": "broadcast", "wall_s": time.perf_counter() - t0}
        )
        if converged:
            break
    else:
        if tol > 0:
            raise RuntimeError(f"pagerank exceeded {max_iters} iterations")

    out = _vector_state_ds(ids, ranks, outdeg).select_columns(["vertex", "rank"])
    return PageRankResult(out.materialize(), num_v, iters, metrics)


# ---------------------------------------------------------------------------
# weighted PageRank (north-star extension)
#
# The reference's MTX reader parses an optional per-edge VALUE and discards
# it (``src/mtx_reader.c:153-156`` — the graph is unweighted).  This kernel
# is what that value would feed: r'(v) = (1-d)/N + d * Σ_{u~v} r(u)·w_uv/W_u
# with W_u = Σ of u's incident weights.  Same one-exchange + sharded
# emit/apply machinery as the unweighted BSP path; parallel edges are
# ADDITIVE (their contributions sum in the emit reduceat), so the exchange
# runs without dedup and no pre-aggregation shuffle is needed.
# ---------------------------------------------------------------------------

_W_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()), ("w", pa.float64())])


def _w_sym_batch(t: pa.Table) -> pa.Table:
    """Drop self-loops + one-pass symmetrize, weights riding along.

    No dedup anywhere in the weighted chain: parallel (u, v) rows are
    semantically additive (each carries its own weight into W_u and into
    u's emission), so multiplicity IS the data."""
    if t.num_columns == 0 or len(t) == 0:
        return _W_SCHEMA.empty_table()
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    keep = s != d
    s, d, w = s[keep], d[keep], w[keep]
    return pa.table(
        {
            "src": np.concatenate([s, d]),
            "dst": np.concatenate([d, s]),
            "w": np.concatenate([w, w]),
        }
    )


@ray.remote(num_cpus=1, num_returns=2)
def _w_group_prep(*blocks):
    """One owner GROUP's dst-sorted sub-blocks → ``(vids, inv_W)`` +
    ``(n, first)``.  W_v = sum of v's incident weights (post-symmetrize the
    dst-grouped rows of v ARE its incident rows); hub sub-splits are
    combined per vid exactly like the unweighted prep."""
    vparts, wparts = [], []
    for b in blocks:
        if b.num_columns == 0 or len(b) == 0:
            continue
        d = b["dst"].to_numpy(zero_copy_only=False)
        w = b["w"].to_numpy(zero_copy_only=False)
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        np.not_equal(d[1:], d[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        vparts.append(d[starts])
        wparts.append(np.add.reduceat(w, starts))
    if not vparts:
        return (np.empty(0, np.int64), np.empty(0, np.float64)), (0, 0)
    v = np.concatenate(vparts)
    ws = np.concatenate(wparts)
    change = np.empty(len(v), dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    # int64 state vids (bsp compact-output contract; blocks may be int32)
    vids = v[starts].astype(np.int64, copy=False)
    W = np.add.reduceat(ws, starts)
    inv = np.zeros(len(W))
    nz = W > 0
    inv[nz] = 1.0 / W[nz]
    return (vids, inv), (int(len(vids)), int(vids[0]))


@ray.remote(num_cpus=1)
def _w_sub_prep(block, gprep, whole_group: bool = False):
    """One weighted sub-block → static emission index: rows re-read as
    dst→src pushes, per-row factor ``wfac = w · inv_W[dst]`` precomputed
    once so each superstep's emit is a pure gather-multiply-reduceat."""
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.int32),
        np.empty(0, np.int32),
        np.empty(0, np.float64),
    )
    if block.num_columns == 0 or len(block) == 0:
        return empty
    s = block["src"].to_numpy(zero_copy_only=False)
    d = block["dst"].to_numpy(zero_copy_only=False)
    w = block["w"].to_numpy(zero_copy_only=False)
    if whole_group:
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        np.not_equal(d[1:], d[:-1], out=change[1:])
        i_local = (np.cumsum(change) - 1).astype(np.int32)
    else:
        i_local = np.searchsorted(gprep[0], d).astype(np.int32)
    wfac = w * gprep[1][i_local]
    order = np.argsort(s, kind="stable")
    tgt = s[order]
    i_local = i_local[order]
    wfac = wfac[order]
    tchange = np.empty(len(tgt), dtype=bool)
    tchange[0] = True
    np.not_equal(tgt[1:], tgt[:-1], out=tchange[1:])
    tgt_starts = np.flatnonzero(tchange).astype(np.int32)
    # int64 emit targets (bsp compact-output contract)
    return (tgt[tgt_starts].astype(np.int64, copy=False), tgt_starts, i_local, wfac)


@ray.remote(num_cpus=1)
def _w_emit(sub, rank_vec, firsts):
    """One weighted superstep emit for one sub-block (``num_returns=K``)."""
    tgt_unique, tgt_starts, i_local, wfac = sub
    k = len(firsts)
    if len(tgt_unique) == 0:
        outs = [(np.empty(0, np.int64), np.empty(0, np.float64))] * k
        return outs if k > 1 else outs
    c = rank_vec[i_local] * wfac
    partial = np.add.reduceat(c, tgt_starts)
    return bsp._owner_split(tgt_unique, partial, firsts)


def weighted_pagerank(
    edges: rd.Dataset,
    *,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iters: int = 100,
) -> PageRankResult:
    """Undirected weighted PageRank over an (src, dst, w) edge Dataset.

    ``tol=0`` runs exactly ``max_iters`` supersteps (the fixed-iteration
    oracle convention).  Weights must be ≥ 0; a vertex whose incident
    weights sum to 0 emits nothing (keeps its teleport mass).  Parallel
    edges are additive.  Runs the sharded BSP path at every size — state
    in the object store, one emit + apply task round per superstep."""
    from linkgraph.runtime import tune_context

    tune_context()
    metrics: list[dict[str, Any]] = []
    t0 = time.perf_counter()
    groups, _n_rows, _n_vert = bsp.raw_map_dst_exchange(
        edges, _w_sym_batch, dedup_sort_src=False, schema=_W_SCHEMA, grouped=True
    )
    gps = [_w_group_prep.options(num_returns=2).remote(*g) for g in groups]
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
                {"vertex": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
            )
        )
        return PageRankResult(empty, 0, 0, metrics)
    sub_owner: list[int] = []
    subs: list = []
    for gi, i in enumerate(keep):
        for b in groups[i]:
            sub_owner.append(gi)
            subs.append(_w_sub_prep.remote(b, gps[i][0], len(groups[i]) == 1))
    firsts_ref = ray.put(firsts)
    ranks = [_bsp_full_vec.remote(n, 1.0 / num_v) for n in counts]
    metrics.append(
        {"phase": "weighted_prep", "num_vertices": num_v, "num_groups": k,
         "num_subblocks": len(subs), "wall_s": time.perf_counter() - t0}
    )
    teleport = (1.0 - damping) / num_v
    iters = 0
    for it in range(1, max_iters + 1):
        t1 = time.perf_counter()
        emits = [
            _w_emit.options(num_returns=k).remote(
                subs[e], ranks[sub_owner[e]], firsts_ref
            )
            for e in range(len(subs))
        ]
        if k == 1:
            emits = [[e] for e in emits]
        outs = [
            _bsp_shuffle_apply.remote(
                gpreps[j], ranks[j], teleport, damping,
                *[emits[e][j] for e in range(len(subs))]
            )
            for j in range(k)
        ]
        ranks = [o[0] for o in outs]
        delta = float(sum(ray.get([o[1] for o in outs])))
        iters += 1
        metrics.append(
            {"iteration": it, "l1_delta": delta, "mode": "weighted_bsp",
             "wall_s": time.perf_counter() - t1}
        )
        if tol > 0 and delta < tol:
            break
    else:
        if tol > 0:
            raise RuntimeError(f"weighted pagerank exceeded {max_iters} iterations")

    tables = [_bsp_ranks_table.remote(gpreps[j], ranks[j]) for j in range(k)]
    return PageRankResult(
        rd.from_arrow_refs(tables).materialize(), num_v, iters, metrics
    )


# --------------------------------------------------------------------------
# Personalized PageRank — teleport restricted to a seed set
# --------------------------------------------------------------------------


@ray.remote(num_cpus=1)
def _ppr_seed_vec(gprep, seeds: np.ndarray, inv_s: float) -> np.ndarray:
    """Per-group personalization vector: ``p[i] = 1/|S|`` where
    ``vids[i] ∈ seeds`` (vids are sorted — one searchsorted probe)."""
    vids = gprep[0]
    p = np.zeros(len(vids))
    if len(vids) and len(seeds):
        idx = np.searchsorted(vids, seeds)
        in_range = idx < len(vids)
        hit = np.zeros(len(seeds), dtype=bool)
        hit[in_range] = vids[idx[in_range]] == seeds[in_range]
        p[idx[hit]] = inv_s
    return p


@ray.remote(num_cpus=1, num_returns=2)
def _ppr_apply(gprep, rank_vec, p_vec, coeff, damping, *chunks):
    """Personalized apply: ``r' = coeff·p + d·contrib`` where
    ``coeff = (1-d) + d·dm`` folds the teleport and the dangling-mass
    redistribution (both land on the seed distribution p, not uniformly —
    the defining difference from global PageRank)."""
    vids = gprep[0]
    contrib = np.zeros(len(vids))
    for ch in chunks:
        pairs = ch if isinstance(ch, list) else [ch]
        for tgt_c, p_c in pairs:
            if len(tgt_c):
                contrib[np.searchsorted(vids, tgt_c)] += p_c
    new = coeff * p_vec + damping * contrib
    return new, float(np.abs(new - rank_vec).sum())


def personalized_pagerank(
    edges: rd.Dataset,
    seeds,
    *,
    directed: bool = True,
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iters: int = 200,
    checkpointer: Checkpointer | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> PageRankResult:
    """Personalized PageRank (random walk with restart to a seed set).

    Update: ``r'(v) = (1-d)·p(v) + d·(Σ_{u→v} r(u)/outdeg(u) + dm·p(v))``
    with ``p = uniform over seeds`` and ``r0 = p`` — the standard RWR
    formulation (Page et al. 1999 §6; Jeh & Widom 2003).  Dangling mass
    restarts at the seeds, so total mass stays 1 at every superstep.

    Same object-store-sharded BSP machinery as :func:`pagerank` (one state
    shard per owner group, one emit task per sub-block; nothing per-vertex
    touches the driver) — the only deltas are the per-group personalization
    vector (built once from a broadcast sorted seed array) and the apply's
    ``coeff·p`` term.  Seeds must be vertices of the graph; ``|S|`` counts
    the distinct seed ids given.  No reference twin (the reference computes
    CC only); public-algorithm citation above.
    """
    from linkgraph import bsp
    from linkgraph import graph as G
    from linkgraph.runtime import tune_context

    tune_context()
    t0 = time.perf_counter()
    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    if len(seeds) == 0:
        raise ValueError("personalized_pagerank needs at least one seed")
    inv_s = 1.0 / len(seeds)
    metrics: list[dict[str, Any]] = []
    if directed:
        groups, _n_rows, _n_vert = bsp.raw_map_dst_exchange(
            edges, _dir_sym_batch, dedup_sort_src=True, schema=_DIR_SCHEMA,
            grouped=True,
        )
        gps = [_pr_dir_group_prep.options(num_returns=2).remote(*g) for g in groups]
    else:
        groups, _n_rows, _n_vert = bsp.raw_map_dst_exchange(
            edges, G.sym_prep_batch, dedup_sort_src=True, grouped=True
        )
        gps = [_pr_group_prep.options(num_returns=2).remote(*g) for g in groups]
    metas = ray.get([p[1] for p in gps])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    gpreps = [gps[i][0] for i in keep]
    counts = [metas[i][0] for i in keep]
    firsts = np.asarray([metas[i][1] for i in keep], dtype=np.int64)
    num_v = int(sum(counts))
    k = len(gpreps)
    if k == 0:
        empty = rd.from_arrow(
            pa.table({"vertex": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
        )
        return PageRankResult(empty, 0, 0, metrics)
    sub_owner: list[int] = []
    subs: list = []
    for gi, i in enumerate(keep):
        whole = len(groups[i]) == 1
        for b in groups[i]:
            sub_owner.append(gi)
            if directed:
                subs.append(_dir_sub_prep.remote(b, gps[i][0], whole))
            else:
                subs.append(bsp.sub_emit_prep.remote(b, gps[i][0], True, whole))
    firsts_ref = ray.put(firsts)
    seeds_ref = ray.put(seeds)
    pvecs = [_ppr_seed_vec.remote(gpreps[j], seeds_ref, inv_s) for j in range(k)]
    start = 1
    ranks = None
    if resume and checkpointer is not None:
        # non-seed vertices start at 0, so 0.0 is the correct default for
        # any vertex a (partial) checkpoint does not cover
        latest = checkpointer.load_shards(gpreps, firsts, "rank", default=0.0)
        if latest is not None:
            last_it, ranks, meta = latest
            start = last_it + 1
            metrics.append(meta)
    if ranks is None:
        ranks = list(pvecs)  # r0 = p
    metrics.append(
        {"phase": "bsp_prep", "num_vertices": num_v, "mode": "ppr",
         "num_seeds": int(len(seeds)), "num_groups": k,
         "num_subblocks": len(subs), "wall_s": time.perf_counter() - t0}
    )

    iters = 0
    for it in range(start, start + max_iters):
        t1 = time.perf_counter()
        if directed:
            dm = float(
                sum(ray.get([_dangling_sum.remote(gpreps[j], ranks[j]) for j in range(k)]))
            )
        else:
            dm = 0.0  # post-symmetrize every vertex has outdeg ≥ 1
        coeff = (1.0 - damping) + damping * dm
        emits = [
            _bsp_shuffle_emit.options(num_returns=k).remote(
                subs[e], gpreps[sub_owner[e]], ranks[sub_owner[e]], firsts_ref
            )
            for e in range(len(subs))
        ]
        if k == 1:
            emits = [[e] for e in emits]
        outs = [
            _ppr_apply.remote(
                gpreps[j], ranks[j], pvecs[j], coeff, damping,
                *[emits[e][j] for e in range(len(subs))]
            )
            for j in range(k)
        ]
        ranks = [o[0] for o in outs]
        delta = float(sum(ray.get([o[1] for o in outs])))
        iters += 1
        metrics.append(
            {"iteration": it, "l1_delta": delta, "dangling_mass": dm,
             "mode": "ppr", "wall_s": time.perf_counter() - t1}
        )
        converged = tol > 0 and delta < tol
        if checkpointer is not None and (converged or it % checkpoint_every == 0):
            checkpointer.save_shards(
                it,
                [_bsp_ranks_table.remote(gpreps[j], ranks[j]) for j in range(k)],
                {"iteration": it, "l1_delta": delta, "dangling_mass": dm,
                 "num_vertices": num_v, "mode": "ppr"},
            )
        if converged:
            break
    else:
        if tol > 0:
            raise RuntimeError(f"personalized pagerank exceeded {max_iters} iterations")

    tables = [_bsp_ranks_table.remote(gpreps[j], ranks[j]) for j in range(k)]
    return PageRankResult(
        rd.from_arrow_refs(tables).materialize(), num_v, iters, metrics
    )
