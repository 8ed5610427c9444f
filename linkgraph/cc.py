"""Connected components — the engine's flagship kernel.

Semantics are the reference's: undirected graph, self-loops dropped
(``src/graph.c:71-73``), canonical labels = minimum vertex id per component
(``src/cc_sequential.c:325-331``; all four sequential reference variants are
bit-identical on this labeling, ``benchmarks/benchmark_sequential.c:84-97``),
iterations-to-convergence reported (``src/cc_sequential.c:489``).

The *algorithm* is Ray-Data-native, replacing all 19 reference variants
(SURVEY.md §2.10) with one dataflow design:

1. **Partition-local union-find contraction** — each Arrow block of edges is
   collapsed to its spanning-forest root pairs inside a stateless
   ``map_batches`` (the dataflow analogue of the reference's per-rank local
   union-find, ``src/mpi/cc_mpi.c:2091-2121``).  This is where the bulk of a
   100 TB edge table disappears: a block with E edges over V distinct
   vertices emits ≤ V-1 pairs.
2. **Alternating large-star / small-star supersteps** (Kiveris et al.,
   "Connected Components in MapReduce and Beyond") — each phase is one
   ``groupby().aggregate(Min)`` + one hash join + a vectorized emit, i.e.
   exactly the min-label exchange the MPI variants perform with
   Allgatherv/halo exchanges (``src/mpi/cc_mpi.c:388-571``), converging in
   O(log^2 V) rounds instead of O(diameter).
3. **Convergence** = multiset-fingerprint stability (the dataflow analogue of
   the reference's ``MPI_Allreduce`` changed-flag,
   ``src/mpi/cc_mpi.c:518-525``), with a ``max_rounds`` cap mirroring the
   reference's iteration caps (``src/mpi/cc_mpi.c:2060``).

Sync, deterministic semantics only (double-buffer style,
``src/cc_openmp.c:62-125``): results are identical at any partition count or
CPU count — required for the determinism tests and the per-url byte-identical
invariant.  Every superstep optionally checkpoints through
``checkpoint.Checkpointer`` (lineage + metrics, resume mid-iteration).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min

from linkgraph import graph as G
from linkgraph.checkpoint import Checkpointer
from linkgraph.runtime import broadcast_gate_rows

try:  # fast C path if scipy is available in the image
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as _scipy_cc

    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False


# ---------------------------------------------------------------------------
# local (per-block) union-find contraction
# ---------------------------------------------------------------------------

def _local_components(u: np.ndarray, v: np.ndarray, n: int) -> np.ndarray:
    """Component min-index per local vertex, vectorized (no Python edge loop).

    Hook-and-compress in the Shiloach-Vishkin style
    (ref ``src/cc_openmp.c:253-310``): repeatedly pull the min parent across
    edges, then pointer-jump until stable.  O(E log V) numpy work.
    """
    p = np.arange(n, dtype=np.int64)
    # convergence = every edge satisfied (p[u] == p[v]).  Satisfied edges
    # are DROPPED each round: after full compression equal parents mean
    # same tree, and hooked trees only ever merge further, so a satisfied
    # edge can never become load-bearing again — the live edge set shrinks
    # fast and bounds per-round work.  (An earlier version inferred
    # convergence from a `before` snapshot that aliased the array
    # ``minimum.at`` mutates in place, exiting mid-propagation on
    # star-of-stars shapes — caught by the membership-graph SQL oracle and
    # pinned by the hypothesis connectivity property in tests/test_cc.py.)
    while len(u):
        # hook the ROOTS (π(π(v)) ← min, true Shiloach-Vishkin): root
        # merges are permanent under compression, which is what licenses
        # dropping satisfied edges below.  Hooking the endpoints instead
        # lets a satisfied edge become load-bearing again when one side is
        # later pulled lower through a different edge (the hypothesis
        # connectivity property fails within seconds on that variant).
        ru, rv = p[u], p[v]
        mn = np.minimum(ru, rv)
        np.minimum.at(p, ru, mn)
        np.minimum.at(p, rv, mn)
        while True:
            pp = p[p]
            if np.array_equal(pp, p):
                break
            p = pp
        live = p[u] != p[v]
        u, v = u[live], v[live]
    return p


def _min_root_index(u: np.ndarray, v: np.ndarray, n: int) -> np.ndarray:
    """Per-local-vertex index of its component's min-id member (scipy C path
    when available, else the vectorized hook-and-compress)."""
    if _HAVE_SCIPY and len(u):
        m = coo_matrix((np.ones(len(u), np.int8), (u, v)), shape=(n, n))
        _, comp = _scipy_cc(m, directed=False)
        roots = np.full(comp.max() + 1, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(roots, comp, np.arange(n, dtype=np.int64))
        return roots[comp]
    return _local_components(u, v, n)


def _contract_batch(t: pa.Table) -> pa.Table:
    """Collapse one edge block to its spanning-forest pairs (root, child).

    root < child always (root is the component-min id within the block), so
    output rows keep the canonical src<dst orientation.  Self-loop rows are
    passed through as distinct ``(x, x)`` marker rows (the reference drops
    self-loops from the adjacency, ``src/graph.c:71-73``, but still labels
    the vertex — the marker keeps loop-only vertices in the vertex set
    without a separate scan of the input).
    """
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    loop_ids = np.unique(src[src == dst])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if len(src) == 0:
        return pa.table({"src": loop_ids, "dst": loop_ids})
    ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    u, v = inv[: len(src)], inv[len(src) :]
    n = len(ids)
    p = _min_root_index(u, v, n)
    child = np.nonzero(p != np.arange(n))[0]
    return pa.table(
        {
            "src": np.concatenate([ids[p[child]], loop_ids]),
            "dst": np.concatenate([ids[child], loop_ids]),
        }
    )


def contract(edges: rd.Dataset, batch_size: int | None = None) -> rd.Dataset:
    """Partition-local contraction over canonical edges (stateless tasks)."""
    return edges.map_batches(
        _contract_batch, batch_format="pyarrow", batch_size=batch_size
    )


def _contract_sym_batch(t: pa.Table) -> pa.Table:
    """orient → local union-find contraction → one-pass symmetrize, as one
    pure Table function for the fused exchange (``raw_map_dst_exchange``)."""
    return G._sym_block_batch(_contract_batch(G._orient_batch(t)))


# ---------------------------------------------------------------------------
# large-star / small-star supersteps
# ---------------------------------------------------------------------------

_EMPTY_EDGES = pa.table(
    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
)


def _segments(key_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start offsets + per-row segment index of equal-key runs (sorted key)."""
    if len(key_sorted) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.empty(len(key_sorted), dtype=bool)
    change[0] = True
    np.not_equal(key_sorted[1:], key_sorted[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    seg_of_row = np.cumsum(change) - 1
    return starts, seg_of_row


def large_star(pairs: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """Connect all strictly-larger neighbors of u to min(N(u) ∪ {u}).

    Single exchange: symmetrized rows are range-partitioned + sorted by u
    (``sort("u")`` — Ray Data's range partitioner keeps all rows of a key
    in one block, measured ~7x faster map-side than the hash-shuffle op on
    small fixed-width rows) and each whole-block batch computes its per-u
    segment minimum AND the emits in one vectorized ``reduceat`` pass over
    the already-sorted key — no separate aggregate + join, no re-sort, and
    no ``map_groups`` (whose hash-shuffle finalize-sort dies on
    schema-less empty partitions in Ray 2.49).  ``num_partitions`` is
    retained for API stability; the range partitioner sizes blocks itself.
    """

    def sym(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"u": np.concatenate([s, d]), "v": np.concatenate([d, s])})

    def emit(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _EMPTY_EDGES
        u = t["u"].to_numpy(zero_copy_only=False)  # pre-sorted by the exchange
        v = t["v"].to_numpy(zero_copy_only=False)
        starts, seg = _segments(u)
        m = np.minimum(u[starts], np.minimum.reduceat(v, starts))
        m_row = m[seg]
        keep = v > u
        return pa.table({"src": m_row[keep], "dst": v[keep]})

    symmed = pairs.map_batches(sym, batch_format="pyarrow")
    return symmed.sort("u").map_batches(emit, batch_format="pyarrow", batch_size=None)


def small_star(pairs: rd.Dataset, num_partitions: int) -> rd.Dataset:
    """Connect all smaller neighbors of u (and u itself) to min(N(u)).

    Input rows satisfy src < dst (guaranteed by contraction / large_star), so
    partitioning by dst sees exactly the smaller neighbors.  Same
    single-exchange whole-block segment pattern as ``large_star``.
    """

    def emit(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _EMPTY_EDGES
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)  # pre-sorted
        starts, seg = _segments(d)
        mn = np.minimum.reduceat(s, starts)
        mn_row = mn[seg]
        keep = s != mn_row
        # members (mn, s) for non-min smaller neighbors + one owner (mn, u)
        return pa.table(
            {
                "src": np.concatenate([mn_row[keep], mn]),
                "dst": np.concatenate([s[keep], d[starts]]),
            }
        )

    return pairs.sort("dst").map_batches(emit, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# driver loop
# ---------------------------------------------------------------------------

@dataclass
class CCResult:
    """Engine equivalent of the reference's ``CCResult``
    (``inc/cc_sequential.h:5-9``): labels live in a Dataset, not an array."""

    labels: rd.Dataset
    num_components: int
    num_iterations: int
    metrics: list[dict[str, Any]] = field(default_factory=list)


def _local_finish(
    pairs: rd.Dataset,
    rounds: int,
    metrics: list[dict[str, Any]],
    verts: rd.Dataset | None = None,
) -> CCResult:
    """Finish a small remainder on the driver with the numpy union-find.

    The dataflow analogue of Afforest's "finish the non-giant remainder
    cheaply" tail (ref ``src/cc_openmp.c:498-617``): once the contracted
    pair set fits comfortably in driver memory, one local hook-and-compress
    beats several more distributed rounds of ~2.4 s fixed cost each.

    With an explicit ``verts`` set (assumed to cover every edge endpoint —
    the reference's "edges within [0, num_vertices)" contract,
    ``src/mtx_reader.c:144-193``), the driver-solved label map for the
    *touched* vertices is broadcast once and joined against ``verts`` in a
    single streaming ``map_batches`` pass — untouched vertices label
    themselves — so the vertex table never funnels through the driver and
    never shuffles.
    """
    import ray

    t0 = time.perf_counter()
    us, ds_ = [], []
    for b in pairs.iter_batches(batch_size=1 << 22, batch_format="pyarrow"):
        # blocks may arrive int32-compacted from the fused exchange (bsp
        # compact-output contract); the output label tables must be int64
        us.append(b["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
        ds_.append(b["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False))
    u = np.concatenate(us) if us else np.empty(0, np.int64)
    v = np.concatenate(ds_) if ds_ else np.empty(0, np.int64)
    ids = np.unique(np.concatenate([u, v]))
    comp = _min_root_index(
        np.searchsorted(ids, u), np.searchsorted(ids, v), len(ids)
    )
    labels_arr = ids[comp]
    if verts is None:
        chunk = 1 << 22
        tables = [
            pa.table({"vertex": ids[i : i + chunk], "label": labels_arr[i : i + chunk]})
            for i in range(0, max(len(ids), 1), chunk)
        ]
        labels = rd.from_arrow(tables if len(tables) > 1 else tables[0]).materialize()
        n_comp = int(len(np.unique(labels_arr)))
    else:
        ref = ray.put((ids, labels_arr))

        def assign(t: pa.Table, ref=ref) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _EMPTY_LABELS
            tids, tlab = ray.get(ref)
            vv = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64, copy=True)
            lab = vv.copy()
            if len(tids):
                p = np.minimum(np.searchsorted(tids, vv), len(tids) - 1)
                hit = tids[p] == vv
                lab[hit] = tlab[p[hit]]
            return pa.table({"vertex": vv, "label": lab})

        labels = verts.select_columns(["vertex"]).map_batches(
            assign, batch_format="pyarrow"
        ).materialize()
        # roots are exactly the rows with vertex == label (identity for
        # untouched vertices, min-id member for touched components)
        n_comp = 0
        for b in labels.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array(
                        [
                            int(
                                (
                                    t["vertex"].to_numpy(zero_copy_only=False)
                                    == t["label"].to_numpy(zero_copy_only=False)
                                ).sum()
                            )
                        ]
                        if len(t)
                        else [],
                        pa.int64(),
                    )
                },
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            n_comp += int(b["n"].to_numpy(zero_copy_only=False).sum())
    metrics.append(
        {"phase": "local_finish", "pairs": len(u), "wall_s": time.perf_counter() - t0}
    )
    return CCResult(labels, n_comp, rounds, metrics)


_EMPTY_LABELS = pa.table(
    {"vertex": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
)


CC_BROADCAST_MAX_PAIRS = 50_000_000  # same per-node state envelope as PageRank


def _sharded_finish(
    groups: list,
    rounds_so_far: int,
    metrics: list[dict[str, Any]],
    max_rounds: int,
    presorted: bool = False,
) -> CCResult:
    """Finish CC beyond the driver-broadcast gate: labels sharded in the
    object store (ONE state shard per owner GROUP — a key range of the
    exchange, holding one sub-block normally and several when a hub forced
    a sub-split), min-label supersteps as emit/apply task rounds, and
    sharded pointer jumping (``linkgraph.bsp`` sharded machinery) instead
    of the driver compress — nothing per-vertex ever reaches the driver,
    so the mode has no per-node state envelope, and no single task touches
    more than ``max_block_rows`` edge rows however hot a hub is.  Dataflow
    analogue of the reference's owner-computes MPI union-find exchange
    (``src/mpi/cc_mpi.c:2018-2341``) with the Shiloach-Vishkin shortcut
    (``src/cc_openmp.c:291-310``)."""
    import ray

    from linkgraph import bsp

    t0 = time.perf_counter()
    gvs = [bsp.group_vertices.options(num_returns=2).remote(*g) for g in groups]
    metas = ray.get([p[1] for p in gvs])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    gv_refs = [gvs[i][0] for i in keep]
    counts = [metas[i][0] for i in keep]
    firsts = np.asarray([metas[i][1] for i in keep], dtype=np.int64)
    num_v = int(sum(counts))
    k = len(gv_refs)
    if k == 0:
        empty = rd.from_arrow(
            pa.table({"vertex": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        )
        return CCResult(empty, 0, rounds_so_far, metrics)
    firsts_ref = ray.put(firsts)
    # per-sub-block emit indexes, each tagged with its owner group
    sub_owner: list[int] = []
    subs: list = []
    for gi, i in enumerate(keep):
        for b in groups[i]:
            sub_owner.append(gi)
            subs.append(
                bsp.sub_emit_prep.remote(
                    b, gvs[i][0], presorted, len(groups[i]) == 1
                )
            )
    labels = [bsp.init_labels.remote(g) for g in gv_refs]
    metrics.append(
        {"phase": "sharded_prep", "wall_s": time.perf_counter() - t0,
         "num_vertices": num_v, "num_groups": k, "num_subblocks": len(subs)}
    )

    def jump_until_stable(labels: list) -> tuple[list, int]:
        total = 0
        while True:
            reqs = [
                bsp.sharded_jump_request.options(num_returns=k + 1).remote(
                    labels[i], firsts_ref
                )
                for i in range(k)
            ]
            reply_sets = [
                bsp.sharded_jump_reply.options(num_returns=k).remote(
                    gv_refs[j], labels[j], *[reqs[i][j] for i in range(k)]
                )
                for j in range(k)
            ]
            if k == 1:
                reply_sets = [[r] for r in reply_sets]
            ups = [
                bsp.sharded_jump_update.remote(
                    labels[i], reqs[i][k], *[reply_sets[j][i] for j in range(k)]
                )
                for i in range(k)
            ]
            labels = [u[0] for u in ups]
            changed = int(sum(ray.get([u[1] for u in ups])))
            total += changed
            if changed == 0:
                return labels, total

    rounds = rounds_so_far
    for it in range(max(max_rounds, 1)):
        t1 = time.perf_counter()
        emits = [
            bsp.sharded_min_emit.options(num_returns=k).remote(
                subs[e], labels[sub_owner[e]], firsts_ref
            )
            for e in range(len(subs))
        ]
        if k == 1:
            emits = [[e] for e in emits]
        outs = [
            bsp.sharded_min_apply.remote(
                gv_refs[j], labels[j], *[emits[e][j] for e in range(len(subs))]
            )
            for j in range(k)
        ]
        labels = [o[0] for o in outs]
        changed = int(sum(ray.get([o[1] for o in outs])))
        labels, jumped = jump_until_stable(labels)
        rounds += 1
        metrics.append(
            {"phase": "sharded_superstep", "round": it, "changed": changed,
             "jumped": jumped, "wall_s": time.perf_counter() - t1,
             "mode": "sharded"}
        )
        if changed == 0 and jumped == 0:
            break
    else:
        raise RuntimeError(f"CC did not converge within {max_rounds} rounds")

    t2 = time.perf_counter()
    tables = [bsp.sharded_labels_table.remote(gv_refs[j], labels[j]) for j in range(k)]
    labels_ds = rd.from_arrow_refs(tables).materialize()
    num_components = int(
        sum(ray.get([bsp.sharded_root_count.remote(gv_refs[j], labels[j]) for j in range(k)]))
    )
    metrics.append({"phase": "labels", "wall_s": time.perf_counter() - t2})
    return CCResult(labels_ds, num_components, rounds, metrics)


def _broadcast_finish(
    edges_dst: rd.Dataset,
    rounds_so_far: int,
    metrics: list[dict[str, Any]],
    max_rounds: int,
    sorted_refs: list | None = None,
    ids: np.ndarray | None = None,
    deduped: bool = False,
) -> CCResult:
    """Finish CC on the dst-sorted symmetrized contracted pairs with
    broadcast supersteps.

    The contracted pairs are a union of per-block stars, so connectivity is
    shallow; min-label supersteps over a one-time positional index (raw Ray
    tasks, see ``linkgraph.bsp``) plus a driver-side pointer-jumping
    compress (the Shiloach-Vishkin shortcut phase, ref ``shortcut``
    ``src/cc_openmp.c:291-310``, run for free on the gathered label vector)
    converge in a handful of rounds.  This is the dataflow analogue of the
    reference's gather-everything ``MPI_Allgatherv`` variants
    (``src/mpi/cc_mpi.c:388-571``): the per-vertex label vector round-trips
    through the driver each superstep, so the mode is gated by the
    per-vertex state size (``CC_BROADCAST_MAX_PAIRS``, measured on the
    true vertex count); beyond the gate the star rounds run.

    Labels are carried as *positions* into the sorted vertex vector —
    position order equals id order, so positional min equals id min and the
    compress is pure ``lab[lab]`` with no searchsorted per round.
    """
    import ray

    from linkgraph import bsp

    t0 = time.perf_counter()
    if sorted_refs is None:
        sorted_refs = bsp.dataset_block_refs(edges_dst)
    if ids is None:
        ids = bsp.vertex_ids(sorted_refs)
    num_v = len(ids)
    # cross-block duplicate pairs are dropped in the index rewrite unless
    # the exchange merge already deduped (dedup_sort_src), in which case the
    # rewrite's dedup pass would be a pure no-op cost — skip it
    block_refs = bsp.positional_index(sorted_refs, ids, dedup=not deduped)
    metrics.append(
        {"phase": "bsp_index", "wall_s": time.perf_counter() - t0, "num_vertices": num_v}
    )

    lab = np.arange(num_v, dtype=np.int64)
    rounds = rounds_so_far
    for it in range(max(max_rounds, 1)):
        t1 = time.perf_counter()
        ref = ray.put(lab)
        futs = [bsp.segment_min_task.remote(b, ref) for b in block_refs]
        new = lab.copy()
        # per-block candidates are unique within a block; a sub-split hub
        # may repeat a dst across adjacent sub-blocks — the sequential
        # per-block indexed minimum combines those partials exactly
        for pos, c in ray.get(futs):
            new[pos] = np.minimum(new[pos], c)
        changed = int((new < lab).sum())
        while True:  # full pointer-jump compress on the driver
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        lab = new
        rounds += 1
        metrics.append(
            {
                "phase": "bsp_superstep",
                "round": it,
                "changed": changed,
                "wall_s": time.perf_counter() - t1,
                "mode": "broadcast",
            }
        )
        if changed == 0:
            break
    else:
        raise RuntimeError(f"CC did not converge within {max_rounds} rounds")

    t2 = time.perf_counter()
    final = ids[lab]
    chunk = 1 << 22
    tables = [
        pa.table({"vertex": ids[i : i + chunk], "label": final[i : i + chunk]})
        for i in range(0, max(num_v, 1), chunk)
    ]
    labels = rd.from_arrow(tables if len(tables) > 1 else tables[0]).materialize()
    num_components = int((lab == np.arange(num_v)).sum())
    metrics.append({"phase": "labels", "wall_s": time.perf_counter() - t2})
    return CCResult(labels, num_components, rounds, metrics)


_IDENTITY_SENTINEL = np.iinfo(np.int64).max


def _fill_identity_block(t: pa.Table) -> pa.Table:
    """Whole-block (vertex-keyed): per-vertex min label; vertices that only
    carry the sentinel (explicit-vertex rows with no computed label, i.e.
    isolated vertices) get their identity label."""
    if t.num_columns == 0 or len(t) == 0:
        return _EMPTY_LABELS
    v = t["vertex"].to_numpy(zero_copy_only=False)
    l = t["label"].to_numpy(zero_copy_only=False)
    order = np.lexsort((l, v))
    v, l = v[order], l[order]
    change = np.empty(len(v), dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    vids = v[starts]
    lab = l[starts]  # min per vertex = first row after the lexsort
    return pa.table({"vertex": vids, "label": np.where(lab == _IDENTITY_SENTINEL, vids, lab)})


def _attach_explicit_vertices(
    res: "CCResult",
    verts: rd.Dataset,
    n_touched: int,
    num_partitions: int,
    metrics: list[dict[str, Any]],
) -> "CCResult":
    """Extend a vertex-implicit CC result to an explicit vertex set with ONE
    vertex-keyed shuffle: sentinel-labeled vertex rows union with the
    computed labels, and a whole-block min fills isolated vertices with
    their identity label.  This replaces the O(log² V) star-round fallback
    for explicit vertex sets at scale (the flagship pages pipeline passes
    the url-id vertex table); component count grows by exactly the number
    of vertices no computed label reached."""
    t0 = time.perf_counter()
    tagged = verts.map_batches(
        lambda t: pa.table(
            {
                "vertex": t["vertex"],
                "label": np.full(len(t), _IDENTITY_SENTINEL, dtype=np.int64),
            }
        ),
        batch_format="pyarrow",
    )
    full = (
        res.labels.union(tagged)
        .repartition(num_partitions, keys=["vertex"])
        .map_batches(_fill_identity_block, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    n_isolated = full.count() - n_touched
    metrics.append(
        {"phase": "attach_vertices", "isolated": n_isolated,
         "wall_s": time.perf_counter() - t0}
    )
    return CCResult(
        full, res.num_components + n_isolated, res.num_iterations, metrics
    )


def _keep_lo(t: pa.Table) -> pa.Table:
    """Recover oriented pairs (src <= dst rows) from a symmetrized table.

    Normalizes to int64 — exchange blocks may be int32-compacted (bsp
    compact-output contract) and the recovered pairs feed the star path
    and checkpoint Parquet, whose schema must be stable across runs."""
    if t.num_columns == 0 or len(t) == 0:
        return _EMPTY_EDGES
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    keep = s <= d
    return pa.table(
        {
            "src": s[keep].astype(np.int64, copy=False),
            "dst": d[keep].astype(np.int64, copy=False),
        }
    )


def _strip_markers(t: pa.Table) -> pa.Table:
    """Drop self-loop marker rows (src == dst) before a star superstep."""
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    keep = s != d
    return pa.table({"src": s[keep], "dst": d[keep]})


def _only_markers(t: pa.Table) -> pa.Table:
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    keep = s == d
    return pa.table({"src": s[keep], "dst": d[keep]})


def connected_components(
    edges: rd.Dataset,
    *,
    vertices: rd.Dataset | None = None,
    num_partitions: int | None = None,
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
    max_rounds: int = 64,
    contract_batch_size: int | None = None,
    local_finish_threshold: int = 5_000_000,
    mode: str = "auto",
) -> CCResult:
    """Min-id component labels for an (arbitrary, possibly dirty) edge table.

    ``vertices`` — optional Dataset of all vertex ids (column ``vertex``,
    unique rows, covering every edge endpoint — the reference's "edges
    within [0, num_vertices)" contract, ``src/mtx_reader.c:144-193``);
    pass it when isolated vertices (no incident edges) must be labeled.
    Defaults to the vertices touched by ``edges``.

    ``local_finish_threshold`` — once the contracted pair set has at most
    this many rows it is pulled to the driver and finished with the local
    union-find (0 disables).  Distributed rounds at that size are pure
    fixed overhead; the default (~80 MB of pairs) stays well inside the
    same driver-memory envelope PageRank's broadcast mode uses — the
    dataflow analogue of the reference's gather-everything Allgatherv
    variants (``src/mpi/cc_mpi.c:388-571``).

    ``mode`` — ``"auto"`` finishes mid-size vertex sets (≤
    ``CC_BROADCAST_MAX_PAIRS``) with broadcast supersteps
    (``_broadcast_finish``) and, beyond the per-node state gate, with
    sharded supersteps (``_sharded_finish`` — labels sharded in the
    object store, no envelope); an explicit ``vertices`` set adds one
    vertex-keyed shuffle that attaches isolated vertices with identity
    labels.  ``"shuffle"`` forces the alternating star rounds;
    ``"broadcast"`` / ``"sharded"`` force those finishes regardless of
    size.  Broadcast/sharded modes checkpoint the contract phase only
    (supersteps re-run on resume — they are a small fraction of the
    contract cost); the star path keeps full per-superstep checkpoints.
    """
    from linkgraph.runtime import tune_context

    tune_context()
    num_partitions = num_partitions or G.default_partitions()
    ckpt = checkpointer or Checkpointer(None)
    verts = vertices  # None → identity rows come straight from the edges

    metrics: list[dict[str, Any]] = []
    start_round = 0
    pairs: rd.Dataset | None = None
    if resume and checkpointer is not None:
        latest = checkpointer.latest()
        if latest is not None:
            it, pairs, meta = latest
            start_round = it + 1
            metrics.append(meta)

    from linkgraph import bsp

    edges_dst: rd.Dataset | None = None
    if pairs is None and checkpointer is None:
        # FUSED prep: orientation, block dedup, contraction, one-pass
        # symmetrize and the single range exchange all run inside ONE
        # streaming execution — the contracted pairs are never separately
        # materialized or re-read.  Marker rows (x, x) ride through the
        # symmetrize as self-rows: harmless as superstep candidates
        # (label[x] min= label[x]) and they carry loop-only vertices into
        # the dst-derived vertex vector.  Gate decisions read free block
        # metadata off the sorted result (sym rows ≈ 2 × pairs).
        t0 = time.perf_counter()
        # no dedup anywhere in this chain: the block union-find tolerates
        # duplicate edges (same forest), its output is duplicate-free per
        # block by construction (each child appears once), and the fused
        # chain never mixes blocks — both block dedups were measured as
        # pure UDF cost (~7 s CPU per 2 M-row task, no rows dropped)
        # dedup_sort_src folds the cross-block pair dedup (contract dedups
        # only block-locally; 2× inflation observed at 64 M edges) and the
        # (dst, src) order into the exchange merge — downstream prep skips
        # its lexsort+dedup, and the exchange's unique-dst count IS the
        # vertex count, so the gate below needs no probe.  The default
        # (whole-read-block) path fuses orient+contract+symmetrize INTO the
        # exchange's sort/sample tasks, so the contracted pairs are never a
        # materialized intermediate; an explicit contract_batch_size keeps
        # the re-batched Dataset chain.
        if contract_batch_size is None:
            groups, n_rows, n_vert = bsp.raw_map_dst_exchange(
                edges, _contract_sym_batch, dedup_sort_src=True, grouped=True
            )
        else:
            lazy_pairs = contract(G.orient_lo_hi(edges), contract_batch_size)
            groups, n_rows, n_vert = bsp.raw_dst_exchange(
                G.symmetrize_block(lazy_pairs), dedup_sort_src=True, grouped=True
            )
        raw_refs = [b for g in groups for b in g]
        edges_dst = rd.from_arrow_refs(raw_refs)
        metrics.append(
            {"phase": "contract_sym_sort", "wall_s": time.perf_counter() - t0,
             "num_vertices": n_vert}
        )
        start_round = 1
        n_pairs = (n_rows + 1) // 2
    else:
        if pairs is None:
            t0 = time.perf_counter()
            # orientation only (the union-find tolerates duplicate edges) —
            # self-loops flow into contract, which converts them to (x, x)
            # marker rows so loop-only vertices stay in the vertex set
            # without a second scan of the input
            pairs = ckpt.save(
                0,
                contract(G.orient_lo_hi(edges), contract_batch_size),
                {"phase": "contract"},
            )
            metrics.append({"phase": "contract", "wall_s": time.perf_counter() - t0})
            start_round = 1
        # gate decisions need only the row count — free block metadata on
        # the materialized/persisted pairs; the content-hash fingerprint (an
        # extra execution) is deferred to the star path, the only consumer
        n_pairs = pairs.count()

    rounds = 0
    if mode != "shuffle" and 0 < n_pairs <= local_finish_threshold:
        # the symmetrized table is fine here: the driver union-find is
        # direction-independent and dedups ids itself
        return _local_finish(
            pairs if pairs is not None else edges_dst, rounds, metrics, verts
        )
    if 0 < n_pairs and mode != "shuffle":
        cc_gate = broadcast_gate_rows(16, CC_BROADCAST_MAX_PAIRS)
        if edges_dst is None and (
            mode in ("sharded", "broadcast") or n_pairs <= cc_gate
        ):
            # checkpointed path: the fused exchange didn't run; pay it now
            t0 = time.perf_counter()
            groups, _, n_vert = bsp.raw_dst_exchange(
                G.symmetrize_block(pairs), dedup_sort_src=True, grouped=True
            )
            edges_dst = rd.from_arrow_refs([b for g in groups for b in g])
            metrics.append(
                {"phase": "sym_sort", "wall_s": time.perf_counter() - t0,
                 "num_vertices": n_vert}
            )
        if edges_dst is not None:
            # the per-node broadcast envelope is the per-VERTEX state
            # vector; its exact size (the unique-dst count) fell out of the
            # exchange merge for free — no probe, and no id fetch until the
            # broadcast finish actually builds the vector
            if mode == "sharded" or (
                mode == "auto" and n_vert > cc_gate
            ):
                # beyond the per-node state envelope: sharded labels, no
                # driver round-trip (the star rounds remain only for
                # forced mode="shuffle")
                res = _sharded_finish(
                    groups, rounds, metrics, max_rounds, presorted=True
                )
            else:
                res = _broadcast_finish(
                    edges_dst, rounds, metrics, max_rounds, deduped=True
                )
            if verts is not None:
                # explicit vertex set: one vertex-keyed shuffle attaches
                # isolated vertices with identity labels
                res = _attach_explicit_vertices(
                    res, verts, n_vert, num_partitions, metrics
                )
            return res

    if pairs is None:
        # the fused prep landed on the star path (beyond-gate size, forced
        # shuffle mode, or explicit vertex set): recover the oriented pairs
        # — src <= dst keeps exactly the (root < child) rows plus the
        # (x, x) markers — with one cheap map over the sorted blocks
        t0 = time.perf_counter()
        pairs = edges_dst.map_batches(_keep_lo, batch_format="pyarrow").materialize()
        metrics.append({"phase": "unsym", "wall_s": time.perf_counter() - t0})

    if n_pairs == 0:
        n_clean = n_loops = 0
        prev_hash: int | None = None
        start_round = max_rounds = 0  # empty edge set
    else:
        n_clean, h0, n_loops = G.fingerprint_and_loops(pairs)
        prev_hash = h0  # multiset hash of ALL rows (markers included)
    prev_pairs = pairs
    for r in range(start_round, start_round + max_rounds):
        t0 = time.perf_counter()
        clean = pairs if n_loops == 0 else pairs.map_batches(
            _strip_markers, batch_format="pyarrow"
        )
        # keyed repartitions inside the stars also re-coalesce blocks each
        # round — without that, block fragmentation compounds per round and
        # shuffle overhead explodes (measured 2s → 160s/round by round 2)
        ls = G.dedup_block(large_star(clean, num_partitions))
        ss = G.dedup_block(small_star(ls, num_partitions))
        if n_loops:
            # marker rows ride along in every checkpoint (but not through
            # the stars) so resume + finalization keep loop-only vertices
            ss = ss.union(pairs.map_batches(_only_markers, batch_format="pyarrow"))
        pairs = ckpt.save(r, ss, {"phase": "star", "round": r})
        # convergence test, count-gated: row count is free block metadata on
        # the materialized/persisted pairs (markers are a constant multiset,
        # so n_loops never changes); the content hash — an extra execution —
        # runs only in rounds where the count stopped changing.  The hash
        # compare is over ALL rows, the same order-independent multiset
        # fingerprint as before (ref Allreduce changed-flag,
        # ``src/mpi/cc_mpi.c:518-525``).
        n_clean_new = pairs.count() - n_loops
        converged = False
        if n_clean_new == n_clean:
            if prev_hash is None:
                _, prev_hash = G.fingerprint(prev_pairs)
            _, h = G.fingerprint(pairs)
            converged = h == prev_hash
            prev_hash = h
        else:
            prev_hash = None
        n_clean = n_clean_new
        prev_pairs = pairs
        rounds += 1
        m = {
            "phase": "star",
            "round": r,
            "pairs": n_clean + n_loops,
            "wall_s": time.perf_counter() - t0,
            "changed": int(not converged),
        }
        metrics.append(m)
        if converged:
            break
        if mode != "shuffle" and 0 < n_clean + n_loops <= local_finish_threshold:
            return _local_finish(pairs, rounds, metrics, verts)
    else:
        if max_rounds > 0:
            raise RuntimeError(f"CC did not converge within {max_rounds} rounds")

    # Finalization. At the star fixed point every component is a single
    # star of (root, child) rows with each child appearing exactly once
    # globally (Kiveris et al.), so child labels need NO shuffle — only the
    # root identity rows (duplicated across blocks) and self-loop markers
    # (possibly shadowed by a real pair elsewhere) go through a small
    # per-vertex min shuffle.
    t0 = time.perf_counter()
    children = pairs.map_batches(
        lambda t: pa.table({"vertex": t["dst"], "label": t["src"]})
        if len(t)
        else _EMPTY_LABELS,
        batch_format="pyarrow",
    )
    if verts is not None:
        identity = verts.map_batches(
            lambda t: pa.table({"vertex": t["vertex"], "label": t["vertex"]}),
            batch_format="pyarrow",
        )
    else:

        def root_identity(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            v = np.unique(s)
            return pa.table({"vertex": v, "label": v})

        identity = pairs.map_batches(root_identity, batch_format="pyarrow")

    def label_min_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _EMPTY_LABELS
        v = t["vertex"].to_numpy(zero_copy_only=False)
        l = t["label"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, l = v[order], l[order]
        starts, _ = _segments(v)
        return pa.table(
            {"vertex": v[starts], "label": np.minimum.reduceat(l, starts)}
        )

    if verts is None and n_loops == 0:
        # fast path: children rows are already one-per-vertex and disjoint
        # from roots; only the root identities (≤ blocks × roots rows) and
        # any marker rows go through the exchange
        resolved = (
            identity.sort("vertex")
            .map_batches(label_min_block, batch_format="pyarrow", batch_size=None)
        )
        labels = children.union(resolved).materialize()
    else:
        # markers / explicit vertex set can collide with child rows — one
        # per-vertex min exchange over ~V rows resolves every duplicate
        labels = (
            children.union(identity)
            .sort("vertex")
            .map_batches(label_min_block, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
    metrics.append({"phase": "labels", "wall_s": time.perf_counter() - t0})

    # roots are exactly the rows with vertex == label → component count
    # needs no distinct-label shuffle (ref ``count_unique_labels`` semantics)
    t0 = time.perf_counter()

    def root_count(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        v = t["vertex"].to_numpy(zero_copy_only=False)
        l = t["label"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int((v == l).sum())], pa.int64())})

    partials = labels.map_batches(root_count, batch_format="pyarrow").take_all()
    num_components = int(sum(r["n"] for r in partials))
    metrics.append({"phase": "count", "wall_s": time.perf_counter() - t0})
    return CCResult(labels, num_components, rounds, metrics)


def count_components(labels: rd.Dataset, num_partitions: int | None = None) -> int:
    """Distinct-label count (ref ``count_unique_labels``, ``src/cc_common.c:7-38``).

    Block-local unique (combiner) → range exchange by label (equal labels
    co-locate) → per-block unique counts, summed — the partial/final
    distinct the reference's thread-local hash sets implement
    (``src/cc_openmp.c:498-537``).
    """

    def uniq(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"label": pa.array([], pa.int64())})
        return pa.table(
            {"label": np.unique(t["label"].to_numpy(zero_copy_only=False))}
        )

    def count_uniq(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        lab = t["label"].to_numpy(zero_copy_only=False)  # pre-sorted
        n = 1 + int((lab[1:] != lab[:-1]).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    parted = (
        labels.select_columns(["label"])
        .map_batches(uniq, batch_format="pyarrow")
        .sort("label")
    )
    partials = parted.map_batches(
        count_uniq, batch_format="pyarrow", batch_size=None
    ).take_all()
    return int(sum(r["n"] for r in partials))


def sample_frequent_label(
    labels: rd.Dataset,
    n_samples: int = 1024,
    seed: int = 17,
    num_partitions: int | None = None,
) -> tuple[int, float]:
    """Estimate the most frequent label (the giant component) from a random
    sample — ref ``sample_frequent_element`` (``src/cc_openmp.c:422-496``),
    which Afforest uses to find and skip the giant component.  Seeded, unlike
    the reference's ``rand_r(time)`` (determinism requirement, SURVEY §4).

    Returns (label, estimated_frequency)."""
    total = labels.count()
    if total == 0:
        return -1, 0.0
    frac = min(1.0, n_samples / total)
    top = (
        labels.random_sample(frac, seed=seed)
        .groupby("label", num_partitions=num_partitions)
        .aggregate(Count(alias_name="n"))
        .sort(["n", "label"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    if not top:
        return -1, 0.0
    sampled = max(1, round(frac * total))
    return int(top[0]["label"]), float(top[0]["n"]) / sampled


def component_stats(
    labels: rd.Dataset, num_partitions: int | None = None
) -> tuple[rd.Dataset, dict[str, float]]:
    """Component size histogram + min/max/avg summary
    (ref ``print_component_stats``, ``src/cc_common.c:40-94``)."""
    sizes = (
        labels.groupby("label", num_partitions=num_partitions)
        .aggregate(Count(alias_name="size"))
    )
    sizes = sizes.materialize()
    summary_row = sizes.aggregate(
        Min("size", alias_name="min_size"),
        Max("size", alias_name="max_size"),
        Mean("size", alias_name="avg_size"),
        Count(alias_name="num_components"),
    )
    return sizes, {k: float(v) for k, v in summary_row.items()}


def labels_equivalent(
    a: rd.Dataset, b: rd.Dataset, num_partitions: int | None = None
) -> bool:
    """True iff two ``(vertex, label)`` tables induce the SAME partition of
    the same vertex set, even when the label VALUES differ — the engine's
    version of the reference benchmark drivers' "Labels differ but produce
    same components (VALID)" cross-check
    (``benchmarks/benchmark_openmp.c:105-135``).

    Fully distributed: one vertex-keyed join plus three distinct counts
    (the label pairing is a bijection ⟺ #distinct(la) == #distinct(lb) ==
    #distinct(la, lb)); the label tables never materialize on the driver.
    """
    from ray.data.aggregate import Count

    from linkgraph import graph as G
    from linkgraph.partition import bucket_join

    num_partitions = num_partitions or G.default_partitions()
    na = a.count()
    if na != b.count():
        return False
    joined = bucket_join(
        a.map_batches(
            lambda t: pa.table({"vertex": t["vertex"], "la": t["label"]}),
            batch_format="pyarrow",
        ),
        b.map_batches(
            lambda t: pa.table({"vertex": t["vertex"], "lb": t["label"]}),
            batch_format="pyarrow",
        ),
        ["vertex"],
        num_buckets=num_partitions,
        left_payload={"la": pa.int64()},
        right_payload={"lb": pa.int64()},
    ).materialize()
    if joined.count() != na:
        return False  # vertex sets differ

    def n_distinct(ds: rd.Dataset, keys: list[str]) -> int:
        return (
            ds.groupby(keys, num_partitions=num_partitions)
            .aggregate(Count(alias_name="_n"))
            .count()
        )

    d_pairs = n_distinct(joined, ["la", "lb"])
    return d_pairs == n_distinct(joined, ["la"]) == n_distinct(joined, ["lb"])
