"""Min-label propagation as iterative groupby supersteps.

Re-expresses the reference's synchronous label propagation
(``label_propagation_sync_omp``, ``src/cc_openmp.c:38-142``;
``mpi_label_propagation``, ``src/mpi/cc_mpi.c:388-571``): every superstep
each vertex takes the minimum label over itself and its neighbors, until no
label changes.  The per-superstep "neighbor-label gather" (edge ⋈ vertex
state) is a bucketed hash join; the min-reduce is one
``groupby(vertex).aggregate(Min)``; the convergence test is a changed-count
aggregate — the dataflow analogue of ``reduction(||:changed)`` /
``MPI_Allreduce(MPI_LOR)`` (``src/cc_openmp.c:92-94``,
``src/mpi/cc_mpi.c:518-525``).

**Frontier filtering** (``frontier=True``): only vertices whose label changed
last superstep push candidates — the dataflow version of the reference's
queue-based ``label_propagation_min`` frontier (``src/cc_sequential.c:130-153``).
Identical fixed point; far fewer shuffled rows once the graph settles.

Converges in O(diameter) supersteps — prefer ``cc.connected_components``
(O(log^2 V) star supersteps) for high-diameter graphs; this kernel is a
deliverable in its own right per the north rule and shares its checkpoint
machinery.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min, Sum

from linkgraph import bsp
from linkgraph import graph as G
from linkgraph.cc import CCResult, count_components
from linkgraph.checkpoint import Checkpointer
from linkgraph.partition import bucket_join
from linkgraph.runtime import broadcast_gate_rows

_INF = np.iinfo(np.int64).max


def _init_state(verts: rd.Dataset) -> rd.Dataset:
    """labels[i] = i, everything active (ref ``src/cc_sequential.c:65-69``)."""

    def fn(t: pa.Table) -> pa.Table:
        v = t["vertex"]
        return pa.table(
            {
                "vertex": v,
                "label": v,
                "changed": pa.array(np.ones(len(t), dtype=np.int8)),
            }
        )

    return verts.map_batches(fn, batch_format="pyarrow")


BROADCAST_MAX_VERTICES = 50_000_000


def label_propagation(
    edges: rd.Dataset,
    *,
    vertices: rd.Dataset | None = None,
    num_partitions: int | None = None,
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
    frontier: bool = True,
    max_iters: int = 1000,
    mode: str = "auto",
) -> CCResult:
    """Min-id component labels via synchronous min-label supersteps.

    Same fixed point as ``cc.connected_components`` (tested); iteration cap
    mirrors the reference's 1000-iteration safety
    (``src/pthreads/cc_pthreads.c:132-133``).

    ``mode="broadcast"`` (auto below 50M vertices) is the Allgatherv
    analogue: the label vector is broadcast per superstep, dst-partitioned
    edge blocks emit disjoint per-dst min candidates in ONE distributed
    pass, and the driver applies the min + changed-count.  Beyond the gate
    auto uses ``"sharded"`` (labels sharded in the object store, one
    emit/apply task round per superstep, identical sweep semantics, no
    state envelope) when there is no explicit vertex set — checkpoints
    there are per-shard raw-task Parquet writes (resumable across modes);
    ``"shuffle"`` keeps all vertex state distributed as dataflow (join +
    min-reduce per superstep) and retains explicit-vertex support.
    """
    from linkgraph.runtime import tune_context

    tune_context()
    num_partitions = num_partitions or G.default_partitions()
    ckpt = checkpointer or Checkpointer(None)

    if mode == "sharded":
        out = _labelprop_sharded(
            edges, max_iters, checkpointer=checkpointer, resume=resume
        )
        if vertices is not None:
            from linkgraph.cc import _attach_explicit_vertices

            n_touched = next(
                m["num_vertices"] for m in out.metrics
                if m.get("phase") == "sharded_prep"
            )
            out = _attach_explicit_vertices(
                out, vertices, n_touched, num_partitions, out.metrics
            )
        return out
    if mode in ("auto", "broadcast"):
        res = _labelprop_broadcast(
            edges, vertices, num_partitions, checkpointer, ckpt, resume,
            max_iters, strict=(mode == "broadcast"),
        )
        if isinstance(res, CCResult):
            return res
        if res is not None:
            # beyond the broadcast gate: reuse the already-paid exchange
            # (res = its owner groups of sorted block refs) for the sharded
            # supersteps; an explicit vertex set attaches isolated vertices
            # afterwards with one vertex-keyed shuffle (identity labels)
            out = _labelprop_sharded(
                edges, max_iters, groups=res,
                checkpointer=checkpointer, resume=resume,
            )
            if vertices is not None:
                from linkgraph.cc import _attach_explicit_vertices

                n_touched = next(
                    m["num_vertices"] for m in out.metrics
                    if m.get("phase") == "sharded_prep"
                )
                out = _attach_explicit_vertices(
                    out, vertices, n_touched, num_partitions, out.metrics
                )
            return out
    elif mode != "shuffle":
        raise ValueError(f"unknown mode {mode!r}")

    # one-pass symmetrize (the union form would scan the lazy canonicalize
    # chain twice); materialized because every superstep reuses it
    sym = G.symmetrize_block(G.canonicalize(edges)).materialize()
    verts = vertices if vertices is not None else G.vertices_of(sym, num_partitions)

    metrics: list[dict[str, Any]] = []
    state: rd.Dataset | None = None
    start = 0
    if resume and checkpointer is not None:
        latest = checkpointer.latest()
        if latest is not None:
            it, state, meta = latest
            start = it + 1
            metrics.append(meta)
    if state is None:
        state = ckpt.save(0, _init_state(verts), {"phase": "init"})
        start = 1

    iters = 0
    for it in range(start, start + max_iters):
        t0 = time.perf_counter()
        active = state
        if frontier:
            active = state.map_batches(
                lambda t: t.filter(pa.compute.equal(t["changed"], 1)),
                batch_format="pyarrow",
            )
        # neighbor-label gather: (src,dst) ⋈ labels-on-src → candidate for dst
        cand = bucket_join(
            sym,
            active.map_batches(
                lambda t: pa.table({"src": t["vertex"], "label": t["label"]}),
                batch_format="pyarrow",
            ),
            ["src"],
            num_buckets=num_partitions,
            left_payload={"dst": pa.int64()},
            right_payload={"label": pa.int64()},
        ).map_batches(
            lambda t: pa.table(
                {
                    "vertex": t["dst"],
                    "label": t["label"],
                    "old": pa.array(np.full(len(t), _INF, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        own = state.map_batches(
            lambda t: pa.table(
                {"vertex": t["vertex"], "label": t["label"], "old": t["label"]}
            ),
            batch_format="pyarrow",
        )
        reduced = (
            cand.union(own)
            .groupby("vertex", num_partitions=num_partitions)
            .aggregate(Min("label", alias_name="label"), Min("old", alias_name="old"))
        )

        def finish(t: pa.Table) -> pa.Table:
            lab = t["label"].to_numpy(zero_copy_only=False)
            old = t["old"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "vertex": t["vertex"],
                    "label": t["label"],
                    "changed": pa.array((lab < old).astype(np.int8)),
                }
            )

        state = ckpt.save(it, reduced.map_batches(finish, batch_format="pyarrow"),
                          {"phase": "superstep", "iteration": it})
        changed = state.aggregate(Sum("changed", alias_name="c"))["c"] or 0
        iters += 1
        metrics.append(
            {
                "iteration": it,
                "changed": int(changed),
                "wall_s": time.perf_counter() - t0,
            }
        )
        if changed == 0:
            break
    else:
        raise RuntimeError(f"label propagation exceeded {max_iters} supersteps")

    labels = state.select_columns(["vertex", "label"]).materialize()
    return CCResult(labels, count_components(labels, num_partitions), iters, metrics)


def _label_state_ds(ids: np.ndarray, labels: np.ndarray, changed: np.ndarray) -> rd.Dataset:
    """Driver vectors → (vertex, label, changed) Dataset in ~4M-row chunks."""
    chunk = 1 << 22
    tables = [
        pa.table(
            {
                "vertex": ids[i : i + chunk],
                "label": labels[i : i + chunk],
                "changed": changed[i : i + chunk].astype(np.int8),
            }
        )
        for i in range(0, max(len(ids), 1), chunk)
    ]
    return rd.from_arrow(tables if len(tables) > 1 else tables[0])


@ray.remote(num_cpus=1)
def _sharded_state_table(gv, labels: np.ndarray) -> pa.Table:
    """(vertex, label, changed=1) checkpoint shard — the conservative
    all-active ``changed`` keeps a frontier-mode dataflow resume correct."""
    return pa.table(
        {
            "vertex": gv[0],
            "label": labels,
            "changed": np.ones(len(labels), dtype=np.int8),
        }
    )


def _labelprop_sharded(
    edges,
    max_iters: int,
    groups: list | None = None,
    checkpointer: Checkpointer | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> CCResult:
    """Beyond-gate label propagation: labels sharded in the object store
    (one state shard per owner GROUP — a key range of the exchange; hub
    sub-splits add bounded sub-blocks to a group without replicating any
    vertex), one emit/apply task round per superstep (``linkgraph.bsp``
    sharded machinery) — identical synchronous sweep semantics to
    broadcast mode (same iteration counts), no per-node state envelope,
    and nothing per-vertex on the driver.  No pointer jumping: LP reports
    iterations-to-convergence of the plain sweep (ref
    ``src/mpi/cc_mpi.c:388-571`` semantics).  Checkpoints are per-shard
    raw-task Parquet writes; resume re-runs the deterministic prep and
    re-matches state by vertex id."""
    import ray

    t0 = time.perf_counter()
    if groups is None:
        groups, _, _ = bsp.raw_map_dst_exchange(
            edges, G.sym_prep_batch, dedup_sort_src=True, grouped=True
        )
    gvs = [bsp.group_vertices.options(num_returns=2).remote(*g) for g in groups]
    metas = ray.get([p[1] for p in gvs])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    gv_refs = [gvs[i][0] for i in keep]
    firsts = np.asarray([metas[i][1] for i in keep], dtype=np.int64)
    num_v = int(sum(metas[i][0] for i in keep))
    k = len(gv_refs)
    # both producers (here and _labelprop_broadcast) dedup+sort in the
    # exchange merge, so the sub-preps skip their lexsort+dedup
    sub_owner: list[int] = []
    subs: list = []
    for gi, i in enumerate(keep):
        for b in groups[i]:
            sub_owner.append(gi)
            subs.append(
                bsp.sub_emit_prep.remote(b, gvs[i][0], True, len(groups[i]) == 1)
            )
    metrics: list[dict[str, Any]] = [
        {"phase": "sharded_prep", "wall_s": time.perf_counter() - t0,
         "num_vertices": num_v, "num_groups": k, "num_subblocks": len(subs)}
    ]
    if k == 0:
        empty = rd.from_arrow(
            pa.table({"vertex": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        )
        return CCResult(empty, 0, 0, metrics)
    firsts_ref = ray.put(firsts)
    start = 1
    labels = None
    if resume and checkpointer is not None:
        latest = checkpointer.load_shards(gv_refs, firsts, "label", default=None)
        if latest is not None:
            last_it, labels, meta = latest
            start = last_it + 1
            metrics.append(meta)
    if labels is None:
        labels = [bsp.init_labels.remote(g) for g in gv_refs]

    iters = 0
    for it in range(start, start + max_iters):
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
        iters += 1
        metrics.append(
            {"phase": "superstep", "iteration": it, "changed": changed,
             "mode": "sharded", "wall_s": time.perf_counter() - t1}
        )
        if checkpointer is not None and (changed == 0 or it % checkpoint_every == 0):
            checkpointer.save_shards(
                it,
                [_sharded_state_table.remote(gv_refs[j], labels[j]) for j in range(k)],
                {"iteration": it, "changed": changed, "mode": "sharded",
                 "num_vertices": num_v},
            )
        if changed == 0:
            break
    else:
        raise RuntimeError(f"label propagation exceeded {max_iters} supersteps")

    tables = [bsp.sharded_labels_table.remote(gv_refs[j], labels[j]) for j in range(k)]
    labels_ds = rd.from_arrow_refs(tables).materialize()
    n_comp = int(
        sum(ray.get([bsp.sharded_root_count.remote(gv_refs[j], labels[j]) for j in range(k)]))
    )
    return CCResult(labels_ds, n_comp, iters, metrics)


def _labelprop_broadcast(
    edges, vertices, num_partitions, checkpointer, ckpt, resume, max_iters, strict
):
    """One distributed pass per superstep: broadcast the label vector,
    dst-partitioned edge blocks emit disjoint per-dst min candidates,
    driver applies the min + changed count (``MPI_Allgatherv`` analogue,
    ref ``src/mpi/cc_mpi.c:388-571``).  When the vertex set exceeds
    ``BROADCAST_MAX_VERTICES`` and not strict, returns the sorted block
    refs instead of a result so the caller can reuse the already-paid
    exchange for the sharded path (or fall through to shuffle)."""
    import ray

    # fused exchange: self-loop drop + orientation + one-pass symmetrize
    # run inside the exchange's sort/sample tasks, the global dedup and the
    # (dst, src) order fold into its merges, equal dst values co-locate
    # pre-sorted (per-block candidate minima are global, emit needs no
    # re-sort), and the merge's unique-dst count is the exact vertex count
    # — the beyond-gate bail-out costs no id fetch (explicit vertices can
    # only grow the set).
    groups, _n_rows, n_vert = bsp.raw_map_dst_exchange(
        edges, G.sym_prep_batch, dedup_sort_src=True, grouped=True
    )
    lp_gate = broadcast_gate_rows(16, BROADCAST_MAX_VERTICES)
    if n_vert > lp_gate and not strict:
        return groups
    sorted_refs = [b for g in groups for b in g]
    extra = (
        [
            b["vertex"].to_numpy(zero_copy_only=False)
            for b in vertices.iter_batches(
                batch_size=1 << 22, batch_format="pyarrow"
            )
        ]
        if vertices is not None
        else None
    )
    ids = bsp.vertex_ids(sorted_refs, extra)
    num_v = len(ids)
    if num_v > lp_gate and not strict:
        return groups

    labels = ids.copy()
    metrics: list[dict[str, Any]] = []
    start = 1
    if resume and checkpointer is not None:
        latest = checkpointer.latest()
        if latest is not None:
            it, state, meta = latest
            vs, ls = [], []
            for b in state.select_columns(["vertex", "label"]).iter_batches(
                batch_size=1 << 22, batch_format="pyarrow"
            ):
                vs.append(b["vertex"].to_numpy(zero_copy_only=False))
                ls.append(b["label"].to_numpy(zero_copy_only=False))
            if vs:
                v, l = np.concatenate(vs), np.concatenate(ls)
                labels[np.searchsorted(ids, v)] = l
            start = it + 1
            metrics.append(meta)

    # one-time positional index + raw-task supersteps (see linkgraph.bsp:
    # the label vector round-trips through the driver every superstep
    # anyway, and a Ray Data execution costs ~2 s of executor startup for
    # ms of work); blocks are dst-disjoint, so candidates never overlap.
    # dedup=False: the exchange merge already deduped globally
    block_refs = bsp.positional_index(sorted_refs, ids, dedup=False)

    iters = 0
    for it in range(start, start + max_iters):
        t0 = time.perf_counter()
        ref = ray.put(labels)
        futs = [bsp.segment_min_task.remote(b, ref) for b in block_refs]
        new_labels = labels.copy()
        # per-block candidates are unique within a block (plain vectorized
        # minimum beats np.minimum.at ~10x); a sub-split hub may repeat a
        # dst across sub-blocks — the sequential per-block min is exact
        for pos, c in ray.get(futs):
            new_labels[pos] = np.minimum(new_labels[pos], c)
        changed_mask = new_labels < labels
        changed = int(changed_mask.sum())
        labels = new_labels
        iters += 1
        meta = {
            "iteration": it,
            "changed": changed,
            "wall_s": time.perf_counter() - t0,
            "mode": "broadcast",
        }
        metrics.append(meta)
        if checkpointer is not None:
            ckpt.save(
                it,
                _label_state_ds(ids, labels, changed_mask),
                {"phase": "superstep", "iteration": it, "changed": changed},
            )
        if changed == 0:
            break
    else:
        raise RuntimeError(f"label propagation exceeded {max_iters} supersteps")

    out = _label_state_ds(ids, labels, np.zeros(len(ids), dtype=bool))
    labels_ds = out.select_columns(["vertex", "label"]).materialize()
    return CCResult(labels_ds, int(len(np.unique(labels))), iters, metrics)
