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
import ray.data as rd
from ray.data.aggregate import Min, Sum

from linkgraph import graph as G
from linkgraph.cc import CCResult, count_components
from linkgraph.checkpoint import Checkpointer
from linkgraph.partition import bucket_join

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


def label_propagation(
    edges: rd.Dataset,
    *,
    vertices: rd.Dataset | None = None,
    num_partitions: int | None = None,
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
    frontier: bool = True,
    max_iters: int = 1000,
) -> CCResult:
    """Min-id component labels via synchronous min-label supersteps.

    Same fixed point as ``cc.connected_components`` (tested); iteration cap
    mirrors the reference's 1000-iteration safety
    (``src/pthreads/cc_pthreads.c:132-133``).
    """
    from linkgraph.runtime import tune_context

    tune_context()
    num_partitions = num_partitions or G.default_partitions()
    ckpt = checkpointer or Checkpointer(None)

    sym = G.symmetrize(G.canonicalize(edges)).materialize()  # reused every superstep
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
