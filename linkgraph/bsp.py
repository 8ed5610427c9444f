"""Shared broadcast-superstep machinery for the iterative graph kernels.

The pattern (used by label propagation, PageRank and connected components'
broadcast modes): symmetrized edges are range-exchanged once by ``dst``
(equal dst values co-locate and arrive pre-sorted), rewritten once into a
positional index (``i_src``/``i_dst`` int32 positions into the sorted vertex
vector), and then every superstep is a fan-out of **raw Ray tasks** over the
materialized index blocks — the per-vertex state vector round-trips through
the driver each superstep exactly like the reference's gather-everything
``MPI_Allgatherv`` variants (``src/mpi/cc_mpi.c:388-571``), while a Ray Data
streaming execution would pay ~2 s of executor/aggregator startup for
milliseconds of work per superstep.

Because the exchange is by ``dst``, blocks have **disjoint dst sets**: each
task's per-dst output rows never overlap another task's, so the driver merge
is plain vectorized indexed assignment (no ``np.minimum.at``, no sort).

On a multi-node cluster the broadcast is one object-store copy per node
(``ray.put`` once per superstep, zero-copy reads within a node); the mode is
gated by vertex count (state must fit one node's heap) with the shuffle
dataflow path as the beyond-gate fallback in every kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def dst_sorted(sym_edges: rd.Dataset) -> rd.Dataset:
    """One range exchange by ``dst``; materialized so the id extraction and
    index build both read the same blocks without re-execution."""
    return sym_edges.sort("dst").materialize()


def vertex_ids(
    edges_dst: rd.Dataset, extra: list[np.ndarray] | None = None
) -> np.ndarray:
    """Sorted vertex-id vector from dst-sorted symmetrized edges.

    Post-symmetrize the dst set IS the vertex set, and dst-partitioned
    blocks have disjoint dst sets — per-block uniques concatenate to the
    exact global set with no further dedup.
    """

    def uniq_dst(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"vertex": pa.array([], pa.int64())})
        return pa.table(
            {"vertex": np.unique(t["dst"].to_numpy(zero_copy_only=False))}
        )

    parts = [
        b["vertex"].to_numpy(zero_copy_only=False)
        for b in edges_dst.map_batches(
            uniq_dst, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_size=1 << 22, batch_format="pyarrow")
    ]
    ids = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    if extra:
        ids = np.unique(np.concatenate([ids] + list(extra)))
    return ids


def positional_index(edges_dst: rd.Dataset, ids: np.ndarray) -> rd.Dataset:
    """(src, dst) → (i_src, i_dst) int32/int64 positions into ``ids``.

    One-time rewrite so supersteps are a pure gather + segment-min with no
    per-superstep ``searchsorted`` and no re-broadcast of the id vector;
    ``i_dst`` stays pre-sorted (row order is preserved)."""
    use32 = len(ids) <= np.iinfo(np.int32).max
    idx_t = pa.int32() if use32 else pa.int64()
    empty_idx = pa.table(
        {"i_src": pa.array([], idx_t), "i_dst": pa.array([], idx_t)}
    )
    ref_ids = ray.put(ids)

    def index_block(
        t: pa.Table, ref=ref_ids, empty=empty_idx, use32=use32
    ) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return empty
        ids_ = ray.get(ref)
        dt = np.int32 if use32 else np.int64
        return pa.table(
            {
                "i_src": np.searchsorted(
                    ids_, t["src"].to_numpy(zero_copy_only=False)
                ).astype(dt),
                "i_dst": np.searchsorted(
                    ids_, t["dst"].to_numpy(zero_copy_only=False)
                ).astype(dt),
            }
        )

    return edges_dst.map_batches(
        index_block, batch_format="pyarrow", batch_size=None
    ).materialize()


def index_block_refs(index: rd.Dataset) -> list:
    """Raw object refs of the materialized index blocks (superstep inputs)."""
    return [
        bref
        for bundle in index.iter_internal_ref_bundles()
        for bref in bundle.block_refs
    ]


@ray.remote(num_cpus=1)
def segment_min_task(block, state: np.ndarray):
    """One dst-disjoint index block × per-vertex state vector →
    (dst positions, per-dst min of gathered src state).

    ``block`` is the materialized Arrow index table (zero-copy read);
    ``i_dst`` arrives pre-sorted from the one range exchange, so the
    segment boundaries are a single vectorized diff."""
    if block.num_columns == 0 or len(block) == 0:
        return np.empty(0, np.int64), np.empty(0, state.dtype)
    i_s = block["i_src"].to_numpy(zero_copy_only=False)
    i_d = block["i_dst"].to_numpy(zero_copy_only=False)
    c = state[i_s]
    change = np.empty(len(i_d), dtype=bool)
    change[0] = True
    np.not_equal(i_d[1:], i_d[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    return i_d[starts].astype(np.int64), np.minimum.reduceat(c, starts)
