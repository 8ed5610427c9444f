"""Shared broadcast-superstep machinery for the iterative graph kernels.

The pattern (used by label propagation, PageRank and connected components'
broadcast modes): symmetrized edges are range-exchanged once by ``dst``
(equal dst values co-locate and arrive pre-sorted), rewritten once into a
positional index (``i_src``/``i_dst`` int32 positions into the sorted vertex
vector), and then every superstep is a fan-out of **raw Ray tasks** over the
index blocks — the per-vertex state vector round-trips through the driver
each superstep exactly like the reference's gather-everything
``MPI_Allgatherv`` variants (``src/mpi/cc_mpi.c:388-571``), while a Ray Data
streaming execution would pay ~2 s of executor/aggregator startup for
milliseconds of work per superstep.

For the same reason the *prep* stages after the one sort exchange are raw
tasks too: vertex-id extraction and the positional-index rewrite each cost
milliseconds of numpy per block, so running them as Ray Data executions
would be pure fixed overhead.  Only the sort itself (the single all-to-all)
is a Dataset operation; everything downstream fans out over its block refs
and the index tables live in the object store as task returns.

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


# ---------------------------------------------------------------------------
# raw-task range exchange (replaces Dataset.sort on the kernel hot paths)
#
# Measured on the 107 M-row CC prep at 32 CPUs: Ray's Sort operator spends
# ~3.4 s/block in SortMap on blocks polars sorts in ~0.2 s — the overhead is
# operator machinery, not sorting.  The raw version samples boundaries, range-
# splits each block (one ``num_returns=K`` task per block) and merges per
# range; same-session A/B: 17–19 s vs 23 s for the fused Dataset.sort chain.
#
# PARTITIONING CONTRACT (everything downstream relies on it): output tables
# are sorted by ``dst`` within each table, ranges are disjoint and ascending
# across tables, and ALL rows of an equal dst value land in one table
# (boundaries split with one consistent ``searchsorted`` side).
#
# HUB SKEW: the equal-dst-in-one-table rule concentrates a celebrity
# vertex's whole in-incidence list in one merge/owner range.  Boundary
# sampling adapts everywhere else (ranges equalize by row count), so the
# worst case is ONE range ≈ max in-degree rows.  Ranges whose SAMPLED row
# estimate exceeds ``max_block_rows`` are split BEFORE the merge: composite
# ``(dst, src)`` sub-bounds drawn from the same samples cut inside the hot
# dst run, each per-block chunk is sub-split at those cuts (one extra hop
# for the hot range's data only), and each sub-range merges independently —
# so no single merge task ever concat+sorts more than ~``max_block_rows``
# rows (reference intent: the giant-component special case,
# ``src/cc_openmp.c:596-613``).  Because the cuts are exact (dst, src)
# values with a consistent searchsorted side, full-row duplicates never
# straddle a cut (global dedup is preserved) and the concatenated
# sub-merges are fully (dst, src)-sorted — byte-identical semantics to the
# old sort-then-slice, without the unbounded sort.  The post-merge slicer
# remains as a backstop for moderate sampling-error overflows.  Per-vertex
# state keeps a single owner: ownership stays at the RANGE ("owner group")
# level — one state shard per group, many bounded sub-blocks per group —
# so the emit-side routing by owner range is unchanged and no vertex is
# ever replicated.  Consumers reduce per dst within each sub-block and
# COMBINE per-dst partials at the owner (min for labels, add for rank
# mass), which is exact because both reductions are associative.  The
# emit side was already hub-safe (emits split by owner range and
# pre-combine per target, so an owner receives ≤ #sub-blocks pre-reduced
# partials per superstep).
#
# COMPACT OUTPUT: exchange output blocks keep the hop-1 int32 compaction
# (a range whose ids fit int32 stays int32; ranges straddling 2^31 stay
# int64; a graph can mix both across ranges).  This halves the exchange's
# LARGEST transfer — the merge output is written once and read by two prep
# consumers — and removes the old int64 re-cast pass in the merge.
# Consumer contract: treat block column dtypes as opaque numpy (all the
# kernels' per-block math is dtype-generic) and normalize to int64 at the
# OUTPUT boundary — small arrays only: group vids, emit targets, the
# vertex-id vector, recovered pair tables, final label/rank tables.
# ---------------------------------------------------------------------------

# Default sub-split threshold: 64 M rows ≈ 1 GB of (src, dst) pairs per
# sub-block — bounds any single task's memory and keeps every int32
# row index valid no matter how hot a hub is.  Tests shrink it to force
# splits on small graphs; pass max_block_rows=0 to disable splitting.
DEFAULT_MAX_BLOCK_ROWS = 64 * 1024 * 1024

# INPUT blocks larger than this are row-sliced before the exchange's map
# phase: a map task's working set is several× its input (symmetrize 2×,
# sort indices, arrow conversion), and CONCURRENCY × working set must fit
# RAM.  Measured: 8 M-row input blocks × 32 concurrent contract+symmetrize
# tasks thrashed this 125 GB box (CC at 256 M edges 193 s vs 55 s with
# 4 M-row blocks); 4 M rows keeps the per-task peak ~1.5 GB.
DEFAULT_INPUT_BLOCK_ROWS = 4 * 1024 * 1024


@ray.remote(num_cpus=1)
def _slice_input_task(block, cuts: np.ndarray) -> list:
    """Row-slice one oversized INPUT block (arbitrary schema) into bounded
    pieces (call with ``num_returns=len(cuts)+1``).  ``take`` copies, so a
    pickled piece never carries the parent buffer."""
    n = len(block)
    bpts = np.concatenate([[0], cuts, [n]])
    return [
        block.take(pa.array(np.arange(bpts[i], bpts[i + 1], dtype=np.int64)))
        for i in range(len(bpts) - 1)
    ]


def _bounded_input_refs(ds: rd.Dataset, cap: int | None) -> list:
    """Materialized block refs with every block ≤ ``cap`` rows (oversized
    blocks are row-sliced by a task round; row counts come free from the
    bundle metadata)."""
    if cap is None:
        cap = DEFAULT_INPUT_BLOCK_ROWS
    pairs = [
        (bref, bm.num_rows)
        for bundle in ds.materialize().iter_internal_ref_bundles()
        for bref, bm in bundle.blocks
    ]
    out: list = []
    for bref, rows in pairs:
        if cap and rows and rows > cap:
            s = -(-rows // cap)
            cuts = (np.arange(1, s) * rows) // s
            out.extend(_slice_input_task.options(num_returns=s).remote(bref, cuts))
        else:
            out.append(bref)
    return out


@ray.remote(num_cpus=1)
def _sample_pairs_task(block, n: int) -> tuple:
    """Evenly-spaced (dst, src) row sample + the block's row count.

    dst drives the range bounds; the aligned src values let the driver cut
    composite (dst, src) sub-bounds inside a hot dst run, and the row count
    scales sample fractions into absolute per-range row estimates."""
    if block.num_columns == 0 or len(block) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64), 0
    d = block["dst"].to_numpy(zero_copy_only=False)
    s = block["src"].to_numpy(zero_copy_only=False)
    idx = np.linspace(0, len(d) - 1, min(n, len(d))).astype(np.int64)
    return d[idx].astype(np.int64), s[idx].astype(np.int64), len(d)


_PAIR_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _cols_of(block, schema: pa.Schema) -> dict:
    return {
        name: block[name].to_numpy(zero_copy_only=False) for name in schema.names
    }


def _table_of(cols: dict, schema: pa.Schema) -> pa.Table:
    return pa.table(
        {name: pa.array(cols[name], schema.field(name).type) for name in schema.names}
    )


def _compact_cols(cols: dict) -> dict:
    """Downcast nonnegative int64 id columns that fit int32 — halves the
    bytes moved through the exchange's two transfer hops (map output and
    split chunks).  Conditional per column per block; the merge promotes
    mixed chunks and always casts its OUTPUT back to the declared schema,
    so nothing downstream ever sees a compact dtype."""
    out = {}
    for n, a in cols.items():
        if (
            a.dtype == np.int64
            and len(a)
            and int(a.min()) >= 0
            and int(a.max()) < np.iinfo(np.int32).max
        ):
            out[n] = a.astype(np.int32)
        else:
            out[n] = a
    return out


def _table_raw(cols: dict) -> pa.Table:
    """Table with the columns' ACTUAL dtypes (no schema cast) — used on the
    exchange's internal hops where int32-compacted ids are in flight."""
    return pa.table({name: pa.array(a) for name, a in cols.items()})


@ray.remote(num_cpus=1)
def _range_split_task(block, bounds: np.ndarray, schema: pa.Schema) -> list:
    k = len(bounds) + 1
    if block.num_columns == 0 or len(block) == 0:
        e = schema.empty_table()
        return [e] * k if k > 1 else [e]
    cols = _cols_of(block, schema)
    order = np.argsort(cols["dst"], kind="stable")
    cols = _compact_cols({n: a[order] for n, a in cols.items()})
    d = cols["dst"]
    b = np.asarray(bounds)
    if d.dtype == np.int32 and (len(b) == 0 or b.max() < np.iinfo(np.int32).max):
        b = b.astype(np.int32)  # avoid numpy upcasting d for the search
    elif d.dtype == np.int32:
        d = d.astype(np.int64)  # mixed-range case: a bound exceeds int32
    cuts = np.searchsorted(d, b, side="left")
    bpts = np.concatenate([[0], cuts, [len(cols["dst"])]])
    return [
        _table_raw({n: a[bpts[i] : bpts[i + 1]] for n, a in cols.items()})
        for i in range(k)
    ]


def _sort_table(t: pa.Table, keys: list[str]) -> pa.Table:
    """Multi-key row sort of an Arrow table (C++ kernel, single-threaded).

    Benchmarked IN SITU on real merge inputs (8 M-row ranges, 32 concurrent
    1-CPU tasks reading plasma-backed chunks): arrow ``sort_indices`` +
    ``take`` 7 s/task vs ~17 s for ``np.lexsort`` and ~14-24 s for polars —
    clean-process microbenchmarks rank these very differently (polars 1.2 s,
    arrow 0.9 s, lexsort 2.9 s), so any change here must be re-measured
    inside the exchange, not standalone.  The full key list makes tie order
    moot (remaining ties are identical rows), so stability is not relied
    on.  ``set_cpu_count(1)`` pins arrow's global pool CPU-fair for this
    1-CPU worker (idempotent; workers only ever run 1-CPU tasks)."""
    pa.set_cpu_count(1)
    idx = pa.compute.sort_indices(t, sort_keys=[(k, "ascending") for k in keys])
    return t.take(idx)


@ray.remote(num_cpus=1, num_returns=5)
def _merge_range_task(dedup_sort_src: bool, schema: pa.Schema, *chunks):
    """Concatenate one (sub-)range's chunks → dst-sorted table + its row
    count + its unique-dst count + its first/last dst value.  Range counts
    are exact and globally additive (ranges are disjoint and own every copy
    of their dst values — the vertex count falls out of the exchange for
    free, so no consumer pays a probe for it); for PRE-SPLIT hot ranges the
    driver corrects the unique-dst sum with the first/last values (a dst
    run cut across adjacent sub-merges is counted once per piece).

    ``dedup_sort_src=True`` additionally lexsorts rows within each dst run
    by the remaining columns (src, then any extras in schema order) and
    drops exact duplicate ROWS — a GLOBAL dedup, valid for the same
    reason (hot-range cuts are exact (dst, src) values, so full-row
    duplicates never straddle a cut).  Extra schema columns beyond
    (src, dst) ride along through sort, dedup and split (e.g. the
    directed-PageRank flag column)."""
    live = [c for c in chunks if len(c)]
    if not live:
        return schema.empty_table(), 0, 0, -1, -1
    extras = [n for n in schema.names if n not in ("src", "dst")]
    # chunks may arrive int32-compacted (see _compact_cols), possibly mixed
    # with int64 chunks from blocks whose ids didn't fit — promote to the
    # common type before the sort
    t = pa.concat_tables(live, promote_options="permissive")
    # full-key sort on BOTH paths: determinism then never depends on sort
    # stability or within-run tie order (remaining ties are identical rows)
    t = _sort_table(t, ["dst", "src", *extras])
    d = t["dst"].to_numpy(zero_copy_only=False)
    if dedup_sort_src:
        cols = {n: t[n].to_numpy(zero_copy_only=False) for n in schema.names}
        keep = np.empty(len(d), dtype=bool)
        keep[0] = True
        keep[1:] = False
        for n in schema.names:
            a = cols[n]
            keep[1:] |= a[1:] != a[:-1]
        cols = {n: a[keep] for n, a in cols.items()}
        d = cols["dst"]
        out = _table_raw(cols)
    else:
        out = t
    # COMPACT-OUTPUT CONTRACT: merged blocks keep whatever dtype the hop-1
    # compaction left (int32 when the range's ids fit, int64 otherwise) —
    # the int64 re-cast here used to double the bytes of the exchange's
    # LARGEST transfer (merge output → object store → 2 consumer reads).
    # Every consumer treats block dtypes as opaque numpy and normalizes at
    # its own OUTPUT boundary (see the HUB SKEW/COMPACT notes up top).
    # GRAFT_EXCHANGE_INT64_OUT=1 restores the old cast — the A/B switch for
    # in-situ interleaved measurement (and an escape hatch).
    import os

    if os.environ.get("GRAFT_EXCHANGE_INT64_OUT") == "1":
        out = out.cast(schema) if out.schema != schema else out
    nuniq = 1 + int((d[1:] != d[:-1]).sum())
    return out, int(len(d)), nuniq, int(d[0]), int(d[-1])


@ray.remote(num_cpus=1)
def _slice_block_task(block, cuts: np.ndarray, schema: pa.Schema) -> list:
    """Row-slice one oversized dst-sorted block into bounded sub-blocks
    (call with ``num_returns=len(cuts)+1``).  Sub-blocks are rebuilt from
    numpy slices so a pickled slice doesn't carry the parent buffer;
    dtypes stay as they arrived (compact-output contract)."""
    cols = _cols_of(block, schema)
    n = len(cols["dst"])
    bpts = np.concatenate([[0], cuts, [n]])
    return [
        _table_raw({nm: a[bpts[i] : bpts[i + 1]] for nm, a in cols.items()})
        for i in range(len(bpts) - 1)
    ]


def _searchsorted_any(a: np.ndarray, v: int, side: str) -> int:
    """searchsorted of a python-int value in a (possibly int32-compacted)
    sorted array without upcasting the array."""
    if a.dtype != np.int64:
        info = np.iinfo(a.dtype)
        if v < info.min:
            return 0
        if v > info.max:
            return len(a)
        v = a.dtype.type(v)
    return int(np.searchsorted(a, v, side=side))


@ray.remote(num_cpus=1)
def _composite_split_task(
    block, d_cuts: np.ndarray, s_cuts: np.ndarray, schema: pa.Schema
) -> list:
    """Split one dst-sorted hot-range chunk at composite ``(dst, src)`` cut
    values: rows strictly below a cut (dst smaller, or dst equal and src
    smaller) go left.  Only the dst runs that contain a cut are re-ordered
    (by src) — the piece boundaries are then plain row slices.  Equal
    (dst, src) rows always land on the same side of every cut, so full-row
    duplicates never straddle a sub-merge boundary."""
    m = len(d_cuts) + 1
    if block.num_columns == 0 or len(block) == 0:
        e = schema.empty_table()
        return [e] * m if m > 1 else [e]
    cols = _cols_of(block, schema)
    d, s = cols["dst"], cols["src"]
    order = np.arange(len(d), dtype=np.int64)
    positions = np.empty(len(d_cuts), dtype=np.int64)
    run_lo = -1  # runs are visited in nondecreasing dst-cut order
    for i, (dc, sc) in enumerate(zip(d_cuts, s_cuts)):
        lo = _searchsorted_any(d, int(dc), "left")
        hi = _searchsorted_any(d, int(dc), "right")
        if hi > lo:
            if lo != run_lo:  # sort this dst run by src once
                run = order[lo:hi]
                order[lo:hi] = run[np.argsort(s[run], kind="stable")]
                run_lo = lo
            run_src = s[order[lo:hi]]
            positions[i] = lo + _searchsorted_any(run_src, int(sc), "left")
        else:
            positions[i] = lo
    positions = np.maximum.accumulate(positions)
    cols = {n: a[order] for n, a in cols.items()}
    bpts = np.concatenate([[0], positions, [len(d)]])
    return [
        _table_raw({n: a[bpts[i] : bpts[i + 1]] for n, a in cols.items()})
        for i in range(m)
    ]


def _build_range_merges(
    parts: list,
    samples: list,
    block_rows: list,
    bounds: np.ndarray,
    dedup_sort_src: bool,
    schema: pa.Schema,
    max_block_rows: int | None,
) -> list:
    """One merge-task list per key range; ranges whose sampled row estimate
    exceeds the bound are pre-split at composite (dst, src) cuts so every
    merge input stays bounded (``parts[i][j]`` = chunk of block i, range j;
    ``samples`` = aligned (dst, src) sample arrays per block)."""
    cap = DEFAULT_MAX_BLOCK_ROWS if max_block_rows is None else max_block_rows
    k = len(parts)
    nk = len(bounds) + 1
    est = np.zeros(nk)
    if cap:
        for (sd, _ss), n_i in zip(samples, block_rows):
            if len(sd):
                idx = np.searchsorted(bounds, sd, side="right")
                est += np.bincount(idx, minlength=nk) * (n_i / len(sd))
    range_merges: list[list] = []
    for j in range(nk):
        chunks = [parts[i][j] for i in range(k)]
        if cap and est[j] > cap:
            sel_d, sel_s = [], []
            for sd, ss in samples:
                if len(sd):
                    in_j = np.searchsorted(bounds, sd, side="right") == j
                    sel_d.append(sd[in_j])
                    sel_s.append(ss[in_j])
            d_in = np.concatenate(sel_d) if sel_d else np.empty(0, np.int64)
            if len(d_in) >= 2:
                s_in = np.concatenate(sel_s)
                order = np.lexsort((s_in, d_in))
                d_in, s_in = d_in[order], s_in[order]
                target = max(1, int(cap * 0.75))
                m = int(min(-(-est[j] // target), 256, len(d_in)))
                if m >= 2:
                    ci = np.linspace(0, len(d_in) - 1, m + 1).astype(np.int64)[1:-1]
                    pairs = np.unique(
                        np.stack([d_in[ci], s_in[ci]], axis=1), axis=0
                    )
                    d_cuts, s_cuts = pairs[:, 0], pairs[:, 1]
                    if len(d_cuts):
                        subparts = [
                            _composite_split_task.options(
                                num_returns=len(d_cuts) + 1
                            ).remote(chunks[i], d_cuts, s_cuts, schema)
                            for i in range(k)
                        ]
                        range_merges.append(
                            [
                                _merge_range_task.remote(
                                    dedup_sort_src,
                                    schema,
                                    *[subparts[i][p] for i in range(k)],
                                )
                                for p in range(len(d_cuts) + 1)
                            ]
                        )
                        continue
        range_merges.append(
            [_merge_range_task.remote(dedup_sort_src, schema, *chunks)]
        )
    return range_merges


def _finish_merges(
    range_merges: list, schema: pa.Schema, max_block_rows: int | None, grouped: bool
) -> tuple[list, int, int]:
    """Common exchange tail: pull counts, correct the unique-dst sum for
    dst runs cut across pre-split sub-merges, sub-split any still-oversized
    output as a backstop (one owner GROUP per range), return flat refs or
    groups.  ``range_merges`` is a list (per key range) of merge-task
    5-tuples.  ``max_block_rows=None`` → module default; ``0`` disables."""
    if max_block_rows is None:
        max_block_rows = DEFAULT_MAX_BLOCK_ROWS
    flat = [m for g in range_merges for m in g]
    metas = ray.get([r for m in flat for r in (m[1], m[2], m[3], m[4])])
    n = 0
    n_uniq = 0
    groups: list[list] = []
    pos = 0
    for g in range_merges:
        gm = metas[4 * pos : 4 * (pos + len(g))]
        blocks: list = []
        prev_last = None
        for i, m in enumerate(g):
            r, nu, d0, d1 = gm[4 * i : 4 * i + 4]
            n += r
            if r > 0:
                n_uniq += nu - (1 if prev_last is not None and d0 == prev_last else 0)
                prev_last = d1
            if max_block_rows and r > max_block_rows:
                s = -(-r // max_block_rows)  # ceil
                cuts = (np.arange(1, s) * r) // s
                blocks.extend(
                    _slice_block_task.options(num_returns=s).remote(
                        m[0], cuts, schema
                    )
                )
            elif r > 0 or len(g) == 1:
                # keep empty singles (degenerate-range contract), drop empty
                # hot-range pieces (duplicate cut pairs make them)
                blocks.append(m[0])
        if not blocks:
            blocks.append(g[0][0])
        groups.append(blocks)
        pos += len(g)
    if grouped:
        return groups, n, n_uniq
    return [b for g in groups for b in g], n, n_uniq


def raw_dst_exchange(
    sym_edges: rd.Dataset,
    *,
    dedup_sort_src: bool = False,
    samples_per_block: int = 2000,
    schema: pa.Schema = _PAIR_SCHEMA,
    max_block_rows: int | None = None,
    grouped: bool = False,
) -> tuple[list, int, int]:
    """Range-exchange a (src, dst) dataset by ``dst`` with raw tasks.

    Returns ``(block refs, total rows, unique dst count)``; the refs
    satisfy the partitioning contract above and feed every
    sharded/broadcast consumer directly.  Post-symmetrize the unique-dst
    count IS the vertex count — every per-node-envelope gate reads it here
    instead of paying a separate probe.  Wrap the refs with
    ``ray.data.from_arrow_refs`` where a Dataset is needed.

    Ranges larger than ``max_block_rows`` (hub skew) are pre-split at
    composite (dst, src) cuts into bounded sub-merges; with
    ``grouped=True`` the first element of the return is ``list[list[ref]]``
    — one owner GROUP per key range — for the sharded-state consumers that
    need single-owner vertex ranges."""
    refs = _bounded_input_refs(sym_edges, None)
    if not refs:
        return [], 0, 0
    k = len(refs)
    sampled = ray.get(
        [_sample_pairs_task.remote(r, samples_per_block) for r in refs]
    )
    samples = [(d, s) for d, s, _n in sampled]
    block_rows = [n for _d, _s, n in sampled]
    live = [d for d, _s in samples if len(d)]
    if not live:
        m = _merge_range_task.remote(dedup_sort_src, schema, *refs)
        return _finish_merges([[m]], schema, max_block_rows, grouped)
    alls = np.sort(np.concatenate(live))
    bounds = alls[np.linspace(0, len(alls) - 1, k + 1).astype(np.int64)[1:-1]]
    bounds = np.unique(bounds)  # duplicate boundaries → empty ranges, drop
    nk = len(bounds) + 1
    if nk == 1:  # degenerate key range: merge everything into one block
        m = _merge_range_task.remote(dedup_sort_src, schema, *refs)
        return _finish_merges([[m]], schema, max_block_rows, grouped)
    bref = ray.put(bounds)
    parts = [
        _range_split_task.options(num_returns=nk).remote(r, bref, schema)
        for r in refs
    ]
    range_merges = _build_range_merges(
        parts, samples, block_rows, bounds, dedup_sort_src, schema, max_block_rows
    )
    return _finish_merges(range_merges, schema, max_block_rows, grouped)


@ray.remote(num_cpus=1, num_returns=2)
def _map_sort_sample_task(block, map_fn, n: int, schema: pa.Schema):
    """Apply ``map_fn`` to one input block, sort the result by ``dst``, and
    return (sorted table, ((dst, src) sample + row count)).  Fusing the map
    into the exchange removes a full object-store pass: the map output is
    never materialized as a separate Dataset and never re-read or re-sorted
    by the split stage."""
    empty_sample = (np.empty(0, np.int64), np.empty(0, np.int64), 0)
    if block.num_columns == 0 or len(block) == 0:
        return schema.empty_table(), empty_sample
    t = map_fn(block)
    if len(t) == 0:
        return schema.empty_table(), empty_sample
    cols = _cols_of(t, schema)
    order = np.argsort(cols["dst"], kind="stable")
    cols = _compact_cols({name: a[order] for name, a in cols.items()})
    d = cols["dst"]
    idx = np.linspace(0, len(d) - 1, min(n, len(d))).astype(np.int64)
    sample = (
        d[idx].astype(np.int64),
        cols["src"][idx].astype(np.int64),
        len(d),
    )
    return _table_raw(cols), sample


@ray.remote(num_cpus=1)
def _split_presorted_task(block, bounds: np.ndarray, schema: pa.Schema) -> list:
    """Range-split an already dst-sorted block: one ``searchsorted``, no
    re-sort.  Chunks are rebuilt from numpy slices rather than
    ``Table.slice`` — a pickled Arrow slice can carry its whole parent
    buffer into the object store, K× per block."""
    k = len(bounds) + 1
    if block.num_columns == 0 or len(block) == 0:
        e = schema.empty_table()
        return [e] * k if k > 1 else [e]
    cols = _cols_of(block, schema)
    d = cols["dst"]
    b = np.asarray(bounds)
    if d.dtype == np.int32 and (len(b) == 0 or b.max() < np.iinfo(np.int32).max):
        b = b.astype(np.int32)  # avoid numpy upcasting d for the search
    elif d.dtype == np.int32:
        d = d.astype(np.int64)  # mixed-range case: a bound exceeds int32
    cuts = np.searchsorted(d, b, side="left")
    bpts = np.concatenate([[0], cuts, [len(cols["dst"])]])
    return [
        _table_raw({n: a[bpts[i] : bpts[i + 1]] for n, a in cols.items()})
        for i in range(k)
    ]


def raw_map_dst_exchange(
    ds: rd.Dataset,
    map_fn,
    *,
    dedup_sort_src: bool = False,
    samples_per_block: int = 2000,
    schema: pa.Schema = _PAIR_SCHEMA,
    max_block_rows: int | None = None,
    grouped: bool = False,
) -> tuple[list, int, int]:
    """Fused map + range exchange by ``dst``: ``map_fn`` (a pure
    Table → (src, dst) Table function) runs inside the sort/sample task of
    each INPUT block, so only the input and the final ranges ever occupy
    the object store — the map output is never a materialized
    intermediate.  Same return contract as :func:`raw_dst_exchange`
    (including hub sub-splitting and ``grouped`` owner groups)."""
    refs = _bounded_input_refs(ds, None)
    if not refs:
        return [], 0, 0
    k = len(refs)
    prepped = [
        _map_sort_sample_task.remote(r, map_fn, samples_per_block, schema)
        for r in refs
    ]
    sampled = ray.get([p[1] for p in prepped])
    sorted_refs = [p[0] for p in prepped]
    samples = [(d, s) for d, s, _n in sampled]
    block_rows = [n for _d, _s, n in sampled]
    live = [d for d, _s in samples if len(d)]
    if not live:
        m = _merge_range_task.remote(dedup_sort_src, schema, *sorted_refs)
        return _finish_merges([[m]], schema, max_block_rows, grouped)
    alls = np.sort(np.concatenate(live))
    bounds = alls[np.linspace(0, len(alls) - 1, k + 1).astype(np.int64)[1:-1]]
    bounds = np.unique(bounds)
    nk = len(bounds) + 1
    if nk == 1:
        m = _merge_range_task.remote(dedup_sort_src, schema, *sorted_refs)
        return _finish_merges([[m]], schema, max_block_rows, grouped)
    bref = ray.put(bounds)
    parts = [
        _split_presorted_task.options(num_returns=nk).remote(r, bref, schema)
        for r in sorted_refs
    ]
    range_merges = _build_range_merges(
        parts, samples, block_rows, bounds, dedup_sort_src, schema, max_block_rows
    )
    return _finish_merges(range_merges, schema, max_block_rows, grouped)


def dataset_block_refs(ds: rd.Dataset) -> list:
    """Raw object refs of a materialized dataset's Arrow blocks."""
    return [
        bref
        for bundle in ds.iter_internal_ref_bundles()
        for bref in bundle.block_refs
    ]


@ray.remote(num_cpus=1)
def _uniq_dst_task(block) -> np.ndarray:
    if block.num_columns == 0 or len(block) == 0:
        return np.empty(0, np.int64)
    return np.unique(block["dst"].to_numpy(zero_copy_only=False))


def vertex_ids(
    block_refs: list, extra: list[np.ndarray] | None = None
) -> np.ndarray:
    """Sorted vertex-id vector from dst-sorted symmetrized edge blocks.

    Post-symmetrize the dst set IS the vertex set.  Blocks have disjoint
    dst sets except at hub sub-split cuts, where the cut vertex appears in
    two adjacent sub-blocks — per-block uniques concatenate sorted, and a
    final ``np.unique`` (cheap on the already-sorted concat) drops the cut
    duplicates.  Raw tasks, no execution."""
    parts = ray.get([_uniq_dst_task.remote(b) for b in block_refs])
    parts = [p for p in parts if len(p)]
    ids = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )
    if extra:
        ids = np.unique(np.concatenate([ids] + list(extra)))
    # per-block uniques may be int32 (compact-output contract); the id
    # vector is the positional-index reference — normalize to int64
    return ids.astype(np.int64, copy=False)


@ray.remote(num_cpus=1)
def _index_block_task(block, ids: np.ndarray, use32: bool, dedup: bool) -> pa.Table:
    dt = np.int32 if use32 else np.int64
    if block.num_columns == 0 or len(block) == 0:
        t = pa.int32() if use32 else pa.int64()
        return pa.table({"i_src": pa.array([], t), "i_dst": pa.array([], t)})
    i_s = np.searchsorted(ids, block["src"].to_numpy(zero_copy_only=False))
    i_d = np.searchsorted(ids, block["dst"].to_numpy(zero_copy_only=False))
    if dedup:
        # dst-disjoint blocks make a block-local (dst, src) dedup GLOBAL;
        # lexsort keyed primarily on i_dst keeps the segment-min invariant
        order = np.lexsort((i_s, i_d))
        i_s, i_d = i_s[order], i_d[order]
        keep = np.empty(len(i_d), dtype=bool)
        keep[0] = True
        keep[1:] = (i_d[1:] != i_d[:-1]) | (i_s[1:] != i_s[:-1])
        i_s, i_d = i_s[keep], i_d[keep]
    return pa.table({"i_src": i_s.astype(dt), "i_dst": i_d.astype(dt)})


def positional_index(block_refs: list, ids: np.ndarray, *, dedup: bool = False) -> list:
    """(src, dst) → (i_src, i_dst) int32/int64 positions into ``ids``.

    One-time rewrite so supersteps are a pure gather + segment-min with no
    per-superstep ``searchsorted`` and no re-broadcast of the id vector;
    ``i_dst`` stays pre-sorted (row order is preserved).  Raw tasks over the
    sorted blocks; the returned **object refs** of the index tables are the
    superstep inputs — the tables never touch the driver.

    ``dedup=True`` drops duplicate (src, dst) rows during the rewrite — a
    *global* dedup, since the range exchange made blocks dst-disjoint.
    Only valid for multiplicity-insensitive consumers (CC's segment-min);
    PageRank/label-frequency consumers must keep every row.
    """
    use32 = len(ids) <= np.iinfo(np.int32).max
    ref_ids = ray.put(ids)
    return [_index_block_task.remote(b, ref_ids, use32, dedup) for b in block_refs]


# ---------------------------------------------------------------------------
# sharded-state min-label machinery (CC/LP beyond the driver-broadcast gate)
#
# Per-vertex labels live as ONE STATE SHARD PER OWNER GROUP (one group per
# key range of the exchange; a group has one sub-block normally, several
# when a hub forced a sub-split — see the HUB SKEW note above).  A
# superstep is one emit round (each sub-block pushes its group's labels
# along its rows, split per owner group) + one apply round (owners take
# mins over all received chunks — chunks from two sub-blocks of the same
# hub run may target the same vertex; min is associative so the combine is
# exact); long label chains are cut by sharded pointer jumping
# (label[label[v]] fetched through a request/reply/update task round-trip).
# Only (target, candidate) chunks and lookup chunks move; the driver sees
# per-shard changed counts.  Ref parity: the owner-computes update exchange
# of the MPI union-find (src/mpi/cc_mpi.c:2091-2239) and the shortcut phase
# of Shiloach-Vishkin (src/cc_openmp.c:291-310), as dataflow.
# ---------------------------------------------------------------------------


@ray.remote(num_cpus=1, num_returns=2)
def group_vertices(*blocks):
    """One owner group's dst-sorted sub-blocks → ``(vids, deg)`` + ``(n,
    first)``.  Sub-blocks are contiguous slices of ONE dst-sorted table, so
    per-block (vid, seglen) partials concatenate already sorted with at
    most one shared vid at each cut; a final unique+sum combines the cut
    partials.  ``deg`` is the per-vid row count (the undirected degree on
    a deduped symmetrized table); min-label consumers ignore it."""
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
        return (np.empty(0, np.int64), np.empty(0, np.int64)), (0, 0)
    v = np.concatenate(vparts)
    c = np.concatenate(cparts)
    change = np.empty(len(v), dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    # vids seed label shards and answer searchsorted lookups — normalize to
    # int64 here (compact-output contract; blocks may be int32)
    vids = v[starts].astype(np.int64, copy=False)
    deg = np.add.reduceat(c, starts)
    return (vids, deg), (int(len(vids)), int(vids[0]))


@ray.remote(num_cpus=1)
def sub_emit_prep(block, gv, presorted: bool = True, whole_group: bool = False):
    """One sub-block → static emit index into its GROUP's vids.

    Rows are re-read as dst→src pushes (the symmetrized table carries both
    directions) and re-sorted once by the push target so each emit is one
    ``reduceat``.  ``i_local`` holds positions into the group vids
    (``gv[0]``), so every sub-block of a group gathers from the same state
    vector.  ``presorted=False`` additionally lexsorts + dedups the rows
    block-locally (cut-straddling duplicates are harmless for min).
    ``whole_group=True`` (the common, unsplit case) derives ``i_local``
    from the dst run-length structure (the block's dst set IS the group
    vids) instead of a row-wise ``searchsorted`` — measured seconds per
    8 M-row block at scale.  Returns ``(tgt_unique, tgt_starts,
    i_local)``; sub-block rows are bounded by the exchange's
    ``max_block_rows``, so int32 row indexes are always valid."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int32))
    if block.num_columns == 0 or len(block) == 0:
        return empty
    s = block["src"].to_numpy(zero_copy_only=False)
    d = block["dst"].to_numpy(zero_copy_only=False)
    if not presorted:
        order = np.lexsort((s, d))
        s, d = s[order], d[order]
        keep = np.empty(len(s), dtype=bool)
        keep[0] = True
        keep[1:] = (d[1:] != d[:-1]) | (s[1:] != s[:-1])
        s, d = s[keep], d[keep]
    if whole_group:
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        np.not_equal(d[1:], d[:-1], out=change[1:])
        i_local = (np.cumsum(change) - 1).astype(np.int32)
    else:
        i_local = np.searchsorted(gv[0], d).astype(np.int32)
    order2 = np.argsort(s, kind="stable")
    tgt = s[order2]
    i_local = i_local[order2]
    tchange = np.empty(len(tgt), dtype=bool)
    tchange[0] = True
    np.not_equal(tgt[1:], tgt[:-1], out=tchange[1:])
    tgt_starts = np.flatnonzero(tchange).astype(np.int32)
    # emit targets route through owner-range searchsorted → int64 (compact-
    # output contract; the unique-target array is far smaller than the rows)
    return (tgt[tgt_starts].astype(np.int64, copy=False), tgt_starts, i_local)


def _owner_split(sorted_vals: np.ndarray, payload, firsts: np.ndarray) -> list:
    """Split (sorted targets, aligned payload) into per-owner-range chunks."""
    cuts = np.searchsorted(sorted_vals, firsts[1:])
    bounds = np.concatenate([[0], cuts, [len(sorted_vals)]])
    return [
        (sorted_vals[bounds[i] : bounds[i + 1]], payload[bounds[i] : bounds[i + 1]])
        for i in range(len(firsts))
    ]


@ray.remote(num_cpus=1)
def sharded_min_emit(sub, labels: np.ndarray, firsts: np.ndarray):
    """Push the group's labels along one sub-block's rows; per-target min;
    split by owner group (call with ``num_returns=K``)."""
    tgt_unique, tgt_starts, i_local = sub
    k = len(firsts)
    if len(tgt_unique) == 0:
        return [(np.empty(0, np.int64), np.empty(0, np.int64))] * k
    cand = np.minimum.reduceat(labels[i_local], tgt_starts)
    return _owner_split(tgt_unique, cand, firsts)


@ray.remote(num_cpus=1, num_returns=2)
def sharded_min_apply(gv, labels: np.ndarray, *chunks):
    """Take the min of received candidates into the group's label shard.
    Chunks from different sub-blocks may repeat a target (a sub-split hub);
    the sequential per-chunk min makes the combine exact regardless."""
    vids = gv[0]
    new = labels.copy()
    for ch in chunks:
        pairs = ch if isinstance(ch, list) else [ch]
        for tgt_c, cand_c in pairs:
            if len(tgt_c):
                pos = np.searchsorted(vids, tgt_c)
                # chunk targets are unique within a chunk → indexed minimum
                new[pos] = np.minimum(new[pos], cand_c)
    return new, int((new < labels).sum())


@ray.remote(num_cpus=1)
def sharded_jump_request(labels: np.ndarray, firsts: np.ndarray):
    """Unique label values this shard points at, split by owner, plus the
    local inverse map (returned LAST — call with ``num_returns=K+1``)."""
    uniq, inv = np.unique(labels, return_inverse=True)
    outs = _owner_split(uniq, np.empty(0), firsts)
    return [o[0] for o in outs] + [inv.astype(np.int32)]


@ray.remote(num_cpus=1)
def sharded_jump_reply(gv, labels: np.ndarray, *request_chunks):
    """labels[ℓ] for each requested local vertex ℓ (call with
    ``num_returns=K``; chunk order preserves the requester's sort)."""
    vids = gv[0]
    outs = []
    for reqs in request_chunks:
        reqs = np.asarray(reqs)
        if len(reqs) == 0:
            outs.append(np.empty(0, np.int64))
        else:
            outs.append(labels[np.searchsorted(vids, reqs)])
    return outs if len(outs) > 1 else outs[0]


@ray.remote(num_cpus=1, num_returns=2)
def sharded_jump_update(labels: np.ndarray, inv: np.ndarray, *replies):
    """labels ← min(labels, label[label]) — one pointer jump."""
    parts = [np.asarray(r) for r in replies]
    lab_of_uniq = (
        np.concatenate(parts) if parts else np.empty(0, np.int64)
    )
    new = np.minimum(labels, lab_of_uniq[inv])
    return new, int((new < labels).sum())


@ray.remote(num_cpus=1)
def sharded_labels_table(gv, labels: np.ndarray) -> pa.Table:
    return pa.table({"vertex": gv[0], "label": labels})


@ray.remote(num_cpus=1)
def sharded_root_count(gv, labels: np.ndarray) -> int:
    return int((labels == gv[0]).sum())


@ray.remote(num_cpus=1)
def init_labels(gv) -> np.ndarray:
    return gv[0].copy()


@ray.remote(num_cpus=1)
def segment_min_task(block, state: np.ndarray):
    """One dst-disjoint index block × per-vertex state vector →
    (dst positions, per-dst min of gathered src state).

    ``block`` is the positional index table (zero-copy object-store read);
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
