"""Mergeable sketches for approximate distinct counting at 100-TB scale.

KMV (k-minimum-values, Bar-Yossef et al., RANDOM 2002): keep the ``k``
smallest 64-bit hashes of the values seen; the k-th smallest estimates the
distinct count as ``(k − 1) / v_k`` of the hash space.  The sketch is a
bounded set, so partials MERGE exactly (union + re-truncate) — the whole
reduction is a per-block combiner plus one tiny driver-side fold of
``num_blocks`` arrays of ≤ k uint64 each; the data itself is never
shuffled (contrast the exact-distinct path, which pays a full groupby
exchange — ``relational.distinct_users``).

Exactness contract (the ``knn_ivf`` exhaustive-regime convention): while a
merged sketch holds FEWER than ``k`` hashes it has seen every distinct
value, and the estimate is the EXACT distinct count — that regime is the
value-checked driver row; the estimation regime is pytest-gated to the
KMV error bound (~1/√(k−2)).

Hashing is the vectorized polars-xxhash path (`runtime.content_hash64`)
for strings; int64 columns hash via the same avalanche mix the dedup
kernels use — no per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — bijective avalanche over uint64."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _column_hashes(col) -> np.ndarray:
    """uint64 hashes of an Arrow column (string → polars xxhash,
    integer → splitmix64; both deterministic and process-independent)."""
    from linkgraph.runtime import content_hash64

    if isinstance(col, pa.ChunkedArray):
        typ = col.type
    else:
        typ = col.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return content_hash64(col).view(np.uint64)
    v = col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return _mix64(v.view(np.uint64))


def kmv_partial(col, k: int) -> np.ndarray:
    """Bottom-k distinct hashes of one block's column (sorted uint64)."""
    h = _column_hashes(col)
    if len(h) == 0:
        return np.empty(0, dtype=np.uint64)
    u = np.unique(h)  # sorted
    return u[:k]


def kmv_merge(partials: list[np.ndarray], k: int) -> np.ndarray:
    """Exact merge: union of bottom-k sets, re-truncated to bottom-k."""
    if not partials:
        return np.empty(0, dtype=np.uint64)
    u = np.unique(np.concatenate(partials))
    return u[:k]


def kmv_estimate(sketch: np.ndarray, k: int) -> float:
    """Distinct-count estimate; EXACT while the sketch is not full."""
    m = len(sketch)
    if m < k:
        return float(m)
    # k-th minimum maps the hash space: E[n] = (k-1) / (v_k / 2^64)
    vk = float(sketch[k - 1]) + 1.0
    return (k - 1) * (2.0 ** 64) / vk


def _grouped_bottomk(g: np.ndarray, h: np.ndarray, k: int):
    """Per-group bottom-k of distinct hashes; ``g`` may be any dtype
    (string object arrays included).  Returns ``(group_firsts, counts,
    flat_hashes)`` with groups contiguous and hashes sorted per group."""
    order = np.lexsort((h, g))
    g, h = g[order], h[order]
    keep = np.empty(len(g), dtype=bool)
    keep[0] = True
    keep[1:] = (g[1:] != g[:-1]) | (h[1:] != h[:-1])
    g, h = g[keep], h[keep]
    change = np.empty(len(g), dtype=bool)
    change[0] = True
    np.not_equal(g[1:], g[:-1], out=change[1:])
    run_id = np.cumsum(change) - 1
    starts = np.flatnonzero(change)
    rank = np.arange(len(g), dtype=np.int64) - starts[run_id]
    sel = rank < k
    g, h = g[sel], h[sel]
    change = np.empty(len(g), dtype=bool)
    change[0] = True
    np.not_equal(g[1:], g[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, len(g)))
    return g[starts], counts, h


def approx_distinct_by_key(
    ds: rd.Dataset, key: str, col: str, k: int = 1 << 16
) -> rd.Dataset:
    """Per-key approximate distinct count — one KMV sketch per key value.

    Stage 1 (combiner): each block reduces to ≤ k hashes PER KEY as an
    Arrow ``large_list`` column — one lexsort per block, no per-group
    Python.  Stage 2: the tiny (n_blocks × n_keys)-row partial stream
    hash-co-locates by key and merges vectorized.  The raw table is never
    shuffled; a hot key costs ≤ k·n_blocks sketch entries, not its row
    count — the sketch twin of ``relational.users_per_event_type``'s
    exact pair-groupby plan.  Same exactness contract as
    ``approx_distinct``: below-k keys report their EXACT distinct count.

    Output: ``(key, n_approx: int64)``.
    """
    from linkgraph.relational import colocate_by_key

    def partial_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    key: pa.array([], t[key].type if t.num_columns else pa.string()),
                    "mins": pa.array([], pa.large_list(pa.uint64())),
                }
            )
        g = t[key].to_numpy(zero_copy_only=False)
        h = _column_hashes(t[col])
        firsts, counts, flat = _grouped_bottomk(g, h, k)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(flat, pa.uint64())
        )
        return pa.table({key: pa.Array.from_pandas(firsts), "mins": lists})

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    key: pa.array([], t[key].type if t.num_columns else pa.string()),
                    "n_approx": pa.array([], pa.int64()),
                }
            )
        lists = t["mins"]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens = np.asarray(
            pa.compute.list_value_length(lists), dtype=np.int64
        )
        g = np.repeat(t[key].to_numpy(zero_copy_only=False), lens)
        h = np.asarray(lists.flatten(), dtype=np.uint64)
        firsts, counts, flat = _grouped_bottomk(g, h, k)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        est = counts.astype(np.float64)
        full = counts >= k
        if full.any():
            vk = flat[offsets[1:][full] - 1].astype(np.float64) + 1.0
            est[full] = (k - 1) * (2.0 ** 64) / vk
        return pa.table(
            {
                key: pa.Array.from_pandas(firsts),
                "n_approx": pa.array(np.round(est).astype(np.int64)),
            }
        )

    partials = ds.select_columns([key, col]).map_batches(
        partial_block, batch_format="pyarrow"
    )
    return colocate_by_key(partials, key).map_batches(
        merge_block, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet–Fuss–Gandouet–Meunier, AofA 2007) — the
# constant-size counterpart to KMV: 2^p one-byte registers, per-block
# partials merge by elementwise max (associative + commutative, so the
# estimate is independent of sharding and parallelism).  A p=14 sketch is
# 16 KB regardless of cardinality; standard error ~1.04/√m ≈ 0.8%.
# Unlike KMV it has NO exact regime (the small-range linear-counting
# correction is still an estimate), so its driver entries are
# SELF-GATING: they compute the exact count alongside and report the
# relative error against the 3σ bound (the knn_ivf_recall convention).
# ---------------------------------------------------------------------------

HLL_P = 14


def _leading_zeros64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (binary descent; 0 → 63
    here, callers cap ρ before the difference matters)."""
    v = x.astype(np.uint64, copy=True)
    lz = np.zeros(len(v), dtype=np.uint8)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += np.uint8(shift)
        v[mask] <<= np.uint64(shift)
    return lz


def hll_partial(col, p: int = HLL_P) -> np.ndarray:
    """Register array (len 2^p, uint8) of one block's column."""
    h = _column_hashes(col)
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h << np.uint64(p)  # the low 64-p bits, left-aligned
    rho = np.minimum(
        _leading_zeros64(rem).astype(np.int64) + 1, 64 - p + 1
    ).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    """Exact merge: elementwise register max."""
    if not partials:
        return np.zeros(1 << HLL_P, dtype=np.uint8)
    out = partials[0].copy()
    for pr in partials[1:]:
        np.maximum(out, pr, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the small-range linear-counting
    correction; the 64-bit hash space needs no large-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return e


def hll_distinct(ds: rd.Dataset, col: str, p: int = HLL_P) -> float:
    """Approximate distinct count of ``ds[col]`` via HyperLogLog.

    One streaming pass, NO shuffle: each block reduces to a 2^p-byte
    register array; the driver folds them with elementwise max — O(2^p)
    driver memory, independent of data size and of the number of blocks.
    """

    def partial_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"regs": pa.array([], pa.large_list(pa.uint8()))})
        return pa.table(
            {"regs": pa.array([hll_partial(t[col], p)], pa.large_list(pa.uint8()))}
        )

    regs = np.zeros(1 << p, dtype=np.uint8)
    parts = ds.select_columns([col]).map_batches(
        partial_block, batch_format="pyarrow"
    )
    for b in parts.iter_batches(batch_size=256, batch_format="pyarrow"):
        for r in b["regs"].to_pylist():
            np.maximum(regs, np.asarray(r, dtype=np.uint8), out=regs)
    return hll_estimate(regs)


def hll_distinct_by_key(
    ds: rd.Dataset, key: str, col: str, p: int = 12
) -> rd.Dataset:
    """Per-key approximate distinct count — one HLL register array per key.

    The ``approx_distinct_by_key`` plan with registers instead of bottom-k
    sets: per-block partials emit (key, 2^p-byte registers), one key-hash
    co-location of the tiny partial stream, and the in-block merge is a
    ``np.maximum.reduceat`` over the stacked register matrix — a hot key
    costs 2^p bytes per block, never its row count.  Default p=12 (4 KB
    per key per block, ~1.6% error) since the per-key stream multiplies
    the sketch by the key count.

    Output: ``(key, n_approx: int64)``.
    """
    from linkgraph.relational import colocate_by_key

    m = 1 << p

    def partial_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    key: pa.array([], t[key].type if t.num_columns else pa.string()),
                    "regs": pa.array([], pa.large_list(pa.uint8())),
                }
            )
        g = t[key].to_numpy(zero_copy_only=False)
        h = _column_hashes(t[col])
        order = np.argsort(g, kind="stable")
        g, h = g[order], h[order]
        change = np.empty(len(g), dtype=bool)
        change[0] = True
        np.not_equal(g[1:], g[:-1], out=change[1:])
        run_id = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        n_groups = len(starts)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rem = h << np.uint64(p)
        rho = np.minimum(
            _leading_zeros64(rem).astype(np.int64) + 1, 64 - p + 1
        ).astype(np.uint8)
        regs = np.zeros((n_groups, m), dtype=np.uint8)
        np.maximum.at(regs, (run_id, idx), rho)
        offsets = np.arange(0, (n_groups + 1) * m, m, dtype=np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(regs.reshape(-1), pa.uint8())
        )
        return pa.table({key: pa.Array.from_pandas(g[starts]), "regs": lists})

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    key: pa.array([], t[key].type if t.num_columns else pa.string()),
                    "n_approx": pa.array([], pa.int64()),
                }
            )
        g = t[key].to_numpy(zero_copy_only=False)
        lists = t["regs"]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        mat = np.asarray(lists.flatten(), dtype=np.uint8).reshape(len(g), m)
        order = np.argsort(g, kind="stable")
        g, mat = g[order], mat[order]
        change = np.empty(len(g), dtype=bool)
        change[0] = True
        np.not_equal(g[1:], g[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        merged = np.maximum.reduceat(mat, starts, axis=0)
        est = np.fromiter(
            (hll_estimate(merged[i]) for i in range(len(starts))),
            dtype=np.float64,
            count=len(starts),
        )
        return pa.table(
            {
                key: pa.Array.from_pandas(g[starts]),
                "n_approx": pa.array(np.round(est).astype(np.int64)),
            }
        )

    partials = ds.select_columns([key, col]).map_batches(
        partial_block, batch_format="pyarrow"
    )
    return colocate_by_key(partials, key).map_batches(
        merge_block, batch_format="pyarrow", batch_size=None
    )


def approx_distinct(ds: rd.Dataset, col: str, k: int = 1 << 16) -> float:
    """Approximate distinct count of ``ds[col]`` via a KMV sketch.

    One streaming pass: per-block bottom-k combiners (each ≤ 8·k bytes)
    flow to the driver through ``iter_batches`` as LIST columns, merged
    incrementally — memory at the driver is O(k), independent of data
    size, and there is NO shuffle.
    """

    def partial_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"mins": pa.array([], pa.large_list(pa.uint64()))})
        p = kmv_partial(t[col], k)
        return pa.table(
            {"mins": pa.array([p], pa.large_list(pa.uint64()))}
        )

    sketch = np.empty(0, dtype=np.uint64)
    parts = ds.select_columns([col]).map_batches(
        partial_block, batch_format="pyarrow"
    )
    for b in parts.iter_batches(batch_size=256, batch_format="pyarrow"):
        chunk = [
            np.asarray(x, dtype=np.uint64) for x in b["mins"].to_pylist()
        ]
        sketch = kmv_merge([sketch] + chunk, k)
    return kmv_estimate(sketch, k)
