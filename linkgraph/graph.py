"""Edge-table operations (normalize / symmetrize / dedup / orient / degrees).

Semantics mirrored from the reference graph builder:
self-loops dropped (``src/graph.c:71-73``), both directions stored for
undirected traversal (``src/graph.c:87-102``), parallel edges permitted on
input (``src/graph.c:75-104``) but explicitly deduplicated here before
PageRank / triangle counting (SURVEY.md §2.7).  Everything is a lazy
``ray.data.Dataset`` transform over Arrow blocks; the only shuffle is the
global dedup groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count


def default_partitions() -> int:
    """Shuffle partition count, aligned with the hash-shuffle aggregator pool.

    Partitions beyond the aggregator count multiply shard objects without
    adding parallelism (measured: 64 partitions = 3.5x slower than 16 on
    the same 4M rows at 32 CPUs — every partition-shard is a separate
    object the aggregators must fetch/concat).  tune_context caps the
    aggregator pool at min(16, cpus); match it.  Multi-node deployments
    pass ``num_partitions`` explicitly per stage.
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(16, cpus))


def from_arrow_edges(table: pa.Table) -> rd.Dataset:
    """Edge Dataset from an in-memory Arrow table (tests/fixtures)."""
    return rd.from_arrow(table)


def _drop_self_loops_batch(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return t.filter(pc.invert(pc.equal(t["src"], t["dst"])))


def drop_self_loops(edges: rd.Dataset) -> rd.Dataset:
    """Remove u==v rows (ref ``src/graph.c:71-73``)."""
    return edges.map_batches(_drop_self_loops_batch, batch_format="pyarrow")


def _orient_batch(t: pa.Table) -> pa.Table:
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    return pa.table({"src": lo, "dst": hi})


def orient_lo_hi(edges: rd.Dataset) -> rd.Dataset:
    """Undirected canonical orientation: (min, max) per edge.

    The reference's "process each undirected edge once" projection
    (``src/cc_sequential.c:416-429``).
    """
    return edges.map_batches(_orient_batch, batch_format="pyarrow")


def _dedup_batch(t: pa.Table) -> pa.Table:
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    if len(src) == 0:
        return _EMPTY_EDGE_TABLE
    # lexsort + adjacent-keep ≈ 40% faster than np.unique(..., axis=0)
    # (which round-trips through a structured void dtype)
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    keep = np.empty(len(s), dtype=bool)
    keep[0] = True
    keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
    return pa.table({"src": s[keep], "dst": d[keep]})


def dedup_block(edges: rd.Dataset) -> rd.Dataset:
    """Block-local dedup — the cheap combiner before any global shuffle."""
    return edges.map_batches(_dedup_batch, batch_format="pyarrow")


def dedup_edges(edges: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Exact global dedup: block combiner + one range exchange by (src, dst).

    All copies of an exact (src, dst) pair compare equal on the full sort
    key, so the range partitioner co-locates them and a per-block
    adjacent-keep mask over the pre-sorted rows is a global dedup —
    measured far faster than both the ``groupby().aggregate`` hash
    aggregate and the keyed hash repartition on small fixed-width rows.
    """
    parted = dedup_block(edges).sort(["src", "dst"])
    return parted.map_batches(_dedup_sorted, batch_format="pyarrow", batch_size=None)


def _dedup_sorted(t: pa.Table) -> pa.Table:
    if t.num_columns == 0 or len(t) == 0:
        return _EMPTY_EDGE_TABLE
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    keep = np.empty(len(s), dtype=bool)
    keep[0] = True
    keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
    return pa.table({"src": s[keep], "dst": d[keep]})


_EMPTY_EDGE_TABLE = pa.table(
    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
)


def canonicalize(edges: rd.Dataset, global_dedup: bool = False) -> rd.Dataset:
    """Self-loop drop + lo/hi orient + block dedup (+ optional global dedup).

    Output rows satisfy src < dst, one row per undirected edge per block
    (globally unique when ``global_dedup``).
    """
    out = dedup_block(orient_lo_hi(drop_self_loops(edges)))
    if global_dedup:
        out = dedup_edges(out)
    return out


def _swap_batch(t: pa.Table) -> pa.Table:
    return pa.table({"src": t["dst"], "dst": t["src"]})


def symmetrize(edges: rd.Dataset) -> rd.Dataset:
    """Both-direction storage (ref ``src/graph.c:87-102``).

    On a canonical (src<dst, deduped) input the result has exactly one row
    per (vertex, neighbor) incidence.
    """
    return edges.union(edges.map_batches(_swap_batch, batch_format="pyarrow"))


def _sym_block_batch(t: pa.Table) -> pa.Table:
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    return pa.table(
        {"src": np.concatenate([s, d]), "dst": np.concatenate([d, s])}
    )


def symmetrize_block(edges: rd.Dataset) -> rd.Dataset:
    """Both directions emitted in one per-block pass (same semantics as
    :func:`symmetrize`, which is a ``union`` and therefore consumes its
    input **twice** — on a lazy upstream chain that re-executes the whole
    chain, so iterative kernels chaining contraction/extraction into the
    symmetrize must use this one-pass form)."""
    return edges.map_batches(_sym_block_batch, batch_format="pyarrow")


def sym_prep_batch(t: pa.Table) -> pa.Table:
    """Per-block kernel prep: drop self-loops, canonical lo/hi orientation,
    one-pass symmetrize.  A pure Table → Table function so the fused
    exchange (``bsp.raw_map_dst_exchange``) can run it inside its
    sort/sample task — no Dataset-materialized intermediate."""
    return _sym_block_batch(_orient_batch(_drop_self_loops_batch(t)))


def out_degrees(edges: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """(vertex, degree) from directed edges — groupby count (one shuffle).

    Ref degree stats: ``src/graph.c:234-252``.
    """
    num_partitions = num_partitions or default_partitions()

    def partial(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        if len(s) == 0:
            return pa.table(
                {"vertex": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
            )
        s = np.sort(s)
        change = np.empty(len(s), dtype=bool)
        change[0] = True
        np.not_equal(s[1:], s[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(s)))
        return pa.table({"vertex": s[starts], "degree": counts})

    def combine(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {"vertex": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
            )
        v = t["vertex"].to_numpy(zero_copy_only=False)  # pre-sorted
        d = t["degree"].to_numpy(zero_copy_only=False)
        change = np.empty(len(v), dtype=bool)
        change[0] = True
        np.not_equal(v[1:], v[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        return pa.table(
            {"vertex": v[starts], "degree": np.add.reduceat(d, starts)}
        )

    # block-local partial counts (combiner) → one range exchange → final
    partials = edges.map_batches(partial, batch_format="pyarrow")
    parted = partials.sort("vertex")
    return parted.map_batches(combine, batch_format="pyarrow", batch_size=None)


def undirected_degrees(
    canonical_edges: rd.Dataset, num_partitions: int | None = None
) -> rd.Dataset:
    """Degrees on the undirected simple graph (input must be canonical)."""
    return out_degrees(symmetrize_block(canonical_edges), num_partitions)


def _vertex_batch(t: pa.Table) -> pa.Table:
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    return pa.table({"vertex": np.unique(np.concatenate([src, dst]))})


def vertices_of(edges: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Distinct vertex ids touched by any edge (block unique + repartition)."""
    num_partitions = num_partitions or default_partitions()

    def uniq(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"vertex": pa.array([], pa.int64())})
        return pa.table(
            {"vertex": np.unique(t["vertex"].to_numpy(zero_copy_only=False))}
        )

    flat = edges.map_batches(_vertex_batch, batch_format="pyarrow")
    parted = flat.sort("vertex")
    return parted.map_batches(uniq, batch_format="pyarrow", batch_size=None)


def graph_stats(
    canonical_edges: rd.Dataset, num_partitions: int | None = None
) -> dict[str, float]:
    """V / E / min / max / avg degree (ref ``graph_print_stats``,
    ``src/graph.c:222-253``) — one degree groupby + one scalar aggregate."""
    from ray.data.aggregate import Max, Mean, Min, Sum

    deg = undirected_degrees(canonical_edges, num_partitions).materialize()
    row = deg.aggregate(
        Min("degree", alias_name="min_degree"),
        Max("degree", alias_name="max_degree"),
        Mean("degree", alias_name="avg_degree"),
        Sum("degree", alias_name="_twice_edges"),
        Count(alias_name="num_vertices"),
    )
    return {
        "num_vertices": int(row["num_vertices"]),
        "num_edges": int(row["_twice_edges"] // 2),
        "min_degree": int(row["min_degree"]),
        "max_degree": int(row["max_degree"]),
        "avg_degree": float(row["avg_degree"]),
    }


# -- multiset fingerprint (convergence detection) ---------------------------

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """splitmix64-style mix of an (int64, int64) pair → uint64 (vectorized)."""
    with np.errstate(over="ignore"):
        x = a.astype(np.uint64) * _MIX + (b.astype(np.uint64) ^ _MIX)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _fp_batch(t: pa.Table) -> pa.Table:
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        h = int(_mix64(src, dst).sum(dtype=np.uint64))
    return pa.table({"n": pa.array([len(t)], pa.int64()), "h": pa.array([h], pa.uint64())})


def _fp_loops_batch(t: pa.Table) -> pa.Table:
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    loops = src == dst
    s, d = src[~loops], dst[~loops]
    with np.errstate(over="ignore"):
        h = int(_mix64(s, d).sum(dtype=np.uint64))
    return pa.table(
        {
            "n": pa.array([len(s)], pa.int64()),
            "h": pa.array([h], pa.uint64()),
            "loops": pa.array([int(loops.sum())], pa.int64()),
        }
    )


def fingerprint_and_loops(edges: rd.Dataset) -> tuple[int, int, int]:
    """Like :func:`fingerprint` but over non-loop rows only, plus the count of
    self-loop (``src == dst``) rows — one pass serves both the convergence
    test and the loop-vertex fast-path decision in ``cc``."""
    partials = edges.map_batches(_fp_loops_batch, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in partials)
    loops = sum(p["loops"] for p in partials)
    h = 0
    for p in partials:
        h = (h + int(p["h"])) % (1 << 64)
    return n, h, loops


def fingerprint(edges: rd.Dataset) -> tuple[int, int]:
    """Order-independent multiset fingerprint: (row count, sum of mix64(src,dst)).

    Used as the superstep convergence test (the dataflow analogue of the
    reference's ``MPI_Allreduce`` changed-flag, ``src/mpi/cc_mpi.c:518-525``).
    Collision probability for a 64-bit sum fingerprint is negligible; a
    ``max_rounds`` safety cap backs it up (ref caps at 1000 iterations,
    ``src/mpi/cc_mpi.c:2060``).
    """
    partials = edges.map_batches(_fp_batch, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in partials)
    h = 0
    for p in partials:
        h = (h + int(p["h"])) % (1 << 64)
    return n, h


def modularity(
    edges: rd.Dataset,
    labels: rd.Dataset,
    *,
    num_partitions: int | None = None,
) -> dict:
    """Newman modularity Q of a vertex labeling over the undirected graph
    (Newman & Girvan 2004): ``Q = intra/m − Σ_c (d_c / 2m)²`` over the
    canonical edge set (self-loops dropped, lo/hi oriented, deduped) —
    the community-quality metric that evaluates a CC / label-propagation
    / external clustering against the null model.

    Distributed plan: canonicalize; attach each endpoint's community by
    two broadcast joins (auto bucket fallback past the memory gate —
    ``partition.broadcast_join``); then ``m`` and ``intra`` fold as
    per-block int partials while per-community degrees come from ONE
    groupby over per-block (community, count) partials — each edge
    contributes 1 to both endpoints' communities, so no separate degree
    pass is needed.  Only scalars and the (bounded) per-community
    degree table move; the joined edge table materializes once and is
    consumed by both passes.

    Returns ``{"m": int, "intra": int, "modularity": float}``.  Float
    convention: ``intra/m − ssq/(4·m·m)`` in that exact op order (the
    SQL oracle twin's expression); community-sum order differs from SQL
    by ulps, absorbed by 6-dp rounding at the query layer.
    """
    from linkgraph.partition import broadcast_join
    from linkgraph.runtime import tune_context

    tune_context()
    num_partitions = num_partitions or default_partitions()
    # GLOBAL dedup: a duplicate (u, v) pair surviving across blocks would
    # double-count m, intra AND both endpoints' community degrees
    canon = canonicalize(edges, global_dedup=True)

    def lab_as(t: pa.Table, key: str, out: str) -> pa.Table:
        return pa.table({key: t["vertex"], out: t["label"]})

    l1 = labels.map_batches(lambda t: lab_as(t, "src", "c1"), batch_format="pyarrow")
    l2 = labels.map_batches(lambda t: lab_as(t, "dst", "c2"), batch_format="pyarrow")
    joined = broadcast_join(
        broadcast_join(canon, l1, left_on="src", right_on="src"),
        l2,
        left_on="dst",
        right_on="dst",
    ).materialize()

    def counts_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {"m": pa.array([], pa.int64()), "intra": pa.array([], pa.int64())}
            )
        c1 = t["c1"].to_numpy(zero_copy_only=False)
        c2 = t["c2"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "m": pa.array([len(c1)], pa.int64()),
                "intra": pa.array([int((c1 == c2).sum())], pa.int64()),
            }
        )

    scalars = joined.map_batches(counts_partial, batch_format="pyarrow").take_all()
    m = sum(r["m"] for r in scalars)
    intra = sum(r["intra"] for r in scalars)
    if m == 0:
        return {"m": 0, "intra": 0, "modularity": 0.0}

    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        c = np.concatenate(
            [
                t["c1"].to_numpy(zero_copy_only=False),
                t["c2"].to_numpy(zero_copy_only=False),
            ]
        )
        u, n = np.unique(c, return_counts=True)
        return pa.table({"label": pa.array(u), "cnt": pa.array(n.astype(np.int64))})

    from ray.data.aggregate import Sum

    dc = (
        joined.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("label", num_partitions=num_partitions)
        .aggregate(Sum("cnt", alias_name="d"))
    )

    def ssq_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"s": pa.array([], pa.float64())})
        d = t["d"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"s": pa.array([float((d * d).sum())])})

    ssq = sum(r["s"] for r in dc.map_batches(ssq_partial, batch_format="pyarrow").take_all())
    q = intra / m - ssq / (4.0 * m * m)
    return {"m": int(m), "intra": int(intra), "modularity": q}
