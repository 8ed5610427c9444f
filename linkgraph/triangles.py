"""Triangle counting: degree-ordered orientation + wedge closing.

North-star addition (not in the reference, which supplies only the
edge-once orientation idea, ``src/cc_sequential.c:416-429``).  Standard
dataflow algorithm:

1. canonicalize + **global dedup** (the reference keeps parallel edges,
   ``src/graph.c:75-104`` — triangles need the simple graph, SURVEY.md §2.7);
2. orient every edge from the lower to the higher endpoint in the
   ``(degree, id)`` total order — bounding out-degree by O(√E), which keeps
   the wedge (2-path) set near-linear even on skewed web graphs;
3. wedges = oriented ⋈ oriented on the middle vertex (bucketed hash join);
4. close wedges against the id-canonical edge set with a two-key join;
   every triangle is generated exactly once, at its minimum-rank vertex.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import graph as G
from linkgraph.partition import bucket_join
from linkgraph.runtime import broadcast_gate_rows


BROADCAST_MAX_VERTICES = 50_000_000


def orient_by_degree(
    canon: rd.Dataset,
    num_partitions: int | None = None,
    degrees: rd.Dataset | None = None,
) -> rd.Dataset:
    """Orient id-canonical edges by the (degree, id) total order.

    Below ``BROADCAST_MAX_VERTICES`` the degree vector is broadcast once
    and the orientation is a single map pass (no joins); above, two
    bucketed joins attach degrees distributedly.  ``degrees`` lets a caller
    that already materialized the (vertex, degree) table reuse it.
    """
    import ray

    num_partitions = num_partitions or G.default_partitions()
    deg = (
        degrees
        if degrees is not None
        else G.undirected_degrees(canon, num_partitions).materialize()
    )
    num_v = deg.count()
    if num_v <= broadcast_gate_rows(16, BROADCAST_MAX_VERTICES):
        vs, gs = [], []
        for b in deg.iter_batches(batch_size=1 << 22, batch_format="pyarrow"):
            vs.append(b["vertex"].to_numpy(zero_copy_only=False))
            gs.append(b["degree"].to_numpy(zero_copy_only=False))
        ids = np.concatenate(vs) if vs else np.empty(0, np.int64)
        dg = np.concatenate(gs) if gs else np.empty(0, np.int64)
        order = np.argsort(ids, kind="stable")
        ids, dg = ids[order], dg[order]
        ref = ray.put((ids, dg))

        def orient_bcast(t: pa.Table, ref=ref) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return pa.table(
                    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
                )
            ids_, dg_ = ray.get(ref)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            ds_ = dg_[np.searchsorted(ids_, s)]
            dd = dg_[np.searchsorted(ids_, d)]
            fwd = (ds_ < dd) | ((ds_ == dd) & (s < d))
            return pa.table(
                {"a": np.where(fwd, s, d), "b": np.where(fwd, d, s)}
            )

        return canon.map_batches(orient_bcast, batch_format="pyarrow")

    with_src = bucket_join(
        canon,
        deg.map_batches(
            lambda t: pa.table({"src": t["vertex"], "dsrc": t["degree"]}),
            batch_format="pyarrow",
        ),
        ["src"],
        num_buckets=num_partitions,
        left_payload={"dst": pa.int64()},
        right_payload={"dsrc": pa.int64()},
    )
    with_both = bucket_join(
        with_src,
        deg.map_batches(
            lambda t: pa.table({"dst": t["vertex"], "ddst": t["degree"]}),
            batch_format="pyarrow",
        ),
        ["dst"],
        num_buckets=num_partitions,
        left_payload={"src": pa.int64(), "dsrc": pa.int64()},
        right_payload={"ddst": pa.int64()},
    )

    def orient(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        ds_ = t["dsrc"].to_numpy(zero_copy_only=False)
        dd = t["ddst"].to_numpy(zero_copy_only=False)
        fwd = (ds_ < dd) | ((ds_ == dd) & (s < d))
        return pa.table(
            {
                "a": np.where(fwd, s, d),
                "b": np.where(fwd, d, s),
            }
        )

    return with_both.map_batches(orient, batch_format="pyarrow")


def triangle_count(
    edges: rd.Dataset, *, num_partitions: int | None = None, mode: str = "auto"
) -> int:
    """Exact global triangle count of the undirected simple graph.

    ``mode="auto"`` (and ``"bsp"``) uses the raw-task BSP path
    (``linkgraph.triangles_bsp``): one range exchange, a degree
    request/reply round instead of a degree broadcast or join, and
    owner-side wedge closing — no state envelope at any vertex count.
    ``mode="dataflow"`` keeps the join-based pipeline below (degree
    broadcast under 50 M vertices, bucketed joins above)."""
    from linkgraph.runtime import tune_context

    tune_context()
    if mode in ("auto", "bsp"):
        from linkgraph.triangles_bsp import triangle_count_bsp

        return triangle_count_bsp(edges)
    if mode != "dataflow":
        raise ValueError(f"unknown mode {mode!r}")
    num_partitions = num_partitions or G.default_partitions()
    canon = G.canonicalize(edges, global_dedup=True).materialize()
    # coalesce join-fragmented blocks before the double-consumed materialize
    oriented = (
        orient_by_degree(canon, num_partitions).repartition(num_partitions).materialize()
    )

    wedges = bucket_join(
        oriented.map_batches(
            lambda t: pa.table({"mid": t["a"], "x": t["b"]}), batch_format="pyarrow"
        ),
        oriented.map_batches(
            lambda t: pa.table({"mid": t["a"], "y": t["b"]}), batch_format="pyarrow"
        ),
        ["mid"],
        num_buckets=num_partitions,
        left_payload={"x": pa.int64()},
        right_payload={"y": pa.int64()},
    )

    def normalize(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        keep = x < y  # one of (x,y)/(y,x); drops x==y self-pairs
        return pa.table({"src": x[keep], "dst": y[keep]})

    open_wedges = wedges.map_batches(normalize, batch_format="pyarrow")
    closed = bucket_join(
        open_wedges,
        canon.map_batches(
            lambda t: t.append_column(
                "hit", pa.array(np.ones(len(t), dtype=np.int8))
            ),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
        num_buckets=num_partitions,
        left_payload={},
        right_payload={"hit": pa.int8()},
    )
    return closed.count()


def local_clustering(
    edges: rd.Dataset, *, num_partitions: int | None = None
) -> rd.Dataset:
    """Per-vertex triangle participation + local clustering coefficient.

    Returns a (vertex, degree, n_triangles, lcc) Dataset over the simple
    undirected graph, ``lcc = 2·T_v / (deg_v·(deg_v−1))`` (0.0 when
    deg_v < 2) — the standard per-vertex transitivity measure.

    Same dataflow as :func:`triangle_count` in ``mode="dataflow"`` with the
    wedge apex carried through the closing join, so each closed triangle
    credits its three vertices exactly once.  Scale shape: triangle credits
    pre-aggregate per block (``np.unique`` combiner) before ONE
    vertex-range exchange, and the degree attach is a union-combine (the
    degree rows and the triangle partials flow into the same sort keyed by
    vertex; a per-block ``reduceat`` folds them) — no extra join, output is
    vertex-sized.
    """
    from linkgraph.runtime import tune_context

    tune_context()
    num_partitions = num_partitions or G.default_partitions()
    canon = G.canonicalize(edges, global_dedup=True).materialize()
    deg = G.undirected_degrees(canon, num_partitions).materialize()
    oriented = (
        orient_by_degree(canon, num_partitions, degrees=deg)
        .repartition(num_partitions)
        .materialize()
    )

    wedges = bucket_join(
        oriented.map_batches(
            lambda t: pa.table({"mid": t["a"], "x": t["b"]}), batch_format="pyarrow"
        ),
        oriented.map_batches(
            lambda t: pa.table({"mid": t["a"], "y": t["b"]}), batch_format="pyarrow"
        ),
        ["mid"],
        num_buckets=num_partitions,
        left_payload={"x": pa.int64()},
        right_payload={"y": pa.int64()},
    )

    def normalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "apex": pa.array([], pa.int64()),
                }
            )
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        m = t["mid"].to_numpy(zero_copy_only=False)
        keep = x < y  # one of (x,y)/(y,x); drops x==y self-pairs
        return pa.table({"src": x[keep], "dst": y[keep], "apex": m[keep]})

    closed = bucket_join(
        wedges.map_batches(normalize, batch_format="pyarrow"),
        canon.map_batches(
            lambda t: t.append_column(
                "hit", pa.array(np.ones(len(t), dtype=np.int8))
            ),
            batch_format="pyarrow",
        ),
        ["src", "dst"],
        num_buckets=num_partitions,
        left_payload={"apex": pa.int64()},
        right_payload={"hit": pa.int8()},
    )

    def tri_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "vertex": pa.array([], pa.int64()),
                    "degree": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        v = np.concatenate(
            [t[c].to_numpy(zero_copy_only=False) for c in ("apex", "src", "dst")]
        )
        vv, cc = np.unique(v, return_counts=True)
        return pa.table(
            {
                "vertex": vv.astype(np.int64, copy=False),
                "degree": np.zeros(len(vv), dtype=np.int64),
                "cnt": cc.astype(np.int64, copy=False),
            }
        )

    def deg_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "vertex": pa.array([], pa.int64()),
                    "degree": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "vertex": t["vertex"],
                "degree": t["degree"],
                "cnt": np.zeros(len(t), dtype=np.int64),
            }
        )

    tagged = closed.map_batches(tri_partial, batch_format="pyarrow").union(
        deg.map_batches(deg_rows, batch_format="pyarrow")
    )
    parted = tagged.sort("vertex")  # range exchange co-locates each vertex

    def combine(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "vertex": pa.array([], pa.int64()),
                    "degree": pa.array([], pa.int64()),
                    "n_triangles": pa.array([], pa.int64()),
                    "lcc": pa.array([], pa.float64()),
                }
            )
        v = t["vertex"].to_numpy(zero_copy_only=False)  # pre-sorted
        d = t["degree"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False)
        change = np.empty(len(v), dtype=bool)
        change[0] = True
        np.not_equal(v[1:], v[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        dv = np.add.reduceat(d, starts)
        tv = np.add.reduceat(c, starts)
        denom = dv * (dv - 1)
        lcc = np.where(denom > 0, (2.0 * tv) / np.maximum(denom, 1), 0.0)
        return pa.table(
            {
                "vertex": v[starts],
                "degree": dv,
                "n_triangles": tv,
                "lcc": lcc,
            }
        )

    return parted.map_batches(combine, batch_format="pyarrow", batch_size=None)
