"""Adversarial-shape coverage for every kernel EXECUTION MODE.

The aliasing regression (see tests/test_cc.py two-level-star tests) showed
that kernels can be green on every random planted fixture and still wrong
on structured topologies whose min-propagation chains outlive one sweep.
These tests push the shapes through each forced execution mode — including
the sharded/BSP scale paths that auto-gating never selects at test sizes —
against the NumPy oracles.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph import graph as G, oracle
from linkgraph.cc import connected_components
from linkgraph.labelprop import label_propagation
from linkgraph.pagerank import pagerank
from linkgraph.triangles import triangle_count


def two_level_star() -> pa.Table:
    """150 leaves → 25 hubs → 5 super-hubs (the membership-graph shape)."""
    cust = np.arange(150, dtype=np.int64)
    nat = 1_000 + (cust % 25)
    nk = np.arange(25, dtype=np.int64)
    return pa.table(
        {
            "src": np.concatenate([cust, 1_000 + nk]),
            "dst": np.concatenate([nat, 2_000 + (nk % 5)]),
        }
    )


def long_chain(n=301) -> pa.Table:
    """Path graph: diameter n-1, worst case for per-hop propagation."""
    v = np.arange(n, dtype=np.int64)
    return pa.table({"src": v[:-1], "dst": v[1:]})


def shuffled_chain(n=301, seed=7) -> pa.Table:
    """Path over a random id permutation: min sits mid-chain, ids give no
    ordering hint, and lo/hi orientation flips edge by edge."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n).astype(np.int64)
    return pa.table({"src": perm[:-1], "dst": perm[1:]})


def bipartite_k(a=40, b=7) -> pa.Table:
    """Complete bipartite K(a,b): heavy skew on the b side, zero triangles."""
    aa = np.repeat(np.arange(a, dtype=np.int64), b)
    bb = np.tile(1_000 + np.arange(b, dtype=np.int64), a)
    return pa.table({"src": aa, "dst": bb})


SHAPES = {
    "two_level_star": two_level_star,
    "long_chain": long_chain,
    "shuffled_chain": shuffled_chain,
    "bipartite": bipartite_k,
}


def _cc_oracle_map(t: pa.Table) -> dict[int, int]:
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    labels = oracle.cc_labels(src, dst)
    touched = np.unique(np.concatenate([src, dst]))
    return {int(v): int(labels[v]) for v in touched}


@pytest.mark.parametrize("shape", sorted(SHAPES))
@pytest.mark.parametrize("mode", ["auto", "shuffle", "broadcast", "sharded"])
def test_cc_modes_on_shapes(shape, mode):
    t = SHAPES[shape]()
    res = connected_components(
        G.from_arrow_edges(t), num_partitions=4, mode=mode,
        local_finish_threshold=0,
    )
    got = {r["vertex"]: r["label"] for r in res.labels.take_all()}
    assert got == _cc_oracle_map(t), (shape, mode)


@pytest.mark.parametrize("shape", sorted(SHAPES))
@pytest.mark.parametrize("mode", ["broadcast", "sharded", "shuffle"])
def test_labelprop_modes_on_shapes(shape, mode):
    t = SHAPES[shape]()
    if mode == "shuffle" and shape in ("long_chain", "shuffled_chain"):
        # one distributed bucket-join superstep per hop: cap the diameter
        # so the forced-dataflow leg stays test-sized (the full 300-hop
        # chains run through the driver-round modes above; deep lineage is
        # pinned separately in test_checkpoint.py)
        t = long_chain(48) if shape == "long_chain" else shuffled_chain(48)
    res = label_propagation(G.from_arrow_edges(t), num_partitions=4, mode=mode)
    got = {r["vertex"]: r["label"] for r in res.labels.take_all()}
    assert got == _cc_oracle_map(t), (shape, mode)


@pytest.mark.parametrize("shape", sorted(SHAPES))
@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_pagerank_undirected_modes_on_shapes(shape, mode):
    """mode='shuffle' on the fast-undirected path is the BSP sharded-state
    scale path; 'broadcast' is the indexed Allgatherv analogue."""
    t = SHAPES[shape]()
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    touched = np.sort(np.unique(np.concatenate([src, dst])))
    remap = {int(v): i for i, v in enumerate(touched)}
    sc = np.array([remap[int(v)] for v in src])
    dc = np.array([remap[int(v)] for v in dst])
    exp = oracle.pagerank(
        np.concatenate([sc, dc]), np.concatenate([dc, sc]), len(touched)
    )
    res = pagerank(
        G.from_arrow_edges(t), directed=False, num_partitions=4,
        tol=1e-12, mode=mode,
    )
    got_map = {r["vertex"]: r["rank"] for r in res.ranks.take_all()}
    got = np.array([got_map[int(v)] for v in touched])
    assert np.allclose(got, exp, atol=1e-6), (shape, mode)


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_pagerank_directed_bsp_on_shapes(shape):
    """Vertex-implicit directed runs take the BSP directed path (dangling
    mass per superstep — stars/bipartite sinks stress it)."""
    t = SHAPES[shape]()
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    touched = np.sort(np.unique(np.concatenate([src, dst])))
    remap = {int(v): i for i, v in enumerate(touched)}
    sc = np.array([remap[int(v)] for v in src])
    dc = np.array([remap[int(v)] for v in dst])
    exp = oracle.pagerank(sc, dc, len(touched))
    res = pagerank(G.from_arrow_edges(t), directed=True, num_partitions=4, tol=1e-12)
    got_map = {r["vertex"]: r["rank"] for r in res.ranks.take_all()}
    got = np.array([got_map[int(v)] for v in touched])
    assert np.allclose(got, exp, atol=1e-6), shape


@pytest.mark.parametrize("shape", sorted(SHAPES))
@pytest.mark.parametrize("mode", ["bsp", "dataflow"])
def test_triangles_modes_on_shapes(shape, mode):
    t = SHAPES[shape]()
    exp = oracle.triangle_count(t["src"].to_numpy(), t["dst"].to_numpy())
    assert (
        triangle_count(G.from_arrow_edges(t), num_partitions=4, mode=mode) == exp
    ), (shape, mode)


def int32_straddle_graph(n=40) -> pa.Table:
    """Triangle fan + chain whose ids sit on BOTH sides of 2^31: some
    exchange ranges int32-compact, others must stay int64, and hot-path
    concatenations mix the two dtypes (the bsp compact-output contract's
    adversarial case)."""
    lo = np.arange(n, dtype=np.int64) * 3
    hi = (np.int64(1) << 31) + 7 + np.arange(n, dtype=np.int64) * 5
    v = np.empty(2 * n, dtype=np.int64)
    v[0::2] = lo
    v[1::2] = hi
    chain = pa.table({"src": v[:-1], "dst": v[1:]})
    # one triangle on each side of the 2^31 boundary and one straddling it
    tri = pa.table(
        {
            "src": np.array([0, 3, 0, int(hi[0]), int(hi[1]), int(hi[0]), 0, 0],
                            dtype=np.int64),
            "dst": np.array([3, 6, 6, int(hi[1]), int(hi[2]), int(hi[2]),
                             int(hi[0]), int(hi[1])], dtype=np.int64),
        }
    )
    return pa.concat_tables([chain, tri])


@pytest.mark.parametrize("mode", ["shuffle", "broadcast", "sharded"])
def test_cc_modes_on_int32_straddling_ids(mode):
    t = int32_straddle_graph()
    res = connected_components(
        G.from_arrow_edges(t), num_partitions=4, mode=mode,
        local_finish_threshold=0,
    )
    labs = res.labels.take_all()
    verts = {int(r["vertex"]) for r in labs}
    assert verts == set(
        np.unique(np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])).tolist()
    )
    assert res.num_components == 1
    assert all(int(r["label"]) == 0 for r in labs), mode
    # internal compaction must never leak: output schema stays int64
    sch = res.labels.schema()
    assert dict(zip(sch.names, sch.types))["vertex"] == pa.int64()
    assert dict(zip(sch.names, sch.types))["label"] == pa.int64()


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_pagerank_on_int32_straddling_ids(mode):
    t = int32_straddle_graph()
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    touched = np.sort(np.unique(np.concatenate([src, dst])))
    remap = {int(v): i for i, v in enumerate(touched)}
    sc = np.array([remap[int(v)] for v in src])
    dc = np.array([remap[int(v)] for v in dst])
    exp = oracle.pagerank(
        np.concatenate([sc, dc]), np.concatenate([dc, sc]), len(touched)
    )
    res = pagerank(
        G.from_arrow_edges(t), directed=False, num_partitions=4,
        tol=1e-12, mode=mode,
    )
    got_map = {r["vertex"]: r["rank"] for r in res.ranks.take_all()}
    got = np.array([got_map[int(v)] for v in touched])
    assert np.allclose(got, exp, atol=1e-6), mode


@pytest.mark.parametrize("mode", ["bsp", "dataflow"])
def test_triangles_on_int32_straddling_ids(mode):
    t = int32_straddle_graph()
    exp = oracle.triangle_count(t["src"].to_numpy(), t["dst"].to_numpy())
    assert exp >= 3  # triangles on both sides of 2^31 and straddling it
    assert triangle_count(G.from_arrow_edges(t), num_partitions=4, mode=mode) == exp


@pytest.mark.parametrize("mode", ["broadcast", "sharded"])
def test_labelprop_on_int32_straddling_ids(mode):
    t = int32_straddle_graph()
    res = label_propagation(G.from_arrow_edges(t), num_partitions=4, mode=mode)
    assert all(int(r["label"]) == 0 for r in res.labels.take_all()), mode


def test_asof_join_semantics():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.partition import asof_join

    ts = lambda s: np.datetime64(s, "us")
    left = pa.table(
        {
            "k": np.array([1, 1, 2, 3], dtype=np.int64),
            "lt": np.array([ts("2025-01-05"), ts("2025-01-01"), ts("2025-01-10"), ts("2025-01-10")]),
            "eid": np.array([10, 11, 12, 13], dtype=np.int64),
        }
    )
    right = pa.table(
        {
            "k": np.array([1, 1, 2], dtype=np.int64),
            "rt": np.array([ts("2025-01-02"), ts("2025-01-04"), ts("2025-01-10")]),
            "pay": np.array([100, 200, 300], dtype=np.int64),
        }
    )
    out = asof_join(
        rd.from_arrow(left).repartition(3),
        rd.from_arrow(right).repartition(2),
        key="k", left_ts="lt", right_ts="rt",
        left_payload={"eid": pa.int64()}, right_payload={"pay": pa.int64()},
        num_buckets=4,
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    # eid 10: latest rt <= 01-05 is 01-04 (pay 200); eid 11: none (dropped);
    # eid 12: exact match 01-10 (pay 300); eid 13: key 3 has no right rows
    assert list(out["eid"]) == [10, 12]
    assert list(out["pay"]) == [200, 300]


def test_range_join_semantics():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.partition import range_join

    ts = lambda s: np.datetime64(s, "us")
    left = pa.table(
        {
            "k": np.array([1, 1, 1, 2], dtype=np.int64),
            "lt": np.array([ts("2025-01-01"), ts("2025-01-03"), ts("2025-01-08"), ts("2025-01-03")]),
            "eid": np.array([10, 11, 12, 13], dtype=np.int64),
        }
    )
    # overlapping windows for key 1; hi is exclusive
    right = pa.table(
        {
            "k": np.array([1, 1, 2], dtype=np.int64),
            "lo": np.array([ts("2025-01-01"), ts("2025-01-02"), ts("2025-01-03")]),
            "hi": np.array([ts("2025-01-03"), ts("2025-01-09"), ts("2025-01-04")]),
            "w": np.array([1, 2, 3], dtype=np.int64),
        }
    )
    out = range_join(
        rd.from_arrow(left).repartition(2),
        rd.from_arrow(right).repartition(2),
        key="k", left_ts="lt", right_lo="lo", right_hi="hi",
        left_payload={"eid": pa.int64()}, right_payload={"w": pa.int64()},
        num_buckets=4,
    ).to_pandas()
    pairs = sorted(zip(out["eid"], out["w"]))
    # eid10 in w1 ([01,03)) only; eid11 in w2 ([02,09)); eid12 in w2;
    # eid13 (key 2) in w3 ([03,04)); 01-03 excluded from w1 (hi exclusive)
    assert pairs == [(10, 1), (11, 2), (12, 2), (13, 3)]


def test_bucket_join_salting_matches_unsalted_on_skew():
    """Hot-key salting (replicate right side × salt, split left by hash):
    identical join result on a heavily skewed key distribution."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.partition import bucket_join

    rng = np.random.default_rng(5)
    # 90% of left rows share one hub key
    k = np.where(rng.random(20_000) < 0.9, 7, rng.integers(0, 50, 20_000))
    left = pa.table(
        {"key": k.astype(np.int64), "lv": np.arange(20_000, dtype=np.int64)}
    )
    right = pa.table(
        {
            "key": np.arange(50, dtype=np.int64),
            "rv": np.arange(50, dtype=np.int64) * 10,
        }
    )

    def run(salt):
        out = bucket_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(2),
            ["key"],
            num_buckets=4,
            salt=salt,
            left_payload={"lv": pa.int64()},
            right_payload={"rv": pa.int64()},
        ).to_pandas()
        return out.sort_values(["key", "lv"]).reset_index(drop=True)

    a, b = run(1), run(4)
    assert len(a) == 20_000
    assert a.equals(b)


def test_broadcast_join_paths_agree_and_gate_before_pull():
    """broadcast_join must produce identical results on both sides of the
    max_rows gate, and the oversized-right fallback must NOT materialize the
    right side onto the driver (ADVICE r2: count() gates before any
    to_arrow_refs pull)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.partition import broadcast_join

    rng = np.random.default_rng(11)
    left = pa.table(
        {
            "key": rng.integers(0, 200, 5_000).astype(np.int64),
            "lv": np.arange(5_000, dtype=np.int64),
        }
    )
    right = pa.table(
        {
            "key": np.arange(200, dtype=np.int64),
            "rv": np.arange(200, dtype=np.int64) * 3,
        }
    )

    def run(max_rows):
        out = broadcast_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(2),
            left_on="key",
            right_on="key",
            max_rows=max_rows,
        ).to_pandas()
        return out.sort_values(["key", "lv"]).reset_index(drop=True)

    small = run(1_000)  # broadcast path
    big = run(50)  # right (200 rows) exceeds gate -> bucket_join fallback
    assert len(small) == 5_000
    assert small.equals(big)
    assert (small["rv"] == small["key"] * 3).all()


def test_bucket_join_outer_matches_pandas_full_outer():
    """how='outer' must keep unmatched rows of BOTH sides null-padded —
    checked against a pandas full-outer merge on a fixture with left-only,
    right-only and matched keys (including right-side key duplicates), and
    it must refuse to compose with salting (ADVICE r3)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from linkgraph.partition import bucket_join

    left = pa.table(
        {
            "key": np.array([1, 2, 2, 3, 5], dtype=np.int64),
            "lv": np.arange(5, dtype=np.int64),
        }
    )
    right = pa.table(
        {
            "key": np.array([2, 3, 3, 4], dtype=np.int64),
            "rv": np.array([20, 30, 31, 40], dtype=np.int64),
        }
    )
    got = (
        bucket_join(
            rd.from_arrow(left).repartition(3),
            rd.from_arrow(right).repartition(2),
            ["key"],
            num_buckets=4,
            how="outer",
            left_payload={"lv": pa.int64()},
            right_payload={"rv": pa.int64()},
        )
        .to_pandas()
        .sort_values(["key", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), on="key", how="outer")
        .sort_values(["key", "lv", "rv"])
        .reset_index(drop=True)
    )
    # keys 1,5 left-only; 4 right-only; key 2: 2 left x 1 right; key 3:
    # 1 left x 2 right -> 1+1+1+2+2 = 7 rows
    assert len(got) == len(want) == 7
    for c in ("key", "lv", "rv"):
        pd.testing.assert_series_equal(
            got[c].astype("Float64"), want[c].astype("Float64"), check_names=False
        )

    with pytest.raises(ValueError, match="outer"):
        bucket_join(
            rd.from_arrow(left),
            rd.from_arrow(right),
            ["key"],
            salt=2,
            how="outer",
            left_payload={"lv": pa.int64()},
            right_payload={"rv": pa.int64()},
        )


def test_memory_gate_forces_sharded_handoff(monkeypatch):
    """broadcast_gate_rows derives the broadcast envelope from cluster
    resources at call time; shrinking it via the override env var must
    flip every auto-gated kernel onto its beyond-gate scale path with
    identical results (VERDICT r3 "Next round" #4)."""
    from linkgraph.runtime import broadcast_gate_rows

    # derived gate: min(measured crossover, memory envelope) — on any
    # initialized session it must be positive and never exceed the
    # crossover constant
    g = broadcast_gate_rows(24, 50_000_000)
    assert 0 < g <= 50_000_000

    t = two_level_star()
    want = _cc_oracle_map(t)

    def labels_map(res):
        df = res.labels.to_pandas()
        return dict(zip(df["vertex"].astype(int), df["label"].astype(int)))

    base_cc = labels_map(connected_components(rd.from_arrow(t), num_partitions=4))
    base_pr = (
        pagerank(rd.from_arrow(t), directed=False, num_partitions=4,
                 tol=0.0, max_iters=3)
        .ranks.to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )

    monkeypatch.setenv("LINKGRAPH_BROADCAST_GATE_ROWS", "1")
    assert broadcast_gate_rows(24, 50_000_000) == 1  # override wins

    gated_cc = labels_map(connected_components(rd.from_arrow(t), num_partitions=4))
    assert gated_cc == base_cc == want

    gated_lp = labels_map(label_propagation(rd.from_arrow(t), num_partitions=4))
    assert gated_lp == want

    gated_pr = (
        pagerank(rd.from_arrow(t), directed=False, num_partitions=4,
                 tol=0.0, max_iters=3)
        .ranks.to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    assert np.allclose(
        gated_pr["rank"].to_numpy(), base_pr["rank"].to_numpy(), atol=1e-9
    )

    assert triangle_count(rd.from_arrow(t), num_partitions=4, mode="dataflow") == 0


def test_broadcast_join_auto_gate_obeys_runtime_envelope(monkeypatch):
    """With max_rows unset, broadcast_join derives its gate from
    runtime.broadcast_gate_rows (cluster-memory envelope, same as the
    kernels — VERDICT r4 #5); shrinking the envelope via the override env
    var must force the bucket_join fallback with identical results."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.partition import broadcast_join

    rng = np.random.default_rng(23)
    left = pa.table(
        {
            "key": rng.integers(0, 300, 4_000).astype(np.int64),
            "lv": np.arange(4_000, dtype=np.int64),
        }
    )
    right = pa.table(
        {
            "key": np.arange(300, dtype=np.int64),
            "rv": np.arange(300, dtype=np.int64) * 7,
        }
    )

    def run():
        out = broadcast_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(2),
            left_on="key",
            right_on="key",
        ).to_pandas()
        return out.sort_values(["key", "lv"]).reset_index(drop=True)

    auto = run()  # derived gate >= 300 on any real box -> broadcast path
    monkeypatch.setenv("LINKGRAPH_BROADCAST_GATE_ROWS", "50")
    forced = run()  # right (300 rows) over the shrunk gate -> bucket_join
    assert len(auto) == 4_000
    assert auto.equals(forced)
    assert (auto["rv"] == auto["key"] * 7).all()
