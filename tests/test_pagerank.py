"""PageRank vs dense NumPy power iteration, allclose(1e-6) (north rule)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import graph as G, oracle, synth
from linkgraph.pagerank import pagerank


def ranks_vec(ds, n, id_map=None):
    out = np.zeros(n)
    for r in ds.take_all():
        v = id_map[r["vertex"]] if id_map else r["vertex"]
        out[v] = r["rank"]
    return out


def test_golden_micro_pagerank_directed():
    edges, _ = synth.golden_micro()
    verts = rd.from_arrow(pa.table({"vertex": np.arange(6, dtype=np.int64)}))
    res = pagerank(G.from_arrow_edges(edges), vertices=verts, num_partitions=2, tol=1e-12)
    exp = oracle.pagerank(edges["src"].to_numpy(), edges["dst"].to_numpy(), 6)
    got = ranks_vec(res.ranks, 6)
    assert np.allclose(got, exp, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_planted_pagerank_directed():
    edges, _ = synth.make_planted_graph(500, 4, 5, seed=17)
    res = pagerank(G.from_arrow_edges(edges), num_partitions=4, tol=1e-12)
    exp = oracle.pagerank(edges["src"].to_numpy(), edges["dst"].to_numpy(), 500)
    got = ranks_vec(res.ranks, 500)
    # vertices with no edges at all aren't in the engine result; compare touched
    touched = np.unique(
        np.concatenate([edges["src"].to_numpy(), edges["dst"].to_numpy()])
    )
    # oracle normalizes over 500 vertices; engine over touched count — rerun
    # oracle on the compacted vertex set for an apples-to-apples check
    remap = {int(v): i for i, v in enumerate(touched)}
    src_c = np.array([remap[int(v)] for v in edges["src"].to_numpy()])
    dst_c = np.array([remap[int(v)] for v in edges["dst"].to_numpy()])
    exp_c = oracle.pagerank(src_c, dst_c, len(touched))
    got_c = np.array(
        [
            dict((r["vertex"], r["rank"]) for r in res.ranks.take_all())[int(v)]
            for v in touched
        ]
    )
    assert np.allclose(got_c, exp_c, atol=1e-6)


def test_pagerank_undirected_mode():
    edges, _ = synth.golden_micro()
    verts = rd.from_arrow(pa.table({"vertex": np.arange(6, dtype=np.int64)}))
    res = pagerank(
        G.from_arrow_edges(edges), directed=False, vertices=verts, num_partitions=2,
        tol=1e-12,
    )
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    exp = oracle.pagerank(
        np.concatenate([src, dst]), np.concatenate([dst, src]), 6
    )
    got = ranks_vec(res.ranks, 6)
    assert np.allclose(got, exp, atol=1e-6)


def test_pagerank_undirected_implicit_vertices_indexed_broadcast():
    # the fast_undirected path (bench headline config): one dst-keyed
    # shuffle + int32-indexed broadcast supersteps
    edges, _ = synth.make_planted_graph(400, 4, 5, seed=31)
    res = pagerank(G.from_arrow_edges(edges), directed=False, num_partitions=4, tol=1e-12)
    assert res.metrics[-1]["mode"] == "broadcast"
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    exp = oracle.pagerank(
        np.concatenate([src, dst]), np.concatenate([dst, src]), 400
    )
    got = ranks_vec(res.ranks, 400)
    assert res.num_vertices == 400
    assert np.allclose(got, exp, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_deterministic_across_partitioning():
    edges, _ = synth.make_planted_graph(300, 3, 4, seed=23)
    a = pagerank(G.from_arrow_edges(edges).repartition(2), num_partitions=2, tol=1e-10)
    b = pagerank(G.from_arrow_edges(edges).repartition(8), num_partitions=8, tol=1e-10)
    assert a.num_iterations == b.num_iterations
    ra = {r["vertex"]: r["rank"] for r in a.ranks.take_all()}
    rb = {r["vertex"]: r["rank"] for r in b.ranks.take_all()}
    assert set(ra) == set(rb)
    assert all(abs(ra[k] - rb[k]) < 1e-12 for k in ra)


def test_pagerank_undirected_bsp_shuffle_mode():
    # forced shuffle exercises the >BROADCAST_MAX_VERTICES scale path:
    # BSP supersteps over dst-sorted blocks with object-store-sharded state
    edges, _ = synth.make_planted_graph(400, 4, 5, seed=31)
    res = pagerank(
        G.from_arrow_edges(edges), directed=False, num_partitions=4,
        tol=1e-12, mode="shuffle",
    )
    assert res.metrics[-1]["mode"] == "shuffle"
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    exp = oracle.pagerank(
        np.concatenate([src, dst]), np.concatenate([dst, src]), 400
    )
    got = ranks_vec(res.ranks, 400)
    assert res.num_vertices == 400
    assert np.allclose(got, exp, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_bsp_shuffle_matches_broadcast():
    edges, _ = synth.make_planted_graph(300, 3, 4, seed=23)
    a = pagerank(G.from_arrow_edges(edges), directed=False, num_partitions=4, tol=1e-10)
    b = pagerank(
        G.from_arrow_edges(edges), directed=False, num_partitions=4,
        tol=1e-10, mode="shuffle",
    )
    ra = {r["vertex"]: r["rank"] for r in a.ranks.take_all()}
    rb = {r["vertex"]: r["rank"] for r in b.ranks.take_all()}
    assert set(ra) == set(rb)
    assert all(abs(ra[k] - rb[k]) < 1e-9 for k in ra)


def test_pagerank_directed_bsp_matches_dataflow():
    """The directed BSP path (implicit vertices) and the bucket-join
    dataflow path (explicit vertices) agree on the same graph."""
    edges, _ = synth.make_planted_graph(600, 3, 4, seed=71)
    ds = G.from_arrow_edges(edges)
    bsp_res = pagerank(ds, num_partitions=4, tol=1e-12)
    assert bsp_res.metrics[-1]["mode"] == "bsp_directed"
    touched = rd.from_arrow(
        pa.table(
            {
                "vertex": np.unique(
                    np.concatenate(
                        [
                            edges["src"].to_numpy(zero_copy_only=False),
                            edges["dst"].to_numpy(zero_copy_only=False),
                        ]
                    )
                )
            }
        )
    )
    df_res = pagerank(ds, vertices=touched, num_partitions=4, tol=1e-12)
    a = {r["vertex"]: r["rank"] for r in bsp_res.ranks.take_all()}
    b = {r["vertex"]: r["rank"] for r in df_res.ranks.take_all()}
    assert a.keys() == b.keys()
    assert all(abs(a[v] - b[v]) < 1e-9 for v in a)


def test_pagerank_directed_bsp_checkpoint_resume(tmp_ckpt):
    from linkgraph.checkpoint import Checkpointer

    edges, _ = synth.make_planted_graph(800, 2, 4, seed=73)
    ck = Checkpointer(tmp_ckpt, "prdir")
    full = pagerank(
        G.from_arrow_edges(edges), tol=0.0, max_iters=6, checkpointer=ck
    )
    assert full.metrics[-1]["mode"] == "bsp_directed"
    import os, shutil
    d = os.path.join(tmp_ckpt, "prdir")
    for name in sorted(os.listdir(d))[3:]:
        shutil.rmtree(os.path.join(d, name))
    resumed = pagerank(
        G.from_arrow_edges(edges), tol=0.0, max_iters=3, checkpointer=ck, resume=True
    )
    want = {r["vertex"]: r["rank"] for r in full.ranks.take_all()}
    got = {r["vertex"]: r["rank"] for r in resumed.ranks.take_all()}
    assert want.keys() == got.keys()
    assert all(abs(want[v] - got[v]) < 1e-12 for v in want)


def test_pagerank_explicit_isolated_vertices_get_teleport_share():
    """Explicit vertex set with isolated ids: they are dangling (out-degree
    0) AND receive only the teleport+dangling share — must match the dense
    oracle, and ranks must still sum to 1."""
    src = np.array([0, 1, 3, 3], dtype=np.int64)
    dst = np.array([1, 2, 4, 5], dtype=np.int64)
    verts = rd.from_arrow(pa.table({"vertex": np.arange(8, dtype=np.int64)}))
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    res = pagerank(edges, directed=True, vertices=verts, num_partitions=4, tol=1e-13)
    exp = oracle.pagerank(src, dst, 8)
    got = ranks_vec(res.ranks, 8)
    assert np.allclose(got, exp, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_multigraph_duplicates_and_loops_collapse():
    """Parallel edges and self-loops: the engine dedups and drops loops
    (src/graph.c:71-104 keeps them — PageRank explicitly diverges, SURVEY
    §2.7); result must equal the oracle on the cleaned simple graph."""
    src = np.array([0, 0, 0, 1, 2, 2, 3], dtype=np.int64)
    dst = np.array([1, 1, 1, 2, 2, 0, 3], dtype=np.int64)  # dup 0→1 ×3, loop 2→2, loop 3→3
    clean_s = np.array([0, 1, 2], dtype=np.int64)
    clean_d = np.array([1, 2, 0], dtype=np.int64)
    verts = rd.from_arrow(pa.table({"vertex": np.arange(4, dtype=np.int64)}))
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    res = pagerank(edges, directed=True, vertices=verts, num_partitions=2, tol=1e-13)
    exp = oracle.pagerank(clean_s, clean_d, 4)
    got = ranks_vec(res.ranks, 4)
    assert np.allclose(got, exp, atol=1e-6)


# --- weighted PageRank (north-star extension) --------------------------------

def _wpr_oracle_undirected(t, tol=1e-12):
    src = t["src"].to_numpy()
    dst = t["dst"].to_numpy()
    w = t["w"].to_numpy()
    touched = np.sort(np.unique(np.concatenate([src, dst])))
    remap = {int(v): i for i, v in enumerate(touched)}
    sc = np.array([remap[int(v)] for v in src])
    dc = np.array([remap[int(v)] for v in dst])
    exp = oracle.weighted_pagerank(
        np.concatenate([sc, dc]),
        np.concatenate([dc, sc]),
        np.concatenate([w, w]),
        len(touched),
        tol=tol,
    )
    return touched, exp


def test_weighted_pagerank_matches_oracle():
    from linkgraph.pagerank import weighted_pagerank

    rng = np.random.default_rng(5)
    n_e, n_v = 400, 60
    t = pa.table(
        {
            "src": rng.integers(0, n_v, n_e).astype(np.int64),
            "dst": rng.integers(0, n_v, n_e).astype(np.int64),
            "w": rng.uniform(0.5, 5.0, n_e),
        }
    )
    touched, exp = _wpr_oracle_undirected(t)
    res = weighted_pagerank(rd.from_arrow(t).repartition(4), tol=1e-12)
    got_map = {r["vertex"]: r["rank"] for r in res.ranks.take_all()}
    got = np.array([got_map[int(v)] for v in touched])
    assert np.allclose(got, exp, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-6


def test_weighted_pagerank_equal_weights_match_unweighted():
    from linkgraph.pagerank import weighted_pagerank

    rng = np.random.default_rng(11)
    n_e, n_v = 300, 50
    s = rng.integers(0, n_v, n_e).astype(np.int64)
    d = rng.integers(0, n_v, n_e).astype(np.int64)
    # dedup pairs so equal-weight == unweighted (which dedups parallel edges)
    keep = s != d
    pairs = np.unique(np.stack([np.minimum(s[keep], d[keep]),
                                np.maximum(s[keep], d[keep])], axis=1), axis=0)
    t = pa.table(
        {"src": pairs[:, 0], "dst": pairs[:, 1],
         "w": np.ones(len(pairs), dtype=np.float64)}
    )
    from linkgraph.pagerank import weighted_pagerank

    wres = weighted_pagerank(rd.from_arrow(t).repartition(4), tol=1e-12)
    ures = pagerank(
        rd.from_arrow(t.select(["src", "dst"])).repartition(4),
        directed=False, num_partitions=4, tol=1e-12,
    )
    wm = {r["vertex"]: r["rank"] for r in wres.ranks.take_all()}
    um = {r["vertex"]: r["rank"] for r in ures.ranks.take_all()}
    assert set(wm) == set(um)
    for v in wm:
        assert abs(wm[v] - um[v]) < 1e-9, v


def test_weighted_pagerank_parallel_edges_are_additive():
    from linkgraph.pagerank import weighted_pagerank

    once = pa.table(
        {"src": np.array([0, 1], dtype=np.int64),
         "dst": np.array([1, 2], dtype=np.int64),
         "w": np.array([4.0, 1.0])}
    )
    twice = pa.table(
        {"src": np.array([0, 0, 1], dtype=np.int64),
         "dst": np.array([1, 1, 2], dtype=np.int64),
         "w": np.array([2.0, 2.0, 1.0])}
    )
    a = weighted_pagerank(rd.from_arrow(once).repartition(2), tol=1e-12, max_iters=300)
    b = weighted_pagerank(rd.from_arrow(twice).repartition(2), tol=1e-12, max_iters=300)
    am = {r["vertex"]: r["rank"] for r in a.ranks.take_all()}
    bm = {r["vertex"]: r["rank"] for r in b.ranks.take_all()}
    assert set(am) == set(bm)
    for v in am:
        assert abs(am[v] - bm[v]) < 1e-9, v


def test_weighted_pagerank_skew_and_straddle():
    """Hub skew + ids on both sides of 2^31 through the weighted path."""
    from linkgraph.pagerank import weighted_pagerank

    rng = np.random.default_rng(3)
    hub = (np.int64(1) << 31) + 9
    n = 200
    leaves = np.arange(n, dtype=np.int64) * 7
    t = pa.table(
        {
            "src": np.concatenate([leaves, leaves[: n // 2]]),
            "dst": np.concatenate(
                [np.full(n, hub, dtype=np.int64), leaves[n // 2 :]]
            ),
            "w": rng.uniform(0.5, 3.0, n + n // 2),
        }
    )
    touched, exp = _wpr_oracle_undirected(t)
    res = weighted_pagerank(rd.from_arrow(t).repartition(4), tol=1e-12)
    got_map = {r["vertex"]: r["rank"] for r in res.ranks.take_all()}
    got = np.array([got_map[int(v)] for v in touched])
    assert np.allclose(got, exp, atol=1e-6)
