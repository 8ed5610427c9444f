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


# --------------------------------------------------------------------------
# Personalized PageRank
# --------------------------------------------------------------------------


def _ppr_oracle_directed(src, dst, seeds, iters, d=0.85):
    """Dense RWR oracle: distinct edges, self-loops dropped, r0 = p,
    dangling mass restarts at the seeds."""
    pairs = {(int(s), int(t)) for s, t in zip(src, dst) if s != t}
    verts = sorted({u for u, v in pairs} | {v for u, v in pairs})
    vi = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for u, v in pairs:
        A[vi[u], vi[v]] = 1.0
    outdeg = A.sum(1)
    p = np.zeros(n)
    for s in np.unique(np.asarray(seeds)):
        p[vi[int(s)]] = 1.0 / len(np.unique(np.asarray(seeds)))
    r = p.copy()
    for _ in range(iters):
        with np.errstate(invalid="ignore", divide="ignore"):
            push = np.where(outdeg > 0, r / np.maximum(outdeg, 1), 0.0)
        contrib = A.T @ push
        dm = r[outdeg == 0].sum()
        r = ((1 - d) + d * dm) * p + d * contrib
    return verts, vi, r


def test_ppr_directed_matches_oracle():
    from linkgraph.pagerank import personalized_pagerank

    rng = np.random.default_rng(23)
    src = rng.integers(0, 80, 300)
    dst = rng.integers(0, 80, 300)
    seeds = [5, 40, 41]
    verts, vi, exp = _ppr_oracle_directed(src, dst, seeds, iters=8)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    res = personalized_pagerank(edges, seeds, directed=True, tol=0.0, max_iters=8)
    got = {r["vertex"]: r["rank"] for r in res.ranks.take_all()}
    assert len(got) == len(verts)
    assert np.allclose([got[v] for v in verts], [exp[vi[v]] for v in verts], atol=1e-12)
    # RWR conserves total mass (dangling restarts at the seeds)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_ppr_converges_and_localizes():
    """On two disconnected cliques, PPR seeded in one clique puts ~all mass
    there — the locality property global PageRank doesn't have."""
    from linkgraph.pagerank import personalized_pagerank

    def clique(base, k):
        s, t = [], []
        for i in range(k):
            for j in range(k):
                if i != j:
                    s.append(base + i)
                    t.append(base + j)
        return s, t

    s1, t1 = clique(0, 5)
    s2, t2 = clique(100, 5)
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(s1 + s2, pa.int64()),
                "dst": pa.array(t1 + t2, pa.int64()),
            }
        )
    )
    res = personalized_pagerank(edges, [0], directed=True, tol=1e-12, max_iters=200)
    got = {r["vertex"]: r["rank"] for r in res.ranks.take_all()}
    mass_far = sum(v for k_, v in got.items() if k_ >= 100)
    assert mass_far == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_ppr_undirected_and_determinism_across_partitioning():
    from linkgraph.pagerank import personalized_pagerank

    rng = np.random.default_rng(29)
    src = rng.integers(0, 60, 240)
    dst = rng.integers(0, 60, 240)
    seeds = [7]
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    # undirected oracle: symmetrized distinct edges
    pairs = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in zip(src, dst) if a != b}
    verts = sorted({u for u, v in pairs} | {v for u, v in pairs})
    vi = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for u, v in pairs:
        A[vi[u], vi[v]] = A[vi[v], vi[u]] = 1.0
    deg = A.sum(1)
    p = np.zeros(n)
    p[vi[7]] = 1.0
    r = p.copy()
    for _ in range(6):
        r = 0.15 * p + 0.85 * (A.T @ (r / deg))
    res1 = personalized_pagerank(
        rd.from_arrow(t).repartition(2), seeds, directed=False, tol=0.0, max_iters=6
    )
    res2 = personalized_pagerank(
        rd.from_arrow(t).repartition(7), seeds, directed=False, tol=0.0, max_iters=6
    )
    g1 = {r_["vertex"]: r_["rank"] for r_ in res1.ranks.take_all()}
    g2 = {r_["vertex"]: r_["rank"] for r_ in res2.ranks.take_all()}
    assert set(g1) == set(g2)
    # 1e-12 across partitionings (repo float-kernel determinism bar)
    assert all(abs(g1[v] - g2[v]) < 1e-12 for v in g1)
    assert np.allclose([g1[v] for v in verts], [r[vi[v]] for v in verts], atol=1e-12)


def test_ppr_hub_skew_and_straddle():
    """Hub vertex + ids straddling 2^31 through the personalized path."""
    from linkgraph.pagerank import personalized_pagerank

    hub = (np.int64(1) << 31) + 3
    n = 150
    leaves = np.arange(n, dtype=np.int64) * 11
    src = np.concatenate([leaves, np.full(n // 3, hub, dtype=np.int64)])
    dst = np.concatenate([np.full(n, hub, dtype=np.int64), leaves[: n // 3] + 1])
    seeds = [int(hub), 0]
    verts, vi, exp = _ppr_oracle_directed(src, dst, seeds, iters=10)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    res = personalized_pagerank(edges.repartition(4), seeds, directed=True, tol=0.0, max_iters=10)
    got = {r["vertex"]: r["rank"] for r in res.ranks.take_all()}
    assert np.allclose([got[v] for v in verts], [exp[vi[v]] for v in verts], atol=1e-12)


def test_ppr_checkpoint_resume(tmp_ckpt):
    """Kill after superstep 2, resume supersteps 3-6 — identical to the
    uninterrupted run (the kernel checkpoint/resume contract)."""
    from linkgraph.checkpoint import Checkpointer
    from linkgraph.pagerank import personalized_pagerank

    rng = np.random.default_rng(31)
    src = rng.integers(0, 40, 160)
    dst = rng.integers(0, 40, 160)
    t = pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    seeds = [1, 2]
    full = personalized_pagerank(
        rd.from_arrow(t), seeds, directed=True, tol=0.0, max_iters=6
    )
    ck = Checkpointer(str(tmp_ckpt))
    personalized_pagerank(
        rd.from_arrow(t), seeds, directed=True, tol=0.0, max_iters=2,
        checkpointer=ck,
    )
    resumed = personalized_pagerank(
        rd.from_arrow(t), seeds, directed=True, tol=0.0, max_iters=4,
        checkpointer=ck, resume=True,
    )
    gf = {r["vertex"]: r["rank"] for r in full.ranks.take_all()}
    gr = {r["vertex"]: r["rank"] for r in resumed.ranks.take_all()}
    assert gf == gr
