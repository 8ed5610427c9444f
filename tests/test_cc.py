"""CC correctness vs the union-find oracle (SURVEY.md §5 test plan)."""

import numpy as np
import pyarrow as pa
import pytest

from linkgraph import graph as G
from linkgraph import oracle, synth
from linkgraph.cc import (
    CCResult,
    _contract_batch,
    _local_components,
    component_stats,
    connected_components,
)


def labels_dict(ds):
    return {r["vertex"]: r["label"] for r in ds.take_all()}


def check_against_oracle(edges_tbl, num_vertices=None):
    src = edges_tbl["src"].to_numpy()
    dst = edges_tbl["dst"].to_numpy()
    expected = oracle.cc_labels(src, dst, num_vertices)
    verts = None
    if num_vertices is not None:
        import ray.data as rd

        verts = rd.from_arrow(
            pa.table({"vertex": np.arange(num_vertices, dtype=np.int64)})
        )
    res = connected_components(
        G.from_arrow_edges(edges_tbl), vertices=verts, num_partitions=4
    )
    got = labels_dict(res.labels)
    exp = {
        int(v): int(l)
        for v, l in enumerate(expected)
        if verts is not None or v in got
    }
    assert got == exp
    assert res.num_components == len(set(exp.values()))
    return res


def test_local_components_chain():
    u = np.array([0, 1, 3], dtype=np.int64)
    v = np.array([1, 2, 4], dtype=np.int64)
    p = _local_components(u, v, 5)
    assert p.tolist() == [0, 0, 0, 3, 3]


def test_contract_batch_star_output():
    t = pa.table(
        {
            "src": np.array([0, 1, 3], dtype=np.int64),
            "dst": np.array([1, 2, 4], dtype=np.int64),
        }
    )
    out = _contract_batch(t)
    rows = sorted(zip(out["src"].to_numpy(), out["dst"].to_numpy()))
    assert rows == [(0, 1), (0, 2), (3, 4)]


def test_golden_micro():
    edges, expected = synth.golden_micro()
    res = check_against_oracle(edges, num_vertices=6)
    assert res.num_components == 2
    sizes, summary = component_stats(res.labels)
    size_map = {r["label"]: r["size"] for r in sizes.take_all()}
    assert size_map == {0: 3, 3: 3}
    assert summary["num_components"] == 2
    assert summary["min_size"] == 3 and summary["max_size"] == 3


def test_planted_small():
    edges, expected = synth.make_planted_graph(60, 3, 4, seed=7)
    res = check_against_oracle(edges, num_vertices=60)
    got = labels_dict(res.labels)
    assert got == {int(v): int(l) for v, l in enumerate(expected)}


def test_planted_medium():
    edges, expected = synth.make_planted_graph(10_000, 10, 8, seed=11)
    res = check_against_oracle(edges, num_vertices=10_000)
    got = labels_dict(res.labels)
    assert got == {int(v): int(l) for v, l in enumerate(expected)}


def test_hub_graph_skew():
    edges, expected = synth.make_hub_graph(2_000, 5, chain_len=6, seed=3)
    n = 1 + 2_000 + 5 * 6
    res = check_against_oracle(edges, num_vertices=n)
    assert res.num_components == 6


def test_isolated_vertices_labeled():
    import ray.data as rd

    edges = pa.table(
        {"src": np.array([1, 2], dtype=np.int64), "dst": np.array([2, 3], dtype=np.int64)}
    )
    verts = rd.from_arrow(pa.table({"vertex": np.arange(6, dtype=np.int64)}))
    res = connected_components(G.from_arrow_edges(edges), vertices=verts, num_partitions=2)
    got = labels_dict(res.labels)
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    assert res.num_components == 4


def test_parallel_edges_and_self_loops():
    edges = pa.table(
        {
            "src": np.array([0, 0, 0, 1, 2, 2], dtype=np.int64),
            "dst": np.array([1, 1, 0, 0, 2, 3], dtype=np.int64),
        }
    )
    res = check_against_oracle(edges, num_vertices=4)
    assert res.num_components == 2


@pytest.mark.parametrize("mode", ["auto", "shuffle"])
def test_determinism_across_partitionings(mode):
    edges, _ = synth.make_planted_graph(2_000, 4, 6, seed=5)
    a = connected_components(
        G.from_arrow_edges(edges).repartition(2),
        num_partitions=2,
        local_finish_threshold=0,
        mode=mode,
    )
    b = connected_components(
        G.from_arrow_edges(edges).repartition(8),
        num_partitions=8,
        local_finish_threshold=0,
        mode=mode,
    )
    assert labels_dict(a.labels) == labels_dict(b.labels)


def test_local_finish_matches_distributed():
    edges, _ = synth.make_planted_graph(1_500, 5, 4, seed=23)
    local = connected_components(G.from_arrow_edges(edges), num_partitions=4)
    dist = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=4,
        local_finish_threshold=0,
        mode="shuffle",
    )
    assert any(m["phase"] == "local_finish" for m in local.metrics)
    assert all(m["phase"] != "local_finish" for m in dist.metrics)
    assert labels_dict(local.labels) == labels_dict(dist.labels)
    assert local.num_components == dist.num_components


def test_broadcast_matches_shuffle():
    edges, _ = synth.make_planted_graph(3_000, 6, 4, seed=11)
    bc = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=4,
        local_finish_threshold=0,
        mode="broadcast",
    )
    sh = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=4,
        local_finish_threshold=0,
        mode="shuffle",
    )
    assert any(m["phase"] == "bsp_superstep" for m in bc.metrics)
    assert all(m["phase"] != "bsp_superstep" for m in sh.metrics)
    assert labels_dict(bc.labels) == labels_dict(sh.labels)
    assert bc.num_components == sh.num_components


def test_broadcast_self_loops_and_parallel_edges():
    edges = pa.table(
        {
            "src": np.array([1, 1, 2, 7, 7], dtype=np.int64),
            "dst": np.array([2, 2, 1, 7, 7], dtype=np.int64),
        }
    )
    res = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=2,
        local_finish_threshold=0,
        mode="broadcast",
    )
    assert labels_dict(res.labels) == {1: 1, 2: 1, 7: 7}
    assert res.num_components == 2


def test_local_finish_with_vertex_set():
    # verts ⊇ endpoints, extra isolated ids; exercises the broadcast
    # label-map assign pass in _local_finish
    import ray.data as rd

    edges = pa.table(
        {
            "src": np.array([10, 11], dtype=np.int64),
            "dst": np.array([11, 12], dtype=np.int64),
        }
    )
    verts = rd.from_arrow(
        pa.table({"vertex": np.array([3, 10, 11, 12, 99], dtype=np.int64)})
    )
    res = connected_components(
        G.from_arrow_edges(edges), vertices=verts, num_partitions=2
    )
    assert any(m["phase"] == "local_finish" for m in res.metrics)
    assert labels_dict(res.labels) == {3: 3, 10: 10, 11: 10, 12: 10, 99: 99}
    assert res.num_components == 3


def test_sharded_matches_shuffle():
    # the beyond-gate scale path: object-store-sharded labels with
    # emit/apply min rounds + sharded pointer jumping
    edges, _ = synth.make_planted_graph(3_000, 6, 4, seed=11)
    sd = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=4,
        local_finish_threshold=0,
        mode="sharded",
    )
    sh = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=4,
        local_finish_threshold=0,
        mode="shuffle",
    )
    assert any(m["phase"] == "sharded_superstep" for m in sd.metrics)
    assert labels_dict(sd.labels) == labels_dict(sh.labels)
    assert sd.num_components == sh.num_components


def test_sharded_self_loops_and_parallel_edges():
    edges = pa.table(
        {
            "src": np.array([1, 1, 2, 7, 7], dtype=np.int64),
            "dst": np.array([2, 2, 1, 7, 7], dtype=np.int64),
        }
    )
    res = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=2,
        local_finish_threshold=0,
        mode="sharded",
    )
    assert labels_dict(res.labels) == {1: 1, 2: 1, 7: 7}
    assert res.num_components == 2


def test_sharded_hub_graph():
    edges, _ = synth.make_hub_graph(5_000, 3)
    res = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=4,
        local_finish_threshold=0,
        mode="sharded",
    )
    assert res.num_components == 4


def test_explicit_vertices_fast_finish_above_threshold():
    """Explicit vertex set beyond the local-finish threshold takes the
    broadcast/sharded finish + attach path (not the star rounds) and still
    labels isolated vertices with their identity."""
    import ray.data as rd

    from linkgraph import oracle, synth

    edges, _ = synth.make_planted_graph(3_000, 4, 5, seed=61)
    n = 3_500  # 500 isolated vertices beyond the edge endpoints
    verts = rd.from_arrow(pa.table({"vertex": np.arange(n, dtype=np.int64)}))
    res = connected_components(
        G.from_arrow_edges(edges),
        vertices=verts,
        num_partitions=4,
        local_finish_threshold=0,  # force the distributed finish
    )
    assert any(m.get("phase") == "attach_vertices" for m in res.metrics)
    src = edges["src"].to_numpy(zero_copy_only=False)
    dst = edges["dst"].to_numpy(zero_copy_only=False)
    expected = oracle.cc_labels(src, dst, n)
    got = labels_dict(res.labels)
    assert got == {i: int(expected[i]) for i in range(n)}
    assert res.num_components == len(np.unique(expected))


def test_local_components_two_level_star():
    """Regression: hook round whose updates are jump-stable must NOT stop
    the sweep (aliased-`before` bug) — a two-level membership star needs
    several hook+jump rounds to drain mins down to the leaves."""
    cust = np.arange(150, dtype=np.int64)
    nations = 150 + (cust % 25)
    nk = np.arange(25, dtype=np.int64)
    u = np.concatenate([cust, 150 + nk])
    v = np.concatenate([nations, 175 + (nk % 5)])
    p = _local_components(u, v, 180)
    assert len(np.unique(p)) == 5
    # every region component bottoms out at a customer index (< 150)
    assert p.max() < 150


def test_cc_two_level_star_end_to_end():
    """CC over the customer→nation→region shape at full pipeline depth."""
    cust = np.arange(150, dtype=np.int64)
    nat = 1_000 + (cust % 25)
    nk = np.arange(25, dtype=np.int64)
    t = pa.table(
        {
            "src": np.concatenate([cust, 1_000 + nk]),
            "dst": np.concatenate([nat, 2_000 + (nk % 5)]),
        }
    )
    res = check_against_oracle(t)
    assert res.num_components == 5


# ---------------------------------------------------------------------------
# property tests: contraction must preserve exact connectivity
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _canon_labels_from_pairs(s, d, n):
    """Min-id labels of the graph given by pairs, via the slow oracle."""
    return oracle.cc_labels(np.asarray(s, np.int64), np.asarray(d, np.int64), n)


@st.composite
def edge_lists(draw):
    """Random graphs biased toward adversarial shapes: stars-of-stars,
    chains, and dense blobs (the aliasing bug only bit on shapes whose
    min-propagation chains outlive one hook round)."""
    n = draw(st.integers(2, 60))
    shape = draw(st.sampled_from(["random", "chain", "two_level_star", "mixed"]))
    edges = []
    if shape in ("random", "mixed"):
        m = draw(st.integers(0, 80))
        for _ in range(m):
            edges.append(
                (draw(st.integers(0, n - 1)), draw(st.integers(0, n - 1)))
            )
    if shape in ("chain", "mixed"):
        start = draw(st.integers(0, n - 1))
        ln = draw(st.integers(1, min(20, n)))
        perm = draw(st.permutations(range(n)))
        for i in range(ln - 1):
            edges.append((perm[i], perm[i + 1]))
    if shape in ("two_level_star", "mixed"):
        hubs = min(draw(st.integers(1, 4)), n)
        for v in range(n):
            edges.append((v, v % hubs))
        for h in range(1, hubs):
            if draw(st.booleans()):
                edges.append((h, 0))
    return n, edges


@settings(max_examples=200, deadline=None)
@given(edge_lists())
def test_contract_batch_preserves_connectivity(case):
    n, edges = case
    if not edges:
        return
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    out = _contract_batch(pa.table({"src": src, "dst": dst}))
    o_s = out["src"].to_numpy()
    o_d = out["dst"].to_numpy()
    want = _canon_labels_from_pairs(src, dst, n)
    got = _canon_labels_from_pairs(o_s, o_d, n)
    # compare only on touched vertices (contract knows nothing of isolated ids)
    touched = np.unique(np.concatenate([src, dst]))
    assert np.array_equal(want[touched], got[touched])


@settings(max_examples=200, deadline=None)
@given(edge_lists())
def test_local_components_matches_union_find(case):
    n, edges = case
    if not edges:
        return
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    if len(src) == 0:
        return
    p = _local_components(src, dst, n)
    want = oracle.cc_labels(src, dst, n)
    assert np.array_equal(p, want)


def test_labels_equivalent_crosscheck():
    """Engine version of the reference drivers' 'labels differ but produce
    same components (VALID)' check (benchmarks/benchmark_openmp.c:105-135)."""
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.cc import labels_equivalent

    v = np.arange(8, dtype=np.int64)
    lab = np.array([0, 0, 0, 3, 3, 5, 5, 5], dtype=np.int64)
    # same partition, shifted label values (e.g. another algorithm's ids)
    lab2 = np.array([9, 9, 9, 1, 1, 2, 2, 2], dtype=np.int64)
    # different partition: vertex 4 moved to another component
    lab3 = np.array([0, 0, 0, 3, 5, 5, 5, 5], dtype=np.int64)
    mk = lambda l: rd.from_arrow(pa.table({"vertex": v, "label": l}))
    assert labels_equivalent(mk(lab), mk(lab), num_partitions=2)
    assert labels_equivalent(mk(lab), mk(lab2), num_partitions=2)
    assert not labels_equivalent(mk(lab), mk(lab3), num_partitions=2)
    # different vertex set
    assert not labels_equivalent(
        mk(lab), rd.from_arrow(pa.table({"vertex": v[:-1], "label": lab[:-1]}))
    )
