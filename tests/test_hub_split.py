"""Hub sub-splitting: a celebrity vertex's oversized dst run is split into
bounded sub-blocks (one owner GROUP per key range) and every kernel still
matches its oracle.  ``DEFAULT_MAX_BLOCK_ROWS`` is shrunk so splits trigger
on small planted graphs, at multiple input block counts."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from linkgraph import bsp, graph as G, oracle, synth
from linkgraph.cc import connected_components
from linkgraph.labelprop import label_propagation
from linkgraph.pagerank import pagerank
from linkgraph.triangles_bsp import triangle_count_bsp

N_SPOKES = 3000
N_CHAINS = 4


@pytest.fixture(autouse=True)
def tiny_blocks(monkeypatch):
    # hub degree 3000 ≫ 400 rows/sub-block → the hub range splits ~8-way
    monkeypatch.setattr(bsp, "DEFAULT_MAX_BLOCK_ROWS", 400)


def _hub_edges():
    edges, labels = synth.make_hub_graph(N_SPOKES, N_CHAINS, seed=3)
    return edges, labels


def _labels_of(ds) -> dict[int, int]:
    return {r["vertex"]: r["label"] for r in ds.take_all()}


def test_grouped_exchange_contract():
    edges, _ = _hub_edges()
    sym = G.symmetrize_block(G.from_arrow_edges(edges).repartition(8))
    groups, n_rows, n_uniq = bsp.raw_dst_exchange(
        sym, dedup_sort_src=True, grouped=True
    )
    tables = [[ray.get(b) for b in g] for g in groups]
    # sub-blocks bounded, groups dst-sorted and range-disjoint, counts exact
    total = 0
    last_max = None
    split_groups = 0
    for g in tables:
        if sum(len(t) for t in g) == 0:
            continue
        if len(g) > 1:
            split_groups += 1
        d = np.concatenate(
            [t["dst"].to_numpy(zero_copy_only=False) for t in g if len(t)]
        )
        assert np.all(d[1:] >= d[:-1]), "group not dst-sorted across sub-blocks"
        if last_max is not None:
            assert d[0] > last_max, "group ranges overlap"
        last_max = d[-1]
        for t in g:
            assert len(t) <= 400 or len(g) == 1
        total += len(d)
    assert split_groups >= 1, "hub did not trigger a sub-split"
    assert total == n_rows
    # oracle counts
    s = edges["src"].to_numpy()
    d0 = edges["dst"].to_numpy()
    pairs = np.unique(
        np.stack([np.concatenate([s, d0]), np.concatenate([d0, s])]), axis=1
    )
    assert n_rows == pairs.shape[1]
    assert n_uniq == len(np.unique(pairs[1]))


@pytest.mark.parametrize("nblocks", [2, 8])
@pytest.mark.parametrize("mode", ["sharded", "broadcast"])
def test_cc_hub_split_modes(nblocks, mode):
    edges, expected = _hub_edges()
    ds = G.from_arrow_edges(edges).repartition(nblocks)
    res = connected_components(ds, mode=mode, local_finish_threshold=0)
    assert res.num_components == 1 + N_CHAINS
    got = _labels_of(res.labels)
    for v, lab in enumerate(expected):
        assert got[v] == lab, (v, got[v], lab)


@pytest.mark.parametrize("nblocks", [2, 8])
def test_labelprop_hub_split_sharded(nblocks):
    edges, expected = _hub_edges()
    ds = G.from_arrow_edges(edges).repartition(nblocks)
    res = label_propagation(ds, mode="sharded")
    assert res.num_components == 1 + N_CHAINS
    got = _labels_of(res.labels)
    for v, lab in enumerate(expected):
        assert got[v] == lab


@pytest.mark.parametrize("nblocks", [2, 8])
def test_pagerank_hub_split_undirected_bsp(nblocks):
    edges, _ = _hub_edges()
    ds = G.from_arrow_edges(edges).repartition(nblocks)
    res = pagerank(ds, directed=False, tol=1e-12, mode="shuffle")
    s, d = edges["src"].to_numpy(), edges["dst"].to_numpy()
    n = int(max(s.max(), d.max()) + 1)
    exp = oracle.pagerank(
        np.concatenate([s, d]), np.concatenate([d, s]), n
    )
    got = np.zeros(n)
    for r in res.ranks.take_all():
        got[r["vertex"]] = r["rank"]
    assert res.num_vertices == n
    assert np.allclose(got, exp, atol=1e-8)
    assert abs(got.sum() - 1.0) < 1e-9


@pytest.mark.parametrize("nblocks", [2, 8])
def test_pagerank_hub_split_directed_bsp(nblocks):
    edges, _ = _hub_edges()
    ds = G.from_arrow_edges(edges).repartition(nblocks)
    res = pagerank(ds, directed=True, tol=1e-12)
    s, d = edges["src"].to_numpy(), edges["dst"].to_numpy()
    n = int(max(s.max(), d.max()) + 1)
    exp = oracle.pagerank(s, d, n)
    got = np.zeros(n)
    for r in res.ranks.take_all():
        got[r["vertex"]] = r["rank"]
    assert np.allclose(got, exp, atol=1e-8)


def test_triangles_hub_split():
    # hub 0 → spokes 1..n, plus a spoke path (i, i+1): n-1 triangles (0,i,i+1)
    n = 1500
    hub_src = np.zeros(n, dtype=np.int64)
    hub_dst = np.arange(1, n + 1, dtype=np.int64)
    path_src = np.arange(1, n, dtype=np.int64)
    path_dst = np.arange(2, n + 1, dtype=np.int64)
    edges = pa.table(
        {
            "src": np.concatenate([hub_src, path_src]),
            "dst": np.concatenate([hub_dst, path_dst]),
        }
    )
    ds = G.from_arrow_edges(edges).repartition(4)
    got = triangle_count_bsp(ds)
    exp = oracle.triangle_count(edges["src"].to_numpy(), edges["dst"].to_numpy())
    assert exp == n - 1
    assert got == exp


def test_cc_checkpoint_resume_with_split(tmp_ckpt):
    from linkgraph.checkpoint import Checkpointer

    edges, expected = _hub_edges()
    ds = G.from_arrow_edges(edges).repartition(4)
    ck = Checkpointer(tmp_ckpt, "hub")
    res1 = connected_components(
        ds, mode="sharded", local_finish_threshold=0, checkpointer=ck
    )
    res2 = connected_components(
        ds, mode="sharded", local_finish_threshold=0, checkpointer=ck, resume=True
    )
    assert res1.num_components == res2.num_components == 1 + N_CHAINS
    assert _labels_of(res1.labels) == _labels_of(res2.labels)


class _BackstopDisabled:
    """Stand-in for bsp._slice_block_task that fails the test if the
    post-merge backstop is ever invoked."""

    def options(self, **_kw):
        raise AssertionError(
            "post-merge backstop fired — pre-merge split failed to bound the merge"
        )

    def remote(self, *_a, **_kw):
        raise AssertionError(
            "post-merge backstop fired — pre-merge split failed to bound the merge"
        )


def test_hub_presplit_bounds_merges_raw_exchange(monkeypatch):
    """With the post-merge slicer disabled, the composite (dst, src)
    pre-split alone must keep every merge task's output under the bound —
    i.e. no single task ever concat+sorts a celebrity vertex's whole
    incidence run (VERDICT r2 item 2)."""
    monkeypatch.setattr(bsp, "_slice_block_task", _BackstopDisabled())
    edges, _ = _hub_edges()
    sym = G.symmetrize_block(G.from_arrow_edges(edges).repartition(8))
    groups, n_rows, n_uniq = bsp.raw_dst_exchange(
        sym, dedup_sort_src=True, grouped=True
    )
    sizes = [len(ray.get(b)) for g in groups for b in g]
    assert max(sizes) <= 400
    s = edges["src"].to_numpy()
    d0 = edges["dst"].to_numpy()
    pairs = np.unique(
        np.stack([np.concatenate([s, d0]), np.concatenate([d0, s])]), axis=1
    )
    assert n_rows == pairs.shape[1]
    assert n_uniq == len(np.unique(pairs[1]))


def test_hub_presplit_bounds_merges_map_exchange(monkeypatch):
    monkeypatch.setattr(bsp, "_slice_block_task", _BackstopDisabled())
    edges, _ = _hub_edges()
    ds = G.from_arrow_edges(edges).repartition(8)
    groups, n_rows, n_uniq = bsp.raw_map_dst_exchange(
        ds, G.sym_prep_batch, dedup_sort_src=True, grouped=True
    )
    sizes = [len(ray.get(b)) for g in groups for b in g]
    assert max(sizes) <= 400
    # group concatenation still fully dst-sorted and range-disjoint
    last_max = None
    total = 0
    for g in groups:
        tabs = [ray.get(b) for b in g]
        if sum(len(t) for t in tabs) == 0:
            continue
        d = np.concatenate(
            [t["dst"].to_numpy(zero_copy_only=False) for t in tabs if len(t)]
        )
        assert np.all(d[1:] >= d[:-1])
        if last_max is not None:
            assert d[0] > last_max
        last_max = d[-1]
        total += len(d)
    assert total == n_rows
    s = edges["src"].to_numpy()
    d0 = edges["dst"].to_numpy()
    pairs = np.unique(
        np.stack([np.concatenate([s, d0]), np.concatenate([d0, s])]), axis=1
    )
    assert n_rows == pairs.shape[1]
    assert n_uniq == len(np.unique(pairs[1]))
