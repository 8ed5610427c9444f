"""MTX reader: parity with the reference reader semantics
(``src/mtx_reader.c``) + round-trip through CC."""

import numpy as np
import pyarrow as pa

from linkgraph import graph as G, oracle, sources, synth
from linkgraph.cc import connected_components, sample_frequent_label


def test_read_mtx_golden(tmp_path):
    # the reference's data/test_small.mtx: 6 vertices, 5 edges, comments,
    # 1-indexed, with a value column on one line
    p = tmp_path / "test_small.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "% golden micro graph\n"
        "6 6 5\n"
        "1 2\n"
        "2 3\n"
        "1 3 1.0\n"
        "4 5\n"
        "5 6\n"
    )
    edges, info = sources.read_mtx(str(p))
    assert info["num_vertices"] == 6 and info["nnz"] == 5 and info["symmetric"]
    rows = sorted((r["src"], r["dst"]) for r in edges.take_all())
    assert rows == [(0, 1), (0, 2), (1, 2), (3, 4), (4, 5)]
    res = connected_components(edges, num_partitions=2)
    assert res.num_components == 2


def test_read_mtx_bounds_and_nonsquare(tmp_path):
    p = tmp_path / "weird.mtx"
    p.write_text("3 5 3\n1 2\n9 1\n2 5\n")  # 9 out of range for V=max(3,5)=5
    edges, info = sources.read_mtx(str(p))
    assert info["num_vertices"] == 5
    rows = sorted((r["src"], r["dst"]) for r in edges.take_all())
    assert rows == [(0, 1), (1, 4)]


def test_mtx_roundtrip(tmp_path):
    tbl, labels = synth.make_planted_graph(100, 4, 3, seed=3)
    src = tbl["src"].to_numpy()
    dst = tbl["dst"].to_numpy()
    p = tmp_path / "rt.mtx"
    sources.write_mtx(str(p), src, dst, 100)
    edges, info = sources.read_mtx(str(p))
    assert info["nnz"] == len(src)
    got = sorted((r["src"], r["dst"]) for r in edges.take_all())
    assert got == sorted(zip(src.tolist(), dst.tolist()))


def test_graph_stats():
    edges, _ = synth.golden_micro()
    canon = G.canonicalize(G.from_arrow_edges(edges), global_dedup=True)
    s = G.graph_stats(canon)
    assert s["num_vertices"] == 6 and s["num_edges"] == 5
    assert s["min_degree"] == 1 and s["max_degree"] == 2


def test_sample_frequent_label():
    edges, expected = synth.make_hub_graph(3000, 2, chain_len=4, seed=9)
    res = connected_components(G.from_arrow_edges(edges), num_partitions=4)
    label, freq = sample_frequent_label(res.labels, n_samples=512, seed=3)
    assert label == 0  # the hub component dominates
    assert freq > 0.9


def test_write_labels(tmp_path):
    import ray.data as rd

    edges, _ = synth.golden_micro()
    res = connected_components(G.from_arrow_edges(edges), num_partitions=2)
    out = sources.write_labels(res.labels, str(tmp_path / "labels"))
    back = rd.read_parquet(out)
    assert {r["vertex"]: r["label"] for r in back.take_all()} == {
        r["vertex"]: r["label"] for r in res.labels.take_all()
    }
