"""Dataflow-path triangle counting vs brute force (FIXTURES.md §6).

The default (BSP) path is covered in test_triangles_bsp.py."""

import numpy as np
import pyarrow as pa

from linkgraph import graph as G, oracle, synth
from linkgraph.triangles import triangle_count


def test_golden_micro_triangles():
    edges, _ = synth.golden_micro()
    assert triangle_count(G.from_arrow_edges(edges), num_partitions=2, mode="dataflow") == 1


def test_clique_k5():
    # K5 has C(5,3) = 10 triangles
    src, dst = [], []
    for i in range(5):
        for j in range(i + 1, 5):
            src.append(i)
            dst.append(j)
    edges = pa.table(
        {"src": np.array(src, dtype=np.int64), "dst": np.array(dst, dtype=np.int64)}
    )
    assert triangle_count(G.from_arrow_edges(edges), num_partitions=2, mode="dataflow") == 10


def test_random_graph_vs_bruteforce():
    rng = np.random.default_rng(31)
    n = 120
    m = 700
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    edges = pa.table({"src": src, "dst": dst})
    expected = oracle.triangle_count(src, dst)
    assert triangle_count(G.from_arrow_edges(edges), num_partitions=4, mode="dataflow") == expected


def test_parallel_edges_do_not_inflate():
    edges = pa.table(
        {
            "src": np.array([0, 0, 1, 1, 2, 0], dtype=np.int64),
            "dst": np.array([1, 1, 2, 2, 0, 2], dtype=np.int64),
        }
    )
    assert triangle_count(G.from_arrow_edges(edges), num_partitions=2, mode="dataflow") == 1


def _lcc_df(res):
    import pandas as pd

    df = res.to_pandas().sort_values("vertex").reset_index(drop=True)
    return df


def test_local_clustering_planted():
    from linkgraph.triangles import local_clustering

    # K4 (lcc 1.0 everywhere) + C5 (lcc 0) + star-5 (lcc 0) + a triangle
    # with a pendant (lcc 1, 1, 1/3, 0)
    src, dst = [], []
    for i in range(4):
        for j in range(i + 1, 4):
            src.append(10 + i); dst.append(10 + j)
    for i in range(5):
        src.append(20 + i); dst.append(20 + (i + 1) % 5)
    for leaf in range(31, 36):
        src.append(30); dst.append(leaf)
    src += [40, 40, 41, 42]
    dst += [41, 42, 42, 43]
    t = pa.table(
        {"src": np.array(src, dtype=np.int64), "dst": np.array(dst, dtype=np.int64)}
    )
    exp = oracle.local_clustering(t["src"].to_numpy(), t["dst"].to_numpy())
    df = _lcc_df(local_clustering(G.from_arrow_edges(t).repartition(3)))
    assert len(df) == len(exp)
    for row in df.itertuples():
        d, tri, lcc = exp[int(row.vertex)]
        assert (row.degree, row.n_triangles) == (d, tri), row
        assert abs(row.lcc - lcc) < 1e-12, row
    got40 = df.set_index("vertex")
    assert got40.loc[40, "lcc"] == 1.0
    assert abs(got40.loc[42, "lcc"] - 1.0 / 3.0) < 1e-12
    assert got40.loc[43, "lcc"] == 0.0
    assert got40.loc[30, "lcc"] == 0.0


def test_local_clustering_random_vs_oracle():
    from linkgraph.triangles import local_clustering

    rng = np.random.default_rng(47)
    n, m = 90, 600
    t = pa.table(
        {
            "src": rng.integers(0, n, m).astype(np.int64),
            "dst": rng.integers(0, n, m).astype(np.int64),
        }
    )
    exp = oracle.local_clustering(t["src"].to_numpy(), t["dst"].to_numpy())
    df = _lcc_df(local_clustering(G.from_arrow_edges(t).repartition(4)))
    assert len(df) == len(exp)
    total_from_vertices = df["n_triangles"].sum()
    assert total_from_vertices == 3 * oracle.triangle_count(
        t["src"].to_numpy(), t["dst"].to_numpy()
    )
    for row in df.itertuples():
        d, tri, lcc = exp[int(row.vertex)]
        assert (row.degree, row.n_triangles) == (d, tri), row
        assert abs(row.lcc - lcc) < 1e-12, row
