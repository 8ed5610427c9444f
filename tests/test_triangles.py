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
