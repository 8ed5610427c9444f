"""BSP triangle counting vs brute force and vs the dataflow path."""

import numpy as np
import pyarrow as pa

from linkgraph import graph as G, oracle, synth
from linkgraph.triangles_bsp import triangle_count_bsp


def test_golden_micro():
    edges, _ = synth.golden_micro()
    assert triangle_count_bsp(G.from_arrow_edges(edges)) == 1


def test_clique_k6():
    src, dst = [], []
    for i in range(6):
        for j in range(i + 1, 6):
            src.append(i)
            dst.append(j)
    edges = pa.table(
        {"src": np.array(src, dtype=np.int64), "dst": np.array(dst, dtype=np.int64)}
    )
    assert triangle_count_bsp(G.from_arrow_edges(edges)) == 20  # C(6,3)


def test_random_graph_vs_bruteforce():
    rng = np.random.default_rng(47)
    n, m = 150, 900
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    edges = pa.table({"src": src, "dst": dst})
    expected = oracle.triangle_count(src, dst)
    assert triangle_count_bsp(G.from_arrow_edges(edges)) == expected


def test_parallel_edges_and_self_loops():
    edges = pa.table(
        {
            "src": np.array([0, 0, 1, 1, 2, 0, 3], dtype=np.int64),
            "dst": np.array([1, 1, 2, 2, 0, 2, 3], dtype=np.int64),
        }
    )
    assert triangle_count_bsp(G.from_arrow_edges(edges)) == 1


def test_hub_graph_pair_splitting():
    """A star hub emits zero wedges under degree orientation (the hub is
    last in the order), but a wheel closes them; exercise the bounded
    emit-task split with a tiny cap."""
    # wheel: hub 0 connected to ring 1..12, ring edges i-(i+1), 12-1
    n = 12
    src = [0] * n + list(range(1, n + 1))
    dst = list(range(1, n + 1)) + [i % n + 1 for i in range(1, n + 1)]
    edges = pa.table(
        {"src": np.array(src, dtype=np.int64), "dst": np.array(dst, dtype=np.int64)}
    )
    got = triangle_count_bsp(G.from_arrow_edges(edges), max_pairs_per_task=4)
    expected = oracle.triangle_count(np.array(src), np.array(dst))
    assert got == expected == n


def test_matches_dataflow_on_planted_graph():
    from linkgraph.triangles import triangle_count

    edges, _ = synth.make_planted_graph(2_000, 4, 5, seed=53)
    ds = G.from_arrow_edges(edges)
    assert triangle_count_bsp(ds) == triangle_count(ds, num_partitions=4, mode="dataflow")
