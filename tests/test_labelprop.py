"""Label propagation: same fixed point as CC (SURVEY.md §5 oracle plan)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import graph as G, oracle, synth
from linkgraph.labelprop import label_propagation


def labels_dict(ds):
    return {r["vertex"]: r["label"] for r in ds.take_all()}


def test_golden_micro_lp():
    edges, expected = synth.golden_micro()
    verts = rd.from_arrow(pa.table({"vertex": np.arange(6, dtype=np.int64)}))
    res = label_propagation(G.from_arrow_edges(edges), vertices=verts, num_partitions=2)
    assert labels_dict(res.labels) == {i: int(l) for i, l in enumerate(expected)}
    assert res.num_components == 2
    assert res.num_iterations >= 2


def test_planted_lp_matches_oracle():
    edges, expected = synth.make_planted_graph(300, 3, 4, seed=13)
    res = label_propagation(G.from_arrow_edges(edges), num_partitions=4)
    exp = oracle.cc_labels(edges["src"].to_numpy(), edges["dst"].to_numpy(), 300)
    got = labels_dict(res.labels)
    assert got == {int(v): int(l) for v, l in enumerate(exp) if v in got}


def test_frontier_matches_full_sweep():
    edges, _ = synth.make_planted_graph(200, 2, 3, seed=21)
    a = label_propagation(G.from_arrow_edges(edges), num_partitions=2, frontier=True)
    b = label_propagation(G.from_arrow_edges(edges), num_partitions=2, frontier=False)
    assert labels_dict(a.labels) == labels_dict(b.labels)
    assert a.num_components == b.num_components


def test_broadcast_matches_shuffle():
    edges, _ = synth.make_planted_graph(300, 3, 4, seed=29)
    a = label_propagation(
        G.from_arrow_edges(edges), num_partitions=4, mode="broadcast"
    )
    b = label_propagation(
        G.from_arrow_edges(edges), num_partitions=4, mode="shuffle"
    )
    assert labels_dict(a.labels) == labels_dict(b.labels)
    assert a.num_components == b.num_components
    # synchronous min-label supersteps are deterministic: identical rounds
    assert a.num_iterations == b.num_iterations


def test_broadcast_checkpoint_resume(tmp_ckpt):
    from linkgraph.checkpoint import Checkpointer

    edges, _ = synth.make_planted_graph(200, 2, 4, seed=31)
    full = label_propagation(
        G.from_arrow_edges(edges),
        num_partitions=2,
        checkpointer=Checkpointer(tmp_ckpt, "lp"),
    )
    resumed = label_propagation(
        G.from_arrow_edges(edges),
        num_partitions=2,
        checkpointer=Checkpointer(tmp_ckpt, "lp"),
        resume=True,
    )
    assert labels_dict(full.labels) == labels_dict(resumed.labels)


def test_sharded_matches_broadcast():
    # the beyond-gate scale path: identical sweep semantics (same
    # iteration count) with object-store-sharded labels
    edges, _ = synth.make_planted_graph(400, 4, 5, seed=31)
    bc = label_propagation(G.from_arrow_edges(edges), num_partitions=4)
    sd = label_propagation(
        G.from_arrow_edges(edges), num_partitions=4, mode="sharded"
    )
    assert labels_dict(sd.labels) == labels_dict(bc.labels)
    assert sd.num_components == bc.num_components
    assert sd.num_iterations == bc.num_iterations


def test_sharded_mode_explicit_vertices():
    import ray.data as rd

    from linkgraph import oracle

    edges = pa.table(
        {"src": np.array([1, 2], dtype=np.int64), "dst": np.array([2, 3], dtype=np.int64)}
    )
    verts = rd.from_arrow(pa.table({"vertex": np.arange(6, dtype=np.int64)}))
    res = label_propagation(
        G.from_arrow_edges(edges), vertices=verts, mode="sharded"
    )
    got = {r["vertex"]: r["label"] for r in res.labels.take_all()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    assert res.num_components == 4
