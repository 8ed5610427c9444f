"""Checkpoint/resume: kill after superstep k, resume, identical final state."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import graph as G, synth
from linkgraph.cc import connected_components
from linkgraph.checkpoint import Checkpointer
from linkgraph.labelprop import label_propagation
from linkgraph.pagerank import pagerank


def labels_dict(ds):
    return {r["vertex"]: r["label"] for r in ds.take_all()}


def test_checkpointer_roundtrip(tmp_ckpt):
    ck = Checkpointer(tmp_ckpt, "job1")
    ds = rd.from_arrow(pa.table({"vertex": np.arange(5, dtype=np.int64)}))
    out = ck.save(0, ds, {"changed": 5})
    assert out.count() == 5
    assert ck.complete_iters() == [0]
    it, ds2, meta = ck.latest()
    assert it == 0 and meta["changed"] == 5 and ds2.count() == 5
    assert meta["lineage"]["prev"] is None


def test_incomplete_iteration_ignored(tmp_ckpt):
    ck = Checkpointer(tmp_ckpt, "job2")
    ds = rd.from_arrow(pa.table({"vertex": np.arange(3, dtype=np.int64)}))
    ck.save(0, ds, {})
    # simulate a crash mid-write of iter 1: directory without manifest
    d = os.path.join(tmp_ckpt, "job2", "iter_0001")
    os.makedirs(d)
    assert ck.complete_iters() == [0]
    assert ck.latest()[0] == 0


def test_cc_resume_mid_iteration(tmp_ckpt):
    edges, _ = synth.make_planted_graph(2_000, 4, 5, seed=19)
    full = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=4,
        checkpointer=Checkpointer(tmp_ckpt, "full"),
    )
    # replay: copy only the first k checkpoints, resume from there
    partial_dir = os.path.join(tmp_ckpt, "partial")
    os.makedirs(partial_dir)
    src_dir = os.path.join(tmp_ckpt, "full")
    iters = sorted(os.listdir(src_dir))
    keep = iters[: max(1, len(iters) // 2)]
    for name in keep:
        shutil.copytree(os.path.join(src_dir, name), os.path.join(partial_dir, name))
    resumed = connected_components(
        G.from_arrow_edges(edges),
        num_partitions=4,
        checkpointer=Checkpointer(partial_dir, ""),
        resume=True,
    )
    assert labels_dict(resumed.labels) == labels_dict(full.labels)
    assert resumed.num_components == full.num_components


def test_lp_resume(tmp_ckpt):
    edges, _ = synth.make_planted_graph(300, 3, 4, seed=29)
    full = label_propagation(
        G.from_arrow_edges(edges),
        num_partitions=2,
        checkpointer=Checkpointer(tmp_ckpt, "lp"),
    )
    # resume from a completed run: should detect convergence quickly and
    # produce the identical labeling
    resumed = label_propagation(
        G.from_arrow_edges(edges),
        num_partitions=2,
        checkpointer=Checkpointer(tmp_ckpt, "lp"),
        resume=True,
    )
    assert labels_dict(resumed.labels) == labels_dict(full.labels)


def _truncate_checkpoints(src_dir: str, keep_n: int) -> None:
    iters = sorted(n for n in os.listdir(src_dir) if n.startswith("iter_"))
    for name in iters[keep_n:]:
        shutil.rmtree(os.path.join(src_dir, name))


def test_pagerank_bsp_sharded_checkpoint_resume(tmp_ckpt):
    """The BSP scale path checkpoints per-shard state and resumes to the
    same scores as the uninterrupted run (state re-matched by vertex id)."""
    edges, _ = synth.make_planted_graph(3_000, 4, 5, seed=31)
    ck = Checkpointer(tmp_ckpt, "prbsp")
    full = pagerank(
        G.from_arrow_edges(edges), directed=False, mode="shuffle",
        tol=0.0, max_iters=5, checkpointer=ck,
    )
    assert full.metrics[-1]["mode"] == "shuffle"  # BSP path engaged
    d = os.path.join(tmp_ckpt, "prbsp")
    assert len([n for n in os.listdir(d) if n.startswith("iter_")]) == 5
    with open(os.path.join(d, "iter_0005", "_metrics.json")) as f:
        meta = json.load(f)
    assert "sharded_parts" in meta and meta["num_vertices"] == full.num_vertices
    # crash after superstep 2: drop iters 3-5, resume for the remaining 3
    _truncate_checkpoints(d, 2)
    resumed = pagerank(
        G.from_arrow_edges(edges), directed=False, mode="shuffle",
        tol=0.0, max_iters=3, checkpointer=ck, resume=True,
    )
    want = {r["vertex"]: r["rank"] for r in full.ranks.take_all()}
    got = {r["vertex"]: r["rank"] for r in resumed.ranks.take_all()}
    assert want.keys() == got.keys()
    assert all(abs(want[v] - got[v]) < 1e-12 for v in want)


def test_lp_sharded_checkpoint_resume(tmp_ckpt):
    edges, _ = synth.make_planted_graph(2_000, 4, 5, seed=37)
    ck = Checkpointer(tmp_ckpt, "lpsh")
    full = label_propagation(
        G.from_arrow_edges(edges), mode="sharded", checkpointer=ck,
    )
    d = os.path.join(tmp_ckpt, "lpsh")
    n_ck = len([n for n in os.listdir(d) if n.startswith("iter_")])
    assert n_ck == full.num_iterations
    _truncate_checkpoints(d, max(1, n_ck // 2))
    resumed = label_propagation(
        G.from_arrow_edges(edges), mode="sharded", checkpointer=ck, resume=True,
    )
    assert labels_dict(resumed.labels) == labels_dict(full.labels)
    assert resumed.num_components == full.num_components


def test_sharded_checkpoint_cross_mode_resume(tmp_ckpt):
    """A checkpoint written by the sharded LP path resumes on the dataflow
    (shuffle) path — the parts are ordinary (vertex, label, changed)
    Parquet — and vice versa via footer-statistics range discovery."""
    edges, _ = synth.make_planted_graph(600, 3, 4, seed=41)
    ck = Checkpointer(tmp_ckpt, "xmode")
    full = label_propagation(
        G.from_arrow_edges(edges), mode="sharded", checkpointer=ck,
    )
    resumed = label_propagation(
        G.from_arrow_edges(edges), mode="shuffle", num_partitions=2,
        checkpointer=ck, resume=True,
    )
    assert labels_dict(resumed.labels) == labels_dict(full.labels)
    # and dataflow-written state resumes on the sharded path
    ck2 = Checkpointer(tmp_ckpt, "xmode2")
    full2 = label_propagation(
        G.from_arrow_edges(edges), mode="shuffle", num_partitions=2,
        checkpointer=ck2,
    )
    resumed2 = label_propagation(
        G.from_arrow_edges(edges), mode="sharded", checkpointer=ck2, resume=True,
    )
    assert labels_dict(resumed2.labels) == labels_dict(full2.labels)


def test_pagerank_checkpoint_metrics(tmp_ckpt):
    edges, _ = synth.golden_micro()
    # directed + implicit vertices → BSP path: one shard-written
    # checkpoint per superstep, metrics carry the dangling mass
    res = pagerank(
        G.from_arrow_edges(edges),
        num_partitions=2,
        tol=1e-8,
        checkpointer=Checkpointer(tmp_ckpt, "pr"),
    )
    d = os.path.join(tmp_ckpt, "pr")
    iters = [n for n in sorted(os.listdir(d)) if n.startswith("iter_")]
    assert len(iters) == res.num_iterations
    with open(os.path.join(d, iters[-1], "_metrics.json")) as f:
        meta = json.load(f)
    assert meta["num_vertices"] == 6
    assert "lineage" in meta and "dangling_mass" in meta

    # explicit vertices → dataflow path: iter_0000 holds the init state
    import numpy as np
    import ray.data as rd

    verts = rd.from_arrow(pa.table({"vertex": np.arange(6, dtype=np.int64)}))
    res2 = pagerank(
        G.from_arrow_edges(edges),
        vertices=verts,
        num_partitions=2,
        tol=1e-8,
        checkpointer=Checkpointer(tmp_ckpt, "pr_df"),
    )
    d2 = os.path.join(tmp_ckpt, "pr_df")
    iters2 = [n for n in sorted(os.listdir(d2)) if n.startswith("iter_")]
    assert len(iters2) == res2.num_iterations + 1  # + init


def test_chained_saves_sever_lineage(ray_session):
    """Deep superstep loops must not nest logical plans: 400 chained
    dir-less saves previously blew Python's recursion limit around ~150
    iterations (RecursionError inside plan execution)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.checkpoint import Checkpointer

    ck = Checkpointer(None)
    state = rd.from_arrow(pa.table({"x": np.arange(64, dtype=np.int64)}))
    for i in range(400):
        state = ck.save(i, state.map_batches(lambda t: t, batch_format="pyarrow"), {})
    assert state.count() == 64
