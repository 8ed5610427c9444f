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


def test_pagerank_checkpoint_metrics(tmp_ckpt):
    edges, _ = synth.golden_micro()
    res = pagerank(
        G.from_arrow_edges(edges),
        num_partitions=2,
        tol=1e-8,
        checkpointer=Checkpointer(tmp_ckpt, "pr"),
    )
    d = os.path.join(tmp_ckpt, "pr")
    iters = [n for n in sorted(os.listdir(d)) if n.startswith("iter_")]
    assert len(iters) == res.num_iterations + 1  # + init
    with open(os.path.join(d, iters[-1], "_metrics.json")) as f:
        meta = json.load(f)
    assert meta["num_vertices"] == 6
    assert "lineage" in meta
