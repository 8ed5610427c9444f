"""Per-superstep checkpointing with lineage + metrics (north-rule requirement).

The reference has no checkpoint/resume at all — any failure aborts
(``src/main.c:115``), with max-iteration caps as the only safety net
(``src/cc_openmp.c:82``, ``src/mpi/cc_mpi.c:2060``).  At 100 TB scale a
superstep loop must survive a driver restart, so every iteration writes its
state Dataset as partitioned Parquet plus a ``_metrics.json`` manifest; the
manifest is written LAST, so a directory with a manifest is complete by
construction (write-then-rename atomicity at the file level).

Layout::

    {root}/{job}/iter_0000/ *.parquet + _metrics.json
    {root}/{job}/iter_0001/ ...

Checkpointing doubles as the per-iteration materialization barrier that keeps
the Dataset lineage shallow (SURVEY.md §7 hard parts: iterative loops in a
DAG engine).  With ``root=None`` the checkpointer degrades to in-memory
``materialize()`` — same barrier, no resumability.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

import numpy as np
import ray
import ray.data as rd


@ray.remote(num_cpus=1)
def _write_shard_task(table, path: str) -> dict[str, Any]:
    """Write one state shard to Parquet; return its vertex range.

    Runs where the shard lives (no driver round-trip of per-vertex state).
    ``root`` must be storage every node can reach — true of any checkpoint
    design; on this sandbox it is the local filesystem.
    """
    import pyarrow.parquet as pq

    pq.write_table(table, path)
    v = table["vertex"].to_numpy(zero_copy_only=False)
    return {
        "file": os.path.basename(path),
        "rows": int(len(v)),
        "vmin": int(v[0]) if len(v) else None,
        "vmax": int(v[-1]) if len(v) else None,
    }


@ray.remote(num_cpus=1)
def _load_shard_state_task(prep, col: str, default, paths: list[str]) -> np.ndarray:
    """Rebuild one shard's state vector from the checkpoint parts that
    overlap its vertex range.

    The shard's vertex set (``prep[0]``, sorted) comes from re-running the
    deterministic prep on the same input; the checkpoint's partitioning may
    differ (different block count, different mode), so state is matched by
    vertex id, not by position.  Vertices absent from the checkpoint keep
    the init value (``default=None`` → the vertex id itself, the min-label
    init)."""
    import pyarrow.parquet as pq

    vids = prep[0]
    out = vids.copy() if default is None else np.full(len(vids), default)
    vs, xs = [], []
    for p in paths:
        t = pq.read_table(p, columns=["vertex", col])
        vs.append(t["vertex"].to_numpy(zero_copy_only=False))
        xs.append(t[col].to_numpy(zero_copy_only=False))
    if vs and sum(len(a) for a in vs):
        v = np.concatenate(vs)
        x = np.concatenate(xs)
        order = np.argsort(v, kind="stable")
        v, x = v[order], x[order]
        pos = np.searchsorted(v, vids)
        pos = np.minimum(pos, max(len(v) - 1, 0))
        hit = v[pos] == vids
        out[hit] = x[pos[hit]]
    return out


class Checkpointer:
    """Superstep state writer/reader for iterative kernels."""

    def __init__(self, root: str | None, job: str = "job"):
        self.root = root
        self.job = job
        self.dir = os.path.join(root, job) if root else None
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)

    def _iter_dir(self, it: int) -> str:
        assert self.dir is not None
        return os.path.join(self.dir, f"iter_{it:04d}")

    def save(self, it: int, ds: rd.Dataset, metrics: dict[str, Any]) -> rd.Dataset:
        """Persist state for iteration ``it``; return the re-read Dataset.

        The returned Dataset reads from Parquet, so downstream lineage starts
        fresh (no recursive re-execution of prior supersteps).  Metrics carry
        lineage (previous iteration path) + convergence counters — the
        engine's equivalent of the reference's per-run perf printout
        (``benchmarks/benchmark_mpi.c:312-336``).
        """
        if self.dir is None:
            mat = ds.materialize()
            # sever the logical plan, not just execution: a materialized
            # Dataset still carries its upstream plan, and an O(diameter)
            # superstep loop (a 300-hop chain under label propagation)
            # nests those plans past Python's recursion limit.  Rebuilding
            # from the block refs is zero-copy and starts lineage fresh —
            # the in-memory analogue of the Parquet re-read below.
            refs = mat.to_arrow_refs()
            return rd.from_arrow_refs(refs) if refs else mat
        d = self._iter_dir(it)
        tmp = d + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(d):
            shutil.rmtree(d)
        ds.write_parquet(tmp)
        os.rename(tmp, d)
        meta = dict(metrics)
        meta.setdefault("iteration", it)
        meta.setdefault("wall_ts", time.time())
        meta.setdefault(
            "lineage",
            {"prev": self._iter_dir(it - 1) if it > 0 else None, "engine": "linkgraph"},
        )
        with open(os.path.join(d, "_metrics.json"), "w") as f:
            json.dump(meta, f)
        return rd.read_parquet(d)

    def save_shards(
        self, it: int, shard_refs: list, metrics: dict[str, Any]
    ) -> None:
        """Persist object-store-sharded per-vertex state for iteration ``it``.

        One raw write task per shard (the shard table never touches the
        driver); the manifest is written after the rename, so a directory
        with a manifest is complete, exactly like :meth:`save`.  The parts
        are ordinary ``(vertex, ...)`` Parquet, readable by :meth:`load` /
        ``latest()`` — a run checkpointed by a BSP mode can resume on a
        dataflow path and vice versa."""
        if self.dir is None:
            return
        d = self._iter_dir(it)
        tmp = d + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(tmp)
        parts = ray.get(
            [
                _write_shard_task.remote(r, os.path.join(tmp, f"part-{j:05d}.parquet"))
                for j, r in enumerate(shard_refs)
            ]
        )
        os.rename(tmp, d)
        meta = dict(metrics)
        meta.setdefault("iteration", it)
        meta.setdefault("wall_ts", time.time())
        meta.setdefault(
            "lineage",
            {"prev": self._iter_dir(it - 1) if it > 0 else None, "engine": "linkgraph"},
        )
        meta["sharded_parts"] = parts
        with open(os.path.join(d, "_metrics.json"), "w") as f:
            json.dump(meta, f)

    def _part_ranges(self, it: int) -> list[tuple[str, int, int]]:
        """(path, vmin, vmax) per part of iteration ``it`` — from the
        manifest when the checkpoint was shard-written, else from the
        Parquet footer statistics (dataflow-written checkpoints)."""
        import pyarrow.parquet as pq

        d = self._iter_dir(it)
        with open(os.path.join(d, "_metrics.json")) as f:
            meta = json.load(f)
        out: list[tuple[str, int, int]] = []
        if "sharded_parts" in meta:
            for p in meta["sharded_parts"]:
                if p["rows"]:
                    out.append((os.path.join(d, p["file"]), p["vmin"], p["vmax"]))
            return out
        for name in sorted(os.listdir(d)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(d, name)
            md = pq.ParquetFile(path).metadata
            schema_idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }["vertex"]
            vmin, vmax, rows = None, None, 0
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                rows += g.num_rows
                st = g.column(schema_idx).statistics
                if st is not None and st.has_min_max:
                    vmin = st.min if vmin is None else min(vmin, st.min)
                    vmax = st.max if vmax is None else max(vmax, st.max)
            if rows:
                # stats can be absent; treat the part as covering everything
                out.append(
                    (
                        path,
                        vmin if vmin is not None else -(2**62),
                        vmax if vmax is not None else 2**62,
                    )
                )
        return out

    def load_shards(
        self, preps: list, firsts: "np.ndarray", col: str, default=None
    ) -> tuple[int, list, dict[str, Any]] | None:
        """Resume object-store-sharded state from the latest complete
        iteration: one raw load task per NEW shard, each reading only the
        checkpoint parts whose vertex range overlaps the shard's range
        (shard ``j`` owns ``[firsts[j], firsts[j+1])``).  Returns
        ``(iteration, state shard refs, metrics)`` or ``None``."""
        iters = self.complete_iters()
        if not iters:
            return None
        it = iters[-1]
        with open(os.path.join(self._iter_dir(it), "_metrics.json")) as f:
            meta = json.load(f)
        ranges = self._part_ranges(it)
        k = len(preps)
        his = [int(firsts[j + 1]) - 1 if j + 1 < k else 2**62 for j in range(k)]
        states = [
            _load_shard_state_task.remote(
                preps[j],
                col,
                default,
                [p for (p, lo, hi) in ranges if hi >= int(firsts[j]) and lo <= his[j]],
            )
            for j in range(k)
        ]
        return it, states, meta

    def complete_iters(self) -> list[int]:
        """Iterations that finished (manifest present), ascending."""
        if self.dir is None or not os.path.isdir(self.dir):
            return []
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("iter_") and not name.endswith(".tmp"):
                if os.path.exists(os.path.join(self.dir, name, "_metrics.json")):
                    out.append(int(name.split("_")[1]))
        return out

    def load(self, it: int) -> tuple[rd.Dataset, dict[str, Any]]:
        d = self._iter_dir(it)
        with open(os.path.join(d, "_metrics.json")) as f:
            meta = json.load(f)
        ds = rd.read_parquet(d)
        return ds, meta

    def latest(self) -> tuple[int, rd.Dataset, dict[str, Any]] | None:
        """Most recent complete iteration, or None (fresh start)."""
        iters = self.complete_iters()
        if not iters:
            return None
        it = iters[-1]
        ds, meta = self.load(it)
        return it, ds, meta
