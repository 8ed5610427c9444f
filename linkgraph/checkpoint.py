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

import ray.data as rd


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
            return ds.materialize()
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
