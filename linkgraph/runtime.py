"""Ray Data context tuning for the engine.

Ray 2.49 defaults to the legacy pull-based SORT shuffle for
groupby/map_groups/repartition — measured on this engine's superstep
workloads it estimates 10+ GB of driver memory and runs minutes per shuffle
at single-digit-million rows.  The hash-shuffle strategy (aggregator actors,
no global sort, no driver staging) runs the same co-group in seconds and is
what the engine's bucketed joins assume.

``tune_context()`` is idempotent and called at the top of every public
kernel entry point, so the engine works regardless of who created the Ray
session (pytest fixture, bench.py, or the external driver).
"""

from __future__ import annotations

from ray.data import DataContext
from ray.data.context import ShuffleStrategy


def default_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the session: (1, CPUs).

    A fixed pool (e.g. ``concurrency=2``) underuses a 32-CPU node and would
    starve a multi-node cluster; an autoscaling range lets Ray grow the
    pool with queue depth and shrink it when idle.
    """
    import ray

    cpus = 8
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    return (1, max(2, cpus))


def resolve_concurrency(c):
    """Caller-supplied concurrency, or the session-sized autoscaling range."""
    return c if c is not None else default_concurrency()


def tune_context() -> DataContext:
    import ray

    ctx = DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # size the aggregator pool to the session: the defaults (64 aggregators,
    # 1 logical CPU each) starve small sessions — a 4-CPU test session sits
    # ~idle while actors wait for resources
    cpus = 8
    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    # few fat aggregators, not one per CPU: every shuffle op spawns a FRESH
    # actor pool (new Python worker processes); at 32 CPUs a 32-actor pool
    # costs ~10-15 s of process startup per execution, dwarfing the actual
    # concat work.  Capped at 16 (measured best at 32 CPUs / 16 partitions;
    # scales down with the session so reduce throughput grows with CPUs).
    ctx.max_hash_shuffle_aggregators = max(2, min(16, cpus))
    # Ray reserves num_partitions × this many logical CPUs for the aggregator
    # pool; a default-200-partition groupby at 0.25 demands 50 CPUs and
    # deadlocks a small session (observed: 4-CPU test fixture hung forever).
    # Keep the logical reservation near-zero — it only gates scheduling, not
    # actual compute.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    # polars block sorts in the range exchanges (the graph kernels' binding
    # cost): measured ~25% faster than the arrow sort path at both 8 and
    # 32 CPUs on the 32M-row incidence exchange
    try:
        ctx.use_polars_sort = True
    except Exception:  # pragma: no cover - option renamed/removed upstream
        pass
    return ctx


# Fraction of one node's object store a single broadcast state vector may
# occupy.  Conservative on purpose: the vector rides the object store once
# (ray.put) plus one deserialized copy per concurrently-running task, and
# several broadcast stages can coexist in a pipeline.
_GATE_STORE_FRACTION = 0.15


def broadcast_gate_rows(bytes_per_row: int, crossover_rows: int) -> int:
    """Per-node broadcast envelope in ROWS, computed at call time.

    The iterative kernels choose between a driver-broadcast state vector
    and sharded object-store state.  Two independent limits bound the
    broadcast side:

    - ``crossover_rows`` — the MEASURED performance crossover where the
      driver round-trip starts losing to the sharded path (constants in
      each kernel module; see BENCH/BASELINE.md).
    - a MEMORY envelope derived from the smallest alive node's
      object-store allocation (``ray.nodes()``), so a small-memory node
      never OOMs holding a vector the literal said was fine, and the
      decision adapts when the engine runs on a differently-sized cluster
      (VERDICT r3 "Next round" #4).

    The gate is their min.  ``LINKGRAPH_BROADCAST_GATE_ROWS`` overrides
    both (ops escape hatch; also how tests force the sharded handoff on a
    big-memory box).  Falls back to ``crossover_rows`` when Ray isn't
    initialized or node info is unavailable.
    """
    import os

    override = os.environ.get("LINKGRAPH_BROADCAST_GATE_ROWS")
    if override:
        return int(override)
    try:
        import ray

        if not ray.is_initialized():
            return crossover_rows
        stores = [
            n.get("Resources", {}).get("object_store_memory", 0.0)
            for n in ray.nodes()
            if n.get("Alive")
        ]
        smallest = min((s for s in stores if s), default=0.0)
        if not smallest:
            return crossover_rows
        mem_rows = int(smallest * _GATE_STORE_FRACTION / bytes_per_row)
        return max(1, min(crossover_rows, mem_rows))
    except Exception:  # pragma: no cover - node API drift
        return crossover_rows


def round_half_away(x, decimals: int = 6):
    """Round ties away from zero — the DuckDB/ANSI-SQL ``round()`` convention.

    ``np.round`` / Python ``round`` / pyarrow's default round are all
    half-to-even; any value this engine rounds for 6-dp comparison against a
    DuckDB oracle must use THIS helper (or ``pc.round(...,
    round_mode="half_towards_infinity")``) so an exact tie at the
    ``decimals+1``-th digit cannot hash-mismatch the oracle.  Accepts a
    scalar (returns float) or array-like (returns float64 ndarray).
    """
    import numpy as np

    scale = 10.0**decimals
    if np.ndim(x) == 0:
        xf = float(x)
        import math

        return math.copysign(math.floor(abs(xf) * scale + 0.5), xf) / scale
    arr = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(arr) * scale + 0.5), arr) / scale


def list_column_to_matrix(col, dtype=None):
    """Uniform-length (chunked) list column → ``(n, d)`` numpy matrix.

    Fixed-size-list and uniform ``list<T>`` columns convert via the flat
    values buffer (one reshape, no per-row Python objects — ``to_pylist``
    measured 30-80× slower on embedding/signature columns); ragged or
    null-bearing columns fall back to the object path.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    dtype = dtype or np.float64
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    t = col.type
    if pa.types.is_fixed_size_list(t) and col.null_count == 0:
        d = t.list_size
        vals = col.flatten().to_numpy(zero_copy_only=False)
        return vals.astype(dtype, copy=False).reshape(n, d)
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and col.null_count == 0:
        widths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        if len(widths) and (widths == widths[0]).all():
            d = int(widths[0])
            vals = col.flatten().to_numpy(zero_copy_only=False)
            return vals.astype(dtype, copy=False).reshape(n, d)
    return np.asarray(col.to_pylist(), dtype=dtype)


def import_polars():
    """Import polars with the 1-thread cap applied in Ray workers.

    polars sizes its global pool at first import; linkgraph.__init__ caps it
    when it detects a worker, but module import order isn't guaranteed for
    every entrypoint (embedded interpreters, pre-init imports).  Re-check at
    the point of first polars use — if the pool doesn't exist yet and we're
    in a worker, the cap still lands in time.
    """
    import os
    import sys

    if "polars" not in sys.modules:
        from linkgraph import _in_ray_worker

        if _in_ray_worker():
            os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    return pl


def content_hash64(col) -> "np.ndarray":
    """Vectorized 64-bit content hash of a (chunked) string column → int64.

    Uses polars' native xxhash (seeded, deterministic, C-speed over the
    Arrow buffer) instead of a per-row Python ``hashlib`` loop — measured
    ~100× on the exact-dedup hash stage.  The value is an ENGINE-INTERNAL
    partitioning/grouping key (dedup groupbys compare hashes, never ship
    them to an oracle), so the exact hash function is free to change.
    """
    import numpy as np
    import pyarrow as pa

    pl = import_polars()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype=np.int64)
    s = pl.from_arrow(col)
    return s.hash(seed=0).to_numpy().view(np.int64)
