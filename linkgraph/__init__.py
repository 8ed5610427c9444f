"""linkgraph — a Ray-Data-native link-graph analytics engine.

Built from scratch against the semantics of the reference
(ktsoupos/parallel_connected_components, a C11 connected-components benchmark
suite): min-id canonical component labels, undirected edge semantics with
self-loop dropping, sync (deterministic) superstep execution, component
statistics, iterations-to-convergence and scaling-efficiency metrics.
See SURVEY.md for the full mapping (reference file:line citations live in
each module's docstring).

Architecture is Ray-Data-first: every stage is a transform over
``ray.data.Dataset`` (Arrow blocks), wide steps are ``groupby``/``join``
hash shuffles, stateful stages are actor pools, and iterative kernels
(connected components, PageRank, label propagation) run as superstep loops
whose per-vertex state lives exclusively in hash-partitioned Datasets —
never in driver memory.
"""

import os as _os

# Large numpy allocations (≥4 MB) madvise(MADV_HUGEPAGE); with kernel THP
# defrag=madvise that triggers SYNCHRONOUS page compaction on first touch —
# measured 6-17 s for a single 50 MB temporary on this host (vs 0.05 s
# without), stalling every block emit and driver combine.  Disable it in
# this process (runtime switch) and in children (env var — Ray workers
# inherit it via the raylet when the driver sets it before ray.init; they
# also run this module import, so the runtime switch covers them even when
# Ray was initialised first).
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

# polars sizes its global thread pool at import; inside 1-CPU Ray tasks the
# default (ncpus) oversubscribes 32× when every worker sorts concurrently.
# Workers import this module, and polars is imported lazily afterwards
# (bsp._sort_cols), so the cap lands before the pool exists.  Scope the cap
# to Ray WORKER processes only — in the driver (or any host application
# importing linkgraph) polars keeps its full pool, e.g. for Ray Data's
# driver-side use_polars_sort path.
import sys as _sys


def _in_ray_worker() -> bool:
    """True iff this process is a Ray worker (task/actor executor).

    Primary signal: Ray's own worker-mode flag (covers embedded interpreters
    and nonstandard entrypoints like runtime_env setup_worker).  Fallback:
    the worker entrypoint basename.  ``sys.argv`` may be empty in embedded
    interpreters — never index it blindly.
    """
    w = _sys.modules.get("ray._private.worker")
    if w is not None:
        try:
            mode = w.global_worker.mode
            if mode is not None:
                return mode == w.WORKER_MODE
        except Exception:
            pass
    argv0 = _sys.argv[0] if _sys.argv else ""
    base = _os.path.basename(argv0 or "")
    return "default_worker.py" in base or "setup_worker" in base


if _in_ray_worker():
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")
try:  # numpy 1.18-1.26 private-but-stable API; numpy 2.x moved np.core
    import numpy as _np

    _np.core.multiarray._set_madvise_hugepage(False)
except Exception:
    pass

from linkgraph import schemas  # noqa: F401
from linkgraph.runtime import tune_context as _tune_context

# Datasets capture the DataContext at creation time, so the hash-shuffle
# strategy must be set before ANY Dataset is built — not just before the
# kernels run.  Idempotent; kernel entry points re-invoke it to re-size the
# aggregator pool once a Ray session exists.
_tune_context()

__version__ = "0.1.0"
