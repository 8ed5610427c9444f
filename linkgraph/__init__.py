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

from linkgraph import schemas  # noqa: F401
from linkgraph.runtime import tune_context as _tune_context

# Datasets capture the DataContext at creation time, so the hash-shuffle
# strategy must be set before ANY Dataset is built — not just before the
# kernels run.  Idempotent; kernel entry points re-invoke it to re-size the
# aggregator pool once a Ray session exists.
_tune_context()

__version__ = "0.1.0"
