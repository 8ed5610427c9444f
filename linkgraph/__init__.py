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

__version__ = "0.1.0"
