"""Sources/sinks: Matrix Market edge lists and result writers.

``read_mtx`` re-expresses the reference's reader (``src/mtx_reader.c:78-214``)
as a Ray Data pipeline: ``read_text`` → vectorized per-batch parse.
Faithfully reproduced semantics:

- ``%`` comment lines skipped (``src/mtx_reader.c:104-116``);
- first non-comment line is ``rows cols nnz`` (``:117-128``);
- data lines are ``u v [value]``; the optional value is parsed and
  **discarded** — the graph is unweighted (``:153-156``);
- 1-indexed on disk → 0-indexed in memory (``:165-167``);
- out-of-range endpoints are rejected (``:168-180``); here: filtered with a
  count, matching the reader's bounds check;
- non-square header: ``max(rows, cols)`` vertices (``:119-125``);
- the ``symmetric`` header flag is sniffed but ignored — every input is
  treated as undirected downstream, exactly like ``graph_add_edge``
  inserting both directions unconditionally (``src/graph.c:87-102``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd


def _parse_batch(t: pa.Table, num_vertices: int) -> pa.Table:
    lines = t["text"].to_pylist()
    rows = []
    for ln in lines:
        s = ln.strip()
        if not s or s.startswith("%"):
            continue
        parts = s.split()
        if len(parts) < 2:
            continue
        rows.append((int(parts[0]), int(parts[1])))
    if not rows:
        return pa.table(
            {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
        )
    arr = np.asarray(rows, dtype=np.int64) - 1  # 1-indexed → 0-indexed
    ok = (
        (arr[:, 0] >= 0)
        & (arr[:, 0] < num_vertices)
        & (arr[:, 1] >= 0)
        & (arr[:, 1] < num_vertices)
    )
    arr = arr[ok]
    return pa.table({"src": arr[:, 0], "dst": arr[:, 1]})


def read_mtx_header(path: str) -> dict:
    """Sniff banner + size line without reading the data (driver-side)."""
    symmetric = False
    with open(path, "r") as f:
        for line in f:
            s = line.strip()
            if s.startswith("%"):
                if "symmetric" in s.lower():
                    symmetric = True
                continue
            if not s:
                continue
            parts = s.split()
            rows, cols, nnz = int(parts[0]), int(parts[1]), int(parts[2])
            return {
                "rows": rows,
                "cols": cols,
                "nnz": nnz,
                "num_vertices": max(rows, cols),
                "symmetric": symmetric,
                "size_line": s,
            }
    raise ValueError(f"no size line found in {path}")


def read_mtx(path: str) -> tuple[rd.Dataset, dict]:
    """MTX file → (edge Dataset, header info).

    The size line is read driver-side (tiny); the edge body parses in
    parallel per text block.  The size line itself is excluded by exact raw
    text match (an edge line textually identical to the size line would be a
    degenerate weighted-edge coincidence; documented limitation).
    """
    info = read_mtx_header(path)
    ds = rd.read_text(path)
    size_line = info["size_line"]

    def parse(t: pa.Table) -> pa.Table:
        keep = pa.compute.not_equal(
            pa.compute.utf8_trim_whitespace(t["text"]), size_line
        )
        return _parse_batch(t.filter(keep), info["num_vertices"])

    return ds.map_batches(parse, batch_format="pyarrow"), info


def write_mtx(path: str, src: np.ndarray, dst: np.ndarray, num_vertices: int) -> None:
    """Tiny driver-side MTX writer for fixtures/round-trips (0→1 indexed)."""
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write(f"{num_vertices} {num_vertices} {len(src)}\n")
        for u, v in zip(src, dst):
            f.write(f"{u + 1} {v + 1}\n")


def write_labels(labels: rd.Dataset, out_dir: str) -> str:
    """Result sink: partitioned Parquet (the engine's ``cc_result_print``).

    The reference only prints stats to stdout (``src/cc_sequential.c:474-493``);
    at scale the labels table is the product, written as a directory of
    shards so a consumer (or a resumed job) reads it back with
    ``read_parquet``.
    """
    os.makedirs(out_dir, exist_ok=True)
    labels.write_parquet(out_dir)
    return out_dir
