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


_EMPTY_SRC_DST = pa.table(
    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
)


def _parse_batch(t: pa.Table, num_vertices: int) -> pa.Table:
    """Vectorized MTX body parse: trim → drop comments/blanks → whitespace
    split → cast first two tokens to int64 (Arrow C kernels throughout —
    the original Python line loop ran 4× slower than the reference's C
    ``fscanf`` reader; this parses ~16 M lines/s/core).  Malformed numeric
    tokens fall back to a per-line loop for that block only.

    DIVERGENCE from the reference: ``src/mtx_reader.c:144-193`` treats a
    short or out-of-range line as a HARD ERROR and aborts the read.  At
    100-TB scale one corrupt shard must not kill the job, so this engine
    drops bad lines instead — but loudly: every drop is counted and logged
    per batch so silent truncation is visible in the worker logs."""
    import logging

    import pyarrow.compute as pc

    col = pc.utf8_trim_whitespace(t["text"])
    keep = pc.and_(
        pc.invert(pc.starts_with(col, pattern="%")), pc.not_equal(col, "")
    )
    col = col.filter(keep)
    if len(col) == 0:
        return _EMPTY_SRC_DST
    n_data = len(col)
    parts = pc.utf8_split_whitespace(col)
    parts = parts.filter(pc.greater_equal(pc.list_value_length(parts), 2))
    if len(parts) == 0:
        logging.getLogger(__name__).warning(
            "read_mtx: dropped %d malformed line(s) in one batch "
            "(reference aborts here; we drop-and-count)", n_data
        )
        return _EMPTY_SRC_DST
    try:
        u = pc.cast(pc.list_element(parts, 0), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = pc.cast(pc.list_element(parts, 1), pa.int64()).to_numpy(
            zero_copy_only=False
        )
    except pa.ArrowInvalid:
        rows = []
        for toks in parts.to_pylist():
            try:
                rows.append((int(toks[0]), int(toks[1])))
            except ValueError:
                continue
        if not rows:
            logging.getLogger(__name__).warning(
                "read_mtx: dropped %d malformed line(s) in one batch", n_data
            )
            return _EMPTY_SRC_DST
        arr = np.asarray(rows, dtype=np.int64)
        u, v = arr[:, 0], arr[:, 1]
    u = u - 1  # 1-indexed → 0-indexed
    v = v - 1
    ok = (u >= 0) & (u < num_vertices) & (v >= 0) & (v < num_vertices)
    dropped = n_data - int(ok.sum())
    if dropped:
        logging.getLogger(__name__).warning(
            "read_mtx: dropped %d malformed/out-of-range line(s) in one "
            "batch (reference aborts here; we drop-and-count)", dropped
        )
    return pa.table({"src": u[ok], "dst": v[ok]})


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


def _range_lines(path: str, start: int, end: int, file_size: int) -> pa.Array:
    """The lines whose FIRST byte lies in ``[start, end)``, as an Arrow
    string array built zero-copy from newline offsets (no per-line Python
    objects).  Standard split-file contract: a range completes a line that
    starts inside it and skips one that started before it."""
    with open(path, "rb") as f:
        if start > 0:
            f.seek(start - 1)
            if f.read(1) != b"\n":
                f.readline()  # line started before us — the previous range's
        pos = f.tell()
        if pos >= end:
            return pa.array([], pa.string())
        chunk = f.read(end - pos)
        if chunk and not chunk.endswith(b"\n") and end < file_size:
            chunk += f.readline()  # finish our last line
    buf = np.frombuffer(chunk, np.uint8)
    # string offsets are int32 → a ≥2 GiB range would silently wrap into a
    # corrupt array; switch to large_string (int64 offsets) past the limit
    # (hit when a caller passes a small num_blocks for a huge file)
    large = len(buf) > np.iinfo(np.int32).max
    odt = np.int64 if large else np.int32
    nl = np.flatnonzero(buf == 0x0A).astype(odt)
    starts = np.concatenate([np.zeros(1, odt), nl + 1])
    if starts[-1] >= len(buf):  # trailing newline → no final partial line
        starts = starts[:-1]
    # each value spans [start_i, start_{i+1}) and so KEEPS its trailing
    # newline — one offsets vector over the raw buffer is then exact and
    # the construction is zero-copy; the parser's utf8_trim_whitespace
    # strips the newline with the rest of the padding
    offsets = np.concatenate([starts, np.asarray([len(buf)], odt)])
    cls = pa.LargeStringArray if large else pa.StringArray
    return cls.from_buffers(
        len(starts),
        pa.py_buffer(np.ascontiguousarray(offsets).tobytes()),
        pa.py_buffer(chunk),
    )


def read_mtx(path: str, num_blocks: int | None = None) -> tuple[rd.Dataset, dict]:
    """MTX file → (edge Dataset, header info).

    The size line is read driver-side (tiny); the body is read in parallel
    BYTE RANGES (``ray.data.read_text`` does not split a single file — a
    250 MB edge list parsed serially at ~30 s where these ranges parse in
    ~1 s at 32 CPUs) and each range is line-split zero-copy and parsed with
    the vectorized Arrow kernels in ``_parse_batch``.  The size line itself
    is excluded by exact text match (an edge line textually identical to it
    would be a degenerate weighted-edge coincidence; documented limitation).
    """
    info = read_mtx_header(path)
    size_line = info["size_line"]
    file_size = os.path.getsize(path)
    k = num_blocks or int(max(8, min(64, file_size // (8 << 20) + 1)))
    bounds = np.linspace(0, file_size, k + 1).astype(np.int64)
    ranges = pa.table({"start": bounds[:-1], "end": bounds[1:]})

    nnz = max(info["nnz"], 1)

    def parse(t: pa.Table) -> pa.Table:
        import logging

        outs = []
        for s, e in zip(t["start"].to_pylist(), t["end"].to_pylist()):
            lines = _range_lines(path, int(s), int(e), file_size)
            if len(lines) == 0:
                continue
            keep = pa.compute.not_equal(
                pa.compute.utf8_trim_whitespace(lines), size_line
            )
            outs.append(
                _parse_batch(
                    pa.table({"text": lines.filter(keep)}), info["num_vertices"]
                )
            )
            # distributed analogue of the reference's every-N-edges progress
            # report (``src/mtx_reader.c:185-193``): one line per byte range
            # as it completes, with its share of the declared edge count
            logging.getLogger(__name__).info(
                "read_mtx: range [%d, %d) parsed %d edges (~%.1f%% of file)",
                s, e, len(outs[-1]), 100.0 * len(outs[-1]) / nnz,
            )
        if not outs:
            return _EMPTY_SRC_DST
        return pa.concat_tables(outs)

    ds = (
        rd.from_arrow(ranges)
        .repartition(k)
        .map_batches(parse, batch_format="pyarrow", batch_size=1)
    )
    return ds, info


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
