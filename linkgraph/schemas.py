"""Arrow schemas for every table the engine passes between stages.

The reference models everything as int32 CSR arrays (``inc/graph.h:11-25``);
at 10^12-document scale vertex ids must be int64 (SURVEY.md §1.2), so every
id/counter here is int64.  The pages schema follows BASELINE.json's
``input_hint`` exactly.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input: Common-Crawl-style web pages (BASELINE.json input_hint).
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Canonical edge table (directed as-extracted; symmetrize for undirected ops).
EDGES = pa.schema([pa.field("src", pa.int64()), pa.field("dst", pa.int64())])

# URL-level edge table straight out of the extractor, before id assignment.
URL_EDGES = pa.schema(
    [pa.field("src_url", pa.string()), pa.field("dst_url", pa.string())]
)

# Per-vertex component labels (the engine's CCResult.labels equivalent,
# reference `inc/cc_sequential.h:5-9`). Canonical label = min vertex id in
# the component (reference `src/cc_sequential.c:325-331`).
LABELS = pa.schema([pa.field("vertex", pa.int64()), pa.field("label", pa.int64())])

# Per-vertex PageRank state. `outdeg` is carried in-state so the dangling
# mass (sum of rank over outdeg==0 vertices) is a cheap filter+sum, not a join.
RANKS = pa.schema(
    [
        pa.field("vertex", pa.int64()),
        pa.field("rank", pa.float64()),
        pa.field("outdeg", pa.int64()),
    ]
)

DEGREES = pa.schema([pa.field("vertex", pa.int64()), pa.field("degree", pa.int64())])

VERTICES = pa.schema([pa.field("vertex", pa.int64())])


def empty(schema: pa.Schema) -> pa.Table:
    """An empty Arrow table with the given schema."""
    return schema.empty_table()
