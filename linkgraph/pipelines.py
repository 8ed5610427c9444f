"""Composed pipelines over the driver-provided testdata tables.

The graph kernels need an edge table; the sandbox testdata (TESTDATA.md) has
no edge table, so we derive deterministic graphs from it:

- ``edges_from_lineitem`` — the bipartite order↔part graph (one edge per
  lineitem row, part ids offset into their own id range).  This is the
  benchmark workhorse: sf0.1 → ~600k edges.
- ``copurchase_edges`` — the part↔part co-purchase graph (two parts linked
  when they appear in the same order): a real triangle-bearing graph,
  derived via a self-join on the order key.

Both are expressible in ANSI SQL, so the *derived-table* queries (degrees,
top-k) get DuckDB oracles.  At these sizes the iterative kernels (CC,
PageRank, LP) get rows-only driver checks plus the pytest NumPy oracles
(FIXTURES.md §6-7); their value-checked SQL oracles live on the bounded
``membership_edges`` graph below.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph import extract, graph as G
from linkgraph.cc import connected_components
from linkgraph.pagerank import pagerank

PART_OFFSET = 1_000_000_000  # keeps part vertex ids disjoint from order ids


def edges_from_lineitem(sf_dir: str) -> rd.Dataset:
    """Bipartite order↔part edge table from lineitem (columns pruned at read)."""
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    )

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": t["l_orderkey"],
                "dst": pa.compute.add(t["l_partkey"], PART_OFFSET),
            }
        )

    return li.map_batches(to_edges, batch_format="pyarrow")


def copurchase_edges(sf_dir: str, num_partitions: int | None = None) -> rd.Dataset:
    """part↔part edges for parts sharing an order (self-join on l_orderkey)."""
    from linkgraph.partition import bucket_join

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    )
    left = li.map_batches(
        lambda t: pa.table({"k": t["l_orderkey"], "p1": t["l_partkey"]}),
        batch_format="pyarrow",
    )
    right = li.map_batches(
        lambda t: pa.table({"k": t["l_orderkey"], "p2": t["l_partkey"]}),
        batch_format="pyarrow",
    )
    pairs = bucket_join(
        left,
        right,
        ["k"],
        num_buckets=num_partitions,
        left_payload={"p1": pa.int64()},
        right_payload={"p2": pa.int64()},
    )

    def orient(t: pa.Table) -> pa.Table:
        p1 = t["p1"].to_numpy(zero_copy_only=False)
        p2 = t["p2"].to_numpy(zero_copy_only=False)
        keep = p1 < p2
        return pa.table({"src": p1[keep], "dst": p2[keep]})

    return pairs.map_batches(orient, batch_format="pyarrow")


def flagship(sf_dir: str, num_partitions: int | None = None):
    """Flagship: lineitem → edge table → connected components → labels."""
    edges = edges_from_lineitem(sf_dir)
    return connected_components(edges, num_partitions=num_partitions)


NATION_OFFSET = 2_000_000_000
REGION_OFFSET = 3_000_000_000


def membership_edges(sf_dir: str) -> rd.Dataset:
    """customer→nation→region membership graph.

    Small and diameter-bounded by construction (exactly one component per
    region, diameter 4), so the iterative kernels over it are fully
    SQL-expressible: CC/LP labels via a DuckDB recursive-CTE reachability
    min, PageRank via unrolled fixed-iteration CTEs — giving the graph
    kernels *value-checked* oracle entries alongside the rows-only
    full-size ones (``__ray_entry__.oracle_sql``).
    """
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["c_custkey"],
                "dst": pa.compute.add(t["c_nationkey"], NATION_OFFSET),
            }
        ),
        batch_format="pyarrow",
    )
    nat = rd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    ).map_batches(
        lambda t: pa.table(
            {
                "src": pa.compute.add(t["n_nationkey"], NATION_OFFSET),
                "dst": pa.compute.add(t["n_regionkey"], REGION_OFFSET),
            }
        ),
        batch_format="pyarrow",
    )
    return cust.union(nat)


def pages_pipeline(
    pages: rd.Dataset,
    num_partitions: int | None = None,
    checkpointer=None,
    resume: bool = False,
):
    """North-rule pipeline: pages → extract hrefs → id edges → CC labels.

    One pages scan total: ``pages_to_edges_and_vertices`` emits the edge
    table AND the vertex universe (isolated pages included) from a single
    task-fused extraction pass — a second html scan would double the
    dominant cost of the pipeline at crawl scale."""
    edges, verts = extract.pages_to_edges_and_vertices(pages)
    return connected_components(
        edges,
        vertices=verts,
        num_partitions=num_partitions,
        checkpointer=checkpointer,
        resume=resume,
    )
