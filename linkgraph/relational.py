"""Generic relational operators over the testdata tables.

These are the engine's filter/project/aggregate/join/sort/top-k/distinct
surface (SURVEY.md §2.2, §2.4-2.7), exercised against the driver's TPC-H-ish
tables so each one has a DuckDB oracle (``__ray_entry__.oracle_sql``).
Column names in every function match the oracle SQL exactly (driver hashes
sort columns by name).

All reads prune columns; all hot paths are vectorized Arrow/pandas; string
group keys go through Ray's native groupby (hash-partial aggregation).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from linkgraph.graph import default_partitions as _np
from linkgraph import graph as G
from linkgraph.pipelines import edges_from_lineitem


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# -- filters / projections / aggregations -----------------------------------

def lineitem_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped: filter on ship date, grouped pricing aggregates."""
    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us"))))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc_price,
            }
        )

    return (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"], num_partitions=_np())
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
    )


def orders_priority_stats(sf_dir: str) -> rd.Dataset:
    """min/max/avg/count of order totals per priority (scalar aggregates)."""
    o = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return o.groupby("o_orderpriority", num_partitions=_np()).aggregate(
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"),
        Mean("o_totalprice", alias_name="avg_price"),
        Count(alias_name="n_orders"),
    )


def events_by_type(sf_dir: str) -> rd.Dataset:
    ev = _read(sf_dir, "events", ["event_type", "value"])
    return ev.groupby("event_type", num_partitions=_np()).aggregate(
        Count(alias_name="n_events"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"),
    )


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per event type (streaming-shaped workload,
    expressed as a batch groupby on the truncated timestamp)."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def trunc(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "event_type": t["event_type"],
                "value": t["value"],
            }
        )

    return (
        ev.map_batches(trunc, batch_format="pyarrow")
        .groupby(["hour", "event_type"], num_partitions=_np())
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )


# -- joins -------------------------------------------------------------------

def orders_per_segment(sf_dir: str) -> rd.Dataset:
    """orders ⋈ customer on custkey → per-market-segment order stats."""
    from linkgraph.partition import bucket_join

    o = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table({"custkey": t["o_custkey"], "o_totalprice": t["o_totalprice"]}),
        batch_format="pyarrow",
    )
    c = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"custkey": t["c_custkey"], "c_mktsegment": t["c_mktsegment"]}),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        o,
        c,
        ["custkey"],
        left_payload={"o_totalprice": pa.float64()},
        right_payload={"c_mktsegment": pa.string()},
    )
    return joined.groupby("c_mktsegment", num_partitions=_np()).aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_price")
    )


def customers_per_nation(sf_dir: str) -> rd.Dataset:
    """customer ⋈ nation (broadcast small side — nation has 25 rows)."""
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    ref = ray.put(dict(zip(nation["n_nationkey"].astype(np.int64), nation["n_name"])))

    class AttachNation:
        def __init__(self):
            import ray as _ray

            self.lookup = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["c_nationkey"].to_numpy(zero_copy_only=False)
            names = [self.lookup[int(k)] for k in keys]
            return pa.table(
                {"n_name": pa.array(names, pa.string()), "c_acctbal": t["c_acctbal"]}
            )

    c = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    from linkgraph.runtime import resolve_concurrency

    return (
        c.map_batches(
            AttachNation,
            batch_format="pyarrow",
            concurrency=resolve_concurrency(None),
        )
        .groupby("n_name", num_partitions=_np())
        .aggregate(
            Count(alias_name="n_customers"),
            Sum("c_acctbal", alias_name="sum_acctbal"),
        )
    )


# -- sorts / top-k / distinct ------------------------------------------------

def top_docs_by_chars(sf_dir: str) -> rd.Dataset:
    d = _read(sf_dir, "documents", ["doc_id", "n_chars", "lang"])
    return d.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)


def lang_distribution(sf_dir: str) -> rd.Dataset:
    d = _read(sf_dir, "documents", ["lang"])
    return d.groupby("lang", num_partitions=_np()).aggregate(Count(alias_name="n_docs"))


def distinct_users(sf_dir: str) -> rd.Dataset:
    """Distinct-count (the ``count_unique_labels`` analogue, ref
    ``src/cc_common.c:7-38``): block-level unique + groupby + count."""
    ev = _read(sf_dir, "events", ["user_id"])
    uniq = (
        ev.map_batches(
            lambda t: pa.table(
                {"user_id": np.unique(t["user_id"].to_numpy(zero_copy_only=False))}
            ),
            batch_format="pyarrow",
        )
        .groupby("user_id", num_partitions=_np())
        .aggregate(Count(alias_name="_n"))
    )
    n = uniq.count()
    return rd.from_arrow(pa.table({"n_users": pa.array([n], pa.int64())}))


# -- dedup with SQL oracle ---------------------------------------------------

def exact_dedup_docs(sf_dir: str) -> rd.Dataset:
    """Exact dedup by text content: keep min doc_id per text, report group
    size.  Hash-partition + per-group-first (SURVEY.md §2.7 mapping)."""
    import hashlib

    d = _read(sf_dir, "documents", ["doc_id", "text"])

    def hash_block(t: pa.Table) -> pa.Table:
        hashes = [
            int.from_bytes(
                hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
            )
            >> 1
            for s in t["text"].to_pylist()
        ]
        return pa.table({"h": pa.array(hashes, pa.int64()), "doc_id": t["doc_id"]})

    return (
        d.map_batches(hash_block, batch_format="pyarrow")
        .groupby("h", num_partitions=_np())
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups"))
        .select_columns(["keep_id", "n_dups"])
    )


# -- text analysis with SQL oracle ------------------------------------------

def token_counts(sf_dir: str) -> rd.Dataset:
    """Whitespace token count per document (vectorized pandas str split)."""
    d = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_block(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(t["text"], " "))
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n.cast(pa.int64())})

    return d.map_batches(count_block, batch_format="pyarrow")


def doc_word_stats(sf_dir: str) -> rd.Dataset:
    """Exact per-document character-class counts (chars, latin words, digits,
    punctuation) — the integer-valued core of the quality-scoring features
    (textstats.QualityScorer), expressed as pure Arrow regex-count kernels so
    it is value-checkable against a DuckDB oracle."""
    d = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats_block(t: pa.Table) -> pa.Table:
        txt = t["text"]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.utf8_length(txt).cast(pa.int64()),
                "n_words": pc.count_substring_regex(txt, "[A-Za-z]+").cast(pa.int64()),
                "n_digits": pc.count_substring_regex(txt, "[0-9]").cast(pa.int64()),
                "n_punct": pc.count_substring_regex(txt, "[.,;:!?'\"()-]").cast(
                    pa.int64()
                ),
            }
        )

    return d.map_batches(stats_block, batch_format="pyarrow")


# -- graph-derived tables with SQL oracle ------------------------------------

def graph_degree_top20(sf_dir: str) -> rd.Dataset:
    """Top-20 vertices by degree on the order↔part bipartite graph."""
    edges = edges_from_lineitem(sf_dir)
    canon = G.canonicalize(edges, global_dedup=True)
    deg = G.undirected_degrees(canon)
    return deg.sort(["degree", "vertex"], descending=[True, False]).limit(20)


def graph_degree_stats(sf_dir: str) -> rd.Dataset:
    """One-row graph summary: V, E, min/max/avg degree.

    Engine parity for the reference's ``graph_print_stats``
    (``src/graph.c:222-253``): vertex count, edge count and the degree
    distribution extrema over the simple undirected graph.
    """
    edges = edges_from_lineitem(sf_dir)
    canon = G.canonicalize(edges, global_dedup=True)
    deg = G.undirected_degrees(canon).materialize()

    def fold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "sum_deg": pa.array([], pa.int64()),
                    "min_deg": pa.array([], pa.int64()),
                    "max_deg": pa.array([], pa.int64()),
                }
            )
        d = t["degree"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(d)], pa.int64()),
                "sum_deg": pa.array([int(d.sum())], pa.int64()),
                "min_deg": pa.array([int(d.min())], pa.int64()),
                "max_deg": pa.array([int(d.max())], pa.int64()),
            }
        )

    parts = deg.map_batches(fold, batch_format="pyarrow", batch_size=None).take_all()
    n = sum(p["n"] for p in parts)
    sum_deg = sum(p["sum_deg"] for p in parts)
    return rd.from_arrow(
        pa.table(
            {
                "num_vertices": pa.array([n], pa.int64()),
                "num_edges": pa.array([sum_deg // 2], pa.int64()),
                "min_degree": pa.array([min(p["min_deg"] for p in parts)], pa.int64()),
                "max_degree": pa.array([max(p["max_deg"] for p in parts)], pa.int64()),
                "avg_degree": pa.array(
                    [round(sum_deg / n, 6) if n else 0.0], pa.float64()
                ),
            }
        )
    )


# -- similarity search with SQL oracle ---------------------------------------

def knn_vec0_top10(sf_dir: str) -> rd.Dataset:
    """Brute-force cosine top-10 against the vec_id=0 embedding.

    The query vector is broadcast (`ray.put`) once; each batch computes a
    vectorized dot-product against it (the baseline ANN path; see
    similarity.py for the LSH-bucketed scale variant).
    """
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q_row = [r for r in emb.filter(lambda r: r["vec_id"] == 0).take(1)][0]
    q = np.asarray(q_row["embedding"], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        import ray as _ray

        qv = _ray.get(ref)
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ qv) / norms
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cos_sim": pa.array(np.round(cos, 6)),
            }
        )

    scored = emb.map_batches(score, batch_format="pyarrow")
    scored = scored.map_batches(
        lambda t: t.filter(pc.not_equal(t["vec_id"], 0)), batch_format="pyarrow"
    )
    return scored.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(10)
