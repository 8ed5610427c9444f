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
from linkgraph.runtime import round_half_away
from linkgraph import graph as G
from linkgraph.pipelines import edges_from_lineitem


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# -- filters / projections / aggregations -----------------------------------

def lowcard_grouped_agg(
    ds: rd.Dataset,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
) -> pa.Table:
    """Shuffle-free grouped aggregate for LOW-cardinality keys.

    ``aggs`` is ``[(column, fn, alias)]`` with ``fn`` one of
    sum / min / max / count.  Per block, Arrow's C++ ``group_by`` computes
    the partial (≤ |groups-in-block| rows leave the worker); the driver
    folds the partials with one more Arrow ``group_by`` (sum of sums /
    min of mins / max of maxes / sum of counts).  Exactness contract
    unchanged from the shuffling groupby: int64 sums and min/max are
    order-free, so results are identical at any parallelism.

    Why: Ray's hash-shuffle aggregate spawns a fresh aggregator actor
    pool per execution — measured 3.4 s of a 3.5 s wall for a 6-group
    aggregate over 600 k rows (the data work was ~0.1 s).  For the
    TPC-H-shaped summaries (5-6 groups) the shuffle moves nothing the
    driver fold can't carry.  Scale bound: driver traffic is
    O(blocks × groups) tiny rows — at 10^6 blocks × 10 groups that is
    10^7 fold rows; beyond that regime (or for high-cardinality keys)
    use the shuffling ``groupby`` as before.
    """
    _FOLD = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, fn, _ in aggs:
        if fn not in _FOLD:
            raise ValueError(f"unsupported lowcard agg fn {fn!r}")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({})
        if any(fn == "count" for _, fn, _ in aggs):
            t = t.append_column(
                "_lc_one", pa.array(np.ones(len(t), dtype=np.int64))
            )
        spec = [
            ("_lc_one" if fn == "count" else col, "sum" if fn == "count" else fn)
            for col, fn, _ in aggs
        ]
        g = t.group_by(keys).aggregate(spec)
        cols = {k: g[k] for k in keys}
        for (col, fn, alias), (scol, sfn) in zip(aggs, spec):
            cols[alias] = g[f"{scol}_{sfn}"]
        return pa.table(cols)

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return pa.table({})
    folded = (
        pa.Table.from_pylist(rows)
        .group_by(keys)
        .aggregate([(alias, _FOLD[fn]) for _, fn, alias in aggs])
    )
    cols = {k: folded[k] for k in keys}
    for _, fn, alias in aggs:
        cols[alias] = folded[f"{alias}_{_FOLD[fn]}"]
    out = pa.table(cols)
    return out.take(pa.compute.sort_indices(out, sort_keys=[(k, "ascending") for k in keys]))


def lineitem_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped: filter on ship date, grouped pricing aggregates.

    Float ``Sum`` over distributed partials is order-dependent in the last
    bits (Ray combines blocks in nondeterministic order; DuckDB sums in scan
    order), which failed the driver's value hash in round 1.  The quantities
    here are fixed-point decimals (quantity integral, price/discount 2 dp) —
    TPC-H defines them as DECIMAL — so the deterministic fix is EXACT
    fixed-point aggregation: scale to int64 cents in the map, Sum integers
    (associative/commutative, order-free), divide once at finalize.  The
    oracle SQL applies the identical contract, so both sides produce
    bit-identical doubles at any parallelism.  Headroom: disc_price is
    scaled by 1e4 (≤1e9/row), so int64 partial sums hold to ~9e9 rows per
    group per block — combine via hugeint/float128 partials beyond that.
    """
    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us"))))
        qty_c = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        base_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        disc_pct = pc.cast(
            pc.round(pc.multiply(pc.subtract(1.0, t["l_discount"]), 100.0)), pa.int64()
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
                "base_c": base_c,
                "disc_c": pc.multiply(base_c, disc_pct),
            }
        )

    # 6 groups: the shuffle-free per-block partial + driver fold (see
    # lowcard_grouped_agg — the shuffling groupby spent 3.4 s of a 3.5 s
    # wall spawning its aggregator pool at this cardinality)
    agg = rd.from_arrow(
        lowcard_grouped_agg(
            li.map_batches(prep, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus"],
            [
                ("qty_c", "sum", "qty_sum"),
                ("base_c", "sum", "base_sum"),
                ("disc_c", "sum", "disc_sum"),
                ("qty_c", "count", "count_order"),
            ],
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        qty = t["qty_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = t["count_order"].to_numpy(zero_copy_only=False).astype(np.float64)
        base = t["base_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        disc = t["disc_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pa.array(qty),
                "sum_base_price": pa.array(base / 100.0),
                "sum_disc_price": pa.array(disc / 10000.0),
                "avg_qty": pa.array(qty / cnt),
                "count_order": t["count_order"],
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def orders_priority_stats(sf_dir: str) -> rd.Dataset:
    """min/max/avg/count of order totals per priority (scalar aggregates).

    Min/Max are order-free; the Mean goes through the exact fixed-point
    contract (cents int64 sum / count) so the value is deterministic at any
    block order — see ``lineitem_pricing_summary``.
    """
    o = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_totalprice": t["o_totalprice"],
                "price_c": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    agg = rd.from_arrow(
        lowcard_grouped_agg(
            o.map_batches(prep, batch_format="pyarrow"),
            ["o_orderpriority"],
            [
                ("o_totalprice", "min", "min_price"),
                ("o_totalprice", "max", "max_price"),
                ("price_c", "sum", "price_sum"),
                ("price_c", "count", "n_orders"),
            ],
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        s = t["price_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = t["n_orders"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "min_price": t["min_price"],
                "max_price": t["max_price"],
                "avg_price": pa.array(s / 100.0 / cnt),
                "n_orders": t["n_orders"],
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def events_by_type(sf_dir: str) -> rd.Dataset:
    """Per-type count/sum/mean; values are 6-dp decimals, aggregated exactly
    at scale 1e6 (deterministic — see ``lineitem_pricing_summary``)."""
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "value_u": pc.cast(
                    pc.round(pc.multiply(t["value"], 1000000.0)), pa.int64()
                ),
            }
        )

    agg = rd.from_arrow(
        lowcard_grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type"],
            [
                ("value_u", "count", "n_events"),
                ("value_u", "sum", "value_sum"),
            ],
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        s = t["value_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt = t["n_events"].to_numpy(zero_copy_only=False).astype(np.float64)
        sv = s / 1000000.0
        return pa.table(
            {
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pa.array(sv),
                "avg_value": pa.array(sv / cnt),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per event type (streaming-shaped workload,
    expressed as a batch groupby on the truncated timestamp)."""
    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def trunc(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "event_type": t["event_type"],
                "value_u": pc.cast(
                    pc.round(pc.multiply(t["value"], 1000000.0)), pa.int64()
                ),
            }
        )

    agg = (
        ev.map_batches(trunc, batch_format="pyarrow")
        .groupby(["hour", "event_type"], num_partitions=_np())
        .aggregate(Count(alias_name="n_events"), Sum("value_u", alias_name="value_sum"))
    )

    def fin(t: pa.Table) -> pa.Table:
        s = t["value_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                # floor_temporal on a second-truncated source can narrow to
                # timestamp[s]; pin [us] so the output schema is stable.
                "hour": pc.cast(t["hour"], pa.timestamp("us")),
                "event_type": t["event_type"],
                "n_events": t["n_events"],
                "sum_value": pa.array(s / 1000000.0),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


# -- joins -------------------------------------------------------------------

def orders_per_segment(sf_dir: str) -> rd.Dataset:
    """orders ⋈ customer on custkey → per-market-segment order stats.

    customer is the dimension side, so the join is a BROADCAST join (one
    ``ray.put`` of the custkey→segment lookup, vectorized searchsorted apply
    per batch) — the fact table streams through with no shuffle; at dimension
    sizes past ``broadcast_join``'s gate it degrades to the bucketed shuffle
    join automatically.  Prices are 2-dp decimals, so the Sum uses the same
    exact fixed-point contract as ``lineitem_pricing_summary``.
    """
    from linkgraph.partition import broadcast_join

    o = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"],
                "price_c": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    c = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = broadcast_join(o, c, left_on="o_custkey", right_on="c_custkey")
    agg = rd.from_arrow(
        lowcard_grouped_agg(
            joined,
            ["c_mktsegment"],
            [
                ("price_c", "count", "n_orders"),
                ("price_c", "sum", "price_sum"),
            ],
        )
    )

    def fin(t: pa.Table) -> pa.Table:
        s = t["price_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": t["n_orders"],
                "total_price": pa.array(s / 100.0),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def customers_per_nation(sf_dir: str) -> rd.Dataset:
    """customer ⋈ nation — broadcast join (25-row dimension), vectorized
    searchsorted+take apply (no per-row Python), exact 2-dp fixed-point Sum."""
    from linkgraph.partition import broadcast_join

    c = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "c_nationkey": t["c_nationkey"],
                "bal_c": pc.cast(
                    pc.round(pc.multiply(t["c_acctbal"], 100.0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    joined = broadcast_join(c, nation, left_on="c_nationkey", right_on="n_nationkey")
    agg = joined.groupby("n_name", num_partitions=_np()).aggregate(
        Count(alias_name="n_customers"), Sum("bal_c", alias_name="bal_sum")
    )

    def fin(t: pa.Table) -> pa.Table:
        s = t["bal_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "n_name": t["n_name"],
                "n_customers": t["n_customers"],
                "sum_acctbal": pa.array(s / 100.0),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


# -- sorts / top-k / distinct ------------------------------------------------

def top_docs_by_chars(sf_dir: str) -> rd.Dataset:
    d = _read(sf_dir, "documents", ["doc_id", "n_chars", "lang"])
    return d.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)


def lang_distribution(sf_dir: str) -> rd.Dataset:
    d = _read(sf_dir, "documents", ["lang"])
    return rd.from_arrow(
        lowcard_grouped_agg(d, ["lang"], [("lang", "count", "n_docs")])
    )


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


def colocate_by_key(
    ds: rd.Dataset, key: str, num_buckets: int | None = None
) -> rd.Dataset:
    """Hash-repartition ``ds`` so ALL rows of each ``key`` value land in one
    output block (the ``bucket_join`` exchange, single-sided).  The final
    blocks hold many whole groups each, so downstream per-block kernels stay
    vectorized ACROSS groups — no per-group Python dispatch, unlike
    ``groupby().map_groups``.  Works for string and integer keys.
    """
    from linkgraph.graph import default_partitions
    from linkgraph.partition import _BUCKET
    from linkgraph.sketch import _column_hashes

    nb = num_buckets or default_partitions()

    def add_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(_BUCKET, pa.array([], pa.int64()))
        b = (_column_hashes(t[key]) % np.uint64(nb)).astype(np.int64)
        return t.append_column(_BUCKET, pa.array(b))

    parted = ds.map_batches(add_bucket, batch_format="pyarrow").repartition(
        nb, keys=[_BUCKET]
    )
    return parted.map_batches(
        lambda t: t.drop_columns([_BUCKET]) if t.num_columns else t,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def _group_runs(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_id, starts) for a key array already sorted by key: ``run_id[i]``
    is the 0-based group index of row i, ``starts[g]`` its first row."""
    change = np.empty(len(keys), dtype=bool)
    change[0] = True
    np.not_equal(keys[1:], keys[:-1], out=change[1:])
    run_id = np.cumsum(change) - 1
    return run_id, np.flatnonzero(change)


def grouped_topk(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    descending: list[bool],
    k: int,
    *,
    rank_col: str = "rk",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Top-``k`` rows per ``key`` group under the (``order_cols``,
    ``descending``) total order — ``row_number() OVER (PARTITION BY key
    ORDER BY ...) <= k``.  The order must be total (include a unique
    tiebreaker) so the result is deterministic at any parallelism.

    Scale shape: a per-block combiner keeps ≤ k rows per (block, key)
    BEFORE the only exchange (a hash repartition on the key, the
    ``bucket_join`` pattern — a range sort would split one key's run
    across block boundaries and double-count its top-k), so the shuffle
    moves at most ``k·n_keys·n_blocks`` rows, not the input; the final
    pass ranks each co-located key vectorized across ALL groups in the
    bucket (no per-group Python).  No driver materialization; output
    streams.
    """
    sch = ds.schema()
    out_types = dict(zip(sch.names, sch.types))
    empty_out = pa.table(
        {
            **{c: pa.array([], out_types[c]) for c in sch.names},
            rank_col: pa.array([], pa.int64()),
        }
    )

    def sort_key(t: pa.Table):
        cols = [t[key].to_numpy(zero_copy_only=False)]
        for c, desc in zip(order_cols, descending):
            v = t[c].to_numpy(zero_copy_only=False)
            cols.append(-v if desc else v)
        # np.lexsort: last key is primary
        return np.lexsort(tuple(reversed(cols)))

    def topk_block(t: pa.Table, final: bool) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return empty_out.drop_columns([rank_col]) if not final else empty_out
        order = sort_key(t)
        kk = t[key].to_numpy(zero_copy_only=False)[order]
        run_id, starts = _group_runs(kk)
        rank = np.arange(len(kk), dtype=np.int64) - starts[run_id]
        keep = rank < k
        out = t.take(pa.array(order[keep]))
        if final:
            out = out.append_column(rank_col, pa.array(rank[keep] + 1))
        return out

    partial = ds.map_batches(
        lambda t: topk_block(t, False), batch_format="pyarrow"
    )
    return colocate_by_key(partial, key, num_buckets).map_batches(
        lambda t: topk_block(t, True), batch_format="pyarrow", batch_size=None
    )


def top_docs_per_lang(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Top-k docs per language by (n_chars desc, doc_id asc) with rank."""
    d = _read(sf_dir, "documents", ["doc_id", "n_chars", "lang"])
    return grouped_topk(d, "lang", ["n_chars", "doc_id"], [True, False], k)


def _cust_event_join(sf_dir: str, how: str) -> rd.Dataset:
    """customer ⋉/▷ events on c_custkey = user_id, counted per segment.

    The right side block-uniques its keys (cheap combiner); the join itself
    is the bucketed hash exchange with an existence mask, so no row from
    the many-side events table ever multiplies a customer row."""
    from linkgraph.partition import bucket_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ekeys = _read(sf_dir, "events", ["user_id"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": np.unique(t["user_id"].to_numpy(zero_copy_only=False))}
        ),
        batch_format="pyarrow",
    )
    joined = bucket_join(
        cust,
        ekeys,
        ["c_custkey"],
        left_payload={"c_mktsegment": pa.string()},
        right_payload={},
        how=how,
    )
    return (
        joined.groupby("c_mktsegment", num_partitions=_np())
        .aggregate(Count(alias_name="n_customers"))
    )


def customers_without_events(sf_dir: str) -> rd.Dataset:
    """Customers with NO event activity per market segment (anti join)."""
    return _cust_event_join(sf_dir, "anti")


def customers_with_events(sf_dir: str) -> rd.Dataset:
    """Customers WITH event activity per market segment (semi join)."""
    return _cust_event_join(sf_dir, "semi")


def exact_quantiles(ds: rd.Dataset, col: str, qs: list[float]) -> list[float]:
    """Exact order-statistics quantiles of ``col`` (``quantile_disc``
    semantics: the value at 0-based global index ``ceil(q·n) − 1``).

    One range exchange (sort by the value column) whose blocks stay in the
    object store; per-block lengths come back from tiny remote probes, and
    only the ≤ ``len(qs)`` selected scalars ever reach the driver — no
    block is pulled whole.
    """
    import math

    import ray

    @ray.remote(num_cpus=0)
    def _blk_len(t: pa.Table) -> int:
        return len(t)

    @ray.remote(num_cpus=0)
    def _pick(t: pa.Table, idxs: list[int]) -> list[float]:
        v = t[col].to_numpy(zero_copy_only=False)
        return [float(v[i]) for i in idxs]

    parted = ds.select_columns([col]).sort(col).materialize()
    refs = parted.to_arrow_refs()
    counts = np.asarray(ray.get([_blk_len.remote(r) for r in refs]), dtype=np.int64)
    n = int(counts.sum())
    if n == 0:
        return [float("nan")] * len(qs)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    gidx = [min(max(math.ceil(q * n) - 1, 0), n - 1) for q in qs]
    per_block: dict[int, list[tuple[int, int]]] = {}
    for qi, g in enumerate(gidx):
        b = int(np.searchsorted(offsets, g, side="right") - 1)
        per_block.setdefault(b, []).append((qi, g - int(offsets[b])))
    out: list[float] = [0.0] * len(qs)
    picked = ray.get(
        [_pick.remote(refs[b], [loc for _, loc in pairs]) for b, pairs in per_block.items()]
    )
    for (b, pairs), vals in zip(per_block.items(), picked):
        for (qi, _), v in zip(pairs, vals):
            out[qi] = v
    return out


def order_price_quantiles(sf_dir: str) -> rd.Dataset:
    """Exact 25/50/75/95th percentiles of o_totalprice (quantile_disc)."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])
    qs = [0.25, 0.5, 0.75, 0.95]
    vals = exact_quantiles(orders, "o_totalprice", qs)
    return rd.from_arrow(
        pa.table(
            {
                "q": pa.array(qs, pa.float64()),
                "o_totalprice": pa.array(vals, pa.float64()),
            }
        )
    )


def grouped_quantiles(
    ds: rd.Dataset,
    key: str,
    col: str,
    qs: list[float],
    q_names: list[str],
    *,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Exact per-group quantiles (``quantile_disc`` semantics: the value at
    0-based index ``ceil(q·n_g) − 1`` within each group's sorted run).

    One hash exchange co-locates each group, then ONE lexsort per block
    ranks every group at once; the per-quantile picks are pure vectorized
    indexing over the segment boundaries — no per-group Python, no driver
    materialization.  Groups must individually fit a block (same contract
    as any exact per-group order statistic; pre-aggregate or sketch when a
    single group outgrows a worker).
    """
    qarr = np.asarray(qs, dtype=np.float64)

    def quants_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    key: pa.array([], t[key].type if t.num_columns else pa.string()),
                    **{qn: pa.array([], pa.float64()) for qn in q_names},
                }
            )
        kk = t[key].to_numpy(zero_copy_only=False)
        vv = t[col].to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, kk))
        kk, vv = kk[order], vv[order]
        run_id, starts = _group_runs(kk)
        n_g = np.diff(np.append(starts, len(kk)))  # rows per group
        # idx[g, j] = start_g + clamp(ceil(q_j * n_g) - 1, 0, n_g - 1)
        off = np.ceil(n_g[:, None] * qarr[None, :]).astype(np.int64) - 1
        np.clip(off, 0, (n_g - 1)[:, None], out=off)
        picks = vv[starts[:, None] + off]
        cols = {key: pa.Array.from_pandas(kk[starts])}
        for j, qn in enumerate(q_names):
            cols[qn] = pa.array(picks[:, j].astype(np.float64))
        return pa.table(cols)

    co = colocate_by_key(ds.select_columns([key, col]), key, num_buckets)
    return co.map_batches(quants_block, batch_format="pyarrow", batch_size=None)


def order_price_quantiles_by_priority(sf_dir: str) -> rd.Dataset:
    """Exact median / p95 of o_totalprice per order priority."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return grouped_quantiles(
        orders, "o_orderpriority", "o_totalprice", [0.5, 0.95], ["p50", "p95"]
    )


def user_event_rolling(sf_dir: str, window: int = 3) -> rd.Dataset:
    """Per-user rolling aggregate over the event stream: for each event,
    the sum and mean of ``value`` over the last ``window`` rows of that
    user in ``(ts, event_id)`` order — ``SUM(value) OVER (PARTITION BY
    user_id ORDER BY ts, event_id ROWS BETWEEN w-1 PRECEDING AND CURRENT
    ROW)``.

    Scale shape: one hash exchange on user_id (sessionization's
    partitioning key — reusable across the whole per-user query family),
    then one lexsort per block and ``window − 1`` shifted adds, masked at
    segment starts.  The window sum follows the repo's exact fixed-point
    contract (6-dp int64 adds — association-order-free), and the mean is
    derived from it by the same two double divisions the oracle SQL
    spells out, so the floats match the oracle bit-for-bit.
    """
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def roll_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "roll_sum": pa.array([], pa.float64()),
                    "roll_mean": pa.array([], pa.float64()),
                }
            )
        uu = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uu))
        u = uu[order]
        v = (
            pc.cast(pc.round(pc.multiply(t["value"], 1000000.0)), pa.int64())
            .to_numpy(zero_copy_only=False)[order]
        )
        run_id, starts = _group_runs(u)
        pos = np.arange(len(u), dtype=np.int64) - starts[run_id]
        s = v.copy()
        cnt = np.ones(len(u), dtype=np.int64)
        for d in range(1, window):
            in_win = pos >= d
            idx = np.flatnonzero(in_win)
            s[idx] += v[idx - d]
            cnt[idx] += 1
        rsum = s.astype(np.float64) / 1000000.0
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": pa.array(u),
                "roll_sum": pa.array(rsum),
                "roll_mean": pa.array(rsum / cnt),
            }
        )

    co = colocate_by_key(ev, "user_id")
    return co.map_batches(roll_block, batch_format="pyarrow", batch_size=None)


def user_event_rolling_median(sf_dir: str, window: int = 4) -> rd.Dataset:
    """Per-user rolling MEDIAN of ``value`` over the trailing ``window``
    rows (3 preceding + current) in ``(ts, event_id)`` order — the exact
    order statistic, ``quantile_disc(value, 0.5) OVER (PARTITION BY
    user_id ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT
    ROW)``.

    Scale shape: the same single user-keyed co-location shuffle as
    ``user_event_rolling``, then a segment-masked ``(n × window)`` lag
    matrix and ONE row-wise sort — vectorized across every user in the
    block, no per-group Python.  The median is a picked input double (no
    arithmetic), so the driver hash matches the SQL oracle bit-for-bit;
    the pick index ``(cnt−1)//2`` equals ``quantile_disc``'s
    ``ceil(0.5·n)−1`` for every window fill level."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def roll_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "roll_median": pa.array([], pa.float64()),
                }
            )
        uu = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uu))
        u = uu[order]
        v = t["value"].to_numpy(zero_copy_only=False)[order]
        n = len(u)
        run_id, starts = _group_runs(u)
        pos = np.arange(n, dtype=np.int64) - starts[run_id]
        mat = np.full((n, window), np.inf)
        mat[:, 0] = v
        for d in range(1, window):
            idx = np.flatnonzero(pos >= d)
            mat[idx, d] = v[idx - d]
        mat.sort(axis=1)  # +inf pads rank past the window fill
        cnt = np.minimum(pos + 1, window)
        med = mat[np.arange(n), (cnt - 1) // 2]
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": pa.array(u),
                "roll_median": pa.array(med),
            }
        )

    co = colocate_by_key(ev, "user_id")
    return co.map_batches(roll_block, batch_format="pyarrow", batch_size=None)


def hll_distinct_users(sf_dir: str) -> rd.Dataset:
    """Self-gating HyperLogLog entry (the ``knn_ivf_recall`` convention —
    HLL has no exact regime, so the query computes the EXACT distinct
    count alongside and reports whether the estimate sits inside the 3σ
    bound 3·1.04/√m): one no-shuffle register-fold pass vs the exact
    groupby path, over the events user column."""
    from linkgraph.sketch import HLL_P, hll_distinct

    ev = _read(sf_dir, "events", ["user_id"])
    est = hll_distinct(ev, "user_id")
    exact = int(
        _read(sf_dir, "events", ["user_id"])
        .groupby("user_id", num_partitions=_np())
        .count()
        .count()
    )
    rel = abs(est - exact) / max(exact, 1)
    bound = 3.0 * 1.04 / float(np.sqrt(1 << HLL_P))
    return rd.from_arrow(
        pa.table(
            {
                "n_users_exact": pa.array([exact], pa.int64()),
                "n_users_hll": pa.array([int(round(est))], pa.int64()),
                "rel_err": pa.array([round_half_away(rel)], pa.float64()),
                "within_3sigma": pa.array([rel <= bound], pa.bool_()),
            }
        )
    )


def hll_users_per_event_type(sf_dir: str) -> rd.Dataset:
    """Per-key HLL twin of ``approx_users_per_event_type``: one register
    array per event_type, merged by elementwise max after a key-hash
    co-location of the tiny partial stream; self-gated per key against
    the exact distinct counts (p=12 → 3σ ≈ 4.9%)."""
    from linkgraph.sketch import hll_distinct_by_key

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    approx = hll_distinct_by_key(ev, "event_type", "user_id", p=12).to_pandas()
    exact = users_per_event_type(sf_dir).to_pandas()
    df = exact.merge(approx, on="event_type")  # bounded: one row per type
    bound = 3.0 * 1.04 / float(np.sqrt(1 << 12))
    rel = (df["n_approx"] - df["n_users"]).abs() / df["n_users"].clip(lower=1)
    out = pa.table(
        {
            "event_type": pa.array(df["event_type"].astype(str)),
            "n_users_exact": pa.array(df["n_users"].astype("int64")),
            "n_users_hll": pa.array(df["n_approx"].astype("int64")),
            "within_3sigma": pa.array((rel <= bound).to_numpy()),
        }
    )
    return rd.from_arrow(out)


def contaminated_docs(sf_dir: str) -> rd.Dataset:
    """Benchmark decontamination over the documents table: the eval set is
    the deterministic subset ``doc_id % 97 == 0`` (standing in for a held
    -out benchmark), and every doc sharing any word 8-gram with it is
    flagged with its distinct shared-gram count — ``dedup.decontaminate``,
    the GPT-3/PaLM-style n-gram overlap pass.  Value-checked against an
    exact string n-gram SQL oracle (the engine compares 64-bit gram
    hashes, the oracle the gram strings; identical modulo hash collisions,
    which the driver check would surface)."""
    from linkgraph.dedup import decontaminate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ev = docs.map_batches(
        lambda t: t.filter(
            pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0)
        ),
        batch_format="pyarrow",
    )
    return decontaminate(docs, ev, n=8)


def chunk_documents(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    stride: int = 48,
) -> rd.Dataset:
    """Split documents into fixed-size token windows with overlap — the
    context-window packing prep of a training pipeline (chunk ``c`` =
    tokens ``[c·stride, c·stride+size)``; the final window is allowed to
    be short so every token lands in at least one chunk).

    Tokenization is the single-space split (``string_split`` parity with
    the SQL oracle).  Fully vectorized and embarrassingly parallel — one
    ``map_batches``, NO shuffle: per block, polars splits and explodes
    the token stream once, window token indices come from a
    ``repeat``/``arange`` fan-out, and the chunk texts are re-joined with
    one vectorized group-join.  Output: ``(doc_id, chunk_id, chunk_text,
    n_tokens)``.
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "chunk_id": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        from linkgraph.runtime import import_polars

        if t.num_columns == 0 or len(t) == 0:
            return empty
        pl = import_polars()
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pl.from_arrow(col).str.split(" ")
        lens = toks.list.len().to_numpy().astype(np.int64)
        flat = toks.explode().rename("tok")
        # chunks per doc: one window if it fits, else enough strides to
        # cover the tail
        n_chunks = np.where(
            lens <= size, 1, (lens - size + stride - 1) // stride + 1
        ).astype(np.int64)
        doc_off = np.concatenate([[0], np.cumsum(lens)])[:-1]
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
        chunk_id = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        c_start = chunk_id * stride
        c_len = np.minimum(c_start + size, lens[doc_idx]) - c_start
        # token fan-out: global flat indices of every chunk's tokens
        total = int(c_len.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(c_len) - c_len, c_len
        )
        tok_idx = doc_off[doc_idx].repeat(c_len) + c_start.repeat(c_len) + within
        grp = np.repeat(np.arange(len(chunk_id), dtype=np.int64), c_len)
        joined = (
            pl.DataFrame({"g": grp, "tok": flat.gather(tok_idx)})
            .group_by("g", maintain_order=True)
            .agg(pl.col("tok").str.join(" "))["tok"]
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "chunk_id": pa.array(chunk_id),
                "chunk_text": joined.to_arrow().cast(pa.string()),
                "n_tokens": pa.array(c_len),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        block, batch_format="pyarrow"
    )


def doc_chunks(sf_dir: str) -> rd.Dataset:
    """Driver entry: chunk the documents table into 64-token windows with
    stride 48 (16-token overlap) — value-checked against a list-slicing
    SQL oracle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(docs, size=64, stride=48)


def user_cumulative_value(sf_dir: str) -> rd.Dataset:
    """Per-user running total of ``value`` in ``(ts, event_id)`` order —
    ``SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING)``.

    Same shape as ``user_event_rolling`` (one hash exchange on user_id,
    one lexsort per block); the running sum follows the repo's exact
    fixed-point contract (6-dp int64), so the whole-block cumsum +
    segment-base subtraction is EXACT integer math — order-free, and the
    oracle SQL recomputes the identical quantity."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def cum_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "cum_value": pa.array([], pa.float64()),
                }
            )
        uu = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uu))
        u = uu[order]
        vc = (
            pc.cast(
                pc.round(pc.multiply(t["value"], 1000000.0)), pa.int64()
            )
            .to_numpy(zero_copy_only=False)[order]
        )
        run_id, starts = _group_runs(u)
        cs = np.cumsum(vc)
        seg_base = np.zeros(len(starts), dtype=np.int64)
        seg_base[1:] = cs[starts[1:] - 1]
        seg = cs - seg_base[run_id]
        return pa.table(
            {
                "event_id": pa.array(eid[order]),
                "user_id": pa.array(u),
                "cum_value": pa.array(seg.astype(np.float64) / 1000000.0),
            }
        )

    co = colocate_by_key(ev, "user_id")
    return co.map_batches(cum_block, batch_format="pyarrow", batch_size=None)


def top_event_type_per_user(sf_dir: str) -> rd.Dataset:
    """Each user's most frequent event type (mode), ties broken by type
    name — count per (user, type) via the native hash-partial groupby,
    then top-1 per user through ``grouped_topk``."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    counts = ev.groupby(["user_id", "event_type"], num_partitions=_np()).aggregate(
        Count(alias_name="n")
    )
    top = grouped_topk(counts, "user_id", ["n", "event_type"], [True, False], 1)
    return top.map_batches(
        lambda t: t.select(["user_id", "event_type", "n"]),
        batch_format="pyarrow",
    )


def degree_histogram(sf_dir: str) -> rd.Dataset:
    """log2-bucketed degree distribution of the order↔part graph: one row
    per bucket ``b`` counting vertices with ``2^b <= degree < 2^(b+1)`` —
    the standard power-law summary, O(log V) output at any scale."""
    edges = edges_from_lineitem(sf_dir)
    canon = G.canonicalize(edges, global_dedup=True)
    deg = G.undirected_degrees(canon)

    def bucketize(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        # float exponent: frexp(d)[1] - 1 == floor(log2 d) for d >= 1
        b = np.frexp(d.astype(np.float64))[1].astype(np.int64) - 1
        return pa.table({"bucket": pa.array(b)})

    return (
        deg.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket", num_partitions=_np())
        .aggregate(Count(alias_name="n_vertices"))
    )


def funnel_click_purchase(sf_dir: str, window_us: int = 3_600_000_000) -> rd.Dataset:
    """Per-user funnel conversions: purchases that follow the SAME user's
    most recent click by less than one hour.

    The temporal-pattern primitive behind funnel analytics, expressed as a
    composition of existing operators: filter → AS-OF join (purchases
    aligned to the latest preceding click per user — one bounded hash
    exchange per side, C-speed merge_asof per block) → window filter →
    hash-partial count.  EXISTS(click within window) ⟺ latest preceding
    click is within the window, so the as-of join needs only ONE right row
    per left row — never a row-multiplying inequality join."""
    from linkgraph.partition import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def side(etype: str, ts_name: str):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.equal(t["event_type"], etype)
            kept = t.filter(m)
            return pa.table(
                {"user_id": kept["user_id"], ts_name: kept["ts"]}
            )

        return fn

    purchases = ev.map_batches(side("purchase", "p_ts"), batch_format="pyarrow")
    clicks = ev.map_batches(side("click", "c_ts"), batch_format="pyarrow")
    j = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
        left_payload={},
        right_payload={},
    )
    win = pa.scalar(window_us, pa.duration("us"))
    hits = j.map_batches(
        lambda t: t.filter(
            pc.less(pc.subtract(t["p_ts"], t["c_ts"]), win)
        ).select(["user_id"]),
        batch_format="pyarrow",
    )
    return hits.groupby("user_id", num_partitions=_np()).aggregate(
        Count(alias_name="n_conversions")
    )


def _pairs_within_groups(
    g: np.ndarray, vals: np.ndarray, cap: int
) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs (a < b) of ``vals`` sharing a ``g`` value, emitted
    by pure index arithmetic (one lexsort + repeat/cumsum — no per-group
    Python).  Groups larger than ``cap`` are dropped (the quadratic-hub
    cut).  ``vals`` may be ints or strings; the within-group sort makes
    ``a < b`` hold by construction."""
    order = np.lexsort((vals, g))
    g, vals = g[order], vals[order]
    run_id, starts = _group_runs(g)
    d = np.diff(np.append(starts, len(g)))
    ok = d <= cap
    if not ok.all():
        keep = ok[run_id]
        g, vals = g[keep], vals[keep]
        if len(g) == 0:
            return vals[:0], vals[:0]
        run_id, starts = _group_runs(g)
        d = d[ok]
    pos = np.arange(len(g), dtype=np.int64) - starts[run_id]
    cnt = d[run_id] - 1 - pos  # pairs led by this row
    total = int(cnt.sum())
    if total == 0:
        return vals[:0], vals[:0]
    a_row = np.repeat(np.arange(len(g), dtype=np.int64), cnt)
    row_start = np.cumsum(cnt) - cnt
    seq = np.arange(total, dtype=np.int64) - row_start[a_row]
    b_row = a_row + 1 + seq
    return vals[a_row], vals[b_row]


def common_neighbors_topk(
    sf_dir: str, k: int | None = 10, max_degree: int = 4096
) -> rd.Dataset:
    """Top-k vertex pairs by common-neighbor count on the order↔part graph
    (the link-prediction baseline score).

    Shape: symmetrized distinct edges co-locate by the MIDDLE vertex (one
    hash exchange), each block emits every within-neighborhood pair (a<b)
    via pure index arithmetic — one lexsort + repeat/cumsum per block, no
    per-group Python — then a native hash-partial count per pair and a
    top-k sort.  Wedge emission is quadratic in the middle vertex's
    degree, so middles above ``max_degree`` are excluded (the standard
    link-prediction hub cut: a million-degree hub certifies nothing about
    pair affinity while emitting d² rows; same spirit as the reference's
    giant-component skip, src/cc_openmp.c:596-613).  The driver-scale
    graphs stay far below the cap, so the DuckDB oracle is exact."""
    edges = edges_from_lineitem(sf_dir)
    sym = G.symmetrize(G.canonicalize(edges, global_dedup=True))

    def emit_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
        )
        if t.num_columns == 0 or len(t) == 0:
            return empty
        a, b = _pairs_within_groups(
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False),
            max_degree,
        )
        if len(a) == 0:
            return empty
        return pa.table({"u": pa.array(a), "v": pa.array(b)})

    pairs = colocate_by_key(sym, "src").map_batches(
        emit_pairs, batch_format="pyarrow", batch_size=None
    )
    counts = pairs.groupby(["u", "v"], num_partitions=_np()).aggregate(
        Count(alias_name="n_common")
    )
    if k is None:
        return counts
    return counts.sort(
        ["n_common", "u", "v"], descending=[True, False, False]
    ).limit(k)


def neighborhood_jaccard_topk(
    sf_dir: str, k: int = 10, max_degree: int = 4096
) -> rd.Dataset:
    """Top-k vertex pairs by neighborhood Jaccard similarity
    |N(u)∩N(v)| / |N(u)∪N(v)| on the order↔part graph — common-neighbor
    counts normalized by degree, the size-invariant link-prediction score.

    Shape: the shared wedge-count pipeline plus TWO dimension attaches
    (degree of u, degree of v) via ``broadcast_join`` — the degree table
    rides the object store once; past its row gate the join degrades to
    the bucketed shuffle automatically.  The union size is inclusion-
    exclusion (deg_u + deg_v − n_common), so no second wedge pass."""
    from linkgraph.partition import broadcast_join

    counts = common_neighbors_topk(sf_dir, k=None, max_degree=max_degree)
    edges = edges_from_lineitem(sf_dir)
    deg = G.undirected_degrees(G.canonicalize(edges, global_dedup=True))

    def rename(old: str, new: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [new if c == old else c for c in t.column_names]
            )

        return fn

    du = deg.map_batches(rename("degree", "deg_u"), batch_format="pyarrow")
    dv = deg.map_batches(rename("degree", "deg_v"), batch_format="pyarrow")
    j1 = broadcast_join(counts, du, left_on="u", right_on="vertex")
    j2 = broadcast_join(j1, dv, left_on="v", right_on="vertex")

    def score(t: pa.Table) -> pa.Table:
        n = t["n_common"].to_numpy(zero_copy_only=False).astype(np.float64)
        un = (
            t["deg_u"].to_numpy(zero_copy_only=False)
            + t["deg_v"].to_numpy(zero_copy_only=False)
            - t["n_common"].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        return pa.table(
            {
                "u": t["u"],
                "v": t["v"],
                "n_common": t["n_common"],
                "jaccard": pa.array(n / un),
            }
        )

    scored = j2.map_batches(score, batch_format="pyarrow")
    return scored.sort(
        ["jaccard", "u", "v"], descending=[True, False, False]
    ).limit(k)


def customer_order_stats(sf_dir: str) -> rd.Dataset:
    """Per-customer order count + exact 2-dp spend, INCLUDING customers
    with no orders (left outer join: 0 orders, NULL spend — the SQL
    convention).

    Scale shape: orders pre-aggregate to one row per customer (partial
    combiners inside Ray's groupby), then customer LEFT-bucket-joins that
    agg — both sides shuffle once on the same key; no side is assumed to
    fit in memory (contrast ``broadcast_join``, which this deliberately
    does not use: at web scale the per-customer agg is as big as the
    customer table)."""
    from linkgraph.partition import bucket_join

    o = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["o_custkey"],
                "price_c": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    agg = o.groupby("c_custkey", num_partitions=_np()).aggregate(
        Count(alias_name="n_orders"), Sum("price_c", alias_name="price_sum")
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = bucket_join(
        cust,
        agg,
        ["c_custkey"],
        left_payload={"c_mktsegment": pa.string()},
        right_payload={"n_orders": pa.int64(), "price_sum": pa.int64()},
        how="left",
    )

    def fin(t: pa.Table) -> pa.Table:
        n = pc.coalesce(t["n_orders"], pa.scalar(0, pa.int64()))
        s = pc.divide(pc.cast(t["price_sum"], pa.float64()), 100.0)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "n_orders": n,
                "total_spent": s,
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow")


def approx_distinct_users_kmv(sf_dir: str) -> rd.Dataset:
    """Distinct users via the KMV sketch (linkgraph/sketch.py) — no shuffle.

    With k = 2^16 ≥ the distinct-user count at every test scale the sketch
    is in its EXACT regime (the ``knn_ivf`` exhaustive-probe convention),
    so the driver value-checks it against ``count(DISTINCT user_id)``; the
    estimation regime is pytest-gated to the KMV error bound."""
    from linkgraph.sketch import approx_distinct

    ev = _read(sf_dir, "events", ["user_id"])
    est = approx_distinct(ev, "user_id", k=1 << 16)
    return rd.from_arrow(
        pa.table({"n_users": pa.array([int(round(est))], pa.int64())})
    )


def events_hopping_window(
    sf_dir: str,
    size_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
) -> rd.Dataset:
    """Hopping (sliding) window counts: events per OVERLAPPING 1-hour
    window advancing every 15 minutes, per event type — the window family
    member tumbling (``events_hourly``) and session (``user_sessions``)
    windows don't cover.

    Each event belongs to exactly ``size/hop`` windows, so the map stage
    replicates rows that many times with the window start computed by
    integer epoch arithmetic (exact), and ONE hash-partial groupby counts
    — streaming, no sort, replication factor is the constant window/hop
    ratio."""
    if size_us % hop_us:
        raise ValueError("events_hopping_window: size must be a hop multiple")
    n = size_us // hop_us
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def expand(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "window_start": pa.array([], pa.timestamp("us")),
                    "event_type": pa.array([], pa.string()),
                }
            )
        ts = t["ts"].to_numpy(zero_copy_only=False).view(np.int64)
        base = (ts // hop_us) * hop_us
        starts = (
            base[:, None] - np.arange(n, dtype=np.int64)[None, :] * hop_us
        ).reshape(-1)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "window_start": pa.array(starts.view("datetime64[us]")),
                "event_type": pa.array(np.repeat(et, n)),
            }
        )

    return (
        ev.map_batches(expand, batch_format="pyarrow")
        .groupby(["window_start", "event_type"], num_partitions=_np())
        .aggregate(Count(alias_name="n_events"))
    )


def event_type_cooccurrence(sf_dir: str) -> rd.Dataset:
    """For every pair of event types, how many distinct users produced
    BOTH — the co-occurrence / market-basket matrix, built on the shared
    within-group pair emitter: global-distinct (user, type) pairs via one
    pair-keyed groupby, co-locate by user, emit type pairs by index
    arithmetic, hash-partial count.  A power user costs at most
    |types|² pair rows — bounded by the type vocabulary, not their event
    count."""
    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    pairs = ev.groupby(["user_id", "event_type"], num_partitions=_np()).aggregate(
        Count(alias_name="_n")
    )

    def emit(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                }
            )
        a, b = _pairs_within_groups(
            t["user_id"].to_numpy(zero_copy_only=False),
            t["event_type"].to_numpy(zero_copy_only=False),
            1 << 20,
        )
        if len(a) == 0:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                }
            )
        return pa.table({"type_a": pa.array(a), "type_b": pa.array(b)})

    co = colocate_by_key(pairs, "user_id").map_batches(
        emit, batch_format="pyarrow", batch_size=None
    )
    return co.groupby(["type_a", "type_b"], num_partitions=_np()).aggregate(
        Count(alias_name="n_users")
    )


def approx_users_per_event_type(sf_dir: str) -> rd.Dataset:
    """Distinct users per event type via per-key KMV sketches — the
    no-raw-shuffle twin of ``users_per_event_type`` (value-checked in the
    exact regime, k ≫ distinct users at every test scale)."""
    from linkgraph.sketch import approx_distinct_by_key

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    out = approx_distinct_by_key(ev, "event_type", "user_id", k=1 << 16)
    return out.map_batches(
        lambda t: t.rename_columns(["event_type", "n_users"]),
        batch_format="pyarrow",
    )


def cross_source_novel_docs(sf_dir: str) -> rd.Dataset:
    """Per source, how many of its documents are NOVEL — their exact text
    appears in no other source.  The incremental-crawl question ("what did
    this snapshot add?") as one content-keyed exchange: texts co-locate by
    vectorized xxhash (collisions only co-locate MORE rows — the in-bucket
    comparison is on the actual text, so correctness never depends on the
    hash), each block counts distinct sources per text with one pandas
    C-speed groupby, and single-source texts roll up per source with a
    hash-partial Sum."""
    from linkgraph.runtime import content_hash64

    d = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def add_h(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                }
            )
        h = content_hash64(t["text"]).view(np.int64)
        return pa.table({"h": pa.array(h), "text": t["text"], "source": t["source"]})

    def novel_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_part": pa.array([], pa.int64()),
                }
            )
        df = t.select(["text", "source"]).to_pandas()
        nsrc = df.groupby("text")["source"].transform("nunique")
        novel = df[nsrc == 1]
        counts = novel.groupby("source").size()
        return pa.table(
            {
                "source": pa.array(counts.index.to_numpy()),
                "n_part": pa.array(counts.to_numpy().astype(np.int64)),
            }
        )

    co = colocate_by_key(
        d.map_batches(add_h, batch_format="pyarrow"), "h"
    )
    partials = co.map_batches(
        novel_partial, batch_format="pyarrow", batch_size=None
    )
    agg = partials.groupby("source", num_partitions=_np()).aggregate(
        Sum("n_part", alias_name="n_novel")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "n_novel": pc.cast(t["n_novel"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def events_pivot_by_segment(sf_dir: str) -> "object":
    """Crosstab: one row per market segment, one count column per event
    type — the reshape pattern: the heavy count is a distributed
    broadcast-join + hash-partial groupby over the long (segment, type)
    form; only the BOUNDED aggregate (n_segments × n_types rows) pivots
    wide, driver-side.  Column set is the fixed event-type vocabulary so
    the schema is stable."""
    from linkgraph.partition import broadcast_join

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = broadcast_join(ev, cust, left_on="user_id", right_on="c_custkey")
    agg = joined.groupby(
        ["c_mktsegment", "event_type"], num_partitions=_np()
    ).aggregate(Count(alias_name="n"))
    long = agg.to_pandas()  # bounded: segments × event types
    wide = (
        long.pivot(index="c_mktsegment", columns="event_type", values="n")
        .fillna(0)
        .astype("int64")
    )
    wide.columns = [f"n_{c}" for c in wide.columns]
    return wide.reset_index().sort_values("c_mktsegment").reset_index(drop=True)


def global_prefix_sum(
    ds: rd.Dataset, order_col: str, val_col: str
) -> rd.Dataset:
    """Distributed exclusive prefix sum (scan): for every row, the sum of
    ``val_col`` over all rows strictly BEFORE it in global ``order_col``
    order — ``sum(v) OVER (ORDER BY o ROWS UNBOUNDED PRECEDING) − v``.

    Classic two-phase scan: ONE range exchange (sort by the order column),
    a tiny per-block-total round (one int64 per block reaches the driver —
    O(num_blocks) state, independent of data size), then each block adds
    its exclusive block offset to a local integer cumsum.  Exact int64
    math throughout.  Output: input columns + ``prefix``.
    """
    import ray

    @ray.remote(num_cpus=0)
    def _blk_sum(t: pa.Table) -> int:
        return int(t[val_col].to_numpy(zero_copy_only=False).sum())

    @ray.remote(num_cpus=0)
    def _with_prefix(t: pa.Table, offset: int) -> pa.Table:
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) == 0:
            return t.append_column("prefix", pa.array([], pa.int64()))
        cs = np.cumsum(v)
        pre = np.empty_like(cs)
        pre[0] = offset
        pre[1:] = offset + cs[:-1]
        return t.append_column("prefix", pa.array(pre))

    parted = ds.sort(order_col).materialize()
    refs = parted.to_arrow_refs()
    sums = np.asarray(ray.get([_blk_sum.remote(r) for r in refs]), dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]) if len(sums) else sums
    out_refs = [
        _with_prefix.remote(r, int(off)) for r, off in zip(refs, offsets)
    ]
    return rd.from_arrow_refs(out_refs)


def doc_packing_bins(sf_dir: str, budget: int = 100_000) -> rd.Dataset:
    """Pack documents (in doc_id order) into contiguous bins of ≤ ``budget``
    total chars-as-token-proxy — the sequence-packing step of a training
    data pipeline, as a distributed prefix scan: ``bin_id =
    prefix_chars // budget``.  Deterministic at any parallelism; the
    per-bin totals roll up with one hash-partial groupby."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    scanned = global_prefix_sum(docs, "doc_id", "n_chars")

    def binize(t: pa.Table) -> pa.Table:
        p = t["prefix"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "bin_id": pa.array(p // budget),
            }
        )

    return scanned.map_batches(binize, batch_format="pyarrow")


# -- dedup with SQL oracle ---------------------------------------------------

def exact_dedup_docs(sf_dir: str) -> rd.Dataset:
    """Exact dedup by text content: keep min doc_id per text, report group
    size (SURVEY.md §2.7 mapping) — delegates to ``dedup.exact_dedup``
    (range-sort segment aggregate, ~2× the hash groupby; rationale
    there)."""
    from linkgraph.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


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
                    [round_half_away(sum_deg / n) if n else 0.0], pa.float64()
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
    q_row = emb.map_batches(
        lambda t: t.filter(pc.equal(t["vec_id"], 0)), batch_format="pyarrow"
    ).take(1)[0]
    q = np.asarray(q_row["embedding"], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    ref = ray.put(qn)

    def score(t: pa.Table) -> pa.Table:
        import ray as _ray

        from linkgraph.runtime import list_column_to_matrix

        qv = _ray.get(ref)
        mat = list_column_to_matrix(t["embedding"], np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ qv) / norms
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cos_sim": pa.array(round_half_away(cos)),
            }
        )

    scored = emb.map_batches(score, batch_format="pyarrow")
    scored = scored.map_batches(
        lambda t: t.filter(pc.not_equal(t["vec_id"], 0)), batch_format="pyarrow"
    )
    return scored.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(10)


# -- as-of join (event ↔ dimension-history alignment) -------------------------

def events_last_order_asof(sf_dir: str) -> rd.Dataset:
    """Each event AS-OF-joined to the latest order DATE of the same user at
    or before the event time (DuckDB ``ASOF JOIN`` semantics; engine path:
    ``partition.asof_join`` — one key co-partition per side, C-speed
    ``merge_asof`` per block).  Only the matched date is emitted, so
    several orders on the same (user, date) collapse to one deterministic
    answer with no dedup pass."""
    from linkgraph.partition import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t["o_custkey"],
                "last_order_ts": pc.cast(t["o_orderdate"], pa.timestamp("us")),
            }
        ),
        batch_format="pyarrow",
    )
    out = asof_join(
        ev,
        od,
        key="user_id",
        left_ts="ts",
        right_ts="last_order_ts",
        left_payload={"event_id": pa.int64()},
        right_payload={},
    )
    return out.select_columns(["event_id", "user_id", "ts", "last_order_ts"])


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Sessionization (streaming-window family): events split into
    per-user sessions at >``gap_minutes`` inactivity gaps, with per-session
    start/end/count and an exact fixed-point value sum.

    ONE user-keyed shuffle co-locates each user's events; everything after
    is a vectorized whole-block pass (lexsort → gap diff → cumsum session
    ids → ``reduceat`` aggregates) — block-local sessionization IS global
    because a user's rows never split across blocks.  Ties on ``ts`` break
    on ``event_id`` in both the engine and the oracle SQL; equal-ts rows
    always share a session (gap 0), so the tie-break never changes the
    result, only the proof of determinism."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": pc.cast(t["ts"], pa.timestamp("us")),
                "event_id": t["event_id"],
                "value_u": pc.cast(
                    pc.round(pc.multiply(t["value"], 1000000.0)), pa.int64()
                ),
            }
        )

    gap_us = np.int64(gap_minutes) * 60_000_000
    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "session_id": pa.array([], pa.int64()),
            "session_start": pa.array([], pa.timestamp("us")),
            "session_end": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.float64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False)
        tsi = ts.view(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val = t["value_u"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tsi, u))
        u, ts, tsi, val = u[order], ts[order], tsi[order], val[order]
        n = len(u)
        new_s = np.empty(n, dtype=bool)
        new_s[0] = True
        new_s[1:] = (u[1:] != u[:-1]) | ((tsi[1:] - tsi[:-1]) > gap_us)
        snum = np.cumsum(new_s)  # 1-based global session counter
        # per-user 1-based session ids: subtract the counter at user start
        new_u = np.empty(n, dtype=bool)
        new_u[0] = True
        new_u[1:] = u[1:] != u[:-1]
        useg = np.cumsum(new_u) - 1
        base = snum[np.flatnonzero(new_u)]
        sid = snum - base[useg] + 1
        starts = np.flatnonzero(new_s)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                "user_id": u[starts],
                "session_id": sid[starts],
                "session_start": ts[starts],
                "session_end": ts[ends],
                "n_events": np.diff(np.append(starts, n)),
                "sum_value": np.add.reduceat(val, starts) / 1000000.0,
            }
        )

    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .repartition(_np(), keys=["user_id"])
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def lineitems_shipped_30d_range(sf_dir: str) -> rd.Dataset:
    """RANGE (interval) join: line items whose ship date falls within 30
    days of their order's date — one row per (lineitem, order-window) pair
    (plain inequality-join semantics).  Engine path:
    ``partition.range_join`` (key co-partition + per-block double
    ``merge_asof`` rank lookup + vectorized pair emission)."""
    from linkgraph.partition import range_join

    month = pa.scalar(30 * 24 * 3600 * 1_000_000, pa.duration("us"))
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_shipdate"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_shipdate": pc.cast(t["l_shipdate"], pa.timestamp("us")),
                "l_partkey": t["l_partkey"],
            }
        ),
        batch_format="pyarrow",
    )
    od = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["o_orderkey"],
                "win_lo": pc.cast(t["o_orderdate"], pa.timestamp("us")),
                "win_hi": pc.add(
                    pc.cast(t["o_orderdate"], pa.timestamp("us")), month
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return range_join(
        li,
        od,
        key="l_orderkey",
        left_ts="l_shipdate",
        right_lo="win_lo",
        right_hi="win_hi",
        left_payload={"l_partkey": pa.int64()},
        right_payload={},
    )


def corpus_curation(sf_dir: str) -> rd.Dataset:
    """Composite training-data curation pipeline: documents → quality
    scoring → exact dedup (keep min doc_id per content) → quality ≥ 0.5
    filter → one-row corpus budget (surviving docs + their whitespace-token
    total).  Composes the engine's own operators — QualityScorer batch
    kernels, the content-hash dedup groupby, and a key-bucketed join —
    end-to-end, value-checked against a single SQL twin."""
    from linkgraph.partition import bucket_join
    from linkgraph.textstats import QualityScorer

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    scorer = QualityScorer()

    def score_block(t: pa.Table) -> pa.Table:
        q = scorer(t)
        ntok = pc.list_value_length(pc.split_pattern(t["text"], " ")).cast(
            pa.int64()
        )
        return pa.table(
            {"doc_id": q["doc_id"], "quality": q["quality"], "ntok": ntok}
        )

    # The quality filter commutes with the inner join, so apply it to the
    # scored side BEFORE the bucketed shuffle — only surviving rows pay the
    # exchange (at corpus scale most of the table is filtered here).
    scored = docs.map_batches(score_block, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality"], 0.5)),
        batch_format="pyarrow",
    )
    keep = exact_dedup_docs(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["keep_id"]}), batch_format="pyarrow"
    )
    joined = bucket_join(
        scored,
        keep,
        ["doc_id"],
        num_buckets=_np(),
        left_payload={"quality": pa.float64(), "ntok": pa.int64()},
        right_payload={},
    )
    agg = joined.aggregate(
        Count(alias_name="n_docs"), Sum("ntok", alias_name="total_tokens")
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_docs": pa.array([int(agg["n_docs"] or 0)], pa.int64()),
                "total_tokens": pa.array(
                    [int(agg["total_tokens"] or 0)], pa.int64()
                ),
            }
        )
    )


def top_tokens(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Corpus-level heavy hitters: the ``k`` most frequent lowercase
    latin/digit tokens across the documents table.

    The block-local ``value_counts`` COMBINER runs before the groupby
    shuffle, so only (token, partial_count) rows ever move — the flat
    token stream (10-100× the document bytes at corpus scale) never
    leaves its block.  Ties at the cut break on token asc, both sides.
    Tokenizer = the RE2 class ``[^a-z0-9]+`` over the lowered text,
    shared verbatim with the DuckDB oracle (the quality-scores
    convention)."""
    d = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        parts = pc.split_pattern_regex(pc.utf8_lower(t["text"]), "[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n": vc.field("counts").cast(pa.int64())}
        )

    return (
        d.map_batches(partial, batch_format="pyarrow")
        .groupby("token", num_partitions=_np())
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def _split_hash(ids: "np.ndarray", mode: str) -> "np.ndarray":
    """Per-id split/sample hash → nonnegative int64 in [0, 2^60).

    ``md5`` (default): first 60 bits of ``md5(str(id))`` — ~1 M ids/s/core,
    exactly recomputable in DuckDB, so the oracle twin can replay the
    assignment bit-for-bit.  ``engine``: the vectorized splitmix64 path
    (same family as the sketch/dedup hashes, ~100× — measured on the
    exact-dedup hash stage) for corpus-scale runs where SQL replay isn't
    needed (VERDICT r4 stretch #8).  Resolved at pipeline-construction
    time on the DRIVER (env vars set after ``ray.init`` don't reach
    workers) and closed over; the oracle gate always runs the default."""
    if mode == "engine":
        from linkgraph.sketch import _mix64

        return (
            _mix64(ids.astype(np.int64, copy=False).view(np.uint64))
            >> np.uint64(4)
        ).view(np.int64)
    import hashlib

    return np.fromiter(
        (
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16)
            for i in ids
        ),
        dtype=np.int64,
        count=len(ids),
    )


def _split_hash_mode(hash_mode: str | None) -> str:
    mode = hash_mode or os.environ.get("LINKGRAPH_SPLIT_HASH", "md5")
    if mode not in ("md5", "engine"):
        raise ValueError(f"unknown split hash mode {mode!r}")
    return mode


def stratified_sample_docs(
    sf_dir: str, per_lang: int = 5, hash_mode: str | None = None
) -> rd.Dataset:
    """Deterministic stratified sample: the ``per_lang`` docs per language
    with the smallest ``(md5(doc_id), doc_id)`` sort key — a reproducible
    uniform-without-replacement sample per stratum (the
    ``doc_split_assignment`` hash-based recipe applied to group-local
    rank), identical at any parallelism and recomputable in SQL.

    Scale shape: block-local top-``per_lang`` per language first (the
    grouped-top-k combiner — at most ``per_lang`` rows per lang per block
    survive), then one key co-location finishes the rank.  Output:
    ``(lang, doc_id, rk)``.  ``hash_mode="engine"`` (or env
    ``LINKGRAPH_SPLIT_HASH=engine``) swaps the SQL-recomputable md5 rank
    key for the vectorized splitmix64 path — see ``_split_hash``."""
    mode = _split_hash_mode(hash_mode)

    d = _read(sf_dir, "documents", ["doc_id", "lang"])

    empty = pa.table(
        {
            "lang": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "rk": pa.array([], pa.int64()),
        }
    )

    def topk_block(t: pa.Table, final: bool) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return empty if final else pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        langs_np = np.asarray(t["lang"].to_pylist(), dtype=object)
        h = _split_hash(ids, mode)
        order = np.lexsort((ids, h, langs_np))
        langs_np, ids = langs_np[order], ids[order]
        run_id, starts = _group_runs(langs_np)
        pos = np.arange(len(ids), dtype=np.int64) - starts[run_id]
        keep = pos < per_lang
        if final:
            return pa.table(
                {
                    "lang": pa.array(langs_np[keep].astype(str)),
                    "doc_id": pa.array(ids[keep]),
                    "rk": pa.array(pos[keep] + 1),
                }
            )
        return pa.table(
            {
                "lang": pa.array(langs_np[keep].astype(str)),
                "doc_id": pa.array(ids[keep]),
            }
        )

    pruned = d.map_batches(
        lambda t: topk_block(t, final=False), batch_format="pyarrow"
    )
    co = colocate_by_key(pruned, "lang")
    return co.map_batches(
        lambda t: topk_block(t, final=True),
        batch_format="pyarrow",
        batch_size=None,
    )


def doc_split_assignment(
    sf_dir: str, val_pct: int = 10, hash_mode: str | None = None
) -> rd.Dataset:
    """Deterministic train/val split: ``split = 'val'`` iff the first 60
    bits of ``md5(str(doc_id))`` mod 100 < ``val_pct``.

    Hash-based, not random — the assignment is identical at any
    parallelism, any block structure, across reruns, AND in the SQL twin
    (the standard reproducible corpus-split recipe; a seeded RNG gives
    none of those).  md5-per-id is a deliberate trade: ~1 M ids/s/core in
    a single streaming pass buys exact DuckDB recomputability.  For
    corpus-scale runs where SQL replay isn't needed, ``hash_mode="engine"``
    (or env ``LINKGRAPH_SPLIT_HASH=engine``) swaps in the vectorized
    splitmix64 path — same determinism properties, ~100× the hash
    throughput, no SQL twin (``_split_hash``)."""
    mode = _split_hash_mode(hash_mode)

    d = _read(sf_dir, "documents", ["doc_id"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = _split_hash(ids, mode)
        val = (h % 100) < val_pct
        return pa.table(
            {
                "doc_id": ids,
                "split": pa.array(np.where(val, "val", "train")),
            }
        )

    return d.map_batches(assign, batch_format="pyarrow")


def window_distinct_users(sf_dir: str, window_min: int = 15) -> rd.Dataset:
    """Distinct users per TUMBLING window: exact COUNT(DISTINCT user_id)
    for every ``window_min``-minute epoch bucket — the streaming-analytics
    staple combining the window family with the scalable distinct plan.

    Scale shape: the window id is integer epoch arithmetic inside the
    first map (no shuffle), then the two-level distinct combine of
    ``users_per_event_type``: block-local unique (window, user) pairs
    shrink the stream before ONE pair-keyed groupby, then a small
    per-window count — a viral window never collects its user set in one
    task."""
    ev = _read(sf_dir, "events", ["ts", "user_id"])
    span_us = window_min * 60 * 1_000_000

    def to_pairs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "window_start": pa.array([], pa.timestamp("us")),
                    "user_id": pa.array([], pa.int64()),
                }
            )
        us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        w = (us.view(np.int64) // span_us) * span_us
        out = pa.table(
            {
                "window_start": pa.array(w.view("datetime64[us]")),
                "user_id": t["user_id"],
            }
        )
        return out.group_by(["window_start", "user_id"]).aggregate([])

    pairs = (
        ev.map_batches(to_pairs, batch_format="pyarrow")
        .groupby(["window_start", "user_id"], num_partitions=_np())
        .aggregate(Count(alias_name="_n"))
    )
    return (
        pairs.groupby("window_start", num_partitions=_np())
        .aggregate(Count(alias_name="n_users"))
        .select_columns(["window_start", "n_users"])
    )


def quality_filter_by_lang(sf_dir: str) -> rd.Dataset:
    """Per-language quality gate: keep documents whose quality score is at
    or above their OWN language's median — the percentile-threshold
    curation pass, composed from the existing quality scorer, the grouped
    exact quantiles and a broadcast threshold lookup.

    Scale shape: the scorer is one actor-pool pass; the per-lang medians
    are a bounded aggregate (one row per language) computed by
    ``grouped_quantiles``; the filter is a broadcast join (thresholds ride
    the object store, the doc stream never shuffles).  Output: (lang,
    n_docs_kept, min_quality_kept) per language — bounded, so the driver
    hash check stays cheap while still pinning the per-doc filter."""
    import ray.data as rd_

    from linkgraph import textstats
    from linkgraph.partition import broadcast_join

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    # threshold on 6-dp-rounded quality so the engine/SQL comparison is
    # deterministic at the cut (raw float64 paths may differ in the last
    # ulp; the 6-dp grid is the proven-identical representation — the
    # quality_scores driver row hash-matches at 6 dp)
    scored = (
        textstats.quality_scores(docs)
        .select_columns(["doc_id", "quality"])
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "quality": pc.round(
                        t["quality"], ndigits=6,
                        round_mode="half_towards_infinity",
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    langs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def key_lang(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "lang": t["lang"]})

    with_lang = broadcast_join(
        scored,
        langs.map_batches(key_lang, batch_format="pyarrow"),
        left_on="doc_id",
        right_on="doc_id",
    )
    med = grouped_quantiles(
        with_lang, "lang", "quality", [0.5], ["q50"]
    ).to_pandas()  # bounded: one row per language
    thresholds = dict(zip(med["lang"], med["q50"]))

    def keep(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {"lang": pa.array([], pa.string()),
                 "quality": pa.array([], pa.float64())}
            )
        q = t["quality"].to_numpy(zero_copy_only=False)
        langs_np = np.asarray(t["lang"].to_pylist(), dtype=object)
        thr = np.fromiter(
            (thresholds.get(l, np.inf) for l in langs_np),
            dtype=np.float64,
            count=len(langs_np),
        )
        m = q >= thr
        return pa.table(
            {"lang": pa.array(langs_np[m]), "quality": pa.array(q[m])}
        )

    kept = with_lang.map_batches(keep, batch_format="pyarrow")
    return (
        kept.groupby("lang", num_partitions=_np())
        .aggregate(
            Count(alias_name="n_docs_kept"),
            Min("quality", alias_name="min_quality_kept"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "lang": t["lang"],
                    "n_docs_kept": t["n_docs_kept"],
                    "min_quality_kept": pc.round(
                        t["min_quality_kept"], ndigits=6,
                        round_mode="half_towards_infinity",
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )


def order_price_ntile(sf_dir: str, k: int = 4) -> rd.Dataset:
    """NTILE(k) price quartiles within each order priority — SQL window
    semantics exactly: rows ordered by (o_totalprice, o_orderkey) within
    the priority, the first ``n mod k`` buckets one row larger.

    Scale shape: one priority-keyed co-location, then a single lexsort
    per block and pure index arithmetic for the bucket assignment —
    vectorized across all groups, no per-group Python."""
    o = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderpriority": pa.array([], pa.string()),
                    "quartile": pa.array([], pa.int64()),
                }
            )
        pr = np.asarray(t["o_orderpriority"].to_pylist(), dtype=object)
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, price, pr))
        pr, key = pr[order], key[order]
        run_id, starts = _group_runs(pr)
        n_g = np.diff(np.append(starts, len(pr)))  # group sizes
        pos = np.arange(len(pr), dtype=np.int64) - starts[run_id]
        n = n_g[run_id]
        rem = n % k
        big = n // k + 1
        small = np.maximum(n // k, 1)
        in_big = pos < rem * big
        bucket = np.where(
            in_big, pos // big, rem + (pos - rem * big) // small
        )
        return pa.table(
            {
                "o_orderkey": pa.array(key),
                "o_orderpriority": pa.array(pr.astype(str)),
                "quartile": pa.array(bucket.astype(np.int64) + 1),
            }
        )

    co = colocate_by_key(o, "o_orderpriority")
    return co.map_batches(block, batch_format="pyarrow", batch_size=None)


def users_per_event_type(sf_dir: str) -> rd.Dataset:
    """Per-key distinct count: distinct users per event type.

    Two-level combine: block-local unique (event_type, user_id) pairs
    shrink the stream before ONE pair-keyed groupby makes them globally
    unique, then a small per-type count — the scalable COUNT(DISTINCT)
    plan (never collects a per-type user set in one task, so a hot event
    type cannot blow a worker)."""
    ev = _read(sf_dir, "events", ["event_type", "user_id"])

    def uniq_pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "user_id": pa.array([], pa.int64()),
                }
            )
        import pyarrow.compute as _pc

        return t.group_by(["event_type", "user_id"]).aggregate([])

    pairs = (
        ev.map_batches(uniq_pairs, batch_format="pyarrow")
        .groupby(["event_type", "user_id"], num_partitions=_np())
        .aggregate(Count(alias_name="_n"))
    )
    return (
        pairs.groupby("event_type", num_partitions=_np())
        .aggregate(Count(alias_name="n_users"))
        .select_columns(["event_type", "n_users"])
    )


def user_event_gaps(sf_dir: str) -> rd.Dataset:
    """Per-user inter-event gap statistics (the LEAD/LAG window family):
    number of gaps, max gap and mean gap in seconds between consecutive
    events ordered by (ts, event_id).

    Same shape as sessionization: ONE user-keyed shuffle co-locates each
    user's events, then a whole-block lexsort + diff + ``reduceat`` pass
    aggregates every user in the block at once.  Gap sums stay exact
    int64 microseconds until the final division, so the engine and the
    SQL twin (``sum(gap_us)::DOUBLE / n / 1e6``) agree bit-for-bit.
    Users with a single event are kept with zero gaps and null gap stats
    (LAG semantics: no predecessor, no gap row)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "max_gap_s": pa.array([], pa.float64()),
            "avg_gap_s": pa.array([], pa.float64()),
        }
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        tsi = (
            t["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tsi, u))
        u, tsi = u[order], tsi[order]
        n = len(u)
        new_u = np.empty(n, dtype=bool)
        new_u[0] = True
        new_u[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_u)
        counts = np.diff(np.append(starts, n))
        # gap at row i (i not a user start) = tsi[i] - tsi[i-1]
        gaps = np.empty(n, dtype=np.int64)
        gaps[1:] = tsi[1:] - tsi[:-1]
        # starts always contains row 0, so this also initializes gaps[0].
        # The forced 0 at each segment start cannot perturb the reduceat
        # max/sum: timestamps are sorted within a user, so every real gap
        # is >= 0.
        gaps[starts] = 0
        sum_us = np.add.reduceat(gaps, starts)
        max_us = np.maximum.reduceat(gaps, starts)
        n_gaps = counts - 1
        has = n_gaps > 0
        max_s = np.where(has, max_us / 1_000_000.0, np.nan)
        avg_s = np.where(has, sum_us / np.maximum(n_gaps, 1) / 1_000_000.0, np.nan)
        return pa.table(
            {
                "user_id": u[starts],
                "n_gaps": n_gaps,
                "max_gap_s": pa.array(max_s, pa.float64(), mask=~has),
                "avg_gap_s": pa.array(avg_s, pa.float64(), mask=~has),
            }
        )

    return (
        ev.repartition(_np(), keys=["user_id"])
        .map_batches(block, batch_format="pyarrow", batch_size=None)
    )


def orders_rollup(sf_dir: str) -> rd.Dataset:
    """Multi-level aggregate (GROUP BY ROLLUP(year, priority)): order count
    and exact revenue at (year, priority), (year) and grand-total levels,
    with sentinel labels (``priority='ALL'``, ``o_year=-1``) instead of SQL
    NULL grouping markers.

    Scale shape: the ONLY distributed work is the finest-level groupby
    (with cent-exact int64 partial sums combined inside the hash
    aggregate); the coarser rollup levels are derived from that
    already-tiny aggregate (years x priorities rows) in a single bounded
    pass — never a second scan of the fact table per level."""
    o = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_year": pc.year(t["o_orderdate"]).cast(pa.int64()),
                "priority": t["o_orderpriority"],
                "cents": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
                ),
            }
        )

    fine = (
        o.map_batches(prep, batch_format="pyarrow")
        .groupby(["o_year", "priority"], num_partitions=_np())
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="cents"))
    )

    empty_rollup = pa.table(
        {
            "o_year": pa.array([], pa.int64()),
            "priority": pa.array([], pa.string()),
            "n_orders": pa.array([], pa.int64()),
            "revenue": pa.array([], pa.float64()),
        }
    )

    def rollup(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return empty_rollup
        # t is the complete fine aggregate (bounded: years x priorities)
        df = t.select(["o_year", "priority", "n_orders", "cents"]).to_pandas()
        by_year = (
            df.groupby("o_year", as_index=False)[["n_orders", "cents"]]
            .sum()
            .assign(priority="ALL")
        )
        total = pa.table(
            {
                "o_year": pa.array([-1], pa.int64()),
                "priority": pa.array(["ALL"]),
                "n_orders": pa.array([int(df["n_orders"].sum())], pa.int64()),
                "cents": pa.array([int(df["cents"].sum())], pa.int64()),
            }
        ).to_pandas()
        import pandas as _pd

        out = _pd.concat([df, by_year, total], ignore_index=True)
        res = pa.table(
            {
                "o_year": pa.array(out["o_year"].astype("int64")),
                "priority": pa.array(out["priority"].astype(str)),
                "n_orders": pa.array(out["n_orders"].astype("int64")),
                "revenue": pa.array(out["cents"].astype("int64") / 100.0),
            }
        )
        return res

    # the fine aggregate is tiny; repartition(1) makes one block hold it all
    return fine.repartition(1).map_batches(
        rollup, batch_format="pyarrow", batch_size=None
    )


def user_click_purchase_outer(sf_dir: str) -> rd.Dataset:
    """FULL OUTER join of two per-user aggregates: click counts vs purchase
    counts — users appearing on either side are kept, the missing side
    null-padded (conversion-analysis staple; completes the join family
    next to inner/left/semi/anti).

    Both inputs are already user-level aggregates (small), so the outer
    ``bucket_join`` moves one row per user per side."""
    from linkgraph.partition import bucket_join

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def side(event_type: str, out: str):
        def fn(t: pa.Table) -> pa.Table:
            f = t.filter(pc.equal(t["event_type"], event_type))
            return pa.table({"user_id": f["user_id"]})

        return (
            ev.map_batches(fn, batch_format="pyarrow")
            .groupby("user_id", num_partitions=_np())
            .aggregate(Count(alias_name=out))
        )

    clicks = side("click", "n_clicks")
    purchases = side("purchase", "n_purchases")
    return bucket_join(
        clicks,
        purchases,
        on=["user_id"],
        how="outer",
        left_payload={"n_clicks": pa.int64()},
        right_payload={"n_purchases": pa.int64()},
    )
