"""Partitioning and skew handling (bucketed hash join, hub salting).

The reference mitigates skew by sampling the giant component and skipping it
(``src/cc_openmp.c:422-496,596-613``) and by dynamic chunk scheduling /
work-stealing (``src/pthreads/afforest_simple.c:622-649``).  In the dataflow
engine the same problem reappears as *heavy keys* in shuffle joins: a
web-scale hub vertex can have more rows than a partition holds.

``bucket_join`` is an explicit partitioned hash join (the portable pattern):
both sides get a ``_bucket = mix64(key) % B`` column, one hash repartition
co-locates matching buckets, and the per-bucket merge is Arrow's C++ hash
join (``pa.Table.join`` — zero pandas copies), falling back to a vectorized
pandas merge only for nested payload types (list-typed MinHash signatures /
embeddings) that Arrow's join rejects.  We use it instead of the
experimental ``Dataset.join`` because the native join's aggregator builds
schema-less empty tables for hash partitions that receive no rows, which
pyarrow's join rejects — guaranteed on small or skewed inputs.

**Salting** (``salt > 1``): the right side must then be unique per key (a
lookup table, e.g. a groupby-aggregate result).  Each right row is
replicated once per salt value, left rows get a deterministic per-row salt,
and the salt participates in both bucketing and the merge keys — so a heavy
left key's rows split across ``salt`` buckets instead of melting one
aggregator.

Groupby *aggregations* (Min/Sum/Count) need none of this — Ray Data applies
partial aggregation (combiners) before its shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from linkgraph.graph import _mix64, default_partitions
from linkgraph.runtime import broadcast_gate_rows

# Measured performance crossover for the relational broadcast-hash join:
# past ~2M unique right-side rows the one-shot driver materialization +
# per-task binary search loses to bucket_join's partitioned Arrow hash
# join on this box.  The effective gate at call time is
# min(crossover, cluster-memory envelope) via broadcast_gate_rows.
_BROADCAST_JOIN_CROSSOVER_ROWS = 2_000_000

_SIDE = "_lgside"
_BUCKET = "_lgbucket"
_SALT = "_lgsalt"

# A/B escape hatch: force the pandas merge path in bucket_join even for
# Arrow-joinable schemas (used by the interleaved join benchmark,
# BENCH/ab_r4_arrow_join_*.jsonl).  Read at pipeline-build time on the
# driver; never set in production code.
_FORCE_PANDAS_JOIN = False


def _key_hash(t: pa.Table, on: list[str], seed: int) -> np.ndarray:
    acc = np.full(len(t), np.uint64(seed), dtype=np.uint64)
    for name in on:
        col = t[name].to_numpy(zero_copy_only=False)
        acc = _mix64(acc.view(np.int64), col.astype(np.int64, copy=False))
    return acc


_BCAST_CACHE: dict = {}


def _broadcast_cached(ref):
    """Per-process cache of a broadcast lookup (ObjectRefs hash stably).
    Bounded: long sessions run many joins; keep the 8 most recent."""
    import ray

    v = _BCAST_CACHE.get(ref)
    if v is None:
        v = ray.get(ref)
        if len(_BCAST_CACHE) >= 8:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[ref] = v
    return v


def broadcast_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    max_rows: int | None = None,
) -> rd.Dataset:
    """Inner join where ``right`` is a small unique-keyed lookup table.

    The small side is materialized ONCE, ``ray.put`` into the object store,
    and every map task attaches its payload columns by a vectorized
    sorted-array binary search (``np.searchsorted``) + Arrow ``take`` — no
    shuffle of the big side, no per-row Python.  This is the broadcast-hash
    join every engine uses for dimension tables; at 100 TB the fact side
    streams through untouched while the dimension rides the object store.

    Requirements: ``right_on`` values are unique int64 keys (a lookup table —
    same contract as ``bucket_join``'s salted right side).  If ``right`` has
    more than ``max_rows`` rows, falls back to the shuffling ``bucket_join``
    automatically so callers can use this unconditionally.
    """
    import ray

    # Materialize into the (spillable) object store first so the row count is
    # cheap metadata, and only pull blocks onto the driver once the count is
    # known to be under the gate.  An oversized right side never touches the
    # driver heap — it stays distributed and flows into the bucket_join.
    right = right.materialize()
    schema = right.schema()
    payload_cols = [c for c in schema.names if c != right_on]
    n_right = right.count()
    if max_rows is None:
        # Same cluster-memory envelope as the iterative kernels
        # (runtime.broadcast_gate_rows): min(measured crossover, what the
        # smallest node's object store can hold), with bytes/row taken from
        # the materialized right side's actual size — not a hard literal
        # (round-4 verdict #5).  LINKGRAPH_BROADCAST_GATE_ROWS overrides.
        bytes_per_row = (
            max(8, right.size_bytes() // n_right) if n_right else 8
        )
        max_rows = broadcast_gate_rows(
            bytes_per_row, _BROADCAST_JOIN_CROSSOVER_ROWS
        )
    if n_right > max_rows:
        lkey = left_on
        rkey = right_on

        def rn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [lkey if c == rkey else c for c in t.column_names]
            )

        return bucket_join(
            left,
            right.map_batches(rn, batch_format="pyarrow"),
            [left_on],
            right_payload={
                c: schema.base_schema.field(c).type for c in payload_cols
            },
        )

    tbl = pa.concat_tables(
        ray.get(right.to_arrow_refs()), promote_options="default"
    ).combine_chunks()
    keys = tbl[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys, kind="stable")
    skeys = keys[order]
    pay = tbl.select(payload_cols).take(pa.array(order)).combine_chunks()
    ref = ray.put((skeys, pay))

    # TASK-based attach with a per-process broadcast cache (not an actor
    # pool): the executor can then FUSE the attach with the left side's
    # read/prep chain — an actor pool both pays its per-execution spawn
    # and forces the fact table through the object store between read and
    # join.  ``ray.get`` of a plasma object inside a worker is zero-copy
    # for the numpy keys / Arrow payload; the cache only skips repeated
    # deserialization dispatch on hot paths.
    def attach(t: pa.Table) -> pa.Table:
        skeys_l, pay_l = _broadcast_cached(ref)
        if t.num_columns == 0 or len(t) == 0 or len(skeys_l) == 0:
            cols = {
                c: pa.array([], t.schema.field(c).type)
                for c in (t.column_names if t.num_columns else [])
            }
            for c in payload_cols:
                cols[c] = pa.array([], pay_l.schema.field(c).type)
            return pa.table(cols or {left_on: pa.array([], pa.int64())})
        k = t[left_on].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        idx = np.searchsorted(skeys_l, k)
        idx_c = np.minimum(idx, len(skeys_l) - 1)
        hit = skeys_l[idx_c] == k
        kept = t.filter(pa.array(hit))
        take_idx = pa.array(idx_c[hit])
        cols = {c: kept[c] for c in kept.column_names}
        for c in payload_cols:
            cols[c] = pay_l[c].take(take_idx)
        return pa.table(cols)

    return left.map_batches(attach, batch_format="pyarrow")


def bucket_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: list[str],
    *,
    num_buckets: int | None = None,
    salt: int = 1,
    left_payload: dict[str, pa.DataType] | None = None,
    right_payload: dict[str, pa.DataType] | None = None,
    how: str = "inner",
) -> rd.Dataset:
    """Hash join of two Datasets on ``on`` (int64 key columns).

    ``how``: ``"inner"`` (default), ``"left"`` (left outer — unmatched left
    rows kept with null right payload), ``"outer"`` (full outer — unmatched
    rows of BOTH sides kept, the missing side null-padded), ``"semi"``
    (left rows whose key exists on the right — no row multiplication from
    right-side duplicates) or ``"anti"`` (left rows whose key does NOT
    exist on the right).  For semi/anti the right side is keys-only
    (``right_payload`` must be empty) and the output schema is the left
    schema.  ``how="outer"`` requires ``salt == 1`` (salting replicates
    the right side, which would emit duplicate right-outer rows).

    Non-key column names must be disjoint between the sides (the engine
    controls all schemas).  ``left_payload`` / ``right_payload`` — optional
    ``{column: arrow_type}`` for the non-key columns; passing them avoids a
    ``ds.schema()`` call that could force early execution of a lazy input.

    ``salt > 1`` is the hot-KEY mitigation for the dataflow join paths: the
    left side splits each key's rows across ``salt`` sub-buckets by row
    hash while the right side replicates ``salt``×, so a celebrity join key
    (a hub vertex in the label-propagation/PageRank shuffle fallbacks)
    spreads over ``salt`` tasks instead of one.  Costs ``salt``× the right
    side — use when the right side is the small one.  (The iterative
    kernels' default BSP paths handle hub skew structurally via the
    exchange's sub-split instead; see bsp.py.)  Verified on a 90 %-hot-key
    distribution in tests/test_shapes.py.
    """
    if salt > 1:
        s_arrow = pa.int64()

        def add_salt(t: pa.Table) -> pa.Table:
            s = _key_hash(t, list(t.column_names), 7) % np.uint64(salt)
            return t.append_column(_SALT, pa.array(s.astype(np.int64)))

        def replicate(t: pa.Table) -> pa.Table:
            n = len(t)
            rep = t.take(pa.array(np.repeat(np.arange(n), salt)))
            s = np.tile(np.arange(salt, dtype=np.int64), n)
            return rep.append_column(_SALT, pa.array(s))

        left = left.map_batches(add_salt, batch_format="pyarrow")
        right = right.map_batches(replicate, batch_format="pyarrow")
        on = on + [_SALT]
        if left_payload is not None:
            left_payload = {**left_payload}
        if right_payload is not None:
            right_payload = {**right_payload}

    if left_payload is None:
        ls = left.schema()  # ray.data.Schema: .names + .types (arrow types)
        left_payload = {
            n: t for n, t in zip(ls.names, ls.types) if n not in on
        }
    if right_payload is None:
        rs = right.schema()
        right_payload = {
            n: t for n, t in zip(rs.names, rs.types) if n not in on
        }
    overlap = set(left_payload) & set(right_payload)
    if overlap:
        raise ValueError(f"bucket_join: overlapping payload columns {overlap}")
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"bucket_join: unknown how {how!r}")
    if how == "outer" and salt > 1:
        raise ValueError("bucket_join: how='outer' does not compose with salt")
    if how in ("semi", "anti") and right_payload:
        raise ValueError(
            f"bucket_join: {how} join takes a keys-only right side, got "
            f"payload columns {sorted(right_payload)}"
        )

    nb = (num_buckets or default_partitions()) * max(salt, 1)
    lpay, rpay = list(left_payload), list(right_payload)
    out_cols = on + lpay + rpay
    out_types: dict[str, pa.DataType] = {
        **{n: pa.int64() for n in on},
        **left_payload,
        **right_payload,
    }

    def widen(side: int, missing: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols: dict[str, pa.Array | pa.ChunkedArray] = {}
            for c in out_cols:
                cols[c] = pa.nulls(n, out_types[c]) if c in missing else t[c]
            cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
            bucket = _key_hash(t, on, 0xA0761D64) % np.uint64(nb)
            cols[_BUCKET] = pa.array(bucket.astype(np.int64))
            return pa.table(cols)

        return fn

    lw = left.map_batches(widen(0, rpay), batch_format="pyarrow")
    rw = right.map_batches(widen(1, lpay), batch_format="pyarrow")
    both = lw.union(rw)

    keep_cols = [c for c in out_cols if c != _SALT]
    empty_out = pa.table(
        {c: pa.array([], out_types[c]) for c in keep_cols}
    )
    # Arrow's C++ hash join (Table.join) supports every scalar payload type
    # but rejects nested (list/struct) non-key fields — the dedup family
    # carries MinHash-signature / embedding list columns, so those buckets
    # take the vectorized pandas path instead.  Decided once at build time:
    # the engine controls all schemas.
    pa_join_ok = not _FORCE_PANDAS_JOIN and all(
        not pa.types.is_nested(tt) and not pa.types.is_dictionary(tt)
        for tt in out_types.values()
    )
    pa_how = {
        "inner": "inner",
        "left": "left outer",
        "outer": "full outer",  # coalesce_keys=True pads payload, merges keys
        "semi": "left semi",
        "anti": "left anti",
    }[how]
    target_schema = pa.schema([(c, out_types[c]) for c in keep_cols])

    def join_group(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return empty_out
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        if pa_join_ok:
            lt = t.filter(pa.array(side == 0)).select(on + lpay)
            rt = t.filter(pa.array(side == 1)).select(on + rpay)
            out = lt.join(rt, keys=on, join_type=pa_how).select(keep_cols)
            return out if out.schema == target_schema else out.cast(target_schema)
        ldf = t.filter(pa.array(side == 0)).select(on + lpay).to_pandas()
        rdf = t.filter(pa.array(side == 1)).select(on + rpay).to_pandas()
        if how in ("semi", "anti"):
            # existence mask, no row multiplication: right is keys-only
            hit = ldf.merge(
                rdf.drop_duplicates(), on=on, how="left", indicator=True
            )["_merge"].to_numpy() == "both"
            out = ldf[hit if how == "semi" else ~hit]
        else:
            # "left"/"outer": pandas widens the missing side to NaN; the
            # from_pandas conversion below maps NaN -> Arrow null even for
            # integer target types, so the outer rows come out null-padded.
            out = ldf.merge(rdf, on=on, how=how)
        arrays = [
            pa.Array.from_pandas(out[c], type=out_types[c]) for c in keep_cols
        ]
        return pa.table(dict(zip(keep_cols, arrays)))

    # hash-repartition by bucket + whole-block merge, NOT groupby.map_groups:
    # the hash-shuffle map_groups finalize-sort dies on schema-less empty
    # partitions (Ray 2.49); join_group handles mixed buckets per block fine
    parted = both.repartition(nb, keys=[_BUCKET])
    return parted.map_batches(join_group, batch_format="pyarrow", batch_size=None)


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    num_buckets: int | None = None,
    left_payload: dict[str, "pa.DataType"] | None = None,
    right_payload: dict[str, "pa.DataType"] | None = None,
) -> rd.Dataset:
    """Inner AS-OF join: for each left row, attach the LATEST right row of
    the same ``key`` with ``right_ts <= left_ts`` (the classic event ↔
    dimension-history alignment; DuckDB's ``ASOF JOIN`` semantics).

    Shape: both sides hash-co-partition by ``key`` (the ``bucket_join``
    widen/union/repartition pattern — ONE shuffle each), then each block
    runs a C-speed ``pandas.merge_asof`` (sorted by timestamp, ``by`` key)
    over its keys — no Python row loop, no global sort.  Determinism: ties
    on ``right_ts`` within a key resolve to the LAST row in (key, ts,
    payload-column) order, so a right side deduplicated on (key, ts) is
    fully deterministic.  Rows with no match are dropped (inner).
    At 100 TB this is one bounded shuffle per side; the right side is
    typically the small dimension history and could ride the broadcast
    path instead — kept symmetric here because history tables grow with
    time, not corpus size.
    """
    import pandas as pd

    from linkgraph.graph import default_partitions

    if left_payload is None:
        ls = left.schema()
        left_payload = {
            n: t for n, t in zip(ls.names, ls.types) if n not in (key, left_ts)
        }
    if right_payload is None:
        rs = right.schema()
        right_payload = {
            n: t for n, t in zip(rs.names, rs.types) if n not in (key, right_ts)
        }
    ts_type = pa.timestamp("us")
    lcols = [key, left_ts, *left_payload]
    rcols = [key, right_ts, *right_payload]
    out_cols = [key, left_ts, *left_payload, right_ts, *right_payload]
    out_types: dict[str, pa.DataType] = {
        key: pa.int64(),
        left_ts: ts_type,
        right_ts: ts_type,
        **left_payload,
        **right_payload,
    }
    nb = num_buckets or default_partitions()

    def widen(side: int, missing: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols: dict = {}
            for c in out_cols:
                cols[c] = pa.nulls(n, out_types[c]) if c in missing else t[c]
            cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
            bucket = _key_hash(t, [key], 0xA0761D64) % np.uint64(nb)
            cols[_BUCKET] = pa.array(bucket.astype(np.int64))
            return pa.table(cols)

        return fn

    lw = left.map_batches(
        widen(0, [right_ts, *right_payload]), batch_format="pyarrow"
    )
    rw = right.map_batches(
        widen(1, [left_ts, *left_payload]), batch_format="pyarrow"
    )
    both = lw.union(rw)
    empty_out = pa.table({c: pa.array([], out_types[c]) for c in out_cols})

    def join_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return empty_out
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        ldf = t.filter(pa.array(side == 0)).select(lcols).to_pandas()
        rdf = t.filter(pa.array(side == 1)).select(rcols).to_pandas()
        if len(ldf) == 0 or len(rdf) == 0:
            return empty_out
        ldf = ldf.sort_values([left_ts, key], kind="stable")
        rdf = rdf.sort_values(
            [right_ts, key, *right_payload], kind="stable"
        )
        out = pd.merge_asof(
            ldf, rdf, left_on=left_ts, right_on=right_ts, by=key,
            direction="backward",
        )
        out = out[out[right_ts].notna()]
        arrays = [
            pa.Array.from_pandas(out[c], type=out_types[c]) for c in out_cols
        ]
        return pa.table(dict(zip(out_cols, arrays)))

    parted = both.repartition(nb, keys=[_BUCKET])
    return parted.map_batches(join_block, batch_format="pyarrow", batch_size=None)


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key: str,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    num_buckets: int | None = None,
    left_payload: dict[str, "pa.DataType"] | None = None,
    right_payload: dict[str, "pa.DataType"] | None = None,
) -> rd.Dataset:
    """Inner RANGE (interval) join: emit one row per (left, right) pair of
    the same ``key`` with ``right_lo <= left_ts < right_hi``.  Overlapping
    intervals produce multiple rows per left row (plain inequality-join
    semantics, the DuckDB ``ON a.k=b.k AND a.ts >= b.lo AND a.ts < b.hi``
    oracle shape).

    Shape: both sides hash-co-partition by ``key`` (ONE shuffle each, the
    ``bucket_join`` widen/union pattern), then each block computes, for
    every right interval, the contiguous run of its key's time-sorted left
    rows via two C-speed ``merge_asof`` rank lookups (strictly-less
    predecessor of ``lo`` and of ``hi``), and emits the pairs with one
    ``repeat``/``arange`` — no Python row loop, no quadratic blow-up
    beyond the actual output size."""
    import pandas as pd

    from linkgraph.graph import default_partitions

    if left_payload is None:
        ls = left.schema()
        left_payload = {
            n: t for n, t in zip(ls.names, ls.types) if n not in (key, left_ts)
        }
    if right_payload is None:
        rs = right.schema()
        right_payload = {
            n: t
            for n, t in zip(rs.names, rs.types)
            if n not in (key, right_lo, right_hi)
        }
    ts_type = pa.timestamp("us")
    lcols = [key, left_ts, *left_payload]
    rcols = [key, right_lo, right_hi, *right_payload]
    out_cols = [key, left_ts, *left_payload, right_lo, right_hi, *right_payload]
    out_types: dict[str, pa.DataType] = {
        key: pa.int64(),
        left_ts: ts_type,
        right_lo: ts_type,
        right_hi: ts_type,
        **left_payload,
        **right_payload,
    }
    nb = num_buckets or default_partitions()

    def widen(side: int, missing: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols: dict = {}
            for c in out_cols:
                cols[c] = pa.nulls(n, out_types[c]) if c in missing else t[c]
            cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
            bucket = _key_hash(t, [key], 0xA0761D64) % np.uint64(nb)
            cols[_BUCKET] = pa.array(bucket.astype(np.int64))
            return pa.table(cols)

        return fn

    lw = left.map_batches(
        widen(0, [right_lo, right_hi, *right_payload]), batch_format="pyarrow"
    )
    rw = right.map_batches(
        widen(1, [left_ts, *left_payload]), batch_format="pyarrow"
    )
    both = lw.union(rw)
    empty_out = pa.table({c: pa.array([], out_types[c]) for c in out_cols})

    def join_block(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return empty_out
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        ldf = (
            t.filter(pa.array(side == 0))
            .select(lcols)
            .to_pandas()
            .sort_values([key, left_ts], kind="stable")
            .reset_index(drop=True)
        )
        rdf = (
            t.filter(pa.array(side == 1))
            .select(rcols)
            .to_pandas()
            .sort_values([key, right_lo], kind="stable")
            .reset_index(drop=True)
        )
        if len(ldf) == 0 or len(rdf) == 0:
            return empty_out
        lk = ldf[key].to_numpy()
        rk = rdf[key].to_numpy()
        lrow = ldf.assign(_lgrow=np.arange(len(ldf), dtype=np.int64))
        seg_start = np.searchsorted(lk, rk, side="left")

        def pred_row(bound_col: str) -> np.ndarray:
            """Global left-row index of the last row with ts < bound, per
            right row (−1 when none in that key)."""
            r = rdf[[key, bound_col]].sort_values(
                [bound_col, key], kind="stable"
            )
            m = pd.merge_asof(
                r,
                lrow[[key, left_ts, "_lgrow"]].sort_values(
                    [left_ts, key], kind="stable"
                ),
                left_on=bound_col,
                right_on=left_ts,
                by=key,
                direction="backward",
                allow_exact_matches=False,
            )
            out = np.full(len(rdf), -1, dtype=np.int64)
            out[r.index.to_numpy()] = (
                m["_lgrow"].fillna(-1).to_numpy().astype(np.int64)
            )
            return out

        a = np.maximum(pred_row(right_lo) + 1, seg_start)
        b_excl = pred_row(right_hi) + 1
        # hi is EXCLUSIVE: rows with ts == hi are excluded by the
        # strict-less predecessor; rows with ts == lo are included via max
        # with the key segment start above
        cnt = np.maximum(b_excl - a, 0)
        total = int(cnt.sum())
        if total == 0:
            return empty_out
        l_idx = (
            np.arange(total)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
            + np.repeat(a, cnt)
        )
        r_idx = np.repeat(np.arange(len(rdf), dtype=np.int64), cnt)
        out = pd.concat(
            [
                ldf.iloc[l_idx].reset_index(drop=True),
                rdf.iloc[r_idx][[right_lo, right_hi, *right_payload]].reset_index(
                    drop=True
                ),
            ],
            axis=1,
        )
        arrays = [
            pa.Array.from_pandas(out[c], type=out_types[c]) for c in out_cols
        ]
        return pa.table(dict(zip(out_cols, arrays)))

    parted = both.repartition(nb, keys=[_BUCKET])
    return parted.map_batches(join_block, batch_format="pyarrow", batch_size=None)
