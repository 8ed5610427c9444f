"""The range-exchange partitioning contract (linkgraph/bsp.py): blocks are
dst-sorted, dst-disjoint, ascending, equal dst values never split, counts
exact.  Every sharded/broadcast kernel relies on these invariants."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from linkgraph import bsp, graph as G


def _pull(refs):
    return [ray.get(r) for r in refs]


def _check_contract(tables, expect_dedup_sorted_src):
    last_max = None
    for t in tables:
        if len(t) == 0:
            continue
        d = t["dst"].to_numpy(zero_copy_only=False)
        s = t["src"].to_numpy(zero_copy_only=False)
        assert np.all(d[1:] >= d[:-1]), "block not dst-sorted"
        if last_max is not None:
            assert d[0] > last_max, "ranges overlap or not ascending"
        last_max = d[-1]
        if expect_dedup_sorted_src:
            key_sorted = np.lexsort((s, d))
            assert np.array_equal(key_sorted, np.arange(len(s)))
            dup = (d[1:] == d[:-1]) & (s[1:] == s[:-1])
            assert not dup.any(), "duplicate rows survived the merge dedup"


def _edges(n=50_000, n_verts=5_000, seed=7, dupes=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_verts, n).astype(np.int64)
    dst = rng.integers(0, n_verts, n).astype(np.int64)
    if dupes:
        src = np.concatenate([src, src[: n // 4]])
        dst = np.concatenate([dst, dst[: n // 4]])
    return pa.table({"src": src, "dst": dst})


def test_exchange_contract_and_counts():
    t = _edges()
    sym = G.symmetrize_block(G.from_arrow_edges(t).repartition(8))
    refs, n_rows, n_uniq = bsp.raw_dst_exchange(sym, dedup_sort_src=True)
    tables = _pull(refs)
    _check_contract(tables, expect_dedup_sorted_src=True)
    got = sum(len(x) for x in tables)
    assert got == n_rows
    # oracle: dedup + unique dst on the driver
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    pairs = np.unique(np.stack([np.concatenate([s, d]), np.concatenate([d, s])]), axis=1)
    assert n_rows == pairs.shape[1]
    assert n_uniq == len(np.unique(pairs[1]))


def test_fused_exchange_matches_chain():
    t = _edges(seed=11)
    ds = G.from_arrow_edges(t).repartition(4)
    refs_a, n_a, v_a = bsp.raw_dst_exchange(
        G.symmetrize_block(G.orient_lo_hi(G.drop_self_loops(ds))),
        dedup_sort_src=True,
    )
    refs_b, n_b, v_b = bsp.raw_map_dst_exchange(
        G.from_arrow_edges(t).repartition(4), G.sym_prep_batch, dedup_sort_src=True
    )
    assert (n_a, v_a) == (n_b, v_b)
    ta = pa.concat_tables(_pull(refs_a))
    tb = pa.concat_tables(_pull(refs_b))
    # same global multiset in the same global (dst, src) order
    assert ta.num_rows == tb.num_rows
    for col in ("src", "dst"):
        assert np.array_equal(
            ta[col].to_numpy(zero_copy_only=False),
            tb[col].to_numpy(zero_copy_only=False),
        )
    _check_contract(_pull(refs_b), expect_dedup_sorted_src=True)


def test_exchange_empty_and_degenerate():
    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    refs, n, v = bsp.raw_dst_exchange(empty)
    assert n == 0 and v == 0
    refs, n, v = bsp.raw_map_dst_exchange(empty, G.sym_prep_batch)
    assert n == 0 and v == 0
    # single dst value: degenerate key range collapses to one block
    one = pa.table(
        {
            "src": np.arange(100, dtype=np.int64),
            "dst": np.full(100, 7, dtype=np.int64),
        }
    )
    refs, n, v = bsp.raw_dst_exchange(
        rd.from_arrow(one).repartition(4), dedup_sort_src=True
    )
    assert v == 1 and n == 100
    tables = [x for x in _pull(refs) if len(x)]
    assert sum(len(x) for x in tables) == 100


def test_exchange_without_dedup_keeps_multiplicity():
    t = pa.table(
        {
            "src": np.array([1, 1, 2], dtype=np.int64),
            "dst": np.array([2, 2, 3], dtype=np.int64),
        }
    )
    refs, n, v = bsp.raw_dst_exchange(rd.from_arrow(t))
    assert n == 3  # duplicates preserved
    assert v == 2


def test_oversized_input_blocks_are_bounded(monkeypatch):
    """Input blocks past DEFAULT_INPUT_BLOCK_ROWS are row-sliced before the
    map phase (the exchange's working-set guard); results are unchanged."""
    monkeypatch.setattr(bsp, "DEFAULT_INPUT_BLOCK_ROWS", 1000)
    t = _edges(n=20_000, n_verts=3_000, seed=13)
    ds = G.from_arrow_edges(t).repartition(2)  # 10k+ rows per input block
    refs, n_rows, n_uniq = bsp.raw_map_dst_exchange(
        ds, G.sym_prep_batch, dedup_sort_src=True
    )
    _check_contract(_pull(refs), expect_dedup_sorted_src=True)
    s = t["src"].to_numpy(zero_copy_only=False)
    d = t["dst"].to_numpy(zero_copy_only=False)
    keep = s != d
    s, d = s[keep], d[keep]
    pairs = np.unique(
        np.stack([np.concatenate([s, d]), np.concatenate([d, s])]), axis=1
    )
    assert n_rows == pairs.shape[1]
    assert n_uniq == len(np.unique(pairs[1]))
