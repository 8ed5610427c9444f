"""Grouped top-k, semi/anti join, exact quantiles, KMV sketch."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph.partition import bucket_join
from linkgraph.relational import exact_quantiles, grouped_topk
from linkgraph.sketch import approx_distinct, kmv_estimate, kmv_merge, kmv_partial


def _df(ds):
    return ds.to_pandas()


def test_grouped_topk_vs_pandas():
    rng = np.random.default_rng(3)
    n = 5_000
    t = pa.table(
        {
            "g": rng.integers(0, 37, n).astype(np.int64),
            "v": rng.integers(0, 1000, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    got = (
        _df(grouped_topk(rd.from_arrow(t).repartition(6), "g", ["v", "id"], [True, False], 4))
        .sort_values(["g", "rk"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df = df.sort_values(["g", "v", "id"], ascending=[True, False, True])
    df["rk"] = df.groupby("g").cumcount() + 1
    want = df[df["rk"] <= 4].sort_values(["g", "rk"]).reset_index(drop=True)
    assert got[["g", "v", "id", "rk"]].equals(want[["g", "v", "id", "rk"]])


def test_grouped_topk_deterministic_across_partitioning():
    rng = np.random.default_rng(11)
    n = 2_000
    t = pa.table(
        {
            "g": rng.integers(0, 5, n).astype(np.int64),
            "v": rng.integers(0, 50, n).astype(np.int64),  # heavy ties
            "id": np.arange(n, dtype=np.int64),
        }
    )
    a = _df(grouped_topk(rd.from_arrow(t).repartition(1), "g", ["v", "id"], [True, False], 3))
    b = _df(grouped_topk(rd.from_arrow(t).repartition(9), "g", ["v", "id"], [True, False], 3))
    key = ["g", "rk"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_semi_anti_join_vs_pandas(how):
    rng = np.random.default_rng(7)
    left = pa.table(
        {
            "k": rng.integers(0, 100, 3_000).astype(np.int64),
            "payload": np.arange(3_000, dtype=np.int64),
        }
    )
    # right has duplicate keys on purpose — semi must not multiply rows
    right = pa.table({"k": rng.integers(50, 150, 500).astype(np.int64)})
    got = _df(
        bucket_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3),
            ["k"],
            left_payload={"payload": pa.int64()},
            right_payload={},
            how=how,
        )
    ).sort_values("payload").reset_index(drop=True)
    ldf, rkeys = left.to_pandas(), set(right["k"].to_pylist())
    mask = ldf["k"].isin(rkeys)
    want = ldf[mask if how == "semi" else ~mask].sort_values("payload").reset_index(
        drop=True
    )
    assert got.equals(want)


def test_anti_join_rejects_right_payload():
    t = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()), "x": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="keys-only"):
        bucket_join(t, t, ["k"], left_payload={}, right_payload={"x": pa.int64()}, how="anti")


def test_exact_quantiles_match_duckdb_semantics():
    import duckdb

    rng = np.random.default_rng(5)
    v = rng.normal(1000.0, 250.0, 10_001)
    qs = [0.01, 0.25, 0.5, 0.75, 0.95, 1.0]
    got = exact_quantiles(
        rd.from_arrow(pa.table({"x": v})).repartition(7), "x", qs
    )
    con = duckdb.connect()
    con.register("v_tbl", pa.table({"x": v}))
    want = con.execute(f"SELECT quantile_disc(x, {qs}) FROM v_tbl").fetchone()[0]
    assert got == pytest.approx(want, abs=0.0)


def test_kmv_exact_regime():
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 500, 20_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(6)
    n_true = len(np.unique(vals))
    assert approx_distinct(ds, "x", k=1 << 12) == n_true


def test_kmv_estimation_regime_error_bound():
    rng = np.random.default_rng(17)
    n_distinct = 50_000
    vals = rng.permutation(n_distinct).astype(np.int64)
    k = 1024
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(8)
    est = approx_distinct(ds, "x", k=k)
    rel_err = abs(est - n_distinct) / n_distinct
    assert rel_err < 5.0 / np.sqrt(k - 2), rel_err  # 5 sigma of the KMV bound


def test_kmv_merge_equals_single_pass():
    rng = np.random.default_rng(19)
    vals = rng.integers(0, 10_000, 30_000)
    k = 256
    h_all = kmv_partial(pa.array(vals.astype(np.int64)), k)
    parts = [
        kmv_partial(pa.array(c.astype(np.int64)), k)
        for c in np.array_split(vals, 7)
    ]
    merged = kmv_merge(parts, k)
    assert np.array_equal(merged, h_all)
    assert kmv_estimate(merged, k) == kmv_estimate(h_all, k)


def test_kmv_string_column():
    vals = [f"user-{i % 300}" for i in range(5_000)]
    ds = rd.from_arrow(pa.table({"s": pa.array(vals)})).repartition(4)
    assert approx_distinct(ds, "s", k=1 << 12) == 300


def test_left_join_null_fills_vs_pandas():
    rng = np.random.default_rng(23)
    left = pa.table(
        {
            "k": np.arange(200, dtype=np.int64),
            "seg": rng.integers(0, 4, 200).astype(np.int64),
        }
    )
    right = pa.table(
        {
            "k": rng.choice(150, 80, replace=False).astype(np.int64),
            "x": rng.integers(0, 9, 80).astype(np.int64),
        }
    )
    got = _df(
        bucket_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(3),
            ["k"],
            left_payload={"seg": pa.int64()},
            right_payload={"x": pa.int64()},
            how="left",
        )
    ).sort_values("k").reset_index(drop=True)
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), on="k", how="left")
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == 200
    assert got["k"].equals(want["k"]) and got["seg"].equals(want["seg"])
    gm, wm = got["x"].isna(), want["x"].isna()
    assert gm.equals(wm)
    assert np.array_equal(got["x"][~gm].to_numpy(), want["x"][~wm].to_numpy())


def test_grouped_quantiles_vs_duckdb():
    import duckdb

    from linkgraph.relational import grouped_quantiles

    rng = np.random.default_rng(29)
    n = 20_000
    t = pa.table(
        {
            "g": rng.integers(0, 23, n).astype(np.int64),
            "v": rng.normal(500.0, 100.0, n),
        }
    )
    got = (
        _df(grouped_quantiles(rd.from_arrow(t).repartition(7), "g", "v",
                              [0.25, 0.5, 0.9], ["q25", "q50", "q90"]))
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT g, quantile_disc(v, 0.25) q25, quantile_disc(v, 0.5) q50,
                  quantile_disc(v, 0.9) q90 FROM t GROUP BY g ORDER BY g"""
    ).df()
    assert np.array_equal(got["g"], want["g"])
    for c in ["q25", "q50", "q90"]:
        assert np.allclose(got[c], want[c], atol=0.0), c


def test_rolling_window_vs_pandas():
    from linkgraph.relational import user_event_rolling

    # build a small parquet events table under /tmp
    import os
    import tempfile

    rng = np.random.default_rng(31)
    n = 4_000
    ts = pa.array(
        rng.integers(0, 500, n).astype("datetime64[us]").astype("datetime64[us]")
    )
    t = pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": pa.array(["x"] * n),
            "value": rng.normal(10.0, 3.0, n),
            "props": pa.array(["{}"] * n),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq

        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = (
            _df(user_event_rolling(d))
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    r = df.groupby("user_id")["value"].rolling(3, min_periods=1)
    df["roll_sum"] = r.sum().reset_index(level=0, drop=True)
    df["roll_mean"] = r.mean().reset_index(level=0, drop=True)
    want = df.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(got["roll_sum"], want["roll_sum"], atol=1e-9)
    assert np.allclose(got["roll_mean"], want["roll_mean"], atol=1e-9)


def _write_events(d, t):
    import os

    import pyarrow.parquet as pq

    pq.write_table(t, os.path.join(d, "events.parquet"))


def test_funnel_boundary_semantics():
    """Conversion iff purchase - click < 1h strictly; equal-ts click counts."""
    import tempfile

    from linkgraph.relational import funnel_click_purchase

    h = 3_600_000_000  # 1h in us
    rows = [
        # user 1: click at t0, purchase at exactly t0 + 1h -> NOT a conversion
        (1, 0, 1, "click"),
        (2, h, 1, "purchase"),
        # user 2: click at t0, purchase at t0 + 1h - 1us -> conversion
        (3, 0, 2, "click"),
        (4, h - 1, 2, "purchase"),
        # user 3: click and purchase at the same instant -> conversion
        (5, 42, 3, "click"),
        (6, 42, 3, "purchase"),
        # user 4: purchase BEFORE any click -> no conversion
        (7, 100, 4, "purchase"),
        (8, 200, 4, "click"),
        # user 5: two purchases after one click, both inside window
        (9, 0, 5, "click"),
        (10, 10, 5, "purchase"),
        (11, 20, 5, "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[us]")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, t)
        got = (
            _df(funnel_click_purchase(d))
            .sort_values("user_id")
            .reset_index(drop=True)
        )
    assert got["user_id"].tolist() == [2, 3, 5]
    assert got["n_conversions"].tolist() == [1, 1, 2]


def _brute_common_neighbors(src, dst):
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in zip(src, dst):
        adj[s].add(d)
        adj[d].add(s)
    counts = defaultdict(int)
    for x, nb in adj.items():
        nb = sorted(nb)
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                counts[(nb[i], nb[j])] += 1
    return counts


def test_common_neighbor_pairs_vs_bruteforce():
    import tempfile

    from linkgraph import graph as G
    from linkgraph.relational import colocate_by_key, common_neighbors_topk

    rng = np.random.default_rng(37)
    # random bipartite-ish graph via a fake lineitem table
    n = 3_000
    t = pa.table(
        {
            "l_orderkey": rng.integers(0, 120, n).astype(np.int64),
            "l_partkey": rng.integers(0, 40, n).astype(np.int64),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq
        import os

        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        got = _df(common_neighbors_topk(d, k=15))
    src = t["l_orderkey"].to_numpy()
    dst = t["l_partkey"].to_numpy() + 1_000_000_000
    pairs = {(s, x) for s, x in zip(src, dst)}
    counts = _brute_common_neighbors([p[0] for p in pairs], [p[1] for p in pairs])
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got_t = list(zip(got["u"], got["v"], got["n_common"]))
    assert got_t == [(u, v, c) for (u, v), c in want]


def test_common_neighbors_hub_cap_drops_hub_wedges():
    """A middle vertex above max_degree contributes no pairs."""
    import tempfile

    from linkgraph.relational import common_neighbors_topk

    # order 0 is a hub touching 30 parts; orders 1..5 each touch 2 parts
    ok, pk = [], []
    for p in range(30):
        ok.append(0)
        pk.append(p)
    for o in range(1, 6):
        ok += [o, o]
        pk += [100 + o, 101 + o]
    t = pa.table(
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        import pyarrow.parquet as pq
        import os

        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        full = _df(common_neighbors_topk(d, k=1000))
        capped = _df(common_neighbors_topk(d, k=1000, max_degree=10))
    # hub wedges: C(30,2) = 435 part-part pairs exist only via order 0
    assert len(full) > len(capped)
    hub_parts = set(range(1_000_000_000, 1_000_000_030))
    capped_pairs = set(zip(capped["u"], capped["v"]))
    assert not any(
        u in hub_parts and v in hub_parts for u, v in capped_pairs
    )


def test_cumulative_value_vs_pandas():
    import tempfile

    from linkgraph.relational import user_cumulative_value

    rng = np.random.default_rng(41)
    n = 3_000
    # heavy ts ties so the (ts, event_id) tiebreak matters
    t = pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pa.array(rng.integers(0, 50, n).astype("datetime64[us]")),
            "user_id": rng.integers(0, 25, n).astype(np.int64),
            "event_type": pa.array(["x"] * n),
            "value": rng.normal(0.0, 5.0, n),  # negative values too
            "props": pa.array(["{}"] * n),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, t)
        got = (
            _df(user_cumulative_value(d))
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["vc"] = np.round(df["value"] * 1e6).astype(np.int64)
    df["cum_value"] = df.groupby("user_id")["vc"].cumsum() / 1e6
    want = df.sort_values("event_id").reset_index(drop=True)
    assert np.array_equal(got["cum_value"].to_numpy(), want["cum_value"].to_numpy())


def test_grouped_kmv_exact_regime_vs_pandas():
    from linkgraph.sketch import approx_distinct_by_key

    rng = np.random.default_rng(53)
    n = 30_000
    t = pa.table(
        {
            "g": pa.array([f"type-{i}" for i in rng.integers(0, 7, n)]),
            "x": rng.integers(0, 800, n).astype(np.int64),
        }
    )
    got = (
        approx_distinct_by_key(rd.from_arrow(t).repartition(6), "g", "x", k=1 << 12)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    want = (
        t.to_pandas().groupby("g")["x"].nunique().rename("n_approx").reset_index()
    )
    assert got["g"].tolist() == want["g"].tolist()
    assert got["n_approx"].tolist() == want["n_approx"].tolist()


def test_grouped_kmv_estimation_regime():
    from linkgraph.sketch import approx_distinct_by_key

    rng = np.random.default_rng(59)
    k = 1024
    # one key far above k, one far below
    big = rng.permutation(40_000).astype(np.int64)
    small = rng.integers(0, 100, 5_000).astype(np.int64)
    t = pa.table(
        {
            "g": pa.array([0] * len(big) + [1] * len(small), pa.int64()),
            "x": np.concatenate([big, small]),
        }
    )
    got = (
        approx_distinct_by_key(rd.from_arrow(t).repartition(5), "g", "x", k=k)
        .to_pandas()
        .set_index("g")["n_approx"]
    )
    assert got[1] == len(np.unique(small))  # exact regime
    rel = abs(got[0] - 40_000) / 40_000
    assert rel < 5.0 / np.sqrt(k - 2), rel


def test_neighborhood_jaccard_vs_bruteforce():
    import tempfile

    from linkgraph.relational import neighborhood_jaccard_topk

    rng = np.random.default_rng(61)
    n = 2_000
    t = pa.table(
        {
            "l_orderkey": rng.integers(0, 80, n).astype(np.int64),
            "l_partkey": rng.integers(0, 30, n).astype(np.int64),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        import os

        import pyarrow.parquet as pq

        pq.write_table(t, os.path.join(d, "lineitem.parquet"))
        got = _df(neighborhood_jaccard_topk(d, k=12))
    src = t["l_orderkey"].to_numpy()
    dst = t["l_partkey"].to_numpy() + 1_000_000_000
    pairs = {(s, x) for s, x in zip(src, dst)}
    counts = _brute_common_neighbors([p[0] for p in pairs], [p[1] for p in pairs])
    from collections import defaultdict

    deg = defaultdict(int)
    for s, x in pairs:
        deg[s] += 1
        deg[x] += 1
    scored = [
        (u, v, c, c / (deg[u] + deg[v] - c)) for (u, v), c in counts.items()
    ]
    want = sorted(scored, key=lambda r: (-r[3], r[0], r[1]))[:12]
    got_t = list(zip(got["u"], got["v"], got["n_common"], got["jaccard"]))
    assert [(u, v, c) for u, v, c, _ in got_t] == [(u, v, c) for u, v, c, _ in want]
    assert np.allclose([j for *_, j in got_t], [j for *_, j in want], atol=0.0)


def test_global_prefix_sum_vs_pandas():
    from linkgraph.relational import global_prefix_sum

    rng = np.random.default_rng(79)
    n = 8_000
    t = pa.table(
        {
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    got = (
        _df(global_prefix_sum(rd.from_arrow(t).repartition(7), "o", "v"))
        .sort_values("o")
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values("o").reset_index(drop=True)
    df["prefix"] = df["v"].cumsum() - df["v"]
    assert got["prefix"].tolist() == df["prefix"].tolist()
    assert got["o"].tolist() == df["o"].tolist()


def test_cross_source_novelty_planted():
    import tempfile

    from linkgraph.relational import cross_source_novel_docs

    rows = [
        # text shared ACROSS sources -> not novel anywhere
        (1, "shared across", "A"),
        (2, "shared across", "B"),
        # duplicated WITHIN one source -> still novel (both rows count)
        (3, "dup within A", "A"),
        (4, "dup within A", "A"),
        # unique texts
        (5, "only in A", "A"),
        (6, "only in B", "B"),
        (7, "only in C", "C"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        import os

        import pyarrow.parquet as pq

        pq.write_table(t, os.path.join(d, "documents.parquet"))
        got = (
            _df(cross_source_novel_docs(d))
            .sort_values("source")
            .reset_index(drop=True)
        )
    assert got["source"].tolist() == ["A", "B", "C"]
    assert got["n_novel"].tolist() == [3, 1, 1]


def test_hll_accuracy_and_merge():
    from linkgraph.sketch import (
        HLL_P, hll_distinct, hll_estimate, hll_merge, hll_partial,
    )

    rng = np.random.default_rng(17)
    vals = rng.integers(0, 80_000, 400_000).astype(np.int64)
    n_true = len(np.unique(vals))
    bound = 3.0 * 1.04 / np.sqrt(1 << HLL_P)

    single = hll_partial(pa.array(vals))
    est = hll_estimate(single)
    assert abs(est - n_true) / n_true <= bound

    # shard-order / sharding invariance: elementwise-max merge of any
    # split equals the single-pass registers exactly
    parts = [hll_partial(pa.array(c)) for c in np.array_split(vals, 9)]
    assert np.array_equal(hll_merge(parts), single)
    assert np.array_equal(hll_merge(list(reversed(parts))), single)

    # distributed pass at two parallelism levels → identical estimate
    t = pa.table({"x": vals})
    e1 = hll_distinct(rd.from_arrow(t).repartition(2), "x")
    e2 = hll_distinct(rd.from_arrow(t).repartition(13), "x")
    assert e1 == e2 == est


def test_hll_by_key_within_bound():
    from linkgraph.sketch import hll_distinct_by_key

    rng = np.random.default_rng(23)
    keys = rng.integers(0, 4, 200_000).astype(np.int64)
    # per-key distinct cardinality scales with the key id
    vals = rng.integers(0, 1, 200_000).astype(np.int64)
    for k in range(4):
        m = keys == k
        vals[m] = rng.integers(0, 500 * (k + 1) ** 3, int(m.sum()))
    t = pa.table({"k": keys, "x": vals})
    out = (
        hll_distinct_by_key(rd.from_arrow(t).repartition(6), "k", "x", p=12)
        .to_pandas()
        .set_index("k")["n_approx"]
    )
    bound = 3.0 * 1.04 / np.sqrt(1 << 12)
    for k in range(4):
        n_true = len(np.unique(vals[keys == k]))
        assert abs(out[k] - n_true) / n_true <= bound, (k, out[k], n_true)


def test_rolling_median_matches_duckdb_window():
    import duckdb

    from linkgraph import relational as R

    rng = np.random.default_rng(31)
    n = 20_000
    t = pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 300, n).astype(np.int64),
            "ts": rng.integers(0, 10_000_000, n).astype("datetime64[us]"),
            "value": np.round(rng.normal(50, 20, n), 6),
        }
    )
    import os
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="lg_rollmed_")
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = (
        R.user_event_rolling_median(d)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        f"""
        SELECT event_id, user_id,
               quantile_disc(value, 0.5) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll_median
        FROM read_parquet('{d}/events.parquet') ORDER BY event_id
        """
    ).fetchdf()
    assert (got["roll_median"].to_numpy() == want["roll_median"].to_numpy()).all()


def test_chunk_documents_windows():
    """Window/stride edge cases: short doc (one chunk), exact-fit, tail
    chunk shorter than stride, empty text, full token coverage."""
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.relational import chunk_documents

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    rows = {
        1: words(5, "a"),      # < size -> 1 chunk of 5
        2: words(8, "b"),      # == size -> 1 chunk
        3: words(9, "c"),      # size+1 -> 2 chunks (0..7, 6..8)
        4: words(20, "d"),     # 1 + ceil(12/6) = 3 chunks
        5: "",                 # split(' ') -> [""] -> one empty chunk
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(rows), pa.int64()),
            "text": pa.array(list(rows.values()), pa.string()),
        }
    )
    got = (
        chunk_documents(rd.from_arrow(t).repartition(2), size=8, stride=6)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    n_chunks = got.groupby("doc_id")["chunk_id"].count().to_dict()
    assert n_chunks == {1: 1, 2: 1, 3: 2, 4: 3, 5: 1}
    d3 = got[got.doc_id == 3]
    assert list(d3.chunk_text) == [words(8, "c"), "c6 c7 c8"]
    assert list(d3.n_tokens) == [8, 3]
    # every token of doc 4 appears in some chunk, in order
    d4 = got[got.doc_id == 4]
    toks = set()
    for txt in d4.chunk_text:
        toks.update(txt.split(" "))
    assert toks == set(words(20, "d").split(" "))
    assert got[got.doc_id == 5].chunk_text.iloc[0] == ""

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(rd.from_arrow(t), size=4, stride=5)


def test_ntile_matches_duckdb_window():
    """NTILE bucket-size semantics (first n%k buckets one larger) on
    random group sizes incl. groups smaller than k."""
    import os
    import tempfile

    import duckdb
    import pyarrow.parquet as pq

    from linkgraph import relational as R

    rng = np.random.default_rng(41)
    n = 5_003
    t = pa.table(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_orderpriority": np.array(
                [f"P{int(x)}" for x in rng.integers(0, 7, n)], dtype=object
            ),
            "o_totalprice": np.round(rng.uniform(10, 1000, n), 2),
        }
    )
    # one tiny group (< 4 rows) to pin the n<k branch
    t = pa.concat_tables(
        [
            t,
            pa.table(
                {
                    "o_orderkey": pa.array([n + 1, n + 2], pa.int64()),
                    "o_orderpriority": pa.array(["TINY", "TINY"]),
                    "o_totalprice": pa.array([5.0, 6.0]),
                }
            ),
        ]
    )
    d = tempfile.mkdtemp(prefix="lg_ntile_")
    pq.write_table(t, os.path.join(d, "orders.parquet"))
    got = (
        R.order_price_ntile(d)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        f"""
        SELECT o_orderkey,
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM read_parquet('{d}/orders.parquet') ORDER BY o_orderkey
        """
    ).fetchdf()
    assert (got["quartile"].to_numpy() == want["quartile"].to_numpy()).all()


def test_window_distinct_users_hot_window_skew():
    """90% of events in ONE window (viral spike): the two-level distinct
    plan must stay correct — and never needs the hot window's user set in
    a single task."""
    import os
    import tempfile

    import duckdb
    import pyarrow.parquet as pq

    from linkgraph import relational as R

    rng = np.random.default_rng(43)
    n = 50_000
    hot = rng.random(n) < 0.9
    base = np.datetime64("2025-01-01T00:00:00", "us")
    offs = np.where(
        hot,
        rng.integers(0, 15 * 60 * 10**6, n),            # hot 15-min window
        rng.integers(15 * 60 * 10**6, 86_400 * 10**6, n),
    )
    t = pa.table(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": base + offs.astype("timedelta64[us]"),
            "user_id": rng.integers(0, 2_000, n).astype(np.int64),
            "event_type": np.array(["click"] * n, dtype=object),
            "value": np.zeros(n),
        }
    )
    d = tempfile.mkdtemp(prefix="lg_wdu_")
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = (
        R.window_distinct_users(d)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        f"""
        SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000)
                 AS window_start,
               count(DISTINCT user_id) AS n_users
        FROM read_parquet('{d}/events.parquet')
        GROUP BY window_start ORDER BY window_start
        """
    ).fetchdf()
    assert len(got) == len(want)
    assert (got["n_users"].to_numpy() == want["n_users"].to_numpy()).all()
    # the hot window saw (almost surely) every user
    assert got["n_users"].max() == 2_000


def test_chunk_documents_property_reconstruction():
    """Property (random corpora): concatenating each doc's chunk tokens
    with stride-overlap removed reconstructs the doc's token stream
    exactly, and every chunk except the last has exactly `size` tokens."""
    import pyarrow as pa
    import ray.data as rd
    from hypothesis import given, settings, strategies as st

    from linkgraph.relational import chunk_documents

    token = st.text(alphabet="abcxyz", min_size=1, max_size=4)

    @settings(max_examples=20, deadline=None)
    @given(
        docs=st.lists(
            st.lists(token, min_size=0, max_size=40), min_size=1, max_size=6
        ),
        size=st.integers(2, 10),
        stride_off=st.integers(1, 5),
    )
    def check(docs, size, stride_off):
        stride = max(1, size - stride_off)
        texts = [" ".join(d) for d in docs]
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = (
            chunk_documents(
                rd.from_arrow(t), size=size, stride=min(stride, size)
            )
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
        )
        stride = min(stride, size)
        for i, txt in enumerate(texts):
            toks = txt.split(" ")
            rows = out[out.doc_id == i]
            assert len(rows) >= 1
            recon = []
            for _, r in rows.iterrows():
                ctoks = r.chunk_text.split(" ")
                start = int(r.chunk_id) * stride
                assert ctoks == toks[start : start + size]
                recon = recon[:start] + ctoks
            assert recon == toks

    check()


def test_split_hash_engine_mode():
    """LINKGRAPH_SPLIT_HASH=engine swaps md5 for vectorized splitmix64
    (VERDICT r4 stretch #8): same schema/determinism contract, different
    (non-SQL) hash; the md5 default stays the oracle-gated path."""
    import pytest

    from linkgraph.relational import (
        _split_hash,
        doc_split_assignment,
        stratified_sample_docs,
    )

    sf = "/root/testdata/sf0.001"
    # hash helper: engine path is vectorized, nonnegative, deterministic
    ids = np.arange(10_000, dtype=np.int64)
    h1 = _split_hash(ids, "engine")
    h2 = _split_hash(ids, "engine")
    assert (h1 == h2).all() and (h1 >= 0).all()
    # ~uniform mod 100 (loose 3-sigma bound)
    frac = float((h1 % 100 < 10).mean())
    assert abs(frac - 0.10) < 3 * np.sqrt(0.1 * 0.9 / len(ids))

    with pytest.raises(ValueError):
        doc_split_assignment(sf, hash_mode="sha1")

    md5_split = doc_split_assignment(sf).to_pandas()
    eng_split = doc_split_assignment(sf, hash_mode="engine").to_pandas()
    assert list(md5_split.columns) == list(eng_split.columns)
    assert len(md5_split) == len(eng_split)
    assert set(eng_split.split) <= {"train", "val"}
    # engine mode is reproducible
    eng2 = doc_split_assignment(sf, hash_mode="engine").to_pandas()
    assert eng_split.sort_values("doc_id").split.tolist() == (
        eng2.sort_values("doc_id").split.tolist()
    )

    samp = stratified_sample_docs(sf, hash_mode="engine").to_pandas()
    assert list(samp.columns) == ["lang", "doc_id", "rk"]
    assert (samp.groupby("lang").size() <= 5).all()
    assert (samp.rk >= 1).all() and (samp.rk <= 5).all()
    samp2 = stratified_sample_docs(sf, hash_mode="engine").to_pandas()
    assert samp.sort_values(["lang", "rk"]).doc_id.tolist() == (
        samp2.sort_values(["lang", "rk"]).doc_id.tolist()
    )
