"""Extraction stage: byte-identical text per url, href recovery, normalization."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from linkgraph import extract, graph as G, oracle, synth
from linkgraph.cc import connected_components


def test_normalize_url():
    base = "https://c0.example.org/p/1"
    assert extract.normalize_url("/p/2", base) == "https://c0.example.org/p/2"
    assert (
        extract.normalize_url("https://c1.example.org/p/9#frag", base)
        == "https://c1.example.org/p/9"
    )
    assert extract.normalize_url("mailto:x@y.z", base) is None
    assert extract.normalize_url("javascript:void(0)", base) is None
    assert extract.normalize_url("#frag", base) is None
    assert (
        extract.normalize_url("HTTPS://C0.Example.ORG/Path?q=1", base)
        == "https://c0.example.org/Path?q=1"
    )


def test_extract_text_strips_script_style():
    html = (
        b"<html><head><title>t one</title><style>p {color: red}</style></head>"
        b"<body><script>var a = 1 < 2;</script><p>hello &amp; world</p></body></html>"
    )
    assert extract.extract_text(html) == "t one hello & world"


def test_golden_text_byte_identical():
    pages, _, _ = synth.make_pages(40, seed=9)
    got = extract.pages_to_text(rd.from_arrow(pages), concurrency=2, batch_size=16)
    got_map = {r["url"]: r["text"] for r in got.take_all()}
    want_map = {u.as_py(): t.as_py() for u, t in zip(pages["url"], pages["text"])}
    assert got_map == want_map


def test_extraction_determinism_across_batching():
    pages, _, _ = synth.make_pages(30, seed=4)
    a = extract.pages_to_text(rd.from_arrow(pages), concurrency=1, batch_size=5)
    b = extract.pages_to_text(rd.from_arrow(pages).repartition(7), concurrency=3, batch_size=2)
    am = {r["url"]: r["text"] for r in a.take_all()}
    bm = {r["url"]: r["text"] for r in b.take_all()}
    assert am == bm


def canonical_pairs(src, dst):
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep])
    hi = np.maximum(src[keep], dst[keep])
    return set(zip(lo.tolist(), hi.tolist()))


def test_href_extraction_recovers_planted_graph():
    pages, planted_edges, labels = synth.make_pages(60, seed=2)
    url_edges = extract.pages_to_url_edges(rd.from_arrow(pages), concurrency=2, batch_size=16)
    ids = extract.url_edges_to_ids(url_edges)
    got = ids.take_all()
    got_src = np.array([r["src"] for r in got])
    got_dst = np.array([r["dst"] for r in got])

    # map planted vertex indices to hashed url ids
    bounds = synth.component_bounds(60, 3)
    comp_index = np.searchsorted(bounds, np.arange(60), side="right") - 1
    hid = np.array(
        [extract.url_to_id(synth.page_url(i, int(comp_index[i]))) for i in range(60)]
    )
    want_src = hid[planted_edges["src"].to_numpy()]
    want_dst = hid[planted_edges["dst"].to_numpy()]
    assert canonical_pairs(got_src, got_dst) == canonical_pairs(want_src, want_dst)


def test_pages_to_cc_end_to_end():
    """Flagship slice: pages → extract → edge table → CC, vs planted labels."""
    pages, _, labels = synth.make_pages(50, seed=6, num_components=4)
    url_edges = extract.pages_to_url_edges(rd.from_arrow(pages), concurrency=2, batch_size=16)
    edges = extract.url_edges_to_ids(url_edges)
    verts = extract.url_id_map(rd.from_arrow(pages)).select_columns(["vertex"])
    res = connected_components(edges, vertices=verts, num_partitions=4)

    bounds = synth.component_bounds(50, 4)
    comp_index = np.searchsorted(bounds, np.arange(50), side="right") - 1
    hid = np.array(
        [extract.url_to_id(synth.page_url(i, int(comp_index[i]))) for i in range(50)]
    )
    # expected: min hashed id within each planted component
    exp = {}
    for i in range(50):
        comp = labels[i]
        members = np.nonzero(labels == comp)[0]
        exp[int(hid[i])] = int(hid[members].min())
    got = {r["vertex"]: r["label"] for r in res.labels.take_all()}
    assert got == exp
    assert res.num_components == 4


def test_vector_normalize_matches_scalar_on_adversarial_hrefs():
    """The polars fast paths must agree byte-for-byte with normalize_url on
    every href class — including dot-segment relative paths ("/a/../b",
    "/..", "/a/./b") which urljoin collapses, and bare-"?" absolute hrefs
    which urlsplit/urlunsplit strips (round-5 ADVICE divergences)."""
    base = "http://h.example.com/x/y"
    hrefs = [
        "/a/../b",
        "/a/./b",
        "/..",
        "/.",
        "/..?q=1",
        "/.hidden/ok",
        "/a.b/c",
        "https://host.example.com/p?",
        "https://host.example.com/p?q=1",
        "https://host.example.com/a/../b",
        "/plain/path",
        "//proto.relative.com/z",
        "rel/child",
        "#frag",
        "mailto:x@y.z",
        "/ok?x=1&y=2",
    ]
    tbl = extract._normalize_edges_vector([base] * len(hrefs), hrefs)
    got = list(
        zip(tbl["src_url"].to_pylist(), tbl["dst_url"].to_pylist())
    )
    want, seen = [], set()
    for h in hrefs:
        u = extract.normalize_url(h, base)
        if u is not None and (base, u) not in seen:
            seen.add((base, u))
            want.append((base, u))
    assert got == want


def test_task_fused_mode_identical_to_actor_pool():
    """compute='tasks' (read-fused, default) and compute='actors' must
    produce byte-identical extractions — the mode only moves WHERE the
    scan runs (plasma round-trip vs fused task), never what it computes."""
    import ray.data as rd

    from linkgraph import extract, synth

    pages, _, _ = synth.make_pages(300, seed=8, num_components=4, filler_words=50)
    ds = rd.from_arrow(pages)
    e_tasks = sorted(
        (r["src_url"], r["dst_url"])
        for r in extract.pages_to_url_edges(ds, compute="tasks").take_all()
    )
    e_actors = sorted(
        (r["src_url"], r["dst_url"])
        for r in extract.pages_to_url_edges(ds, compute="actors").take_all()
    )
    assert e_tasks == e_actors and len(e_tasks) > 0
    t_tasks = sorted(
        (r["url"], r["text"])
        for r in extract.pages_to_text(ds, compute="tasks").take_all()
    )
    t_actors = sorted(
        (r["url"], r["text"])
        for r in extract.pages_to_text(ds, compute="actors").take_all()
    )
    assert t_tasks == t_actors and len(t_tasks) == 300
    # golden-text contract holds with filler pages in both modes
    golden = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    assert all(golden[u] == txt for u, txt in t_tasks)


def test_one_scan_pipeline_matches_two_scan():
    """pages_to_edges_and_vertices (one pages scan) must produce exactly
    the edge table and vertex universe the two-scan recipe produced —
    including an isolated page with no surviving links."""
    import pyarrow as pa
    import ray.data as rd

    from linkgraph import extract, synth

    pages, _, _ = synth.make_pages(120, seed=5, num_components=3)
    # append an isolated page: only a self-link (dropped as a self-loop)
    iso_url = "https://isolated.example.org/only"
    iso = pa.table(
        {
            "url": [iso_url],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array(
                [f'<a href="{iso_url}">self</a>'.encode()], pa.binary()
            ),
            "text": [""],
            "lang": ["en"],
        }
    )
    all_pages = pa.concat_tables([pages, iso], promote_options="permissive")
    ds = rd.from_arrow(all_pages)

    edges1, verts1 = extract.pages_to_edges_and_vertices(ds)
    e1 = sorted((r["src"], r["dst"]) for r in edges1.take_all())
    v1 = sorted(r["vertex"] for r in verts1.take_all())

    e2 = sorted(
        (r["src"], r["dst"])
        for r in extract.url_edges_to_ids(
            extract.pages_to_url_edges(ds)
        ).take_all()
    )
    v2 = sorted(
        r["vertex"]
        for r in extract.url_id_map(ds).select_columns(["vertex"]).take_all()
    )
    assert e1 == e2 and v1 == v2 and len(v1) == 121

    # the pipeline labels the isolated page as its own singleton component
    from linkgraph.pipelines import pages_pipeline

    res = pages_pipeline(ds, num_partitions=4)
    assert res.num_components == 3 + 1
