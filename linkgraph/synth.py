"""Deterministic fixture generators (pages + planted graphs).

Seeded reimplementation of the reference's graph generator
(``tools/generate_graph.c:9-85``), which is *unseeded* (``srand(time)``,
``tools/generate_graph.c:25``); we fix the seed so every fixture is
reproducible (SURVEY.md §4 determinism row).  The planted-component
construction is the same: contiguous vertex ranges per component, a spanning
tree linking each vertex to a random earlier vertex of its component
(``tools/generate_graph.c:49-53``), plus random intra-component extra edges
(``tools/generate_graph.c:57-66``).

``make_pages`` additionally wraps a planted graph into Common-Crawl-style
pages (schemas.PAGES): each page's ``html`` embeds its out-links as
``<a href>`` tags (with realistic noise: relative links, fragments, mailto:,
javascript:, duplicates, self-links) and its golden ``text`` column is the
exact byte string the extractor must reproduce (BASELINE.json per-row
invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu graph vertex edge component label rank crawl page link "
    "anchor data stream batch shuffle arrow block actor"
).split()


def component_bounds(num_vertices: int, num_components: int) -> np.ndarray:
    """Start offsets (len C+1) of contiguous, near-equal component ranges."""
    base = num_vertices // num_components
    rem = num_vertices % num_components
    sizes = np.full(num_components, base, dtype=np.int64)
    sizes[:rem] += 1
    return np.concatenate([[0], np.cumsum(sizes)])


def make_planted_graph(
    num_vertices: int,
    num_components: int,
    edges_per_vertex: int = 4,
    seed: int = 0,
) -> tuple[pa.Table, np.ndarray]:
    """Planted-component undirected graph with known ground truth.

    Returns ``(edges, expected_labels)`` where ``edges`` is a directed edge
    list (one row per generated edge, unsymmetrized, may contain parallel
    edges exactly like the reference generator) and ``expected_labels[v]`` is
    the min-id canonical component label of ``v``.
    """
    if num_components < 1 or num_vertices < num_components:
        raise ValueError("need num_vertices >= num_components >= 1")
    rng = np.random.default_rng(seed)
    bounds = component_bounds(num_vertices, num_components)
    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []
    labels = np.empty(num_vertices, dtype=np.int64)
    for c in range(num_components):
        lo, hi = int(bounds[c]), int(bounds[c + 1])
        n = hi - lo
        labels[lo:hi] = lo
        if n > 1:
            # spanning tree: v -> uniform earlier vertex in [lo, v)
            v = np.arange(lo + 1, hi, dtype=np.int64)
            u = lo + (rng.random(n - 1) * (v - lo)).astype(np.int64)
            srcs.append(u)
            dsts.append(v)
            # extra intra-component edges (parallel edges/self-pairs possible
            # upstream of canonicalization, as in the reference generator)
            n_extra = max(0, n * max(edges_per_vertex - 1, 0) // 2)
            if n_extra:
                a = lo + (rng.random(n_extra) * n).astype(np.int64)
                b = lo + (rng.random(n_extra) * n).astype(np.int64)
                keep = a != b
                srcs.append(a[keep])
                dsts.append(b[keep])
    src = np.concatenate(srcs) if srcs else np.empty(0, dtype=np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, dtype=np.int64)
    edges = pa.table({"src": src, "dst": dst})
    return edges, labels


def golden_micro() -> tuple[pa.Table, np.ndarray]:
    """The reference's golden micro-graph (``data/test_small.mtx:1-13``).

    6 vertices, 5 edges, 2 components; expected min-id labels
    ``[0, 0, 0, 3, 3, 3]`` and 1 triangle (0-1-2).
    """
    edges = pa.table(
        {
            "src": np.array([0, 1, 0, 3, 4], dtype=np.int64),
            "dst": np.array([1, 2, 2, 4, 5], dtype=np.int64),
        }
    )
    return edges, np.array([0, 0, 0, 3, 3, 3], dtype=np.int64)


def make_hub_graph(
    n_spokes: int, n_chains: int, chain_len: int = 8, seed: int = 0
) -> tuple[pa.Table, np.ndarray]:
    """One huge hub (vertex 0, degree ``n_spokes``) + disjoint chains.

    Exercises heavy-key skew — the analogue of the reference's giant
    component that Afforest samples and skips (``src/cc_openmp.c:596-612``).
    Expected: ``1 + n_chains`` components.
    """
    hub_src = np.zeros(n_spokes, dtype=np.int64)
    hub_dst = np.arange(1, n_spokes + 1, dtype=np.int64)
    labels = np.zeros(1 + n_spokes + n_chains * chain_len, dtype=np.int64)
    srcs = [hub_src]
    dsts = [hub_dst]
    base = n_spokes + 1
    for c in range(n_chains):
        lo = base + c * chain_len
        v = np.arange(lo, lo + chain_len, dtype=np.int64)
        srcs.append(v[:-1])
        dsts.append(v[1:])
        labels[lo : lo + chain_len] = lo
    edges = pa.table({"src": np.concatenate(srcs), "dst": np.concatenate(dsts)})
    return edges, labels


# ---------------------------------------------------------------------------
# Pages fixture
# ---------------------------------------------------------------------------

def page_url(vertex: int, component: int) -> str:
    """Canonical URL of a planted page (already in normalized form)."""
    return f"https://c{component}.example.org/p/{vertex}"


def make_pages(
    n_pages: int,
    seed: int = 0,
    num_components: int = 3,
    edges_per_vertex: int = 3,
    filler_words: int = 0,
) -> tuple[pa.Table, pa.Table, np.ndarray]:
    """Pages table wrapping a planted link graph.

    Returns ``(pages, edges, expected_labels)``: ``pages`` conforms to
    ``schemas.PAGES``; ``edges`` is the planted *vertex-id* edge table the
    extractor should recover (before symmetrization); ``expected_labels`` the
    min-id component labels.  The golden ``text`` column is exactly what
    ``extract.extract_text`` must produce, byte-identically, per url.

    ``filler_words`` > 0 appends that many extra body words per page (a
    30-word seeded sample tiled — cheap to build, full cost to scan), so
    pages reach realistic Common-Crawl sizes (~1500 words ≈ 10-15 KB of
    html).  The default fixture's ~1 KB pages make extraction almost free
    relative to pipeline orchestration, which HIDES the extractor's CPU
    scaling; benchmark fixtures should pass a realistic size (the scaling
    record does, BENCH/BASELINE.md).  Filler words join the golden text
    contract like any other body words.
    """
    rng = np.random.default_rng(seed)
    edges_tbl, labels = make_planted_graph(
        n_pages, num_components, edges_per_vertex, seed=seed + 1
    )
    comp_of = labels  # label == component start == component id anchor
    bounds = component_bounds(n_pages, num_components)
    comp_index = np.searchsorted(bounds, np.arange(n_pages), side="right") - 1

    out_links: list[list[int]] = [[] for _ in range(n_pages)]
    for u, v in zip(edges_tbl["src"].to_numpy(), edges_tbl["dst"].to_numpy()):
        out_links[int(u)].append(int(v))

    langs = ["en", "de", "fr", "el", "es"]
    urls, tss, htmls, texts, langcol = [], [], [], [], []
    epoch = np.datetime64("2025-06-01T00:00:00", "us")
    for i in range(n_pages):
        ci = int(comp_index[i])
        url = page_url(i, ci)
        title_words = [
            _WORDS[w] for w in rng.integers(0, len(_WORDS), size=3)
        ]
        body_words = [
            _WORDS[w] for w in rng.integers(0, len(_WORDS), size=int(rng.integers(8, 40)))
        ]
        # token stream in document order = golden text
        tokens: list[str] = list(title_words)
        html_parts = [
            "<html><head>",
            f"<title>{' '.join(title_words)}</title>",
            '<style>body { color: #222; }</style>',
            "</head><body>",
            '<script type="text/javascript">var x = 1 < 2;</script>',
        ]
        # interleave paragraphs and links
        para: list[str] = []
        links = list(dict.fromkeys(out_links[i]))  # dedup, keep order
        for w in body_words:
            para.append(w)
        html_parts.append("<p>" + " ".join(para) + "</p>")
        tokens.extend(para)
        if filler_words > 0:
            base = [
                _WORDS[w] for w in rng.integers(0, len(_WORDS), size=30)
            ]
            reps = -(-filler_words // len(base))  # ceil
            fill = (base * reps)[:filler_words]
            html_parts.append("<p>" + " ".join(fill) + "</p>")
            tokens.extend(fill)
        for j in links:
            cj = int(comp_index[j])
            anchor = _WORDS[int(rng.integers(0, len(_WORDS)))]
            style = int(rng.integers(0, 4))
            target = page_url(j, cj)
            if style == 0:
                href = target  # absolute
            elif style == 1 and cj == ci:
                href = f"/p/{j}"  # relative to site root
            elif style == 2:
                href = target + "#section-2"  # fragment to strip
            else:
                href = target
            html_parts.append(f'<a href="{href}">{anchor}</a>')
            tokens.append(anchor)
            if style == 3:
                html_parts.append(f'<a href="{href}">{anchor}</a>')  # duplicate
                tokens.append(anchor)
        # noise links the extractor must ignore
        html_parts.append('<a href="mailto:admin@example.org">contact</a>')
        tokens.append("contact")
        html_parts.append('<a href="javascript:void(0)">noop</a>')
        tokens.append("noop")
        html_parts.append(f'<a href="{url}">self</a>')  # self-link -> self-loop
        tokens.append("self")
        html_parts.append("</body></html>")

        urls.append(url)
        tss.append(epoch + np.timedelta64(i * 1_000_000, "us"))
        htmls.append("".join(html_parts).encode("utf-8"))
        texts.append(" ".join(tokens))
        langcol.append(langs[i % len(langs)])

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langcol, pa.string()),
        }
    )
    return pages, edges_tbl, labels
