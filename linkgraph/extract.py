"""HTML → href/text extraction over Common-Crawl-style pages.

The reference has no extractor (its input is a pre-built MTX edge list,
``src/mtx_reader.c:78-214``); this stage is specified by BASELINE.json's
north rule: parse hrefs out of ``html`` via ``map_batches`` over zero-copy
Arrow with **stateful actor-pool extractors** whose extracted text is
**byte-identical per url** across runs, partitionings, and CPU counts.

Determinism: extraction is a pure function of the html bytes + page url —
compiled regexes only, no locale, no wall clock, fixed parser version
(``PARSER_VERSION``).  Stateful setup (regex compilation) happens once per
actor in ``__init__``; per-batch work is ``__call__`` (SURVEY.md §7 actor
pool rules).
"""

from __future__ import annotations

import html as _htmlmod
import re
from urllib.parse import urldefrag, urljoin, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph.runtime import resolve_concurrency

PARSER_VERSION = 1

_SKIP_SCHEMES = ("mailto:", "javascript:", "data:", "tel:", "ftp:", "file:", "about:")


def _compile():
    return {
        "script": re.compile(r"<script\b.*?</script\s*>", re.I | re.S),
        "style": re.compile(r"<style\b.*?</style\s*>", re.I | re.S),
        "comment": re.compile(r"<!--.*?-->", re.S),
        "tag": re.compile(r"<[^>]*>"),
        "ws": re.compile(r"\s+"),
        "href": re.compile(
            r"""<a\b[^>]*?\bhref\s*=\s*("([^"]*)"|'([^']*)')""", re.I | re.S
        ),
    }


def extract_text(html_bytes: bytes, regexes: dict | None = None) -> str:
    """Visible text: drop script/style/comments, strip tags, unescape,
    collapse whitespace.  Pure; byte-stable per input."""
    rx = regexes or _compile()
    s = html_bytes.decode("utf-8", errors="replace")
    s = rx["script"].sub(" ", s)
    s = rx["style"].sub(" ", s)
    s = rx["comment"].sub(" ", s)
    s = rx["tag"].sub(" ", s)
    s = _htmlmod.unescape(s)
    return rx["ws"].sub(" ", s).strip()


def normalize_url(href: str, base_url: str) -> str | None:
    """Resolve + canonicalize an href; None for non-link schemes.

    Lowercases scheme/host, strips fragments, keeps http(s) only.
    """
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    low = href.lower()
    if any(low.startswith(p) for p in _SKIP_SCHEMES):
        return None
    try:
        resolved = urljoin(base_url, href)
        resolved, _ = urldefrag(resolved)
        parts = urlsplit(resolved)
    except ValueError:
        return None
    if parts.scheme not in ("http", "https"):
        return None
    return urlunsplit(
        (parts.scheme.lower(), parts.netloc.lower(), parts.path, parts.query, "")
    )


def extract_hrefs(
    html_bytes: bytes, base_url: str, regexes: dict | None = None
) -> list[str]:
    """Ordered, de-duplicated, normalized out-links of one page."""
    rx = regexes or _compile()
    s = html_bytes.decode("utf-8", errors="replace")
    out: list[str] = []
    seen: set[str] = set()
    for m in rx["href"].finditer(s):
        raw = m.group(2) if m.group(2) is not None else m.group(3)
        url = normalize_url(_htmlmod.unescape(raw), base_url)
        if url is not None and url not in seen:
            seen.add(url)
            out.append(url)
    return out


# Vectorized-normalization fast paths.  Measured on the synth pages fixture:
# the per-href Python ``normalize_url`` (urljoin/urlsplit/urlunsplit) is
# ~93% of extractor wall (0.306 s of 0.308 s per 5k pages) while the regex
# scan is 7% — so the scale lever is normalizing hrefs in bulk, not a
# faster tag scan.  A href qualifies for a fast path only when the
# vectorized result PROVABLY equals ``normalize_url``'s:
#
# - _FAST_ABS: absolute http(s), scheme+netloc already lowercase, no
#   userinfo/fragment/whitespace/backslash → normalize_url is the identity
#   (urljoin of an absolute url returns it; urlsplit/urlunsplit round-trip
#   is exact for this charset).
# - _FAST_REL: root-relative path (single leading ``/``), base url itself
#   canonical → result is base's scheme://netloc prefix + href.
#
# Everything else (protocol-relative ``//``, dot-segments, uppercase
# hosts, userinfo, percent-escaped netlocs, control chars) falls back to
# the scalar ``normalize_url``, so the two paths can never diverge on the
# cases the fast regexes don't prove.
_FAST_ABS_RE = r"^https?://[a-z0-9.\-]+(:[0-9]+)?(/[^?#\s\\]*)?(\?[^#\s\\]+)?$"
_FAST_REL_RE = r"^/$|^/[^/#\s\\][^#\s\\]*$"
# Dot-only path segments ("/.", "/..", terminated by "/", "?" or end) are
# removed by urljoin's RFC-3986 merge for *relative* hrefs, so the
# base_prefix+href shortcut would diverge — route them to the scalar path.
# (Absolute hrefs keep their dot segments under urljoin, so _FAST_ABS is
# unaffected; the \+ in its query group forces bare-"?" hrefs to the scalar
# path, whose urlsplit/urlunsplit round-trip drops the empty query.)
_DOT_SEG_RE = r"/\.\.?([/?]|$)"
_FAST_BASE_RE = r"^https?://[a-z0-9.\-]+(:[0-9]+)?(/|$)"
_BASE_PREFIX_RE = r"^(https?://[a-z0-9.\-]+(?::[0-9]+)?)"
_SKIP_SCHEME_RE = r"^(mailto|javascript|data|tel|ftp|file|about):"


def _normalize_edges_vector(src: list[str], raw: list[str]) -> pa.Table:
    """(src_url, raw-href) rows → normalized (src_url, dst_url) edge rows.

    Vectorized twin of ``normalize_url`` + the per-page ordered dedup of
    ``extract_hrefs``: polars string kernels classify each href, the fast
    classes resolve in bulk, the residue goes through the scalar function.
    Drop rules (empty, ``#``-only, skip schemes) replicate
    ``normalize_url``'s pre-join None conditions exactly.
    """
    from linkgraph.runtime import import_polars

    empty = pa.table(
        {"src_url": pa.array([], pa.string()), "dst_url": pa.array([], pa.string())}
    )
    if not raw:
        return empty
    pl = import_polars()
    df = pl.DataFrame({"src_url": src, "href": raw}).with_row_index("_i")
    df = df.with_columns(pl.col("href").str.strip_chars().alias("href"))
    df = df.filter(
        (pl.col("href").str.len_bytes() > 0)
        & ~pl.col("href").str.starts_with("#")
        & ~pl.col("href").str.to_lowercase().str.contains(_SKIP_SCHEME_RE)
    )
    if len(df) == 0:
        return empty
    # fragment strip pre-join == urldefrag post-join (the fragment never
    # affects the resolved non-fragment part)
    df = df.with_columns(pl.col("href").str.replace(r"#.*$", "").alias("href"))
    base_prefix = pl.col("src_url").str.extract(_BASE_PREFIX_RE, 1)
    dst = (
        pl.when(pl.col("href").str.contains(_FAST_ABS_RE))
        .then(pl.col("href"))
        .when(
            pl.col("href").str.contains(_FAST_REL_RE)
            & ~pl.col("href").str.contains(_DOT_SEG_RE)
            & pl.col("src_url").str.contains(_FAST_BASE_RE)
        )
        .then(base_prefix + pl.col("href"))
        .otherwise(None)
    )
    df = df.with_columns(dst.alias("dst_url"))
    slow = df.filter(pl.col("dst_url").is_null())
    if len(slow):
        vals = [
            normalize_url(h, b)
            for h, b in zip(slow["href"].to_list(), slow["src_url"].to_list())
        ]
        slow = slow.with_columns(pl.Series("dst_url", vals, dtype=pl.String))
        df = pl.concat([df.filter(pl.col("dst_url").is_not_null()), slow]).sort(
            "_i"
        )
    df = df.filter(pl.col("dst_url").is_not_null()).unique(
        subset=["src_url", "dst_url"], keep="first", maintain_order=True
    )
    return pa.table(
        {
            "src_url": df["src_url"].to_arrow().cast(pa.string()),
            "dst_url": df["dst_url"].to_arrow().cast(pa.string()),
        }
    )


class HrefExtractor:
    """Actor-pool stage: pages batch → (src_url, dst_url) edge rows.

    Regexes compile once per actor (``__init__``); each ``__call__``
    processes one Arrow batch (SURVEY.md §2.3 stateful-stage mapping).
    The per-page regex scan collects raw hrefs; normalization — the
    measured 93%-of-wall term — runs vectorized over the whole batch
    (``_normalize_edges_vector``), per-page ordered dedup included.
    """

    def __init__(self) -> None:
        self.rx = _compile()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        finditer = self.rx["href"].finditer
        src_out: list[str] = []
        raw_out: list[str] = []
        for u, h in zip(urls, htmls):
            s = h.decode("utf-8", errors="replace")
            for m in finditer(s):
                raw = m.group(2) if m.group(2) is not None else m.group(3)
                # html entities all start with '&'; skip the unescape call
                # (per-string Python) for the common clean case
                src_out.append(u)
                raw_out.append(raw if "&" not in raw else _htmlmod.unescape(raw))
        return _normalize_edges_vector(src_out, raw_out)


class TextExtractor:
    """Actor-pool stage: pages batch → (url, text) rows (byte-stable)."""

    def __init__(self) -> None:
        self.rx = _compile()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text(h, self.rx) for h in batch["html"].to_pylist()]
        return pa.table(
            {"url": batch["url"], "text": pa.array(texts, pa.string())}
        )


# Per-PROCESS extractor cache for the task-fused mode: Ray reuses worker
# processes across tasks, so compiled-regex state persists exactly like an
# actor's __init__ state — without forcing the html through the object
# store between the read and the extractor.
_TASK_HREF: HrefExtractor | None = None
_TASK_TEXT: TextExtractor | None = None


def _href_extract_task(batch: pa.Table) -> pa.Table:
    global _TASK_HREF
    if _TASK_HREF is None:
        _TASK_HREF = HrefExtractor()
    return _TASK_HREF(batch)


def _text_extract_task(batch: pa.Table) -> pa.Table:
    global _TASK_TEXT
    if _TASK_TEXT is None:
        _TASK_TEXT = TextExtractor()
    return _TASK_TEXT(batch)


def pages_to_url_edges(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    compute: str = "tasks",
) -> rd.Dataset:
    """pages → URL-level edge table.

    ``compute="tasks"`` (default) runs the extractor as task-based
    ``map_batches`` with per-process cached state: the streaming executor
    FUSES it with the upstream read, so the html column — the widest
    bytes in the whole pipeline — is decoded and scanned inside one task
    and never round-trips the object store.  Measured on 512k ~19 KB
    pages (10 GB html): actor pool 6.5 s flat at BOTH 8 and 32 CPUs (the
    read→plasma→actor copy is bandwidth-bound, so CPUs don't help); fused
    tasks 3.7 s at 8 CPUs → 1.2 s at 32 (raw scaling eff 0.79).  At
    100 TB the plasma round-trip of html is the difference between a
    CPU-bound and a memory-bus-bound cluster.

    ``compute="actors"`` keeps the actor-pool stage (north-star shape) —
    the right mode when extractor state is genuinely expensive (an ML
    model, a big dictionary) rather than a few compiled regexes; state
    then lives in ``__init__`` once per actor (SURVEY.md §2.3).

    ``batch_size`` is small because html payloads are wide binary rows
    (memory-aware batching).  Columns are pruned to (url, html) before
    the extractor so text/lang bytes never ship either way.
    """
    pruned = pages.select_columns(["url", "html"])
    if compute == "tasks":
        return pruned.map_batches(
            _href_extract_task, batch_format="pyarrow", batch_size=batch_size
        )
    return pruned.map_batches(
        HrefExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_concurrency(concurrency),
    )


def pages_to_text(
    pages: rd.Dataset,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    compute: str = "tasks",
) -> rd.Dataset:
    """pages → (url, text); the per-url byte-identical deliverable.
    Same task-fused default / actor-pool option as
    ``pages_to_url_edges`` (the extracted bytes are identical in both
    modes — the mode only moves WHERE the scan runs)."""
    pruned = pages.select_columns(["url", "html"])
    if compute == "tasks":
        return pruned.map_batches(
            _text_extract_task, batch_format="pyarrow", batch_size=batch_size
        )
    return pruned.map_batches(
        TextExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_concurrency(concurrency),
    )


def urls_to_ids(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized stable 63-bit vertex ids (int64 ≥ 0) for a url column.

    One seeded xxhash pass over the flat Arrow string buffer (polars,
    C-speed) — the same engine-internal-hash contract as
    ``runtime.content_hash64``: the id is a partitioning/join key that never
    leaves the engine (the extraction oracle is hash-independent by
    construction), so the exact function is free to change between releases.
    Within one environment it is deterministic across processes, workers and
    parallelism levels.  ``>> 1`` keeps the historical non-negative 63-bit
    contract.
    """
    from linkgraph.runtime import import_polars

    pl = import_polars()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, dtype=np.int64)
    h = pl.from_arrow(col).hash(seed=0).to_numpy()
    return (h >> np.uint64(1)).astype(np.int64, copy=False)


def url_to_id(url: str) -> int:
    """Stable 63-bit vertex id of a normalized url (scalar convenience).

    Defined as ``urls_to_ids`` on a 1-row column so scalar and batch paths
    can never diverge; hot paths should call ``urls_to_ids`` directly.
    """
    return int(urls_to_ids(pa.array([url], pa.string()))[0])


def _ids_batch(t: pa.Table) -> pa.Table:
    return pa.table(
        {"src": urls_to_ids(t["src_url"]), "dst": urls_to_ids(t["dst_url"])}
    )


def url_edges_to_ids(url_edges: rd.Dataset) -> rd.Dataset:
    """(src_url, dst_url) → (src, dst) int64 via the stable url hash."""
    return url_edges.map_batches(_ids_batch, batch_format="pyarrow")


def url_id_map(pages: rd.Dataset) -> rd.Dataset:
    """(url, vertex) mapping for joining results back to urls."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"url": t["url"], "vertex": urls_to_ids(t["url"])})

    return pages.select_columns(["url"]).map_batches(fn, batch_format="pyarrow")


def _href_and_marker_task(batch: pa.Table) -> pa.Table:
    """Task-fused extract that ALSO emits one ``(url, NULL)`` marker row
    per input page, so one pages scan yields both the edge table and the
    full vertex universe (isolated pages included).  Output schema:
    ``(src_url: string, dst_url: string?)`` — edge rows have a non-null
    dst."""
    global _TASK_HREF
    if _TASK_HREF is None:
        _TASK_HREF = HrefExtractor()
    edges = _TASK_HREF(batch)
    urls = batch["url"].cast(pa.string())
    markers = pa.table(
        {
            "src_url": urls,
            "dst_url": pa.nulls(len(urls), pa.string()),
        }
    )
    return pa.concat_tables([edges, markers], promote_options="permissive")


def pages_to_edges_and_vertices(
    pages: rd.Dataset, *, batch_size: int = 256
) -> tuple[rd.Dataset, rd.Dataset]:
    """ONE pages scan → (id edge table, vertex-id table incl. isolated
    pages).

    The two-output split that ``pages_pipeline`` needs: branching a lazy
    Dataset re-executes the whole extraction per consumer (Ray Data
    lineage is a tree, not a DAG), and the html scan is by far the most
    expensive pass over a crawl — at 10^12 documents a second scan
    doubles the pipeline's dominant cost.  One task-fused pass emits edge
    rows plus a null-dst marker row per page; the combined table (urls
    only, no html — ~2 % of the input bytes) materializes ONCE and both
    consumers read the cached blocks."""
    combined = pages.select_columns(["url", "html"]).map_batches(
        _href_and_marker_task, batch_format="pyarrow", batch_size=batch_size
    ).materialize()

    def edge_ids(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        e = t.filter(pc.is_valid(t["dst_url"]))
        return pa.table(
            {
                "src": urls_to_ids(e["src_url"]),
                "dst": urls_to_ids(e["dst_url"]),
            }
        )

    def vert_ids(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = t.filter(pc.is_null(t["dst_url"]))
        return pa.table({"vertex": urls_to_ids(m["src_url"])})

    edges = combined.map_batches(edge_ids, batch_format="pyarrow")
    verts = combined.map_batches(vert_ids, batch_format="pyarrow")
    return edges, verts
