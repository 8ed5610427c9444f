"""Scale-path triangle counting: raw-task BSP over dst-range-partitioned
adjacency — no joins, no driver-side vertex state, no degree broadcast.

The dataflow path (``linkgraph.triangles``) broadcasts the degree vector
below a 50 M-vertex gate and falls back to two bucketed joins above it;
both materialize the full wedge set as shuffled rows.  This module closes
wedges with one round of raw Ray tasks over the same dst-sorted blocks the
other kernels already build (``bsp.raw_dst_exchange``), so it has no
per-node state envelope at any vertex count:

1. **prep** — the deduped symmetrized exchange makes blocks dst-disjoint;
   per-dst segment lengths ARE the undirected degrees (global, no shuffle).
2. **degree lookup** — one request/reply task round fetches ``deg[src]``
   for each block's foreign endpoints from their owner ranges (the BSP
   analogue of the reference's ghost-label exchange,
   ``src/mpi/cc_mpi.c:950-1049``).
3. **orient + index** — each block keeps only rows where
   ``(deg, id)(dst) < (deg, id)(src)`` (each undirected edge appears in
   exactly two blocks, once per direction, so exactly one side keeps it —
   the edge-once orientation of ``src/cc_sequential.c:416-429`` under the
   degree total order).  Out-adjacency stays range-partitioned by the
   *lower-ranked* endpoint with zero movement, because that endpoint IS the
   block's dst.  The task also builds a lexsorted membership key array.
4. **wedge close** — per block, all ordered out-neighbor pairs (x, y) are
   emitted (vectorized repeat/arange, no Python loop), split by
   owner-of-x; each owner counts how many received pairs exist in its
   oriented edge set with one vectorized ``searchsorted`` over the key
   array.  Total = sum of counts.

Degree ordering bounds out-degree by O(sqrt E), which keeps the emitted
wedge set near-linear even on skewed web graphs; ``max_pairs_per_task``
additionally splits a block's wedge emission into bounded-size tasks so a
hub-heavy block cannot blow a worker's heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from linkgraph import bsp
from linkgraph import graph as G


@ray.remote(num_cpus=1, num_returns=2)
def _tri_prep(block):
    """One dst-sorted deduped symmetrized block → (s, d, vids, deg) +
    (n_vertices, first_vid).

    Rows arrive globally deduped and (dst, src)-lexsorted
    (``raw_dst_exchange(dedup_sort_src=True)``); per-dst segment lengths
    are exact undirected degrees because blocks own every copy of their
    dst values."""
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
    )
    if block.num_columns == 0 or len(block) == 0:
        return empty, (0, 0)
    s = block["src"].to_numpy(zero_copy_only=False)
    d = block["dst"].to_numpy(zero_copy_only=False)
    change = np.empty(len(d), dtype=bool)
    change[0] = True
    np.not_equal(d[1:], d[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    vids = d[starts]
    deg = np.diff(np.append(starts, len(d)))
    return (s, d, vids, deg), (int(len(vids)), int(vids[0]))


@ray.remote(num_cpus=1)
def _deg_request(prep, firsts: np.ndarray):
    """Unique foreign endpoints (srcs) split by owner range; the local
    inverse map rides LAST (call with ``num_returns=K+1``)."""
    s = prep[0]
    uniq, inv = np.unique(s, return_inverse=True)
    outs = bsp._owner_split(uniq, np.empty(0), firsts)
    return [o[0] for o in outs] + [inv.astype(np.int32)]


@ray.remote(num_cpus=1)
def _deg_reply(prep, *request_chunks):
    """deg[v] for each requested v owned here (``num_returns=K``)."""
    vids, deg = prep[2], prep[3]
    outs = []
    for reqs in request_chunks:
        reqs = np.asarray(reqs)
        if len(reqs) == 0:
            outs.append(np.empty(0, np.int64))
        else:
            outs.append(deg[np.searchsorted(vids, reqs)])
    return outs if len(outs) > 1 else outs[0]


@ray.remote(num_cpus=1, num_returns=2)
def _orient_index(prep, inv: np.ndarray, *deg_replies):
    """Orient rows by the (degree, id) total order; build the block's
    out-adjacency (wedge source) and membership index (wedge target).

    Returns ``(index_tuple, n_wedge_pairs)``.  The index tuple holds:
      - ``a2, b2, degb2`` — oriented edges re-lexsorted by
        ``(a, deg(b), b)`` so each a-segment's out-list is already in key
        order for pair emission; ``offs2`` the segment offsets;
      - ``uniq_a, uniq_b, keys`` — the vectorized two-key membership
        structure: ``key = rank(a) * (len(uniq_b)+1) + rank(b)`` is
        monotone in (a, b) lex order, so one ``searchsorted`` answers
        batched "is (x, y) an oriented edge here?" queries.
    """
    s, d = prep[0], prep[1]
    parts = [np.asarray(r) for r in deg_replies]
    deg_of_uniq = np.concatenate(parts) if parts else np.empty(0, np.int64)
    if len(s) == 0:
        e = np.empty(0, np.int64)
        return (e, e, e, e, e, e, e), 0
    deg_s = deg_of_uniq[inv]
    # deg[dst] via the block's own (vids, deg); rows are dst-sorted
    deg_d = prep[3][np.searchsorted(prep[2], d)]
    keep = (deg_d < deg_s) | ((deg_d == deg_s) & (d < s))
    a, b, degb = d[keep], s[keep], deg_s[keep]
    if len(a) == 0:
        e = np.empty(0, np.int64)
        return (e, e, e, e, e, e, e), 0
    # membership index over (a, b) in id-lex order (rows arrive so sorted)
    uniq_a = np.unique(a)
    uniq_b = np.unique(b)
    ra = np.searchsorted(uniq_a, a).astype(np.int64)
    rb = np.searchsorted(uniq_b, b).astype(np.int64)
    keys = ra * (len(uniq_b) + 1) + rb  # already sorted
    # wedge-source order: within each a-segment sort out-list by (deg, id)
    order = np.lexsort((b, degb, a))
    a2, b2, degb2 = a[order], b[order], degb[order]
    change = np.empty(len(a2), dtype=bool)
    change[0] = True
    np.not_equal(a2[1:], a2[:-1], out=change[1:])
    offs2 = np.flatnonzero(change).astype(np.int64)
    lens = np.diff(np.append(offs2, len(a2)))
    n_pairs = int((lens * (lens - 1) // 2).sum())
    return (a2, b2, degb2, offs2, uniq_a, uniq_b, keys), n_pairs


@ray.remote(num_cpus=1)
def _wedge_emit(index, firsts: np.ndarray, part: int, n_parts: int):
    """Emit this block's ordered out-neighbor pairs (x, y), x before y in
    the (degree, id) order, split by owner-of-x (``num_returns=K``).

    ``part``/``n_parts`` select a contiguous run of a-segments balanced by
    pair count, so one hub-heavy block fans out as several bounded tasks.
    All-vectorized: two ``np.repeat`` and one ``np.arange`` build the pair
    index stream; no Python loop over rows."""
    a2, b2, degb2, offs2, *_ = index
    k = len(firsts)
    empty = [(np.empty(0, np.int64), np.empty(0, np.int64))] * k
    if len(a2) == 0:
        return empty if k > 1 else empty
    lens = np.diff(np.append(offs2, len(a2)))
    pair_cnt = lens * (lens - 1) // 2
    if n_parts > 1:
        cum = np.concatenate([[0], np.cumsum(pair_cnt)])
        total = cum[-1]
        lo_seg = int(np.searchsorted(cum, total * part // n_parts, "left"))
        hi_seg = int(np.searchsorted(cum, total * (part + 1) // n_parts, "left"))
        hi_seg = max(hi_seg, lo_seg)
    else:
        lo_seg, hi_seg = 0, len(offs2)
    sel = slice(lo_seg, hi_seg)
    offs_s, lens_s = offs2[sel], lens[sel]
    if len(offs_s) == 0 or lens_s.sum() == 0:
        return empty if k > 1 else empty
    # per row r at position p of its segment: emit b2[r] paired with each
    # later member b2[r+1 .. seg_end); segments tile a2, so the selected
    # row range is contiguous
    row_idx = np.arange(offs_s[0], offs_s[-1] + lens_s[-1])
    seg_of = np.repeat(np.arange(len(offs_s)), lens_s)
    pos = row_idx - offs_s[seg_of]
    cnt = lens_s[seg_of] - 1 - pos
    total_p = int(cnt.sum())
    if total_p == 0:
        return empty if k > 1 else empty
    x = np.repeat(b2[row_idx], cnt)
    first_y = row_idx + 1
    y_idx = np.arange(total_p) - np.repeat(np.cumsum(cnt) - cnt, cnt) + np.repeat(
        first_y, cnt
    )
    y = b2[y_idx]
    # split by owner-of-x: sort the stream once by x
    order = np.argsort(x, kind="stable")
    x, y = x[order], y[order]
    outs = bsp._owner_split(x, y, firsts)
    return outs if k > 1 else outs


@ray.remote(num_cpus=1)
def _wedge_close(index, *query_chunks) -> int:
    """Count received (x, y) wedge queries that are oriented edges here.

    One vectorized membership test: both query ids are ranked into this
    block's (uniq_a, uniq_b) vocabularies (a miss in either vocabulary is
    a non-edge), then a single ``searchsorted`` over the monotone combined
    key array."""
    _, _, _, _, uniq_a, uniq_b, keys = index
    hits = 0
    for ch in query_chunks:
        pairs = ch if isinstance(ch, list) else [ch]
        for qx, qy in pairs:
            if len(qx) == 0 or len(keys) == 0:
                continue
            ra = np.searchsorted(uniq_a, qx)
            ra = np.minimum(ra, len(uniq_a) - 1)
            ok = uniq_a[ra] == qx
            rb = np.searchsorted(uniq_b, qy)
            rb = np.minimum(rb, max(len(uniq_b) - 1, 0))
            ok &= (uniq_b[rb] == qy) if len(uniq_b) else False
            qk = ra * (len(uniq_b) + 1) + rb
            pos = np.searchsorted(keys, qk[ok])
            pos = np.minimum(pos, len(keys) - 1)
            hits += int((keys[pos] == qk[ok]).sum())
    return hits


def triangle_count_bsp(
    edges: rd.Dataset,
    *,
    max_pairs_per_task: int = 8_000_000,
) -> int:
    """Exact triangle count with no state envelope at any vertex count.

    One range exchange (shared machinery with CC/LP/PageRank prep), then
    three raw-task rounds: degree lookup, orient+index, wedge emit/close.
    """
    from linkgraph.runtime import tune_context

    tune_context()
    sorted_refs, _, _ = bsp.raw_map_dst_exchange(
        edges, G.sym_prep_batch, dedup_sort_src=True
    )
    if not sorted_refs:
        return 0
    pairs = [_tri_prep.remote(b) for b in sorted_refs]
    metas = ray.get([p[1] for p in pairs])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    preps = [pairs[i][0] for i in keep]
    firsts = np.asarray([metas[i][1] for i in keep], dtype=np.int64)
    k = len(preps)
    if k == 0:
        return 0
    firsts_ref = ray.put(firsts)

    # round 1: fetch deg[src] from owner ranges (ghost-degree exchange)
    reqs = [
        _deg_request.options(num_returns=k + 1).remote(preps[i], firsts_ref)
        for i in range(k)
    ]
    replies = [
        _deg_reply.options(num_returns=k).remote(
            preps[j], *[reqs[i][j] for i in range(k)]
        )
        for j in range(k)
    ]
    if k == 1:
        replies = [[r] for r in replies]

    # round 2: orient + per-block adjacency/membership index
    oi = [
        _orient_index.remote(
            preps[i], reqs[i][k], *[replies[j][i] for j in range(k)]
        )
        for i in range(k)
    ]
    indexes = [o[0] for o in oi]
    n_pairs = ray.get([o[1] for o in oi])

    # round 3: wedge emit (bounded tasks per block) + owner-side close
    emits = []
    for i in range(k):
        n_parts = max(1, -(-n_pairs[i] // max_pairs_per_task))
        for part in range(n_parts):
            emits.append(
                _wedge_emit.options(num_returns=k).remote(
                    indexes[i], firsts_ref, part, n_parts
                )
            )
    if k == 1:
        emits = [[e] for e in emits]
    closes = [
        _wedge_close.remote(indexes[j], *[e[j] for e in emits]) for j in range(k)
    ]
    return int(sum(ray.get(closes)))
