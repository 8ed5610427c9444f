"""Scale-path triangle counting: raw-task BSP over dst-range-partitioned
adjacency — no joins, no driver-side vertex state, no degree broadcast.

The dataflow path (``linkgraph.triangles``) broadcasts the degree vector
below a 50 M-vertex gate and falls back to two bucketed joins above it;
both materialize the full wedge set as shuffled rows.  This module closes
wedges with one round of raw Ray tasks over the same dst-sorted owner
groups the other kernels already build (``bsp.raw_dst_exchange`` with
``grouped=True``), so it has no per-node state envelope at any vertex
count:

1. **prep** — the deduped symmetrized exchange makes owner groups
   dst-disjoint; per-dst segment lengths summed across a group's
   sub-blocks ARE the undirected degrees (global, no shuffle —
   ``bsp.group_vertices``).
2. **degree lookup** — one request/reply task round fetches ``deg[src]``
   for each sub-block's foreign endpoints from their owner groups (the BSP
   analogue of the reference's ghost-label exchange,
   ``src/mpi/cc_mpi.c:950-1049``).
3. **orient + index** — each sub-block keeps only rows where
   ``(deg, id)(dst) < (deg, id)(src)`` (each undirected edge appears in
   exactly two groups, once per direction, so exactly one side keeps it —
   the edge-once orientation of ``src/cc_sequential.c:416-429`` under the
   degree total order).  Out-adjacency stays range-partitioned by the
   *lower-ranked* endpoint with zero movement, because that endpoint IS the
   sub-block's dst.  The task also builds a lexsorted membership key array.
4. **wedge close** — the oriented rows of a group's sub-blocks re-join
   into ONE group index (a cut vertex's out-list spans sub-blocks; its
   cross-cut neighbor pairs exist only in the joined segment), then all
   ordered out-neighbor pairs (x, y) are emitted (vectorized
   repeat/arange, no Python loop), split by owner-group-of-x; each owner
   counts how many received pairs exist in its oriented edge set with one
   vectorized ``searchsorted`` over the group's key array.

Degree ordering bounds out-degree by O(sqrt E), which keeps the emitted
wedge set near-linear even on skewed web graphs; ``max_pairs_per_task``
additionally splits a sub-block's wedge emission into bounded-size tasks,
and the exchange's hub sub-split bounds every prep/index task's row count,
so a hub-heavy range cannot blow a worker's heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from linkgraph import bsp
from linkgraph import graph as G


@ray.remote(num_cpus=1)
def _deg_request(block, firsts: np.ndarray):
    """Unique foreign endpoints (srcs) of one sub-block split by owner
    group; the local inverse map rides LAST (``num_returns=K+1``)."""
    k = len(firsts)
    if block.num_columns == 0 or len(block) == 0:
        return [np.empty(0, np.int64)] * k + [np.empty(0, np.int32)]
    s = block["src"].to_numpy(zero_copy_only=False)
    # int64 request ids (bsp compact-output contract; blocks may be int32)
    uniq, inv = np.unique(s, return_inverse=True)
    uniq = uniq.astype(np.int64, copy=False)
    outs = bsp._owner_split(uniq, np.empty(0), firsts)
    return [o[0] for o in outs] + [inv.astype(np.int32)]


@ray.remote(num_cpus=1)
def _deg_reply(gv, *request_chunks):
    """deg[v] for each requested v owned by this group (``num_returns=K``)."""
    vids, deg = gv
    outs = []
    for reqs in request_chunks:
        reqs = np.asarray(reqs)
        if len(reqs) == 0:
            outs.append(np.empty(0, np.int64))
        else:
            outs.append(deg[np.searchsorted(vids, reqs)])
    return outs if len(outs) > 1 else outs[0]


@ray.remote(num_cpus=1)
def _orient_rows(block, gv, inv: np.ndarray, *deg_replies):
    """Orient one sub-block's rows by the (degree, id) total order:
    keep only rows where ``(deg, id)(dst) < (deg, id)(src)``.  ``deg(dst)``
    comes from the group's (vids, deg); ``deg(src)`` from the ghost
    replies.  Returns the oriented ``(a, b, deg_b)`` arrays (a = the
    sub-block's dst, ascending — row order is preserved)."""
    e = np.empty(0, np.int64)
    if block.num_columns == 0 or len(block) == 0:
        return e, e, e
    s = block["src"].to_numpy(zero_copy_only=False)
    d = block["dst"].to_numpy(zero_copy_only=False)
    parts = [np.asarray(r) for r in deg_replies]
    deg_of_uniq = np.concatenate(parts) if parts else np.empty(0, np.int64)
    deg_s = deg_of_uniq[inv]
    deg_d = gv[1][np.searchsorted(gv[0], d)]
    keep = (deg_d < deg_s) | ((deg_d == deg_s) & (d < s))
    return d[keep], s[keep], deg_s[keep]


@ray.remote(num_cpus=1, num_returns=2)
def _group_index(*oriented_parts):
    """One owner group's oriented sub-block rows → its out-adjacency
    (wedge source) and membership index (wedge target).

    Rebuilding the index at GROUP level is what keeps wedge emission exact
    under hub sub-splits: a cut vertex's out-list spans two sub-blocks,
    and its cross-sub-block neighbor pairs exist only in the concatenated
    segment.  Memory note: this materializes only the group's ORIENTED
    rows — degree ordering drops a hub's huge in-run (the hub is the
    higher-ranked endpoint), so the oriented set is the O(sqrt E)-bounded
    out-adjacency, not the raw range.

    Returns ``(index_tuple, n_wedge_pairs)``.  The index tuple holds:
      - ``a2, b2, degb2`` — oriented edges re-lexsorted by
        ``(a, deg(b), b)`` so each a-segment's out-list is already in key
        order for pair emission; ``offs2`` the segment offsets;
      - ``uniq_a, uniq_b, keys`` — the vectorized two-key membership
        structure: ``key = rank(a) * (len(uniq_b)+1) + rank(b)`` is
        monotone in (a, b) lex order, so one ``searchsorted`` answers
        batched "is (x, y) an oriented edge here?" queries.
    """
    e = np.empty(0, np.int64)
    live = [p for p in oriented_parts if len(p[0])]
    if not live:
        return (e, e, e, e, e, e, e), 0
    a = np.concatenate([p[0] for p in live])
    b = np.concatenate([p[1] for p in live])
    degb = np.concatenate([p[2] for p in live])
    # membership index over (a, b): parts arrive a-ascending and
    # (a, b)-lexsorted within each part, but a cut vertex's rows may span
    # parts — one lexsort restores the global (a, b) order
    order0 = np.lexsort((b, a))
    a_m, b_m = a[order0], b[order0]
    uniq_a = np.unique(a_m)
    uniq_b = np.unique(b_m)
    ra = np.searchsorted(uniq_a, a_m).astype(np.int64)
    rb = np.searchsorted(uniq_b, b_m).astype(np.int64)
    keys = ra * (len(uniq_b) + 1) + rb  # sorted by construction
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
    """Emit this sub-block's ordered out-neighbor pairs (x, y), x before y
    in the (degree, id) order, split by owner-group-of-x
    (``num_returns=K``).

    ``part``/``n_parts`` select a contiguous run of a-segments balanced by
    pair count, so one hub-heavy sub-block fans out as several bounded
    tasks.  All-vectorized: two ``np.repeat`` and one ``np.arange`` build
    the pair index stream; no Python loop over rows."""
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
    """Count received (x, y) wedge queries that are oriented edges in this
    owner group's index.

    One vectorized membership test: both query ids are ranked into the
    group's (uniq_a, uniq_b) vocabularies (a miss in either vocabulary is
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
    groups, _, _ = bsp.raw_map_dst_exchange(
        edges, G.sym_prep_batch, dedup_sort_src=True, grouped=True
    )
    if not groups:
        return 0
    gvs = [bsp.group_vertices.options(num_returns=2).remote(*g) for g in groups]
    metas = ray.get([p[1] for p in gvs])
    keep = [i for i, (n, _) in enumerate(metas) if n > 0]
    gv_refs = [gvs[i][0] for i in keep]
    firsts = np.asarray([metas[i][1] for i in keep], dtype=np.int64)
    k = len(gv_refs)
    if k == 0:
        return 0
    firsts_ref = ray.put(firsts)
    sub_owner: list[int] = []
    sub_blocks: list = []
    for gi, i in enumerate(keep):
        for b in groups[i]:
            sub_owner.append(gi)
            sub_blocks.append(b)
    ns = len(sub_blocks)

    # round 1: fetch deg[src] from owner groups (ghost-degree exchange);
    # one request per sub-block, one reply task per owner group
    reqs = [
        _deg_request.options(num_returns=k + 1).remote(sub_blocks[e], firsts_ref)
        for e in range(ns)
    ]
    replies = [
        _deg_reply.options(num_returns=ns).remote(
            gv_refs[j], *[reqs[e][j] for e in range(ns)]
        )
        for j in range(k)
    ]
    if ns == 1:
        replies = [[r] for r in replies]

    # round 2: orient per sub-block, then one adjacency/membership index
    # per owner group (exact under sub-splits: a cut vertex's out-list is
    # re-joined before pair emission)
    oriented = [
        _orient_rows.remote(
            sub_blocks[e], gv_refs[sub_owner[e]], reqs[e][k],
            *[replies[j][e] for j in range(k)]
        )
        for e in range(ns)
    ]
    gi = [
        _group_index.options(num_returns=2).remote(
            *[oriented[e] for e in range(ns) if sub_owner[e] == j]
        )
        for j in range(k)
    ]
    indexes = [g[0] for g in gi]
    n_pairs = ray.get([g[1] for g in gi])

    # round 3: wedge emit (bounded tasks per group) + owner-side close
    emits = []
    for j in range(k):
        n_parts = max(1, -(-n_pairs[j] // max_pairs_per_task))
        for part in range(n_parts):
            emits.append(
                _wedge_emit.options(num_returns=k).remote(
                    indexes[j], firsts_ref, part, n_parts
                )
            )
    if k == 1:
        emits = [[e] for e in emits]
    closes = [
        _wedge_close.remote(indexes[j], *[em[j] for em in emits]) for j in range(k)
    ]
    return int(sum(ray.get(closes)))
