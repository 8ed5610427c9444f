"""``python -m linkgraph`` — the ``ray job submit`` entry point.

North-rule requirement: the engine runs as a Ray job on a fixed-size
cluster.  Submit with e.g.::

    ray job submit --working-dir . -- \
        python -m linkgraph cc --edges s3://bucket/edges/ --output /out/labels

Subcommands mirror the kernel surface: ``cc``, ``pagerank``, ``labelprop``,
``triangles``, ``bfs``, ``sssp`` (parquet-only — the MTX reader discards
edge values, reference parity), ``ppr`` (personalized PageRank over a seed
set), ``hits`` (hubs & authorities), ``walks`` (hash-driven random-walk
corpus), ``extract-cc`` (pages parquet → href edges → components).
Results are written as partitioned Parquet (resumable output — one file per
block, never one giant file) and a one-line JSON summary goes to stdout.

Ray session: attaches to the cluster Ray (``ray job submit`` sets
RAY_ADDRESS) or starts a local one; guarded so an externally initialised
session is reused untouched.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True, logging_level="ERROR")


def _edges(path: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)


def _edge_input(args):
    """Edge Dataset from ``--edges`` (parquet) or ``--mtx`` (Matrix Market,
    the reference's native input — ``src/mtx_reader.c:78-214``)."""
    if getattr(args, "mtx", None):
        from linkgraph.sources import read_mtx

        ds, _info = read_mtx(args.mtx)
        return ds
    return _edges(args.edges, ["src", "dst"])


def _ckpt(args):
    from linkgraph.checkpoint import Checkpointer

    if args.checkpoint_dir:
        return Checkpointer(args.checkpoint_dir, args.job_name)
    return None


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="linkgraph")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--output", required=True, help="output parquet directory")
        sp.add_argument("--num-partitions", type=int, default=None)
        sp.add_argument("--checkpoint-dir", default=None)
        sp.add_argument("--job-name", default="job")
        sp.add_argument("--resume", action="store_true")

    for name in ("cc", "pagerank", "labelprop", "triangles"):
        sp = sub.add_parser(name)
        src_grp = sp.add_mutually_exclusive_group(required=True)
        src_grp.add_argument("--edges", help="edge parquet (src, dst)")
        src_grp.add_argument("--mtx", help="Matrix Market edge-list file")
        common(sp)
        if name == "pagerank":
            sp.add_argument("--damping", type=float, default=0.85)
            sp.add_argument("--tol", type=float, default=1e-8)
            sp.add_argument("--max-iters", type=int, default=200)
            sp.add_argument("--directed", action="store_true")
            sp.add_argument("--mode", default="auto",
                            choices=["auto", "broadcast", "shuffle"])

    sp = sub.add_parser("bfs")
    src_grp = sp.add_mutually_exclusive_group(required=True)
    src_grp.add_argument("--edges", help="edge parquet (src, dst)")
    src_grp.add_argument("--mtx", help="Matrix Market edge-list file")
    sp.add_argument("--source", type=int, required=True, help="source vertex id")
    common(sp)

    # sssp is parquet-only: the MTX reader discards edge values by design
    # (reference parity, src/mtx_reader.c:153-156)
    sp = sub.add_parser("sssp")
    sp.add_argument("--edges", required=True, help="edge parquet (src, dst, w)")
    sp.add_argument("--source", type=int, required=True, help="source vertex id")
    sp.add_argument("--weight-col", default="w")
    common(sp)

    sp = sub.add_parser("ppr")
    src_grp = sp.add_mutually_exclusive_group(required=True)
    src_grp.add_argument("--edges", help="edge parquet (src, dst)")
    src_grp.add_argument("--mtx", help="Matrix Market edge-list file")
    sp.add_argument("--seeds", required=True,
                    help="comma-separated seed vertex ids (restart set)")
    sp.add_argument("--damping", type=float, default=0.85)
    sp.add_argument("--tol", type=float, default=1e-8)
    sp.add_argument("--max-iters", type=int, default=200)
    sp.add_argument("--undirected", action="store_true")
    common(sp)

    sp = sub.add_parser("hits")
    src_grp = sp.add_mutually_exclusive_group(required=True)
    src_grp.add_argument("--edges", help="edge parquet (src, dst)")
    src_grp.add_argument("--mtx", help="Matrix Market edge-list file")
    sp.add_argument("--max-iters", type=int, default=20)
    sp.add_argument("--tol", type=float, default=0.0)
    sp.add_argument("--output", required=True, help="output parquet directory")
    sp.add_argument("--num-partitions", type=int, default=None)

    sp = sub.add_parser("walks")
    src_grp = sp.add_mutually_exclusive_group(required=True)
    src_grp.add_argument("--edges", help="edge parquet (src, dst)")
    src_grp.add_argument("--mtx", help="Matrix Market edge-list file")
    sp.add_argument("--starts", required=True,
                    help="comma-separated start vertex ids")
    sp.add_argument("--length", type=int, default=10)
    sp.add_argument("--walks-per-start", type=int, default=1)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--output", required=True, help="output parquet directory")

    sp = sub.add_parser("extract-cc")
    sp.add_argument("--pages", required=True,
                    help="pages parquet (url, warc_ts, html, text, lang)")
    common(sp)

    sp = sub.add_parser("decontaminate")
    sp.add_argument("--train", required=True,
                    help="corpus parquet (doc_id, text)")
    sp.add_argument("--eval", dest="eval_path", required=True,
                    help="benchmark parquet (doc_id, text) — the small side")
    sp.add_argument("--ngram", type=int, default=8)
    sp.add_argument("--output", required=True, help="output parquet directory")
    sp.add_argument("--num-partitions", type=int, default=None)

    args = p.parse_args(argv)
    _ensure_ray()
    import pyarrow as pa  # noqa: F401  (fail fast when arrow is broken)

    t0 = time.perf_counter()
    summary: dict[str, object]

    if args.cmd == "cc":
        from linkgraph.cc import connected_components

        res = connected_components(
            _edge_input(args),
            num_partitions=args.num_partitions,
            checkpointer=_ckpt(args),
            resume=args.resume,
        )
        res.labels.write_parquet(args.output)
        summary = {"cmd": "cc", "components": res.num_components,
                   "rounds": res.num_iterations}
    elif args.cmd == "labelprop":
        from linkgraph.labelprop import label_propagation

        res = label_propagation(
            _edge_input(args),
            num_partitions=args.num_partitions,
            checkpointer=_ckpt(args),
            resume=args.resume,
        )
        res.labels.write_parquet(args.output)
        summary = {"cmd": "labelprop", "components": res.num_components,
                   "iterations": res.num_iterations}
    elif args.cmd == "pagerank":
        from linkgraph.pagerank import pagerank

        res = pagerank(
            _edge_input(args),
            directed=args.directed,
            damping=args.damping,
            tol=args.tol,
            max_iters=args.max_iters,
            num_partitions=args.num_partitions,
            checkpointer=_ckpt(args),
            resume=args.resume,
            mode=args.mode,
        )
        res.ranks.write_parquet(args.output)
        summary = {"cmd": "pagerank", "num_vertices": res.num_vertices,
                   "iterations": res.num_iterations}
    elif args.cmd == "bfs":
        from linkgraph.bfs import bfs_hops

        dists, metrics = bfs_hops(
            _edge_input(args),
            args.source,
            num_partitions=args.num_partitions,
            checkpointer=_ckpt(args),
            resume=args.resume,
        )
        dists.write_parquet(args.output)
        summary = {"cmd": "bfs", "source": args.source,
                   "supersteps": len(metrics)}
    elif args.cmd == "sssp":
        from linkgraph.bfs import sssp

        dists, metrics = sssp(
            _edges(args.edges, ["src", "dst", args.weight_col]),
            args.source,
            weight_col=args.weight_col,
            num_partitions=args.num_partitions,
            checkpointer=_ckpt(args),
            resume=args.resume,
        )
        dists.write_parquet(args.output)
        summary = {"cmd": "sssp", "source": args.source,
                   "supersteps": len(metrics)}
    elif args.cmd == "triangles":
        from linkgraph.triangles import triangle_count

        n = triangle_count(
            _edge_input(args),
            num_partitions=args.num_partitions,
        )
        import pyarrow as pa
        import ray.data as rd

        rd.from_arrow(
            pa.table({"triangles": pa.array([n], pa.int64())})
        ).write_parquet(args.output)
        summary = {"cmd": "triangles", "triangles": n}
    elif args.cmd == "ppr":
        from linkgraph.pagerank import personalized_pagerank

        seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
        res = personalized_pagerank(
            _edge_input(args),
            seeds,
            directed=not args.undirected,
            damping=args.damping,
            tol=args.tol,
            max_iters=args.max_iters,
            checkpointer=_ckpt(args),
            resume=args.resume,
        )
        res.ranks.write_parquet(args.output)
        summary = {"cmd": "ppr", "num_vertices": res.num_vertices,
                   "num_seeds": len(set(seeds)),
                   "iterations": res.num_iterations}
    elif args.cmd == "hits":
        from linkgraph.hits import hits

        res = hits(
            _edge_input(args),
            max_iters=args.max_iters,
            tol=args.tol,
        )
        res.scores.write_parquet(args.output)
        summary = {"cmd": "hits", "num_vertices": res.num_vertices,
                   "iterations": res.num_iterations}
    elif args.cmd == "walks":
        from linkgraph.walks import random_walks

        starts = [int(s) for s in args.starts.split(",") if s.strip()]
        walks, metrics = random_walks(
            _edge_input(args),
            starts,
            length=args.length,
            walks_per_start=args.walks_per_start,
            seed=args.seed,
        )
        walks.write_parquet(args.output)
        summary = {"cmd": "walks", "rows": walks.count(),
                   "num_starts": metrics[0]["num_starts"],
                   "length": args.length,
                   "walks_per_start": args.walks_per_start}
    elif args.cmd == "extract-cc":
        import ray.data as rd

        from linkgraph.pipelines import pages_pipeline

        res = pages_pipeline(
            rd.read_parquet(args.pages),
            num_partitions=args.num_partitions,
            checkpointer=_ckpt(args),
            resume=args.resume,
        )
        res.labels.write_parquet(args.output)
        summary = {"cmd": "extract-cc", "components": res.num_components,
                   "rounds": res.num_iterations}
    else:  # decontaminate
        import ray.data as rd

        from linkgraph.dedup import decontaminate

        flagged = decontaminate(
            rd.read_parquet(args.train, columns=["doc_id", "text"]),
            rd.read_parquet(args.eval_path, columns=["doc_id", "text"]),
            n=args.ngram,
        )
        flagged.write_parquet(args.output)
        summary = {"cmd": "decontaminate", "flagged": flagged.count()}

    summary["wall_s"] = round(time.perf_counter() - t0, 3)
    summary["output"] = args.output
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
