"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "detail": {...edges/sec, iterations...}}

Every per-pipeline time is the MINIMUM over GRAFT_BENCH_REPEATS (default
2) in-process repeats — single runs on this box carry one-sided
interference noise larger than real round-over-round deltas.

``--scaling`` runs the north-rule kernels (cc, pagerank, triangles, the
extraction stage alone, and the composed extract→CC pipeline) in fresh
processes at RAY_GRAFT_CPUS=8 and 32 on the same input and reports
throughput at both plus per-kernel and combined scaling efficiency, raw
and normalized to the host's parallel-memcpy ceiling (BASELINE.md
sandbox adaptation of the north rule's N-vs-4N-node criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# must precede ray.init so every worker inherits it: large numpy
# allocations otherwise madvise(HUGEPAGE) and stall seconds per block on
# kernels with THP defrag=madvise (see linkgraph/__init__.py)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")


def _planted_parquet(n_vertices: int, n_components: int, epv: int, seed: int) -> str:
    """Write (once) and return the cached planted-graph parquet path.

    Written as a DIRECTORY of 32 equal shards: Ray parallelizes parquet
    reads at file granularity, and a single-file fixture serializes the
    whole decode into one task (~6 s at 64 M edges) at every consumer.
    """
    import pyarrow.parquet as pq

    from linkgraph import synth

    d = "/tmp/linkgraph_bench"
    os.makedirs(d, exist_ok=True)
    path = os.path.join(
        d, f"planted_v{n_vertices}_c{n_components}_e{epv}_s{seed}_sharded"
    )
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        edges, _ = synth.make_planted_graph(n_vertices, n_components, epv, seed=seed)
        os.makedirs(path, exist_ok=True)
        n = edges.num_rows
        shards = 32
        for i in range(shards):
            lo, hi = i * n // shards, (i + 1) * n // shards
            pq.write_table(
                edges.slice(lo, hi - lo),
                os.path.join(path, f"part-{i:05d}.parquet"),
                row_group_size=1 << 20,
            )
        with open(done, "w") as f:
            f.write("ok")
    return path


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd

    from linkgraph import relational as R
    from linkgraph import synth
    from linkgraph.cc import connected_components
    from linkgraph.pagerank import pagerank
    from linkgraph.pipelines import edges_from_lineitem, pages_pipeline
    from linkgraph.triangles import triangle_count

    # partitioning is a function of the DATA, not the cluster: a fixed
    # partition count keeps iterations-to-convergence identical at every
    # parallelism level (the determinism half of the scaling criterion).
    # Kept low-ish: every hash shuffle ships blocks × partitions shard
    # objects, and per-object overhead dominates below ~10^7 rows/partition.
    num_partitions = int(os.environ.get("GRAFT_BENCH_PARTITIONS", "16"))
    bench_vertices = int(os.environ.get("GRAFT_BENCH_VERTICES", "6400000"))
    # block count is a function of the DATA (identical at every CPU level):
    # ~4 M input rows (≈8 M symmetrized) per block bounds each exchange map
    # task's working set.  At 256 M edges with only 32 blocks, 32 concurrent
    # map tasks × ~3 GB peak exceeded RAM and thrashed: CC 193 s vs 55 s
    # with data-sized blocks (measured 2026-08-19).
    graph_blocks = int(
        os.environ.get("GRAFT_BENCH_BLOCKS", max(32, bench_vertices // 1_600_000))
    )
    # GRAFT_BENCH_ONLY="cc,pagerank" restricts the run to those pipelines —
    # used by --scaling so the 8-vs-32 comparison pays only for the
    # north-rule kernels (everything else still runs in the default bench)
    only_env = os.environ.get("GRAFT_BENCH_ONLY", "")
    only = set(only_env.split(",")) if only_env else None

    def want(name: str) -> bool:
        return only is None or name in only

    # graph-kernel input: a deterministic planted graph at ~16M edges
    # (large enough that the distributed star rounds run — smaller graphs
    # contract straight into the driver-local finish — and that marginal
    # shuffle cost dominates the per-execution fixed cost), cached as
    # parquet so every parallelism level reads the identical bytes
    graph_path = _planted_parquet(
        n_vertices=bench_vertices,
        n_components=16,
        epv=4,
        seed=42,
    )

    # warm-up (untimed): fault the fixture's data pages into the OS page
    # cache, spawn the worker pool and grow the object store before any
    # kernel is timed.  ``count()`` on a bare read_parquet is metadata-only
    # — it leaves the data pages cold on disk, which billed 10-30 s of
    # first-read disk I/O to whichever kernel ran first (and only to that
    # kernel, skewing the 8-vs-32 comparison).  The decode pass below
    # touches every row instead; the metric is kernel throughput, not
    # cold-start I/O (protocol note in BENCH/BASELINE.md).
    import pyarrow as _pa

    def _touch(t):
        return _pa.table({"n": _pa.array([len(t)], _pa.int64())})

    if only is None:
        edges_from_lineitem(sf_dir).count()
    n_edges = rd.read_parquet(graph_path, override_num_blocks=graph_blocks).count()
    if want("cc") or want("pagerank") or want("triangles"):
        rd.read_parquet(graph_path, override_num_blocks=graph_blocks).map_batches(
            _touch, batch_format="pyarrow"
        ).count()

    def measure() -> tuple[dict, dict]:
        queries: dict[str, float] = {}
        detail: dict[str, object] = {}
        _measure_into(queries, detail)
        return queries, detail

    def _measure_into(queries: dict, detail: dict) -> None:
        # --- CC (flagship) ---
        if want("cc"):
            t0 = time.perf_counter()
            cc_res = connected_components(
                rd.read_parquet(graph_path, override_num_blocks=graph_blocks),
                num_partitions=num_partitions,
            )
            queries["cc"] = time.perf_counter() - t0
            detail["cc"] = {
                "edges": n_edges,
                "rounds": cc_res.num_iterations,
                "components": cc_res.num_components,
                "edges_per_sec": n_edges / queries["cc"],
                "edges_per_sec_per_superstep": n_edges
                * cc_res.num_iterations
                / queries["cc"],
            }

        # --- PageRank (fixed 5 supersteps; auto mode broadcasts the rank
        # vector — 3 MB at this vertex count — and keeps edges distributed;
        # shuffle mode is the >50M-vertex scale path) ---
        PR_ITERS = 5
        if want("pagerank"):
            t0 = time.perf_counter()
            pr = pagerank(
                rd.read_parquet(graph_path, override_num_blocks=graph_blocks),
                directed=False,
                num_partitions=num_partitions,
                tol=0.0,
                max_iters=PR_ITERS,
            )
            queries["pagerank"] = time.perf_counter() - t0
            sym_edges = 2 * n_edges
            detail["pagerank"] = {
                "iterations": pr.num_iterations,
                "num_vertices": pr.num_vertices,
                "mode": pr.metrics[-1].get("mode"),
                "edges_per_sec_per_superstep": sym_edges
                * pr.num_iterations
                / queries["pagerank"],
            }

        # --- triangles (BSP path) on the same planted graph ---
        if want("triangles"):
            t0 = time.perf_counter()
            n_tri = triangle_count(
                rd.read_parquet(graph_path, override_num_blocks=graph_blocks)
            )
            queries["triangles"] = time.perf_counter() - t0
            detail["triangles"] = {
                "n_triangles": n_tri,
                "edges_per_sec": n_edges / queries["triangles"],
            }

        # --- extraction → CC on synthetic pages (north-rule pipeline);
        # fixture generation is cached parquet OUTSIDE the timed region (it is
        # a driver-side Python loop, not part of the pipeline under test), and
        # sized so the actor-pool spin-up amortizes into steady-state
        # extraction throughput ---
        # 48k pages: large enough that actor-pool spin-up amortizes into
        # steady-state extraction throughput (2.5k pages/s at 12k pages vs
        # ~9.7k at 48k, 32 CPUs)
        if want("extract_cc") or want("extract"):
            n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", "48000"))
            # realistic page size: ~1 KB default synth pages make extraction
            # nearly free relative to pipeline orchestration, hiding the
            # extractor's CPU scaling entirely (measured: 8-CPU and 32-CPU
            # runs within noise of each other at ANY page count).  Real
            # Common-Crawl html is tens of KB; the scaling record uses
            # ~1500 filler words (~12 KB/page) so the actor pool's scan
            # cost dominates and scaling is measurable.
            n_words = int(os.environ.get("GRAFT_BENCH_PAGE_WORDS", "0"))
            tag = f"pages_{n_pages}_w{n_words}_s42" if n_words else f"pages_{n_pages}_s42"
            # sharded DIRECTORY like the planted-graph fixture: Ray
            # parallelizes parquet reads at file granularity
            pages_path = os.path.join("/tmp/linkgraph_bench", f"{tag}_sharded")
            done = os.path.join(pages_path, "_SUCCESS")
            if not os.path.exists(done):
                import pyarrow.parquet as pq

                pages, _, _ = synth.make_pages(
                    n_pages, seed=42, num_components=8, filler_words=n_words
                )
                os.makedirs(pages_path, exist_ok=True)
                shards = 64
                for i in range(shards):
                    lo, hi = i * n_pages // shards, (i + 1) * n_pages // shards
                    pq.write_table(
                        pages.slice(lo, hi - lo),
                        os.path.join(pages_path, f"part-{i:05d}.parquet"),
                        row_group_size=1 << 10,
                    )
                with open(done, "w") as f:
                    f.write("ok")
            # untimed warm decode (same protocol as the graph fixture above)
            rd.read_parquet(pages_path, override_num_blocks=2 * num_cpus).map_batches(
                _touch, batch_format="pyarrow"
            ).count()

        # --- extraction STAGE alone (the north-rule extractor deliverable,
        # measured without the CC tail): pages → href edges → int64 ids,
        # task-fused with the read.  The full extract→CC pipeline below
        # carries a fixed CC-on-small-graph tail that cannot amortize at
        # any driver-feasible fixture size (the CC kernel's own scaling is
        # recorded at 128 M edges above), so the stage and the composition
        # are recorded separately. ---
        if want("extract"):
            from linkgraph import extract as _ex

            t0 = time.perf_counter()
            n_eedges = (
                _ex.url_edges_to_ids(
                    _ex.pages_to_url_edges(
                        rd.read_parquet(
                            pages_path, override_num_blocks=2 * num_cpus
                        )
                    )
                )
                .materialize()
                .count()
            )
            queries["extract"] = time.perf_counter() - t0
            detail["extract"] = {
                "pages": n_pages,
                "edges": n_eedges,
                "pages_per_sec": round(n_pages / queries["extract"], 1),
            }

        if want("extract_cc"):
            t0 = time.perf_counter()
            pres = pages_pipeline(
                rd.read_parquet(pages_path, override_num_blocks=2 * num_cpus),
                num_partitions=num_partitions,
            )
            queries["extract_cc"] = time.perf_counter() - t0
            detail["extract_cc"] = {
                "components": pres.num_components,
                "pages": n_pages,
                "pages_per_sec": round(n_pages / queries["extract_cc"], 1),
            }

        # --- relational headline (Q1-shaped aggregate) ---
        if want("pricing_summary"):
            t0 = time.perf_counter()
            R.lineitem_pricing_summary(sf_dir).to_pandas()
            queries["pricing_summary"] = time.perf_counter() - t0

        # --- join + groupby ---
        if want("orders_per_segment"):
            t0 = time.perf_counter()
            R.orders_per_segment(sf_dir).to_pandas()
            queries["orders_per_segment"] = time.perf_counter() - t0

        # --- dedup ---
        if want("exact_dedup"):
            t0 = time.perf_counter()
            R.exact_dedup_docs(sf_dir).count()
            queries["exact_dedup"] = time.perf_counter() - t0

        # --- similarity ---
        if want("knn"):
            t0 = time.perf_counter()
            R.knn_vec0_top10(sf_dir).to_pandas()
            queries["knn"] = time.perf_counter() - t0

    # Per-pipeline MINIMUM over in-process repeats (VERDICT r4 "Next
    # round" #2): single runs at 1.6-3.4 s absolute are inside this box's
    # observed run-to-run noise (the r4 href A/B's reps spanned 2.87-4.61 s
    # for the SAME variant), and interference is one-sided — it only ever
    # adds time — so the min over repeats estimates the true cost.  Each
    # query takes its detail dict from the repeat that achieved the min so
    # derived stats stay consistent with the reported time (ADVICE r2).
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    runs = [measure() for _ in range(repeats)]
    queries: dict[str, float] = {}
    detail: dict[str, object] = {}
    for k in runs[0][0]:
        wi = min(range(repeats), key=lambda i: runs[i][0][k])
        queries[k] = runs[wi][0][k]
        if k in runs[wi][1]:
            detail[k] = runs[wi][1][k]

    ray.shutdown()
    total = sum(queries.values())
    return {
        "metric": "headline_pipelines_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "repeats": repeats,
        "detail": detail,
    }


def _memcpy_probe(ncpu: int, total_mb: int = 8192, repeats: int = 3) -> float:
    """Wall seconds for ``ncpu`` processes to copy ``total_mb`` MB total
    (fixed work, divided evenly) — the host's raw parallel memory-bandwidth
    profile under the same fixed-total-work protocol as the kernel scaling
    runs.  Minimum over ``repeats`` (interference is one-sided)."""
    import multiprocessing as mp

    per = total_mb // ncpu

    def worker(per_mb: int) -> None:
        import numpy as np

        # buffer of per_mb/8 MB, copied 8× → per_mb MB copied per worker
        a = np.ones((per_mb << 20) // 64, dtype=np.float64)
        for _ in range(8):
            a = a.copy()

    best = float("inf")
    ctx = mp.get_context("fork")  # fork: the closure target needs no pickling
    for _ in range(repeats):
        procs = [ctx.Process(target=worker, args=(per,)) for _ in range(ncpu)]
        t0 = time.perf_counter()
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        best = min(best, time.perf_counter() - t0)
    return best


def run_scaling() -> dict:
    # the scaling comparison runs the north-rule kernels — CC, PageRank,
    # triangles and the extract→CC pipeline (VERDICT r4 "Next round" #3;
    # reference anchor: the all-algorithms sweep of
    # scripts/run_benchmarks.sh:38-71) — at an amortizing graph size
    # (default 25.6 M vertices / 64 M edges; override with
    # GRAFT_SCALING_VERTICES) — the fixed per-execution orchestration cost
    # shrinks relative to kernel work as the graph grows, which is exactly
    # the regime a real N-vs-4N-node cluster comparison sits in
    scaling_vertices = os.environ.get("GRAFT_SCALING_VERTICES", "25600000")
    kernels = os.environ.get(
        "GRAFT_SCALING_KERNELS", "cc,pagerank,triangles,extract,extract_cc"
    ).split(",")

    def run_once(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_ONLY=",".join(kernels),
            GRAFT_BENCH_VERTICES=scaling_vertices,
            # realistic CC-page-sized fixture (~19 KB html → 10 GB total):
            # extraction must be CPU-bound, not fixed-cost-bound, for the
            # 8-vs-32 comparison to measure the extractor at all
            GRAFT_BENCH_PAGES=os.environ.get("GRAFT_SCALING_PAGES", "1000000"),
            GRAFT_BENCH_PAGE_WORDS=os.environ.get(
                "GRAFT_SCALING_PAGE_WORDS", "1500"
            ),
            # repeats happen at PROCESS level here (fresh ray session per
            # repeat, the established scaling protocol) — not in-process
            GRAFT_BENCH_REPEATS="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # single-node run-to-run variance is large and one-sided
        # (interference only ever adds time), so per-query minima over
        # repeated fresh processes estimate the true cost.  For each query,
        # take the DETAIL dict from the repeat that achieved the minimum so
        # derived stats (edges_per_sec etc.) stay consistent with the
        # reported time — grafting minima onto run 0's detail produced
        # contradictory JSONs (ADVICE r2).
        runs = [run_once(ncpu) for _ in range(repeats)]
        best = dict(runs[0])
        best["queries"] = {}
        best["detail"] = {}
        for k in runs[0]["queries"]:
            winner = min(runs, key=lambda r: r["queries"][k])
            best["queries"][k] = round(winner["queries"][k], 3)
            if k in winner.get("detail", {}):
                best["detail"][k] = winner["detail"][k]
        best["value"] = round(sum(best["queries"].values()), 3)
        best["repeats"] = repeats
        return best

    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    # scaling efficiency over ALL north-rule kernels, plus per-kernel
    t_lo = sum(r_lo["queries"][k] for k in kernels)
    t_hi = sum(r_hi["queries"][k] for k in kernels)
    eff = (t_lo / t_hi) / (hi / lo)
    per_kernel_eff = {
        k: round((r_lo["queries"][k] / r_hi["queries"][k]) / (hi / lo), 3)
        for k in kernels
    }
    # the host's own parallel memory-bandwidth ceiling under the identical
    # fixed-total-work protocol: a single shared-memory box saturates its
    # memory controllers well before 32 copy streams, so raw memcpy itself
    # scales at < 1.0 here.  eff_normalized = eff / memcpy_eff is the
    # kernel's efficiency relative to what THIS box's memory system allows
    # — on a real N→4N-node cluster every node adds its own memory system,
    # which is exactly the term the normalization removes.
    m_lo = _memcpy_probe(lo)
    m_hi = _memcpy_probe(hi)
    memcpy_eff = (m_lo / m_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency_kernels",
        "value": round(eff, 3),
        "unit": "ratio",
        "kernels": kernels,
        "per_kernel_eff": per_kernel_eff,
        "per_kernel_eff_normalized": {
            k: round(min(v / memcpy_eff, 1.0), 3) if memcpy_eff > 0 else None
            for k, v in per_kernel_eff.items()
        },
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": round(t_lo, 3),
        "sec_hi": round(t_hi, 3),
        "memcpy_sec_lo": round(m_lo, 3),
        "memcpy_sec_hi": round(m_hi, 3),
        "memcpy_eff": round(memcpy_eff, 3),
        "eff_normalized_to_memcpy": round(min(eff / memcpy_eff, 1.0), 3)
        if memcpy_eff > 0
        else None,
        "full_lo": r_lo,
        "full_hi": r_hi,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
