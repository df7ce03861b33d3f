"""Benchmark harness. Prints ONE JSON line (stdout); progress to stderr.

Modes:
  python bench.py              # full bench at RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling    # run the headline kernel at 8 and 32 CPUs in
                               # fresh processes, report scaling efficiency

Inputs (all deterministic, no external data):
  * $GRAFT_SF_DIR (default /root/testdata/sf0.1) — query-suite timings
  * synthetic code corpus at FIXTURES.md bench scale (~200k files, ~1.7M
    import edges), cached under /tmp/graft_bench/corpus
  * synthetic uniform edge table (V=1e6, E=16e6) for kernel throughput,
    cached under /tmp/graft_bench/edges — big enough that per-superstep
    compute dominates scheduling overhead at 32 CPUs

Headline metric (BASELINE.json): end-to-end corpus→edge-extraction→PageRank
convergence wall-time ("value", sec) + edges/sec per PageRank superstep for
both engines (broadcast Dataset engine and CSR actor engine) + per-query
secs over the sf dir.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

CORPUS_REPOS = int(os.environ.get("GRAFT_BENCH_REPOS", "8600"))
# kernel-throughput tables (cached under /tmp/graft_bench):
#  - broadcast engine: V small enough that per-batch combine compacts and
#    the dense driver reduce is trivial (its design regime — V ≪ E)
#  - CSR engine: big enough that per-superstep compute dominates the fixed
#    scheduling/object-store cost (the scaling-experiment table)
BCAST_V = int(os.environ.get("GRAFT_BENCH_BCAST_V", "200000"))
BCAST_E = int(os.environ.get("GRAFT_BENCH_BCAST_E", "8000000"))
EDGE_V = int(os.environ.get("GRAFT_BENCH_V", "1000000"))
EDGE_E = int(os.environ.get("GRAFT_BENCH_E", "400000000"))
CSR_PARTITIONS = int(os.environ.get("GRAFT_BENCH_P", "32"))  # FIXED per run:
# partition count is a property of the job (recorded in the checkpoint
# manifest), not of the cluster size — the scaling experiment varies only
# num_cpus, mirroring an N- vs 4N-node cluster reading one partitioned layout
SUPERSTEPS = 5
BENCH_QUERIES = [
    "edge_table",
    "degree_out",
    "triangles_per_vertex",
    "connected_components",
    "pagerank",
    "doc_cooccurrence",
    "tfidf_top3",
    "minhash_dedup",
    "knn_top5",
    "windowed_user_stats",
    "lineitem_pricing_summary",
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_bench_corpus() -> str:
    out = f"/tmp/graft_bench/corpus_r{CORPUS_REPOS}"
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        from citationgraphs_ray.corpus import generate_corpus, write_corpus_parquet

        log(f"generating bench corpus ({CORPUS_REPOS} repos)...")
        t0 = time.time()
        corp = generate_corpus(
            n_repos=CORPUS_REPOS, seed=42, mega_repo_files=10_000, out_deg_base=8
        )
        write_corpus_parquet(corp, out, shards=64)
        open(marker, "w").close()
        log(
            f"corpus: {corp.table.num_rows} files, {len(corp.expected_edges)} "
            f"edges, {time.time() - t0:.1f}s"
        )
    return out


def ensure_bench_edges(v: int, e: int) -> str:
    out = f"/tmp/graft_bench/edges_v{v}_e{e}"
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(out, exist_ok=True)
        rng = np.random.default_rng(7)
        shard = e // 64
        log(f"generating bench edge table V={v} E={e}...")
        for s in range(64):
            src = rng.integers(0, v, size=shard, dtype=np.int64)
            # mild skew: 3% of edges point at 64 hub vertices
            dst = rng.integers(0, v, size=shard, dtype=np.int64)
            hub_mask = rng.random(shard) < 0.03
            dst[hub_mask] = rng.integers(0, 64, size=int(hub_mask.sum()))
            keep = src != dst
            pq.write_table(
                pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])}),
                os.path.join(out, f"part-{s:05d}.parquet"),
            )
        open(marker, "w").close()
    return out


def host_canary() -> float:
    """Single-core matmul seconds — a host-speed reference so two scaling
    legs can be checked for comparability (the sandbox VM's effective CPU
    allocation varies over time; legs with very different canary values are
    not comparable)."""
    a = np.random.default_rng(0).standard_normal((1500, 1500))
    t0 = time.time()
    for _ in range(3):
        a = a @ a * 1e-3
    return round(time.time() - t0, 3)


def run_bench(num_cpus: int) -> dict:
    import ray
    import ray.data

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

    from citationgraphs_ray.graph.csr_engine import CsrEngine
    from citationgraphs_ray.graph.engine import pagerank
    from citationgraphs_ray.stages.edges import extract_edge_table

    results: dict = {"num_cpus": num_cpus, "host_canary_sec": host_canary()}

    # NOTE: kernel throughput measured FIRST — the corpus pipeline's
    # materialized datasets pressure the object store and skew ray.put
    # latency (measured 127M vs 2B edges/s when run after).
    # --- CSR engine on the big table (the scaling-experiment kernel) ------
    edge_dir = ensure_bench_edges(EDGE_V, EDGE_E)
    big = ray.data.read_parquet(edge_dir)
    E = big.count()
    eng = CsrEngine(
        big,
        EDGE_V,
        num_partitions=CSR_PARTITIONS,
        workdir="/tmp/graft_bench/csr",
        tag=f"v{EDGE_V}e{EDGE_E}",
    )
    eng.pagerank(tol=0.0, max_iters=1)  # warm-up (untimed)
    t0 = time.time()
    eng.pagerank(tol=0.0, max_iters=SUPERSTEPS)
    csr_step = (time.time() - t0) / SUPERSTEPS
    eng.shutdown()
    results["csr_edges_per_sec_per_superstep"] = round(E / csr_step)
    results["edges_per_sec_per_superstep"] = results[
        "csr_edges_per_sec_per_superstep"
    ]
    log(f"[{num_cpus} cpus] CSR engine (E={E}): {E / csr_step:,.0f} edges/s/step")

    # --- broadcast engine: its sweet spot (V small, message compaction) ---
    if not os.environ.get("GRAFT_BENCH_SCALING"):
        bdir = ensure_bench_edges(BCAST_V, BCAST_E)
        bds = ray.data.read_parquet(bdir).repartition(num_cpus * 4).materialize()
        bE = bds.count()
        t0 = time.time()
        pagerank(bds, BCAST_V, tol=0.0, max_iters=SUPERSTEPS)
        bcast_step = (time.time() - t0) / SUPERSTEPS
        results["bcast_edges_per_sec_per_superstep"] = round(bE / bcast_step)
        log(
            f"[{num_cpus} cpus] broadcast engine (E={bE}): "
            f"{bE / bcast_step:,.0f} edges/s/step"
        )

    # --- headline: corpus → edges → PageRank convergence ------------------
    corpus_dir = ensure_bench_corpus()
    ds = ray.data.read_parquet(corpus_dir)
    ds.count()  # warm page cache (untimed)
    t0 = time.time()
    edges, vids = extract_edge_table(ds)
    edges = edges.repartition(num_cpus * 4).materialize()
    n_edges = edges.count()
    n_verts = vids.count()
    t_extract = time.time() - t0
    # PageRank to convergence on the CSR actor engine (the north-star
    # architecture); broadcast-engine timing reported separately below
    t0 = time.time()
    ceng = CsrEngine(
        edges,
        n_verts,
        num_partitions=CSR_PARTITIONS,
        workdir="/tmp/graft_bench/csr",
        tag=f"corpus_r{CORPUS_REPOS}",
    )
    _, pr_iters, _ = ceng.pagerank(tol=1e-9)
    ceng.shutdown()
    t_pr = time.time() - t0
    results["corpus_files"] = n_verts
    results["corpus_edges"] = n_edges
    results["extract_sec"] = round(t_extract, 3)
    results["pagerank_sec"] = round(t_pr, 3)
    results["pagerank_iters"] = pr_iters
    results["pipeline_sec"] = round(t_extract + t_pr, 3)
    log(
        f"[{num_cpus} cpus] corpus pipeline: extract {t_extract:.1f}s + "
        f"pagerank {t_pr:.1f}s ({pr_iters} iters, {n_edges} edges)"
    )

    ray.shutdown()
    return results


def run_queries(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from citationgraphs_ray.pipelines.queries import QUERIES

    out = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        res = QUERIES[name](sf_dir)
        if hasattr(res, "count"):
            res.count()  # consume the pipeline
        out[name] = round(time.time() - t0, 3)
        log(f"query {name}: {out[name]}s")
    ray.shutdown()
    return out


def scaling_mode() -> None:
    env = dict(os.environ)
    results = {}
    for n in (8, 32):
        env["RAY_GRAFT_CPUS"] = str(n)
        env["GRAFT_BENCH_KERNELS_ONLY"] = "1"
        env["GRAFT_BENCH_SCALING"] = "1"  # CSR big-table kernel + pipeline only
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[n] = json.loads(out.strip().splitlines()[-1])
    tput8 = results[8]["csr_edges_per_sec_per_superstep"]
    tput32 = results[32]["csr_edges_per_sec_per_superstep"]
    eff = (tput32 / tput8) / 4.0
    print(
        json.dumps(
            {
                "csr_edges_per_sec_8": tput8,
                "csr_edges_per_sec_32": tput32,
                "scaling_efficiency": round(eff, 3),
                "pipeline_sec_8": results[8]["pipeline_sec"],
                "pipeline_sec_32": results[32]["pipeline_sec"],
                "host_canary_sec_8": results[8].get("host_canary_sec"),
                "host_canary_sec_32": results[32].get("host_canary_sec"),
            }
        )
    )


def main() -> None:
    if "--scaling" in sys.argv:
        scaling_mode()
        return
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    results = run_bench(num_cpus)
    queries = (
        {}
        if os.environ.get("GRAFT_BENCH_KERNELS_ONLY")
        else run_queries(sf_dir, num_cpus)
    )
    payload = {
        "metric": "corpus->edges->pagerank convergence wall time",
        "value": results["pipeline_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": num_cpus,
        **results,
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
