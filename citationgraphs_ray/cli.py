"""``ray job submit``-able entry point (BASELINE.json north_star).

Runs the flagship pipeline — corpus parquet → edge extraction → graph
kernel — with checkpoint/resume flags, writing partitioned parquet
results. Submit against a cluster exactly as the north rule describes::

    ray job submit --working-dir . -- \
        python -m citationgraphs_ray.cli \
        --corpus /data/corpus --output /data/out --kernel pagerank \
        --checkpoint-dir /data/ck --resume

or run locally (``ray.init`` is guarded, so an existing session — e.g.
the driver's or pytest's — is reused; standalone runs auto-init).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np
import pyarrow as pa
import ray
import ray.data


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="citationgraphs_ray",
        description="Ray-Data-native citation/link-graph analytics engine",
    )
    p.add_argument("--corpus", required=True, help="corpus parquet dir/file")
    p.add_argument("--output", required=True, help="output parquet dir")
    p.add_argument(
        "--kernel",
        default="pagerank",
        choices=[
            "pagerank",
            "cc",
            "lpa",
            "bfs",
            "kcore",
            "triangles",
            "edges",
            "hits",
            "ppr",
            "mis",
            "katz",
        ],
        help="analysis to run over the extracted edge table (hits/mis/katz "
        "run on the broadcast engine regardless of --engine; ppr honors it)",
    )
    p.add_argument(
        "--katz-alpha",
        type=float,
        default=0.001,
        help="attenuation for --kernel katz (must be < 1/lambda_max)",
    )
    p.add_argument(
        "--engine",
        default="csr",
        choices=["csr", "broadcast"],
        help="csr = partition-actor BSP (scale path); broadcast = dense "
        "driver-vector engine (small V); triangles/edges ignore this",
    )
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument(
        "--resume",
        action="store_true",
        help="resume from the newest complete checkpoint in --checkpoint-dir",
    )
    p.add_argument("--num-partitions", type=int, default=32)
    p.add_argument(
        "--output-mode",
        default="table",
        choices=["table", "shards"],
        help="table = assembled (id, value) parquet via Ray Data (small-V "
        "convenience); shards = per-partition parquet written directly by "
        "the CSR workers, no V-sized driver array (csr engine only)",
    )
    p.add_argument("--workdir", default="/tmp/citationgraphs_ray")
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument(
        "--bfs-source",
        type=int,
        default=0,
        help="source vertex id for --kernel bfs",
    )
    p.add_argument(
        "--kcore-k", type=int, default=3, help="k for --kernel kcore"
    )
    p.add_argument(
        "--seeds",
        default="0",
        help="comma-separated seed vertex ids for --kernel ppr",
    )
    p.add_argument("--tol", type=float, default=1e-9)
    p.add_argument("--max-iters", type=int, default=200)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if (
        args.kernel == "kcore"
        and args.engine == "csr"
        and args.output_mode == "shards"
    ):
        print(
            "error: --kernel kcore --engine csr supports only "
            "--output-mode table (its CSR checkpoint shards hold an "
            "ENCODED state column); use table mode or --engine broadcast",
            file=sys.stderr,
        )
        return 2
    if not ray.is_initialized():  # reuse the submitting session if any
        # plain ray.init(): respects RAY_ADDRESS (ray job submit sets it),
        # starts a local session otherwise
        ray.init()

    from .graph.csr_engine import CsrEngine
    from .graph.engine import (
        bfs_hops,
        connected_components,
        k_core,
        label_propagation,
        pagerank,
    )
    from .graph.triangles import triangle_counts
    from .stages.edges import extract_edge_table, symmetrize_edges

    corpus = ray.data.read_parquet(args.corpus)
    edges, vids = extract_edge_table(corpus)
    edges = edges.materialize()
    V = vids.count()

    if args.kernel == "edges":
        edges.write_parquet(args.output)
        print(json.dumps({"kernel": "edges", "rows": edges.count(), "V": V}))
        return 0

    if args.kernel == "hits":
        from .graph.engine import hits

        res = hits(
            edges,
            V,
            max_iters=args.max_iters,
            tol=args.tol,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        out = ray.data.from_arrow(
            pa.table(
                {
                    "id": pa.array(np.arange(V, dtype=np.int64)),
                    "hub": pa.array(res.hub),
                    "auth": pa.array(res.auth),
                }
            )
        )
        out.write_parquet(args.output)
        print(
            json.dumps(
                {
                    "kernel": "hits",
                    "V": V,
                    "iterations": res.iterations,
                    "converged": bool(res.converged),
                    "output": args.output,
                }
            )
        )
        return 0

    # actual engine a kernel ran on (triangles/mis/katz and non-csr ppr
    # always use the broadcast engine, whatever --engine says)
    engine_used = "broadcast"
    if args.kernel == "triangles":
        res = triangle_counts(symmetrize_edges(edges), V)
        state, iters, converged = res.state, res.iterations, True
        col = "tri_count"
    elif args.kernel == "mis":
        from .graph.engine import maximal_independent_set

        res = maximal_independent_set(
            symmetrize_edges(edges).materialize(),
            V,
            max_iters=args.max_iters,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        state, iters, converged = res.state, res.iterations, res.converged
        col = "state"
    elif args.kernel == "katz":
        from .graph.engine import katz_centrality

        res = katz_centrality(
            edges,
            V,
            alpha=args.katz_alpha,
            tol=args.tol,
            max_iters=args.max_iters,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        state, iters, converged = res.state, res.iterations, res.converged
        col = "katz"
    elif args.kernel == "ppr" and args.engine != "csr":
        seeds = [int(s) for s in args.seeds.split(",") if s.strip() != ""]
        res = pagerank(
            edges,
            V,
            damping=args.damping,
            tol=args.tol,
            max_iters=args.max_iters,
            reset_ids=seeds,
            checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
        state, iters, converged = res.state, res.iterations, res.converged
        col = "rank"
    elif args.engine == "csr" and (
        args.kernel in ("pagerank", "ppr", "cc", "lpa", "bfs")
        or (args.kernel == "kcore" and args.output_mode == "table")
    ):
        # kcore's CSR checkpoint shards hold its ENCODED state column, so
        # shards-mode kcore uses the broadcast engine below
        # pick the kernel's edge view BEFORE constructing the engine —
        # cc/lpa run on the symmetrized edges only, so building (and
        # immediately discarding) a directed-edge engine would waste a
        # full checksum + partition + CSR build
        eng_edges = (
            edges
            if args.kernel in ("pagerank", "ppr")
            else symmetrize_edges(edges).materialize()
        )
        eng = CsrEngine(
            eng_edges,
            V,
            num_partitions=args.num_partitions,
            workdir=args.workdir,
        )
        # shards mode never assembles the V-sized driver array — the
        # state is drained straight from the workers via write_states
        assemble = args.output_mode != "shards"
        if args.kernel in ("pagerank", "ppr"):
            seeds = (
                [int(s) for s in args.seeds.split(",") if s.strip() != ""]
                if args.kernel == "ppr"
                else None
            )
            state, iters, converged = eng.pagerank(
                damping=args.damping,
                tol=args.tol,
                max_iters=args.max_iters,
                checkpoint_dir=args.checkpoint_dir,
                resume=args.resume,
                assemble=assemble,
                reset_ids=seeds,
            )
            col = "rank"
        elif args.kernel == "cc":
            state, iters, converged = eng.connected_components(
                max_iters=args.max_iters,
                checkpoint_dir=args.checkpoint_dir,
                resume=args.resume,
                assemble=assemble,
            )
            col = "component"
        elif args.kernel == "bfs":
            state, iters, converged = eng.bfs_hops(
                [args.bfs_source],
                max_iters=args.max_iters,
                checkpoint_dir=args.checkpoint_dir,
                resume=args.resume,
                assemble=assemble,
            )
            col = "hops"
        elif args.kernel == "kcore":
            state, iters, converged = eng.k_core(
                args.kcore_k,
                checkpoint_dir=args.checkpoint_dir,
                resume=args.resume,
                assemble=assemble,
            )
            col = "in_kcore"
        else:
            state, iters, converged = eng.label_propagation(
                max_rounds=args.max_iters,
                checkpoint_dir=args.checkpoint_dir,
                resume=args.resume,
                assemble=assemble,
            )
            col = "label"
        if args.output_mode == "shards":
            rows = eng.write_states(args.output, col)
            eng.shutdown()
            print(
                json.dumps(
                    {
                        "kernel": args.kernel,
                        "engine": "csr",
                        "V": V,
                        "iterations": iters,
                        "converged": bool(converged),
                        "output": args.output,
                        "output_mode": "shards",
                        "rows": rows,
                    }
                )
            )
            return 0
        eng.shutdown()
        engine_used = "csr"
    else:
        kw = dict(checkpoint_dir=args.checkpoint_dir, resume=args.resume)
        if args.kernel == "pagerank":
            res = pagerank(
                edges,
                V,
                damping=args.damping,
                tol=args.tol,
                max_iters=args.max_iters,
                **kw,
            )
            col = "rank"
        elif args.kernel == "cc":
            res = connected_components(
                symmetrize_edges(edges), V, max_iters=args.max_iters, **kw
            )
            col = "component"
        elif args.kernel == "bfs":
            res = bfs_hops(
                symmetrize_edges(edges),
                V,
                sources=[args.bfs_source],
                max_iters=args.max_iters,
                **kw,
            )
            col = "hops"
        elif args.kernel == "kcore":
            res = k_core(
                symmetrize_edges(edges), V, k=args.kcore_k, **kw
            )
            col = "in_kcore"
        else:
            res = label_propagation(
                symmetrize_edges(edges), V, max_rounds=args.max_iters, **kw
            )
            col = "label"
        state, iters, converged = res.state, res.iterations, res.converged

    out = ray.data.from_arrow(
        pa.table(
            {"id": pa.array(np.arange(V, dtype=np.int64)), col: pa.array(state)}
        )
    )
    out.write_parquet(args.output)
    print(
        json.dumps(
            {
                "kernel": args.kernel,
                "engine": engine_used,
                "V": V,
                "iterations": iters,
                "converged": bool(converged),
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
