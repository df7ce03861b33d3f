"""Print ds.stats() for the headline extraction pipeline — the per-stage
evidence that wall time is spent in the UDFs (regex extraction, C++
aggregates), not scheduling.

Usage: python tools/stage_stats.py [n_repos] (default 2000)
"""

from __future__ import annotations

import sys

import ray
import ray.data


def main() -> int:
    n_repos = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from citationgraphs_ray.corpus import generate_corpus, write_corpus_parquet
    from citationgraphs_ray.stages.edges import ExtractImportEdges

    corp = generate_corpus(n_repos=n_repos, seed=42, mega_repo_files=2000)
    path = write_corpus_parquet(corp, f"/tmp/graft_bench/corpus_r{n_repos}")
    ds = ray.data.read_parquet(path)
    # stats on the hot stage itself (read → project → regex extraction);
    # the downstream distinct's driver merge would hide these
    raw = ds.select_columns(["repo", "path", "lang", "content"]).map_batches(
        ExtractImportEdges, batch_format="pyarrow", concurrency=(1, 8)
    ).materialize()
    print(f"raw edge rows={raw.count()}", file=sys.stderr)
    print(raw.stats())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
