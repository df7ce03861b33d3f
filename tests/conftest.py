import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    from citationgraphs_ray.corpus import generate_corpus

    return generate_corpus(n_repos=30, seed=42, mega_repo_files=300)


@pytest.fixture(scope="session")
def small_edges(small_corpus):
    """Materialized (edges, vertex_ids) for the small corpus."""
    import ray.data

    from citationgraphs_ray.stages.edges import extract_edge_table

    ds = ray.data.from_arrow(small_corpus.table)
    edges, vids = extract_edge_table(ds)
    return edges.materialize(), vids.materialize()
