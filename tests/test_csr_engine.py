"""CSR actor engine must equal the broadcast engine / oracle."""

import numpy as np
import pytest

from citationgraphs_ray.graph.csr_engine import CsrEngine
from citationgraphs_ray.graph.engine import pagerank
from citationgraphs_ray.graph.oracle import components_oracle, pagerank_oracle
from citationgraphs_ray.stages.edges import symmetrize_edges


@pytest.fixture(scope="module")
def engines(small_edges, tmp_path_factory):
    edges, vids = small_edges
    V = vids.count()
    wd = str(tmp_path_factory.mktemp("csr"))
    dir_eng = CsrEngine(edges, V, num_partitions=4, workdir=wd, tag="dir")
    und = symmetrize_edges(edges).materialize()
    und_eng = CsrEngine(und, V, num_partitions=4, workdir=wd, tag="und")
    yield edges, V, dir_eng, und_eng
    dir_eng.shutdown()
    und_eng.shutdown()


def test_csr_pagerank_matches_oracle(engines, small_edges):
    edges, V, dir_eng, _ = engines
    earr = edges.to_pandas()[["src", "dst"]].to_numpy()
    state, iters, converged = dir_eng.pagerank(tol=1e-10)
    assert converged
    exp = pagerank_oracle(earr, V, tol=1e-10)
    assert np.allclose(state, exp, atol=1e-6)
    # and matches the broadcast engine
    bc = pagerank(edges, V, tol=1e-10)
    assert np.allclose(state, bc.state, atol=1e-9)


def test_csr_cc_matches_oracle(engines):
    edges, V, _, und_eng = engines
    earr = edges.to_pandas()[["src", "dst"]].to_numpy()
    state, iters, converged = und_eng.connected_components()
    assert converged
    assert np.array_equal(state, components_oracle(earr, V))


def test_partitioned_layout_on_disk(engines, tmp_path_factory):
    import glob
    import os

    _, _, dir_eng, _ = engines
    # one directory per hash partition + completion marker (resumable layout)
    roots = glob.glob("/tmp/pytest*/**/edges_dir_p4", recursive=True)
    found = [r for r in roots if os.path.exists(os.path.join(r, "_SUCCESS"))]
    assert found
    parts = {os.path.basename(p) for p in glob.glob(found[0] + "/part=*")}
    assert parts == {f"part={p}" for p in range(4)}
