"""F5: checkpoint/resume — interrupted run ≡ uninterrupted run, exactly."""

import json
import os
import shutil

import numpy as np
import pytest

from citationgraphs_ray.graph.engine import connected_components, pagerank
from citationgraphs_ray.stages.edges import symmetrize_edges
from citationgraphs_ray.state.checkpoints import CheckpointManager


@pytest.fixture()
def ckdir(tmp_path):
    return str(tmp_path / "ck")


def test_pagerank_resume_equals_uninterrupted(small_edges, ckdir):
    edges, vids = small_edges
    V = vids.count()
    full = pagerank(edges, V, tol=1e-10)
    # interrupted: run 3 supersteps, "kill", resume to convergence
    pagerank(edges, V, tol=1e-10, max_iters=3, checkpoint_dir=ckdir)
    resumed = pagerank(
        edges, V, tol=1e-10, checkpoint_dir=ckdir, resume=True
    )
    assert resumed.converged
    assert np.array_equal(resumed.state, full.state)  # bitwise: same op order


def test_resume_ignores_incomplete_superstep(small_edges, ckdir):
    edges, vids = small_edges
    V = vids.count()
    pagerank(edges, V, tol=1e-10, max_iters=3, checkpoint_dir=ckdir)
    iters = sorted(d for d in os.listdir(ckdir) if d.startswith("iter_"))
    # simulate a crash mid-write: newest superstep has state but no manifest
    os.remove(os.path.join(ckdir, iters[-1], "MANIFEST.json"))
    mgr = CheckpointManager(ckdir, "pagerank", _fp(ckdir))
    ck = mgr.latest()
    assert ck.iteration == int(iters[-2].split("_")[1])


def test_manifest_contents(small_edges, ckdir):
    edges, vids = small_edges
    V = vids.count()
    pagerank(edges, V, tol=1e-10, max_iters=2, checkpoint_dir=ckdir)
    it0 = os.path.join(ckdir, "iter_000000")
    with open(os.path.join(it0, "MANIFEST.json")) as f:
        m = json.load(f)
    assert m["kernel"] == "pagerank"
    assert m["parent"] is None
    assert "linf_residual" in m["metric"]
    assert len(m["parts"]) == m["num_partitions"]
    assert sum(p["rows"] for p in m["parts"]) == V
    # per-partition shard files exist (resumable, partitioned output)
    for p in m["parts"]:
        assert os.path.exists(os.path.join(it0, p["file"]))


def test_fingerprint_mismatch_rejected(small_edges, ckdir):
    edges, vids = small_edges
    V = vids.count()
    pagerank(edges, V, tol=1e-10, max_iters=1, checkpoint_dir=ckdir)
    with pytest.raises(ValueError, match="different run"):
        CheckpointManager(ckdir, "pagerank", "deadbeef00000000")


def test_cc_resume(small_edges, ckdir):
    edges, vids = small_edges
    V = vids.count()
    und = symmetrize_edges(edges).materialize()
    full = connected_components(und, V)
    connected_components(und, V, max_iters=2, checkpoint_dir=ckdir)
    resumed = connected_components(und, V, checkpoint_dir=ckdir, resume=True)
    assert resumed.converged
    assert np.array_equal(resumed.state, full.state)


def _fp(ckdir):
    with open(os.path.join(ckdir, "run.json")) as f:
        return json.load(f)["fingerprint"]


def test_resume_after_convergence_is_noop(small_edges, ckdir):
    """Resuming a converged run must not run extra supersteps (bitwise)."""
    edges, vids = small_edges
    V = vids.count()
    full = pagerank(edges, V, tol=1e-10, checkpoint_dir=ckdir)
    assert full.converged
    again = pagerank(edges, V, tol=1e-10, checkpoint_dir=ckdir, resume=True)
    assert np.array_equal(again.state, full.state)
    assert again.iterations == full.iterations


def test_different_graph_same_shape_rejected(small_edges, ckdir):
    """A graph with identical (V, E) but different edges must not resume
    from another graph's checkpoint (edge checksum in the fingerprint)."""
    import pyarrow as pa
    import ray.data

    edges, vids = small_edges
    V = vids.count()
    pagerank(edges, V, tol=1e-10, max_iters=1, checkpoint_dir=ckdir)
    df = edges.to_pandas()
    df2 = df.copy()
    # swap one edge endpoint → same row count, different edge set
    df2.loc[df2.index[0], "dst"] = (df2.iloc[0]["dst"] + 1) % V
    if ((df2.iloc[0]["src"] == df2.iloc[0]["dst"])):
        df2.loc[df2.index[0], "dst"] = (df2.iloc[0]["dst"] + 1) % V
    other = ray.data.from_pandas(df2)
    with pytest.raises(ValueError, match="different run"):
        pagerank(other, V, tol=1e-10, max_iters=1, checkpoint_dir=ckdir)


def test_checkpoint_pruning_keeps_resume_point(small_edges, ckdir):
    """keep_last prunes old superstep dirs while resume still works from
    the newest surviving manifest."""
    edges, vids = small_edges
    V = vids.count()
    full = pagerank(edges, V, tol=1e-10)
    pagerank(
        edges,
        V,
        tol=1e-10,
        max_iters=4,
        checkpoint_dir=ckdir,
        checkpoint_keep_last=2,
    )
    iters = sorted(d for d in os.listdir(ckdir) if d.startswith("iter_"))
    assert len(iters) == 2  # only the newest two survive
    resumed = pagerank(
        edges, V, tol=1e-10, checkpoint_dir=ckdir, resume=True
    )
    assert resumed.converged
    assert np.array_equal(resumed.state, full.state)


def test_bfs_resume(small_edges, ckdir):
    from citationgraphs_ray.graph.engine import bfs_hops
    from citationgraphs_ray.stages.edges import symmetrize_edges

    edges, vids = small_edges
    V = vids.count()
    und = symmetrize_edges(edges).materialize()
    full = bfs_hops(und, V, sources=[0])
    bfs_hops(und, V, sources=[0], max_iters=1, checkpoint_dir=ckdir)
    resumed = bfs_hops(
        und, V, sources=[0], checkpoint_dir=ckdir, resume=True
    )
    assert resumed.converged
    assert np.array_equal(resumed.state, full.state)


def test_kcore_resume(small_edges, ckdir):
    from citationgraphs_ray.graph.engine import k_core
    from citationgraphs_ray.stages.edges import symmetrize_edges

    edges, vids = small_edges
    V = vids.count()
    und = symmetrize_edges(edges).materialize()
    full = k_core(und, V, k=3)
    k_core(und, V, k=3, max_iters=1, checkpoint_dir=ckdir)
    resumed = k_core(und, V, k=3, checkpoint_dir=ckdir, resume=True)
    assert resumed.converged
    assert np.array_equal(resumed.state, full.state)


def test_sssp_resume(small_edges, ckdir):
    import pyarrow as pa
    import ray.data

    from citationgraphs_ray.graph.engine import sssp
    from citationgraphs_ray.utils import fast_grouped_agg

    edges, vids = small_edges
    V = vids.count()
    we = fast_grouped_agg(edges, ["src", "dst"], count_as="w").materialize()
    full = sssp(we, V, sources=[0])
    sssp(we, V, sources=[0], max_iters=1, checkpoint_dir=ckdir)
    resumed = sssp(we, V, sources=[0], checkpoint_dir=ckdir, resume=True)
    assert resumed.converged
    assert np.array_equal(resumed.state, full.state)
