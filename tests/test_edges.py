"""Minimum slice (SURVEY.md §7.1): corpus → extract → resolve → dedup."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from citationgraphs_ray.corpus import generate_corpus
from citationgraphs_ray.stages.edges import (
    ExtractImportEdges,
    dedup_edges,
    extract_edge_table,
    in_degrees,
    mint_vertex_ids,
    out_degrees,
    sha256_content,
    symmetrize_edges,
)


def test_corpus_deterministic():
    a = generate_corpus(n_repos=10, seed=42)
    b = generate_corpus(n_repos=10, seed=42)
    assert a.table.equals(b.table)
    assert a.expected_edges == b.expected_edges
    c = generate_corpus(n_repos=10, seed=43)
    assert not a.table.equals(c.table)


def test_extraction_matches_generator_ground_truth(small_corpus, small_edges):
    edges, vids = small_edges
    # map ids back to (repo, path)
    vt = vids.to_pandas()
    id2key = {r.id: (r.repo, r.path) for r in vt.itertuples()}
    got = set()
    for b in edges.iter_batches(batch_format="pyarrow"):
        for s, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
            sr, sp = id2key[s]
            dr, dp = id2key[d]
            got.add((sr, sp, dr, dp))
    assert got == small_corpus.expected_edges


def test_resolve_edges_join_equals_broadcast(small_corpus, small_edges):
    """The distributed-hash-join resolve engine must produce the exact
    same edge table as the broadcast dict probe (VERDICT #5: at 10^12
    files the vertex map cannot be a driver dict)."""
    from citationgraphs_ray.stages.edges import resolve_edges

    edges_bc, vids = small_edges  # broadcast path (default at this size)
    ds = ray.data.from_arrow(small_corpus.table)
    slim = ds.select_columns(["repo", "path", "lang", "content"])
    raw = slim.map_batches(
        ExtractImportEdges, batch_format="pyarrow", concurrency=(1, 4)
    )
    edges_join = dedup_edges(resolve_edges(raw, vids, mode="join"))
    a = edges_bc.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = (
        edges_join.to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_extract_fused_equals_staged(small_corpus):
    """The fused extract+resolve+dedup actor stage must produce exactly
    the staged two-pool pipeline's edge table."""
    from citationgraphs_ray.stages.edges import extract_edge_table

    ds = ray.data.from_arrow(small_corpus.table)
    ef, vf = extract_edge_table(ds, mode="fused")
    es, vs = extract_edge_table(ds, mode="staged")
    a = ef.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = es.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert a.equals(b)
    assert vf.count() == vs.count()


def test_extract_distributed_equals_fused(small_corpus):
    """mode="distributed" (forced 10^12-file engines: distributed-sort
    mint, hash-join resolve, shuffle dedup) must produce exactly the
    fused broadcast-regime edge table AND the same vertex-id mapping."""
    from citationgraphs_ray.stages.edges import extract_edge_table

    ds = ray.data.from_arrow(small_corpus.table)
    ef, vf = extract_edge_table(ds, mode="fused")
    ed, vd = extract_edge_table(ds, mode="distributed")
    a = ef.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = ed.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert a.equals(b)
    mf = vf.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    md = vd.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert mf.equals(md)


def test_resolve_hashed_collision_guard_raises():
    """A duplicated (h1, h2) pair in the vertex map must trip the guard
    fused into pass-1's reduce tasks (same-h1 rows share a bucket, so
    per-bucket adjacent-duplicate detection IS the global check)."""
    from citationgraphs_ray.stages.edges import (
        _resolve_hashed,
        _VertexHashCollision,
    )

    vh = pa.table(
        {
            "h1": pa.array([1, 1, 2], type=pa.int64()),
            "h2": pa.array([5, 5, 6], type=pa.int64()),
            "id": pa.array([0, 1, 2], type=pa.int64()),
        }
    )
    eh = pa.table(
        {
            "s1": pa.array([1], type=pa.int64()),
            "s2": pa.array([5], type=pa.int64()),
            "d1": pa.array([2], type=pa.int64()),
            "d2": pa.array([6], type=pa.int64()),
        }
    )
    with pytest.raises(_VertexHashCollision):
        _resolve_hashed(
            ray.data.from_arrow(eh).materialize(),
            ray.data.from_arrow(vh).materialize(),
            num_partitions=4,
        )


def test_extract_distributed_collision_fallback(small_corpus, monkeypatch):
    """When the hashed resolve reports a collision, the distributed path
    must fall back to the exact string join and still produce the
    correct edge table."""
    from citationgraphs_ray.stages import edges as edges_mod

    def always_collide(*a, **k):
        raise edges_mod._VertexHashCollision

    monkeypatch.setattr(edges_mod, "_resolve_hashed", always_collide)
    ds = ray.data.from_arrow(small_corpus.table)
    ed, vd = edges_mod.extract_edge_table(ds, mode="distributed")
    vt = vd.to_pandas()
    id2key = {r.id: (r.repo, r.path) for r in vt.itertuples()}
    got = {
        (*id2key[s], *id2key[d])
        for s, d in zip(*ed.to_pandas()[["src", "dst"]].T.values)
    }
    assert got == small_corpus.expected_edges


def test_extract_distributed_empty_corpus():
    """Zero-row corpus through the forced-distributed path: no edges,
    no vertex ids, no crash in the empty-exchange wiring."""
    empty = pa.table(
        {
            "repo": pa.array([], type=pa.string()),
            "path": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
            "content": pa.array([], type=pa.string()),
        }
    )
    ed, vd = extract_edge_table(ray.data.from_arrow(empty), mode="distributed")
    assert ed.count() == 0
    assert vd.count() == 0


def test_dedup_idempotent_and_no_self_loops(small_edges):
    edges, _ = small_edges
    df = edges.to_pandas()
    assert not df.duplicated(["src", "dst"]).any()
    assert (df.src != df.dst).all()
    again = dedup_edges(ray.data.from_pandas(df)).to_pandas()
    assert len(again) == len(df)


def test_symmetrize(small_edges):
    edges, _ = small_edges
    und = symmetrize_edges(edges).to_pandas()
    pairs = set(zip(und.src, und.dst))
    assert all((d, s) in pairs for s, d in pairs)


def test_vertex_ids_dense_and_sorted(small_corpus):
    ds = ray.data.from_arrow(small_corpus.table)
    vids = mint_vertex_ids(ds).to_pandas().sort_values("id")
    n = small_corpus.table.num_rows
    assert list(vids.id) == list(range(n))
    keys = list(zip(vids.repo, vids.path))
    assert keys == sorted(keys)


def test_vertex_ids_driver_equals_distributed(small_corpus):
    """Both rank engines (driver C++ sort vs Ray sort + zip_with_index)
    mint byte-identical (repo, path, id) tables."""
    ds = ray.data.from_arrow(small_corpus.table)
    drv = (
        mint_vertex_ids(ds, mode="driver")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    dst = (
        mint_vertex_ids(ds, mode="distributed")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert drv.equals(dst)


def test_vertex_ids_distributed_dedups_duplicated_keys(small_corpus):
    """The distributed mint folds the distinct into its bucket shuffle —
    a doubled corpus must mint the exact same (repo, path, id) table."""
    doubled = pa.concat_tables([small_corpus.table, small_corpus.table])
    a = (
        mint_vertex_ids(ray.data.from_arrow(small_corpus.table), mode="distributed")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    b = (
        mint_vertex_ids(ray.data.from_arrow(doubled), mode="distributed")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_degrees_consistent(small_edges):
    edges, _ = small_edges
    df = edges.to_pandas()
    od = out_degrees(edges).to_pandas().set_index("id")["out_degree"]
    idg = in_degrees(edges).to_pandas().set_index("id")["in_degree"]
    exp_out = df.groupby("src").size()
    exp_in = df.groupby("dst").size()
    assert od.sort_index().equals(exp_out.sort_index().rename("out_degree"))
    assert idg.sort_index().equals(exp_in.sort_index().rename("in_degree"))
    assert od.sum() == len(df) == idg.sum()


def test_content_sha_invariant(small_corpus):
    ds = ray.data.from_arrow(small_corpus.table)
    edges, _ = extract_edge_table(ds)
    edges.materialize()  # run the pipeline
    shas = (
        ds.map_batches(sha256_content, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["repo", "path"])
    )
    src = small_corpus.table.to_pandas().sort_values(["repo", "path"])
    expected = [hashlib.sha256(c.encode()).hexdigest() for c in src.content]
    assert list(shas.sha256) == expected


def test_empty_edge_rows_markdown():
    corp = generate_corpus(n_repos=5, seed=7)
    tbl = corp.table
    ex = ExtractImportEdges()
    md_mask = pa.compute.equal(tbl["lang"], "markdown")
    md_only = tbl.filter(md_mask)
    if md_only.num_rows:
        assert ex(md_only).num_rows == 0


def test_vertex_probe_fast_equals_exact():
    """VertexProbe's hash fast path and the exact pandas fallback must
    agree, including misses (dangling keys) and chunked-array inputs."""
    from citationgraphs_ray.stages.edges import VertexProbe

    tbl = pa.table(
        {
            "repo": [f"org{i % 7}/repo{i}" for i in range(500)],
            "path": [f"src/m{i}.py" for i in range(500)],
            "id": list(range(500)),
        }
    )
    fast = VertexProbe.build(tbl)
    exact = VertexProbe.build(tbl, force_exact=True)
    assert fast.exact is None and exact.exact is not None
    assert len(fast) == len(exact) == 500
    repo = pa.chunked_array(
        [
            ["org0/repo0", "org1/repo8", "nowhere/none"],
            ["org3/repo3", "org0/repo7"],
        ]
    )
    path = pa.chunked_array(
        [["src/m0.py", "src/m8.py", "src/m1.py"], ["src/m3.py", "src/m7.py"]]
    )
    a = fast.probe(repo, path)
    b = exact.probe(repo, path)
    assert a.tolist() == b.tolist() == [0, 8, -1, 3, 7]


def test_extract_fused_dedups_duplicated_corpus_rows():
    """The fused skip-global-distinct gate must detect duplicated
    (repo, path) corpus rows and keep the full dedup shuffle."""
    corp = generate_corpus(n_repos=8, seed=42)
    doubled = pa.concat_tables([corp.table, corp.table])
    e_dup, _ = extract_edge_table(ray.data.from_arrow(doubled), mode="fused")
    e_ref, _ = extract_edge_table(
        ray.data.from_arrow(corp.table), mode="fused"
    )
    a = e_dup.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = e_ref.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert not a.duplicated(["src", "dst"]).any()
    assert a.equals(b)


def test_vectorized_extractor_equals_python_loop(small_corpus):
    """The polars (Rust-regex) extraction kernel must emit exactly the
    Python ``finditer`` loop's rows (same multiset — order-insensitive),
    including the awkward cases: null/empty content, non-python lang,
    trailing whitespace on import lines, multiple matches per file."""
    from citationgraphs_ray.stages.edges import ExtractImportEdges

    ex = ExtractImportEdges()
    edge_cases = pa.table(
        {
            "repo": ["o/r1", "o/r2", "o/r3", "o/r4", "o/r5", "o/r6"],
            "path": [f"src/f{i}.py" for i in range(6)],
            "lang": ["python", "python", "python", "go", "python", "python"],
            "content": [
                None,
                "",
                "import m1  \nimport m2\nfrom o/r1.m3 import x\n",
                "import m4\n",  # non-python: no rows
                "  import m5\n# import m6\nfrom bad .m7 import x\n",
                "import m8\nimport m8\n",  # duplicate emits kept
            ],
        }
    )
    for batch in (small_corpus.table, edge_cases):
        a = ex(batch).to_pandas()
        b = ex._call_py(batch).to_pandas()
        cols = list(a.columns)
        a = a.sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), f"mismatch: {len(a)} vs {len(b)} rows"
        assert [str(t) for t in ex(batch).schema.types] == ["string"] * 4


def test_extract_distributed_direct_read_equals_fused(small_corpus, tmp_path):
    """A parquet-backed corpus must take the direct-read regime (fused
    read+extract+bucket tasks — content never enters the object store)
    and produce exactly the fused-mode edge table and vertex ids."""
    from citationgraphs_ray.corpus import write_corpus_parquet
    from citationgraphs_ray.stages.edges import (
        _corpus_parquet_paths,
        extract_edge_table,
    )

    ds = ray.data.read_parquet(
        write_corpus_parquet(small_corpus, str(tmp_path / "pq"))
    )
    paths, _fs = _corpus_parquet_paths(ds)
    assert paths, "bare read_parquet must be detected as direct-readable"
    ef, vf = extract_edge_table(ds, mode="fused")
    ed, vd = extract_edge_table(ds, mode="distributed")
    # the parquet-backed fused path (direct-read tasks) must also equal
    # the in-memory fused path (map_batches actor stage)
    em, _ = extract_edge_table(
        ray.data.from_arrow(small_corpus.table), mode="fused"
    )
    a0 = ef.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b0 = em.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert a0.equals(b0)
    a = ef.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = ed.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert a.equals(b)
    mf = vf.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    md = vd.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert mf.equals(md)
    # transforms beyond projection must NOT take the direct path
    p2, _ = _corpus_parquet_paths(ds.filter(lambda r: True))
    assert p2 is None


def test_extract_distributed_direct_collision_fallback(
    small_corpus, tmp_path, monkeypatch
):
    """The direct-read regime's _VertexHashCollision handler (fresh
    distributed mint + exact string join) must produce the correct edge
    table — forced by making the hashed resolve always collide."""
    from citationgraphs_ray.corpus import write_corpus_parquet
    from citationgraphs_ray.stages import edges as edges_mod

    def always_collide(*a, **k):
        raise edges_mod._VertexHashCollision

    monkeypatch.setattr(edges_mod, "_resolve_hashed", always_collide)
    ds = ray.data.read_parquet(
        write_corpus_parquet(small_corpus, str(tmp_path / "pq"))
    )
    paths, _ = edges_mod._corpus_parquet_paths(ds)
    assert paths, "must exercise the DIRECT path's fallback branch"
    ed, vd = edges_mod.extract_edge_table(ds, mode="distributed")
    vt = vd.to_pandas()
    id2key = {r.id: (r.repo, r.path) for r in vt.itertuples()}
    got = {
        (*id2key[s], *id2key[d])
        for s, d in zip(*ed.to_pandas()[["src", "dst"]].T.values)
    }
    assert got == small_corpus.expected_edges
