"""Edge extraction + graph construction over Ray Data.

This is the north-rule edge-extraction stage (SURVEY.md §2.12): the
reference builds its graph by mutating per-node ``Refs``/``Cites`` slices
from CSV edge rows (CitationGraphs.go:1528-1540 — G1) and dedups /
symmetrizes on save via nested sets (CitationGraphs.go:2003-2026 — G2).
Here the canonical representation is an **edge table** ``(src:int64,
dst:int64)``; adjacency is always derived, never node-embedded.

Pipeline (streaming, zero-copy Arrow):

    read_parquet(corpus, columns=[repo,path,lang,content])
      → map_batches(ExtractImportEdges)        # stateless, regex per actor
      → resolve (repo,path)→id                 # broadcast vertex map / join
      → drop self-loops, groupby(src,dst) dedup
      → write_parquet / downstream kernels

``content`` is projected away inside the extraction stage so the wide blob
column never reaches a shuffle (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..utils import collect_table, fast_distinct, fast_grouped_agg, zip_with_index

# Regexes matching the synthetic corpus grammar (corpus.py): same-repo
# ``import m<k>`` lines and cross-repo ``from org<A>/repo<B>.m<k> import``
# lines. Real-world extractors plug in here (user-extension hook, SURVEY.md
# §2.11): any callable str -> list[(dst_repo_or_None, dst_module)].
_SAME_REPO = re.compile(r"^import m(\d+)\s*$", re.MULTILINE)
_CROSS_REPO = re.compile(r"^from ([\w./-]+/[\w.-]+)\.m(\d+) import", re.MULTILINE)


class ExtractImportEdges:
    """Stateless-per-batch edge extractor (actor pool so regexes compile once).

    In: corpus batch (repo, path, lang, content). Out: raw string-keyed edge
    rows (src_repo, src_path, dst_repo, dst_path) — unresolved, undeduped.
    Markdown/go files simply yield no rows (empty-edge case). The reference
    analog is keyphrase-candidate extraction per title (CitationGraphs.go
    call sites 2065/2414) restated as content → import targets.
    """

    def __init__(self) -> None:
        self.same_repo = _SAME_REPO
        self.cross_repo = _CROSS_REPO

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        langs = batch["lang"].to_pylist()
        contents = batch["content"].to_pylist()
        sr: list[str] = []
        sp: list[str] = []
        dr: list[str] = []
        dp: list[str] = []
        for repo, path, lang, content in zip(repos, paths, langs, contents):
            if lang != "python" or not content:
                continue
            for m in self.same_repo.finditer(content):
                sr.append(repo)
                sp.append(path)
                dr.append(repo)
                dp.append(f"src/m{m.group(1)}.py")
            for m in self.cross_repo.finditer(content):
                sr.append(repo)
                sp.append(path)
                dr.append(m.group(1))
                dp.append(f"src/m{m.group(2)}.py")
        return pa.table(
            {
                "src_repo": pa.array(sr, type=pa.string()),
                "src_path": pa.array(sp, type=pa.string()),
                "dst_repo": pa.array(dr, type=pa.string()),
                "dst_path": pa.array(dp, type=pa.string()),
            }
        )


def sha256_content(batch: pa.Table) -> pa.Table:
    """Append per-row sha256(content) — the input_hint invariant column.

    The pipeline never mutates the corpus, so sha256 before == sha256 after
    any stage; tests assert equality against a fresh read of the source.
    Stateless task stage (plain function).
    """
    shas = [
        hashlib.sha256(c.encode() if c is not None else b"").hexdigest()
        for c in batch["content"].to_pylist()
    ]
    return pa.table(
        {
            "repo": batch["repo"],
            "path": batch["path"],
            "sha256": pa.array(shas),
        }
    )


def mint_vertex_ids(
    corpus: ray.data.Dataset, mode: str = "auto"
) -> ray.data.Dataset:
    """Dense int64 vertex ids for every file: rank over sorted (repo, path).

    Deterministic and order-independent (unlike the reference's first-seen
    vocab ids, CitationGraphs.go:143-147, which depend on map iteration
    order). Returns ``(repo, path, id)``.

    Two equivalent rank engines (equivalence-tested):

    - ``driver`` (the broadcast regime, vertex map ≤
      ``BROADCAST_RESOLVE_MAX_ROWS``): one C++ ``Table.sort_by`` on the
      collected distinct table. The map is driver-held in this regime
      anyway (the fused extraction probe ``ray.put``s it), and Ray's
      distributed sort costs ~2-4 s of sample/range-partition fixed
      overhead that dominates small-table minting — the profiled residual
      in the round-2 extraction scaling numbers.
    - ``distributed`` (the 10^12-file path): Ray range-partitioned sort +
      block-offset ``zip_with_index``; no driver object ever holds V rows.
    """
    verts = fast_distinct(
        corpus.select_columns(["repo", "path"]), ["repo", "path"]
    )
    if mode == "auto":
        mode = (
            "driver"
            if verts.count() <= BROADCAST_RESOLVE_MAX_ROWS
            else "distributed"
        )
    if mode == "driver":
        tbl = collect_table(verts).combine_chunks()
        tbl = tbl.sort_by([("repo", "ascending"), ("path", "ascending")])
        tbl = tbl.append_column(
            "id", pa.array(np.arange(len(tbl), dtype=np.int64))
        )
        return ray.data.from_arrow(tbl)
    return zip_with_index(verts.sort(["repo", "path"]), col="id")


# Vertex-map rows above which resolve_edges switches from the broadcast
# dict probe to distributed hash joins (the map no longer fits one object
# at 10^12-file scale).
BROADCAST_RESOLVE_MAX_ROWS = 5_000_000


def resolve_edges(
    raw_edges: ray.data.Dataset,
    vertex_ids: ray.data.Dataset,
    mode: str = "auto",
    num_join_partitions: int | None = None,
) -> ray.data.Dataset:
    """Resolve string-keyed edges to ``(src:int64, dst:int64)``.

    Two equivalent engines (parametrized-tested identical):

    - ``broadcast`` (small V): the vertex map is ``ray.put`` once and
      probed per batch — the SURVEY.md §2.7 broadcast-join pattern for
      the reference's ``Nodes`` dict probes (CitationGraphs.go:1536-1537).
    - ``join`` (the 10^12-file path, where no single object can hold the
      map): two distributed hash joins on (repo, path) — resolve src,
      then dst; inner joins drop unresolvable endpoints exactly like the
      broadcast probe drops them.

    ``mode="auto"`` picks by vertex-map size. Self-loops are dropped in
    both. Unresolvable dsts (dangling imports) are dropped, mirroring
    "unresolved-edge dropping" in FIXTURES.md.
    """
    if mode == "auto":
        mode = (
            "broadcast"
            if vertex_ids.count() <= BROADCAST_RESOLVE_MAX_ROWS
            else "join"
        )
    if mode == "join":
        if num_join_partitions is None:
            # Ray's hash-shuffle join schedules one aggregator actor per
            # partition; more partitions than CPUs deadlocks a small
            # session (observed: p=32 hangs at num_cpus=4).
            num_join_partitions = min(
                64, max(2, int(ray.cluster_resources().get("CPU", 8)))
            )
        vs = vertex_ids.map_batches(
            lambda t: pa.table(
                {"src_repo": t["repo"], "src_path": t["path"], "src": t["id"]}
            ),
            batch_format="pyarrow",
        )
        vd = vertex_ids.map_batches(
            lambda t: pa.table(
                {"dst_repo": t["repo"], "dst_path": t["path"], "dst": t["id"]}
            ),
            batch_format="pyarrow",
        )
        j = raw_edges.join(
            vs, "inner", num_join_partitions, on=("src_repo", "src_path")
        ).join(vd, "inner", num_join_partitions, on=("dst_repo", "dst_path"))

        def finish(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = src != dst
            return pa.table(
                {"src": pa.array(src[keep]), "dst": pa.array(dst[keep])}
            )

        return j.map_batches(finish, batch_format="pyarrow")

    keys_ref = ray.put(_vertex_lookup(vertex_ids))

    class Resolve:
        """Vectorized probe: keys joined with an Arrow kernel, looked up
        via a pandas hash index (C) — the old per-row dict loop was 15 s
        at 7M edge rows."""

        def __init__(self) -> None:
            self.lookup = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            sk = pc.binary_join_element_wise(
                batch["src_repo"].combine_chunks(),
                batch["src_path"].combine_chunks(),
                "\x00",
            ).to_pandas()
            dk = pc.binary_join_element_wise(
                batch["dst_repo"].combine_chunks(),
                batch["dst_path"].combine_chunks(),
                "\x00",
            ).to_pandas()
            s = sk.map(self.lookup).to_numpy(dtype=np.float64, na_value=np.nan)
            d = dk.map(self.lookup).to_numpy(dtype=np.float64, na_value=np.nan)
            keep = ~np.isnan(s) & ~np.isnan(d) & (s != d)
            return pa.table(
                {
                    "src": pa.array(s[keep].astype(np.int64)),
                    "dst": pa.array(d[keep].astype(np.int64)),
                }
            )

    return raw_edges.map_batches(Resolve, batch_format="pyarrow", concurrency=(1, 32))


def dedup_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Exact edge dedup: hash-partition on (src, dst), first per group.

    Reference analog: nested-set dedup on save (CitationGraphs.go:2003-2026).
    groupby is the shuffle; the count column is projected away.
    """
    return fast_distinct(edges, ["src", "dst"])


def symmetrize_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Undirected view: union(edges, reversed(edges)) then exact dedup.

    Reference analog: SaveCitationGraph's union of Refs and reversed Cites
    (CitationGraphs.go:2003-2026). Self-loops assumed already dropped.
    """
    # normalize both branches to Arrow blocks: upstream pandas-block stages
    # (map_groups) mixed with arrow blocks break union/materialize
    fwd = edges.map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
        batch_format="pyarrow",
    )
    rev = edges.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow",
    )
    return dedup_edges(fwd.union(rev))


def out_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(id, out_degree) via groupby(src).count() — adjacency is derived."""
    out = fast_grouped_agg(edges, ["src"], count_as="out_degree")
    return out.map_batches(
        lambda t: pa.table({"id": t["src"], "out_degree": t["out_degree"]}),
        batch_format="pyarrow",
    )


def in_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(id, in_degree) via groupby(dst).count() — the reference's in-citation
    count shape (CitationGraphs.go:3947-3961)."""
    out = fast_grouped_agg(edges, ["dst"], count_as="in_degree")
    return out.map_batches(
        lambda t: pa.table({"id": t["dst"], "in_degree": t["in_degree"]}),
        batch_format="pyarrow",
    )


def add_salt(
    edges: ray.data.Dataset,
    hot_dsts: np.ndarray,
    num_salts: int = 8,
) -> ray.data.Dataset:
    """Degree-threshold salting (SURVEY.md §4.3): split rows whose ``dst``
    is a hub into ``(dst, salt)`` sub-keys so the message-reduce shuffle has
    no single hot partition; a second small aggregate merges the partials.

    ``hot_dsts`` is the (small) array of vertex ids whose in-degree exceeds
    the threshold — broadcast, probed with np.isin per batch.
    """
    hot_ref = ray.put(np.sort(hot_dsts.astype(np.int64)))

    class Salt:
        def __init__(self) -> None:
            self.hot = ray.get(hot_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            src = batch["src"].to_numpy(zero_copy_only=False)
            is_hot = (
                np.isin(dst, self.hot)
                if len(self.hot)
                else np.zeros(len(dst), dtype=bool)
            )
            salt = np.where(is_hot, src % num_salts, 0).astype(np.int64)
            return pa.table(
                {"src": batch["src"], "dst": batch["dst"], "salt": pa.array(salt)}
            )

    return edges.map_batches(Salt, batch_format="pyarrow", concurrency=(1, 8))


def _vertex_lookup(vertex_ids: ray.data.Dataset):
    """(repo\\0path) → id pandas hash index (the broadcast probe side)."""
    import pandas as pd

    vert_tbl = collect_table(vertex_ids)
    key_arr = pc.binary_join_element_wise(
        vert_tbl["repo"].combine_chunks(),
        vert_tbl["path"].combine_chunks(),
        "\x00",
    )
    return pd.Series(
        vert_tbl["id"].to_numpy(zero_copy_only=False).astype(np.int64),
        index=key_arr.to_pandas(),
    )


class ExtractResolveEdges(ExtractImportEdges):
    """Fused extract → resolve → per-block dedup in ONE actor stage.

    The two-stage form ships every raw string edge row (4 string columns)
    through the object store between the extract and resolve pools; fusing
    probes the broadcast vertex map right where the edges are born and
    emits already-distinct int64 pairs per block — one actor-pool ramp-up
    and a full plasma pass less (the extraction stage's dominant
    non-compute cost at bench scale).
    """

    def __init__(self, lookup_ref) -> None:
        super().__init__()
        self.lookup = ray.get(lookup_ref)
        self.M = len(self.lookup) + 1  # composite-key modulus for dedup

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = super().__call__(batch)
        sk = pc.binary_join_element_wise(
            raw["src_repo"].combine_chunks(),
            raw["src_path"].combine_chunks(),
            "\x00",
        ).to_pandas()
        dk = pc.binary_join_element_wise(
            raw["dst_repo"].combine_chunks(),
            raw["dst_path"].combine_chunks(),
            "\x00",
        ).to_pandas()
        s = sk.map(self.lookup).to_numpy(dtype=np.float64, na_value=np.nan)
        d = dk.map(self.lookup).to_numpy(dtype=np.float64, na_value=np.nan)
        keep = ~np.isnan(s) & ~np.isnan(d) & (s != d)
        src = s[keep].astype(np.int64)
        dst = d[keep].astype(np.int64)
        # per-block partial dedup (ids < M, so the composite fits int64 in
        # the broadcast regime this fused path is gated to)
        uniq = np.unique(src * self.M + dst)
        return pa.table(
            {"src": pa.array(uniq // self.M), "dst": pa.array(uniq % self.M)}
        )


def extract_edge_table(
    corpus: ray.data.Dataset,
    mode: str = "auto",
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Full minimum-slice pipeline (SURVEY.md §7.1).

    corpus → extract → mint ids → resolve → dedup. Returns
    ``(edges(src,dst), vertex_ids(repo,path,id))``.

    ``mode="fused"`` (the auto pick when the vertex map fits one object)
    runs extract+resolve+partial-dedup as ONE actor stage
    (``ExtractResolveEdges``); ``mode="staged"`` keeps the two-pool form —
    the only choice when the vertex map must be joined distributively.
    Both modes are equivalence-tested.
    """
    vids = mint_vertex_ids(corpus)
    if mode == "auto":
        mode = (
            "fused"
            if vids.count() <= BROADCAST_RESOLVE_MAX_ROWS
            else "staged"
        )
    slim = corpus.select_columns(["repo", "path", "lang", "content"])
    if mode == "fused":
        keys_ref = ray.put(_vertex_lookup(vids))
        partial = slim.map_batches(
            ExtractResolveEdges,
            fn_constructor_kwargs={"lookup_ref": keys_ref},
            batch_format="pyarrow",
            concurrency=(1, 32),
        )
        edges = fast_distinct(partial, ["src", "dst"])
    else:
        raw = slim.map_batches(
            ExtractImportEdges, batch_format="pyarrow", concurrency=(1, 32)
        )
        edges = dedup_edges(resolve_edges(raw, vids))
    return edges, vids
