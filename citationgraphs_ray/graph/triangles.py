"""Per-vertex triangle counting: degree orientation + two-hop join.

Canonical distributed algorithm (SURVEY.md §2.12; identical join/aggregate
shape to the reference's ``GetDocConcurrences`` per-container distinct-pair
expansion, CitationGraphs.go:835-928):

1. undirected unique edges (u < v), degrees.
2. orient every edge low→high by total order ``ork(x) = deg(x)·(V+1) + x``
   — max oriented out-degree is O(sqrt(E)), which bounds the wedge
   explosion at hubs (the orientation IS the skew handling here).
3. wedges: per center vertex a, all ordered pairs (b, c) of oriented
   out-neighbors — ``groupby(a).map_groups`` pair expansion.
4. probe (b, c) against the oriented edge set → each hit is one triangle
   {a, b, c}. The probe set (E keys ≤ int64 each) is broadcast sorted and
   probed with np.searchsorted; at scales where E no longer fits an object,
   replace with ``Dataset.join`` on the composite key — same semantics.
5. flat-map each triangle to its 3 vertices → ``groupby(id).count``.

Exact-match vs graph/oracle.py:triangles_oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..utils import dataset_to_dense_array, fast_distinct, fast_grouped_agg
from .engine import KernelResult


def triangle_counts(
    edges_undirected: ray.data.Dataset,
    num_vertices: int,
    strategy: str = "auto",
) -> KernelResult:
    """strategy:
    - "broadcast" (default via auto when E fits an object): wedge generation
      as a map stage over vertex ranges against the broadcast SORTED
      oriented edge-key array — the keys a·M+b are contiguous per center a,
      so each task slices its adjacency with two searchsorted calls; no
      shuffle, no per-group Python dispatch (~25x faster than map_groups on
      a dense 1000-vertex graph).
    - "shuffle": groupby(a).map_groups wedge expansion — the huge-E path
      where the edge set no longer fits one object.
    """
    M = num_vertices + 1
    eds = edges_undirected.select_columns(["src", "dst"])

    # unique undirected edges u < v  (dedup via groupby on the canonical form)
    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {"u": pa.array(np.minimum(s, d)), "v": pa.array(np.maximum(s, d))}
        )

    uv = fast_distinct(
        eds.map_batches(canon, batch_format="pyarrow"), ["u", "v"]
    ).materialize()

    # degrees over the undirected unique edges
    deg = np.zeros(num_vertices, dtype=np.int64)
    edge_keys_parts: list[np.ndarray] = []
    for b in uv.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        deg += np.bincount(u, minlength=num_vertices)
        deg += np.bincount(v, minlength=num_vertices)

    ork = deg * M + np.arange(num_vertices, dtype=np.int64)  # orientation rank
    ork_ref = ray.put(ork)

    # orient each edge low-ork → high-ork; collect probe keys a*M+b
    def orient(batch: pa.Table) -> pa.Table:
        r = ray.get(ork_ref)
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        swap = r[u] > r[v]
        a = np.where(swap, v, u)
        b = np.where(swap, u, v)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    oriented = uv.map_batches(orient, batch_format="pyarrow").materialize()
    for bt in oriented.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        a = bt["a"].to_numpy(zero_copy_only=False)
        b = bt["b"].to_numpy(zero_copy_only=False)
        edge_keys_parts.append(a * M + b)
    edge_keys = (
        np.sort(np.concatenate(edge_keys_parts))
        if edge_keys_parts
        else np.empty(0, dtype=np.int64)
    )
    keys_ref = ray.put(edge_keys)
    ork_ref2 = ray.put(ork)

    if strategy == "auto":
        strategy = "broadcast" if len(edge_keys) <= 50_000_000 else "shuffle"

    if strategy == "broadcast":
        # map over vertex ranges; adjacency of each center a is the
        # contiguous key slice [a·M, (a+1)·M) of the broadcast sorted keys
        def wedge_probe_bcast(batch: dict) -> pa.Table:
            keys = ray.get(keys_ref)
            r = ray.get(ork_ref2)
            ids_out: list[np.ndarray] = []
            for a in batch["id"]:
                lo = np.searchsorted(keys, a * M)
                hi = np.searchsorted(keys, (a + 1) * M)
                if hi - lo < 2:
                    continue
                nbrs = keys[lo:hi] - a * M
                nbrs = nbrs[np.argsort(r[nbrs], kind="stable")]
                i, j = np.triu_indices(len(nbrs), k=1)
                b, c = nbrs[i], nbrs[j]
                hit = np.searchsorted(keys, b * M + c)
                ok = (hit < len(keys)) & (
                    keys[np.minimum(hit, len(keys) - 1)] == b * M + c
                )
                b, c = b[ok], c[ok]
                if len(b):
                    ids_out.append(np.full(len(b), a, dtype=np.int64))
                    ids_out.append(b)
                    ids_out.append(c)
            out = (
                np.concatenate(ids_out)
                if ids_out
                else np.empty(0, dtype=np.int64)
            )
            return pa.table({"id": pa.array(out)})

        tri_vertices = ray.data.range(num_vertices, override_num_blocks=64).map_batches(
            wedge_probe_bcast, batch_format="numpy"
        )
    else:
        # wedges per center a via grouped expansion; probe immediately so
        # only matched triangles leave the group
        def wedge_probe(g: pd.DataFrame) -> pd.DataFrame:
            keys = ray.get(keys_ref)
            r = ray.get(ork_ref2)
            nbrs = g["b"].to_numpy()
            if len(nbrs) < 2:
                return pd.DataFrame({"id": np.empty(0, dtype=np.int64)})
            # order neighbors by orientation rank so pairs (b, c) are oriented
            nbrs = nbrs[np.argsort(r[nbrs], kind="stable")]
            i, j = np.triu_indices(len(nbrs), k=1)
            b, c = nbrs[i], nbrs[j]
            hit = np.searchsorted(keys, b * M + c)
            hit_ok = (hit < len(keys)) & (keys[np.minimum(hit, len(keys) - 1)] == b * M + c)
            b, c = b[hit_ok], c[hit_ok]
            center = np.full(len(b), g["a"].iloc[0], dtype=np.int64)
            return pd.DataFrame({"id": np.concatenate([center, b, c])})

        tri_vertices = oriented.groupby("a").map_groups(
            wedge_probe, batch_format="pandas"
        )

    def partial_counts(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(ids, return_inverse=True)
        cnt = np.bincount(inv)
        return pa.table(
            {"id": pa.array(u), "cnt": pa.array(cnt.astype(np.int64))}
        )

    agg = fast_grouped_agg(
        tri_vertices.map_batches(partial_counts, batch_format="pyarrow"),
        ["id"],
        {"cnt": ("cnt", "sum")},
    )
    counts = dataset_to_dense_array(
        agg, "id", "cnt", num_vertices, default=0, dtype=np.int64
    )
    return KernelResult(counts, 1, True, [])
