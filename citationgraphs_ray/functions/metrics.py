"""Community-comparison metrics (SURVEY.md §2.8, X1-X11).

The reference computes all of these over in-memory maps
(CitationGraphs.go:3135-3608). Here the heavy input is reduced FIRST to a
small contingency table via the canonical shape — ``assign1 ⋈ assign2 on id
→ groupby(c1, c2).count()`` — and the scalar information-theoretic math
runs on that table driver-side (it has at most |C1|·|C2| rows, independent
of n). Soft-membership metrics (modularity/CPM) use block matrix products
against a broadcast normalized membership matrix.

Definitions pinned (deterministic; the oracle tests mirror them):
- pair counts use unordered pairs C(x,2)
- MI/entropies in nats; NMI = 2·MI/(H1+H2); AMI = (MI-EMI)/(max(H1,H2)-EMI)
- EMI: exact hypergeometric expectation (Vinh et al., JMLR 2010), computed
  with lgamma (reference: numCombs exact combinatorics, 3496-3546)
- soft modularity: ordered pairs including i==j —
  Σ_c Σ_{i,j∈c} (cos(m_i,m_j) − s_i·s_j / T), s_i = Σ_j cos(m_i,m_j) over
  ALL j, T = Σ_i s_i  (CompareByModularity, 3135-3202)
- CPM: Σ_c Σ_{i,j∈c} (cos − γ)  (CompareByCPM, 3206-3232)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..utils import collect_table, list_column_to_matrix


# ---------------------------------------------------------------------------
# Contingency table + hard-partition metrics (X3-X8)
# ---------------------------------------------------------------------------


def contingency_table(
    assign1: ray.data.Dataset, assign2: ray.data.Dataset, num_partitions: int = 8
) -> pd.DataFrame:
    """(c1, c2, n) from two (id, community) assignment tables — hash join on
    id then grouped count (SURVEY.md X3). Result is small; returned as
    pandas for the scalar math."""
    j = assign1.join(
        assign2,
        join_type="inner",
        num_partitions=num_partitions,
        on=("id",),
        left_suffix="_1",
        right_suffix="_2",
    )
    cols = [c for c in j.schema().names if c != "id"]
    ct = j.groupby(cols).count().to_pandas()
    ct.columns = ["c1", "c2", "n"]
    return ct


@dataclass
class PartitionComparison:
    ri: float
    ari: float
    mi: float
    nmi: float
    ami: float
    h1: float
    h2: float
    emi: float


def _c2(x: np.ndarray | float) -> np.ndarray | float:
    return x * (x - 1) / 2.0


def compare_partitions(ct: pd.DataFrame) -> PartitionComparison:
    """All X3-X8 metrics from one contingency table."""
    nij = ct.pivot_table(index="c1", columns="c2", values="n", fill_value=0).to_numpy(
        dtype=np.float64
    )
    a = nij.sum(axis=1)  # sizes of partition-1 communities
    b = nij.sum(axis=0)
    n = nij.sum()
    # Rand index / ARI from pair counts
    sum_ij = _c2(nij).sum()
    sum_a = _c2(a).sum()
    sum_b = _c2(b).sum()
    total_pairs = _c2(n)
    ri = (total_pairs + 2 * sum_ij - sum_a - sum_b) / total_pairs
    exp_ij = sum_a * sum_b / total_pairs
    denom = 0.5 * (sum_a + sum_b) - exp_ij
    ari = (sum_ij - exp_ij) / denom if denom != 0 else 1.0
    # entropies (nats) and MI
    pa_ = a / n
    pb = b / n
    h1 = float(-np.sum(pa_[pa_ > 0] * np.log(pa_[pa_ > 0])))
    h2 = float(-np.sum(pb[pb > 0] * np.log(pb[pb > 0])))
    pij = nij / n
    mask = pij > 0
    outer = np.outer(pa_, pb)
    mi = float(np.sum(pij[mask] * np.log(pij[mask] / outer[mask])))
    nmi = 2 * mi / (h1 + h2) if (h1 + h2) > 0 else 1.0
    emi = expected_mutual_information(a.astype(int), b.astype(int), int(n))
    d = max(h1, h2) - emi
    ami = (mi - emi) / d if d != 0 else 1.0
    return PartitionComparison(ri, ari, mi, nmi, ami, h1, h2, emi)


def expected_mutual_information(a: np.ndarray, b: np.ndarray, n: int) -> float:
    """Exact EMI under the hypergeometric null (Vinh et al. 2010), via
    lgamma — the reference computes the identical expectation with exact
    combinatorial products (ComputeEMI/numCombs, 3550-3590/3496-3546)."""
    lg = math.lgamma
    emi = 0.0
    for ai in a:
        for bj in b:
            lo = max(1, ai + bj - n)
            hi = min(ai, bj)
            for nij in range(lo, hi + 1):
                p = math.exp(
                    lg(ai + 1)
                    - lg(nij + 1)
                    - lg(ai - nij + 1)
                    + lg(n - ai + 1)
                    - lg(bj - nij + 1)
                    - lg(n - ai - bj + nij + 1)
                    - (lg(n + 1) - lg(bj + 1) - lg(n - bj + 1))
                )
                emi += p * (nij / n) * math.log(n * nij / (ai * bj))
    return emi


# ---------------------------------------------------------------------------
# Soft memberships (X1, X2, X9, X11)
# ---------------------------------------------------------------------------


def communities_from_memberships(memberships: ray.data.Dataset) -> ray.data.Dataset:
    """(id, community) — argmax over the membership vector, first max wins
    (GetCommunitiesFromMemberships, 3236-3259)."""

    def fn(batch: pa.Table) -> pa.Table:
        try:
            comm = np.argmax(
                list_column_to_matrix(batch["membership"]), axis=1
            ).astype(np.int64)
        except ValueError:  # ragged / empty membership rows
            vecs = batch["membership"].to_pylist()
            comm = np.array(
                [int(np.argmax(v)) if v else -1 for v in vecs], dtype=np.int64
            )
        return pa.table({"id": batch["id"], "community": pa.array(comm)})

    return memberships.map_batches(fn, batch_format="pyarrow")


def _normalized_matrix(memberships: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    tbl = collect_table(memberships)
    ids = tbl["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = list_column_to_matrix(tbl["membership"])
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def soft_modularity(
    memberships: ray.data.Dataset, communities: ray.data.Dataset
) -> float:
    """X1: block-parallel cosine sums. s = N @ (N.T @ 1) computed as
    map_batches block products against the broadcast normalized matrix —
    O(n·k) per block, no n×n materialization."""
    ids, N = _normalized_matrix(memberships)
    N_ref = ray.put(N)
    colsum = N.sum(axis=0)  # Σ_j n_j  (k-vector)
    s = N @ colsum  # s_i = Σ_j cos(i,j)
    T = float(s.sum())
    id_pos = {int(v): i for i, v in enumerate(ids)}

    comm = communities.to_pandas()
    mod = 0.0
    for _, grp in comm.groupby("community"):
        pos = np.array([id_pos[int(i)] for i in grp["id"]], dtype=np.int64)
        sub = N[pos]
        # Σ_{i,j∈c} cos(i,j) = ||Σ_{i∈c} n_i||² — O(|c|·k), no |c|² blowup
        csum = sub.sum(axis=0)
        cos_sum = float(csum @ csum)
        s_sub = s[pos]
        mod += cos_sum - float(s_sub.sum() ** 2) / T
    return mod


def cpm(
    memberships: ray.data.Dataset, communities: ray.data.Dataset, gamma: float = 0.5
) -> float:
    """X2: Σ_c Σ_{i,j∈c} (cos − γ), ordered pairs incl. i==j."""
    ids, N = _normalized_matrix(memberships)
    id_pos = {int(v): i for i, v in enumerate(ids)}
    comm = communities.to_pandas()
    total = 0.0
    for _, grp in comm.groupby("community"):
        pos = np.array([id_pos[int(i)] for i in grp["id"]], dtype=np.int64)
        csum = N[pos].sum(axis=0)
        total += float(csum @ csum) - gamma * len(pos) ** 2
    return total


def check_memberships(memberships: ray.data.Dataset, expected_n: int) -> None:
    """X11 invariants (checkMemberships, 3081-3098): covers all n ids,
    consistent vector dims."""
    n = memberships.count()
    if n != expected_n:
        raise ValueError(f"memberships rows {n} != expected {expected_n}")
    dims = memberships.map_batches(
        lambda t: pa.table(
            {"d": pa.array({len(v) for v in t["membership"].to_pylist()})}
        ),
        batch_format="pyarrow",
    ).unique("d")
    if len(dims) != 1:
        raise ValueError(f"inconsistent membership dims: {sorted(dims)}")


def check_communities(communities: ray.data.Dataset, expected_n: int) -> None:
    """X11 (checkCommunities, 3102-3110): sizes sum to n, no id twice."""
    n = communities.count()
    distinct = communities.unique("id")
    if n != expected_n or len(distinct) != expected_n:
        raise ValueError(
            f"communities cover {len(distinct)}/{n} ids, expected {expected_n}"
        )


def memb_cos(a: np.ndarray | list[float], b: np.ndarray | list[float]) -> float:
    """M10 (membCos, CitationGraphs.go:3114-3131): cosine similarity of two
    membership vectors; 0 if either is a zero vector."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b / (na * nb))


def community_ids_from_communities(
    communities: list[set[int]],
) -> ray.data.Dataset:
    """X10 (getCommunityIDsFromCommunities, 3263-3271): invert a list of
    member-sets into the (id, community) assignment table."""
    ids: list[int] = []
    comms: list[int] = []
    for c, members in enumerate(communities):
        for m in sorted(members):
            ids.append(m)
            comms.append(c)
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "community": pa.array(comms, type=pa.int64()),
            }
        )
    )
