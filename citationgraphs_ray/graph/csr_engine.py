"""CSR actor-pool engine: fixed partitions hosted by a sized worker pool.

The scale-out counterpart of the broadcast engine (engine.py). Design
(SURVEY.md §4.3, BASELINE.json north_rule):

- The edge table is hash-partitioned ONCE by ``src % P`` into partitioned
  Parquet (``part=<p>/``) — the resumable on-disk layout. **P is a property
  of the run** (recorded in every checkpoint manifest), not of the cluster.
- **W worker actors** (default ``min(session CPUs, P)``) each own the
  partitions ``{p : p % W == wid}`` — exactly
  how a fixed partitioned layout maps onto an N- vs 4N-node cluster. This
  sizing is load-bearing for scaling measurements: a *running* Ray actor
  reserves zero CPUs, so one-actor-per-partition would execute all P
  actors concurrently regardless of ``ray.init(num_cpus=...)`` and an
  8-vs-32-CPU experiment would silently measure the full host twice
  (observed: identical throughput at both "cluster sizes"). W sized to the
  session's CPU count restores a real parallelism limit — W
  single-threaded worker processes.
- Per owned partition, a worker builds once: CSR out-degrees plus static
  per-destination routing — ``srcidx`` (local src index per edge, grouped
  by destination partition; the per-superstep gather ``contrib[srcidx]``
  reads a small cache-resident vector), ``inv`` (compacted dst bincount
  bins) and ``dq`` (compacted local dst ids). The ``dq`` arrays are
  exchanged to the destination partition's owner ONCE; supersteps ship
  **values only** (sums / mins / keyed counts).
- Superstep = BSP scatter/gather: each worker bundles its per-(p, q)
  message slices into ONE plasma object per destination worker (≤ W²
  objects/superstep, not P² — 16× fewer ``ray.put``s when a P=32 run
  executes on W=8); receivers fetch exactly their bundles actor-to-actor
  and the driver only routes refs and sums W scalars.
- Checkpoints are **per partition** (not per worker): each worker writes
  shards for its owned partitions, the manifest (completion marker) is
  written last — so a run checkpointed at one cluster size resumes at
  another.

Rationale for raw actors: Ray Data's map_batches actor pools don't pin a
stable partition→actor assignment across iterations, so per-partition
mutable CSR state genuinely can't be expressed in the Dataset API — this is
the documented escape hatch. Everything around it (partitioning, layout,
message pre-aggregation) keeps the Dataset/groupby shapes.

Kernels: PageRank, connected components, label propagation — all
equivalence-tested against the broadcast engine and the NumPy oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..state.checkpoints import CheckpointManager
from .engine import edge_checksum_and_count

_I64MAX = np.iinfo(np.int64).max

# Auto worker sizing: every superstep pays a W-proportional coordination
# term (2W driver→actor RPCs + up to W² bundled message objects; on one
# box all through a shared plasma store) while per-worker compute is E/W,
# so small graphs want few workers. Measured on the 1.6M-edge headline
# graph at 32 session CPUs: PageRank 44.8 ms/step at W=4 vs 410 ms/step
# at W=32 — 9× end-to-end for the identical result. One worker per ~1M
# edges keeps the compute term dominant; explicit ``num_workers``
# overrides (the multi-node setting, where each node adds memory
# bandwidth and its own object store, may justify more).
CSR_EDGES_PER_WORKER = int(
    os.environ.get("GRAFT_CSR_EDGES_PER_WORKER", "1000000")
)


def _sum_by_partition(dicts: list[dict[int, float]]) -> float:
    """Sum per-partition scalars in ascending partition order — float
    summation order (hence the global bit pattern) stays independent of how
    partitions are grouped onto workers."""
    merged: dict[int, float] = {}
    for d in dicts:
        merged.update(d)
    return sum(merged[p] for p in sorted(merged))


def partition_edges(
    edges: ray.data.Dataset,
    out_dir: str,
    num_partitions: int,
    weight_col: str | None = None,
) -> str:
    """Hash-partition the edge table by src % P into partitioned Parquet
    (optionally carrying an integer edge-weight column for SSSP)."""

    def add_part(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((src % num_partitions).astype(np.int64))
        )

    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    (
        edges.select_columns(cols)
        .map_batches(add_part, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["part"])
    )
    return out_dir


class _Partition:
    """Worker-local state of one hash partition (plain object, not an actor)."""

    def __init__(self, pid: int, P: int, V: int) -> None:
        self.pid = pid
        self.P = P
        self.V = V
        self.n_local = (V - pid + P - 1) // P
        self.out_deg: np.ndarray | None = None
        self.state: np.ndarray | None = None
        # per-destination-partition routing: (srcidx, inv, dq) per q
        self.route: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self.route_w: list[np.ndarray] | None = None  # per-route edge weights (SSSP)
        self.in_dq: dict[int, np.ndarray] = {}  # src partition p -> dq
        self.frontier: np.ndarray | None = None  # BFS/SSSP only
        self.sssp_dist: np.ndarray | None = None  # SSSP decoded state

    def local_ids(self) -> np.ndarray:
        return np.arange(self.n_local, dtype=np.int64) * self.P + self.pid

    def build(self, edge_dir: str, weight_col: str | None = None) -> int:
        part_dir = os.path.join(edge_dir, f"part={self.pid}")
        cols = ["src", "dst"] + ([weight_col] if weight_col else [])
        if os.path.isdir(part_dir):
            tbl = pq.read_table(part_dir, columns=cols)
            src = tbl["src"].to_numpy().astype(np.int64)
            dst = tbl["dst"].to_numpy().astype(np.int64)
            w = (
                tbl[weight_col].to_numpy().astype(np.int64)
                if weight_col
                else None
            )
        else:  # partition with no edges
            src = np.empty(0, dtype=np.int64)
            dst = np.empty(0, dtype=np.int64)
            w = np.empty(0, dtype=np.int64) if weight_col else None
        if w is not None and len(w) and w.min() < 0:
            raise ValueError("sssp requires non-negative weights")
        local = src // self.P
        order = np.argsort(local, kind="stable")
        local, dst = local[order], dst[order]
        if w is not None:
            w = w[order]
            self.route_w = []
        counts = np.bincount(local, minlength=self.n_local)
        self.out_deg = counts.astype(np.float64)
        src_of_edge = np.repeat(np.arange(self.n_local, dtype=np.int64), counts)
        dst_part = dst % self.P
        order_q = np.argsort(dst_part, kind="stable")
        bounds = np.searchsorted(dst_part[order_q], np.arange(self.P + 1))
        for q in range(self.P):
            sel = order_q[bounds[q] : bounds[q + 1]]
            dq, inv = np.unique(dst[sel] // self.P, return_inverse=True)
            self.route.append((src_of_edge[sel], inv.astype(np.int64), dq))
            if w is not None:
                self.route_w.append(w[sel])
        return len(src)


@ray.remote(num_cpus=0)
class CsrWorker:
    """Owns partitions {p : p % W == wid}; single-threaded numpy inside.

    num_cpus=0: the TRUE parallelism limit is the worker count W (that many
    single-threaded processes exist, period); holding scheduler CPU slots
    for the actors' lifetime would starve any Ray Data stage sharing the
    session (measured deadlock under pytest's 4-CPU session)."""

    def __init__(self, wid: int, num_workers: int, P: int, V: int) -> None:
        self.wid = wid
        self.W = num_workers
        self.P = P
        self.V = V
        self.parts = {
            p: _Partition(p, P, V) for p in range(P) if p % num_workers == wid
        }

    # -- setup --------------------------------------------------------------
    def build(self, edge_dir: str, weight_col: str | None = None) -> int:
        return sum(
            pt.build(edge_dir, weight_col) for pt in self.parts.values()
        )

    def route_dq(self) -> dict:
        """One-time routing exchange: {(p, q): ref(dq)} for owned p."""
        out = {}
        for p, pt in self.parts.items():
            for q in range(self.P):
                out[(p, q)] = ray.put(pt.route[q][2])
        return out

    def set_incoming_dq(self, keys: list, *dqs: np.ndarray) -> bool:
        for (p, q), dq in zip(keys, dqs):
            self.parts[q].in_dq[p] = dq
        return True

    def get_states(self) -> dict[int, np.ndarray]:
        return {p: pt.state for p, pt in self.parts.items()}

    # -- PageRank -----------------------------------------------------------
    def pr_init(self, seeds: list | None = None) -> dict[int, float]:
        """Uniform init, or — with ``seeds`` — the personalized teleport
        vector r0 (uniform over the seed set, 0 elsewhere); r0's local
        slice is kept on the partition for every gather."""
        seed_arr = (
            np.asarray(seeds, dtype=np.int64) if seeds is not None else None
        )
        out = {}
        for p, pt in self.parts.items():
            if seed_arr is None:
                pt.state = np.full(pt.n_local, 1.0 / self.V)
                pt.ppr_r0 = None
            else:
                r0 = np.zeros(pt.n_local)
                r0[np.isin(pt.local_ids(), seed_arr)] = 1.0 / len(seed_arr)
                pt.ppr_r0 = r0
                pt.state = r0.copy()
            out[p] = float(pt.state[pt.out_deg == 0].sum())
        return out

    def _bundle(self, slices: dict) -> dict:
        """Group per-(p, q) message slices by DESTINATION WORKER and put
        one object per (this worker → dest worker) pair: W² objects per
        superstep instead of P². Identical at W == P; 16× fewer
        ``ray.put``s when a P=32 run executes on W=8 (each put costs
        ~0.3-1 ms regardless of size — the small-graph superstep floor)."""
        by_w: dict[int, dict] = {}
        for (p, q), msg in slices.items():
            by_w.setdefault(q % self.W, {})[(p, q)] = msg
        return {w: ray.put(d) for w, d in by_w.items()}

    def pr_scatter(self) -> dict:
        out = {}
        for p, pt in self.parts.items():
            contrib = np.where(
                pt.out_deg > 0, pt.state / np.maximum(pt.out_deg, 1), 0.0
            )
            for q, (srcidx, inv, dq) in enumerate(pt.route):
                sums = (
                    np.bincount(inv, weights=contrib[srcidx], minlength=len(dq))
                    if len(dq)
                    else np.zeros(0)
                )
                out[(p, q)] = sums
        return self._bundle(out)

    def pr_gather(
        self,
        damping: float,
        dangling_mass: float,
        *bundles: dict,
    ) -> tuple[float, float]:
        # varargs: Ray resolves ObjectRefs only as top-level args.
        # Process in (q, p) order so float summation order — and therefore
        # the result bit pattern — is independent of the worker count W.
        items = [kv for b in bundles for kv in b.items()]
        sums = {p: np.zeros(pt.n_local) for p, pt in self.parts.items()}
        for (p, q), m in sorted(items, key=lambda km: (km[0][1], km[0][0])):
            u = self.parts[q].in_dq[p]
            if len(u):
                sums[q] += np.bincount(
                    u, weights=m, minlength=self.parts[q].n_local
                )
        resid = 0.0
        dangling = {}
        for q, pt in self.parts.items():
            r0 = getattr(pt, "ppr_r0", None)
            if r0 is None:
                # uniform path bit-identical to the pre-PPR kernel
                new_state = (1.0 - damping) / self.V + damping * (
                    sums[q] + dangling_mass / self.V
                )
            else:
                new_state = (1.0 - damping) * r0 + damping * (
                    sums[q] + dangling_mass * r0
                )
            if pt.n_local:
                resid = max(resid, float(np.max(np.abs(new_state - pt.state))))
            pt.state = new_state
            # per-partition dangling so the driver can sum in partition
            # order — keeps results bitwise independent of worker count W
            dangling[q] = float(pt.state[pt.out_deg == 0].sum())
        return resid, dangling

    # -- Connected components ----------------------------------------------
    def cc_init(self) -> bool:
        for pt in self.parts.values():
            pt.state = pt.local_ids().astype(np.int64)
        return True

    def cc_scatter(self) -> dict:
        out = {}
        for p, pt in self.parts.items():
            for q, (srcidx, inv, dq) in enumerate(pt.route):
                mins = np.full(len(dq), _I64MAX, dtype=np.int64)
                if len(srcidx):
                    np.minimum.at(mins, inv, pt.state[srcidx])
                out[(p, q)] = mins
        return self._bundle(out)

    def cc_gather(self, *bundles: dict) -> int:
        items = [kv for b in bundles for kv in b.items()]
        incoming = {
            p: np.full(pt.n_local, _I64MAX, dtype=np.int64)
            for p, pt in self.parts.items()
        }
        for (p, q), m in sorted(items, key=lambda km: (km[0][1], km[0][0])):
            u = self.parts[q].in_dq[p]
            if len(u):
                np.minimum.at(incoming[q], u, m)
        changed = 0
        for q, pt in self.parts.items():
            new_state = np.minimum(pt.state, incoming[q])
            changed += int(np.count_nonzero(new_state != pt.state))
            pt.state = new_state
        return changed

    # -- BFS hop distance -----------------------------------------------------
    def bfs_init(self, sources: list) -> bool:
        src = np.asarray(sources, dtype=np.int64)
        for p, pt in self.parts.items():
            pt.state = np.full(pt.n_local, _I64MAX, dtype=np.int64)
            mine = src[src % self.P == p] // self.P
            pt.state[mine] = 0
            pt.frontier = np.zeros(pt.n_local, dtype=bool)
            pt.frontier[mine] = True
        return True

    def bfs_scatter(self) -> dict:
        """Same min-exchange shape as cc_scatter, but only FRONTIER
        vertices (settled last round) emit — total message work across
        all rounds is O(E), the level-synchronous-BFS property. The
        per-route arrays stay dq-sized (INF padding) to keep the
        exchange layout identical to CC's."""
        out = {}
        for p, pt in self.parts.items():
            for q, (srcidx, inv, dq) in enumerate(pt.route):
                mins = np.full(len(dq), _I64MAX, dtype=np.int64)
                if len(srcidx):
                    live = pt.frontier[srcidx]
                    if live.any():
                        np.minimum.at(
                            mins, inv[live], pt.state[srcidx[live]] + 1
                        )
                out[(p, q)] = mins
        return self._bundle(out)

    def bfs_gather(self, *bundles: dict) -> int:
        items = [kv for b in bundles for kv in b.items()]
        incoming = {
            p: np.full(pt.n_local, _I64MAX, dtype=np.int64)
            for p, pt in self.parts.items()
        }
        for (p, q), m in sorted(items, key=lambda km: (km[0][1], km[0][0])):
            u = self.parts[q].in_dq[p]
            if len(u):
                np.minimum.at(incoming[q], u, m)
        changed = 0
        for q, pt in self.parts.items():
            new_state = np.minimum(pt.state, incoming[q])
            pt.frontier = new_state != pt.state
            changed += int(np.count_nonzero(pt.frontier))
            pt.state = new_state
        return changed

    def bfs_restore_frontier(self, level: int) -> bool:
        """Level-synchronous invariant: the frontier after iteration k is
        exactly {v : dist[v] == k+1}, so a resume rebuilds it from the
        state shard alone (no separate frontier column needed)."""
        for pt in self.parts.values():
            pt.frontier = pt.state == level
        return True

    # -- weighted SSSP ----------------------------------------------------------
    # state ENCODING (single int64 column): dist >= 0 settled/non-frontier,
    # -(dist)-1 < 0 for FRONTIER vertices (settled last round, relaxations
    # pending), I64MAX unreached — resume decodes both dist and frontier
    # from the shard alone (unlike BFS, weighted distance has no
    # level == iteration invariant to rebuild the frontier from).
    def sssp_init(self, sources: list) -> bool:
        if self.parts and next(iter(self.parts.values())).route_w is None:
            raise ValueError(
                "sssp needs a weighted layout — construct CsrEngine with "
                "weight_col"
            )
        src = np.asarray(sources, dtype=np.int64)
        for p, pt in self.parts.items():
            dist = np.full(pt.n_local, _I64MAX, dtype=np.int64)
            pt.frontier = np.zeros(pt.n_local, dtype=bool)
            mine = src[src % self.P == p] // self.P
            dist[mine] = 0
            pt.frontier[mine] = True
            pt.sssp_dist = dist
            pt.state = np.where(pt.frontier, -dist - 1, dist)
        return True

    def sssp_scatter(self) -> dict:
        out = {}
        for p, pt in self.parts.items():
            for q, (srcidx, inv, dq) in enumerate(pt.route):
                mins = np.full(len(dq), _I64MAX, dtype=np.int64)
                if len(srcidx):
                    live = pt.frontier[srcidx]
                    if live.any():
                        np.minimum.at(
                            mins,
                            inv[live],
                            pt.sssp_dist[srcidx[live]]
                            + pt.route_w[q][live],
                        )
                out[(p, q)] = mins
        return self._bundle(out)

    def sssp_gather(self, *bundles: dict) -> int:
        items = [kv for b in bundles for kv in b.items()]
        incoming = {
            p: np.full(pt.n_local, _I64MAX, dtype=np.int64)
            for p, pt in self.parts.items()
        }
        for (p, q), m in sorted(items, key=lambda km: (km[0][1], km[0][0])):
            u = self.parts[q].in_dq[p]
            if len(u):
                np.minimum.at(incoming[q], u, m)
        changed = 0
        for q, pt in self.parts.items():
            new_dist = np.minimum(pt.sssp_dist, incoming[q])
            pt.frontier = new_dist != pt.sssp_dist
            changed += int(np.count_nonzero(pt.frontier))
            pt.sssp_dist = new_dist
            pt.state = np.where(pt.frontier, -new_dist - 1, new_dist)
        return changed

    def sssp_restore(self, _start: int) -> bool:
        for pt in self.parts.values():
            st = pt.state.astype(np.int64)
            pt.frontier = st < 0
            pt.sssp_dist = np.where(pt.frontier, -st - 1, st)
        return True

    # -- k-core decomposition --------------------------------------------------
    # state ENCODING (single int64 column, checkpoint-shard compatible):
    #   >= 0  alive, value = current residual degree (>= k by invariant)
    #   -2    killed THIS round (its decrements are still pending)
    #   -1    dead in an earlier round
    # so a resume rebuilds (deg, alive, pending-kill) from the shard alone.
    def kcore_init(self, k: int) -> bool:
        self.kcore_k = int(k)
        for pt in self.parts.values():
            deg = pt.out_deg.astype(np.int64)  # symmetrized → undirected
            kill = deg < k
            pt.kc_deg = np.where(kill, 0, deg)
            pt.kc_alive = ~kill
            pt.kc_kill = kill
            pt.state = np.where(
                kill, np.int64(-2), np.where(pt.kc_alive, pt.kc_deg, -1)
            )
        return True

    def kcore_scatter(self) -> dict:
        """Only vertices KILLED last round emit (one count per out-edge
        into each dq) — the O(E)-total decrement peel, same contract as
        engine.k_core."""
        out = {}
        for p, pt in self.parts.items():
            kill = pt.kc_kill
            for q, (srcidx, inv, dq) in enumerate(pt.route):
                cnt = np.zeros(len(dq), dtype=np.int64)
                if len(srcidx):
                    live = kill[srcidx]
                    if live.any():
                        np.add.at(cnt, inv[live], 1)
                out[(p, q)] = cnt
        return self._bundle(out)

    def kcore_gather(self, *bundles: dict) -> int:
        items = [kv for b in bundles for kv in b.items()]
        dec = {
            p: np.zeros(pt.n_local, dtype=np.int64)
            for p, pt in self.parts.items()
        }
        for (p, q), m in sorted(items, key=lambda km: (km[0][1], km[0][0])):
            u = self.parts[q].in_dq[p]
            if len(u):
                np.add.at(dec[q], u, m)
        killed = 0
        k = self.kcore_k
        for q, pt in self.parts.items():
            pt.kc_deg = np.where(pt.kc_alive, pt.kc_deg - dec[q], 0)
            new_kill = pt.kc_alive & (pt.kc_deg < k)
            pt.kc_alive = pt.kc_alive & ~new_kill
            pt.kc_deg[new_kill] = 0
            pt.kc_kill = new_kill
            killed += int(np.count_nonzero(new_kill))
            pt.state = np.where(
                new_kill, np.int64(-2),
                np.where(pt.kc_alive, pt.kc_deg, -1),
            )
        return killed

    def kcore_restore(self, _start: int) -> bool:
        """Decode (deg, alive, pending-kill) from the loaded state shard."""
        for pt in self.parts.values():
            st = pt.state.astype(np.int64)
            pt.kc_alive = st >= 0
            pt.kc_deg = np.where(pt.kc_alive, st, 0)
            pt.kc_kill = st == -2
            pt.state = st
        return True

    # -- Label propagation ---------------------------------------------------
    def lpa_init(self) -> bool:
        for pt in self.parts.values():
            pt.state = pt.local_ids().astype(np.int64)
        return True

    def lpa_scatter(self) -> dict:
        """Messages are composite keys ``local_dst·M + label`` — either
        COMBINED ``(unique_keys, counts)`` or RAW ``(keys, None)``.

        The map-side combiner (a per-route ``np.unique``) only pays when
        labels repeat; in the early rounds of a dense graph nearly every
        message is distinct and the combiner is pure sort cost on E
        elements per superstep (profiled on the 400M-edge bench: rounds
        1-2 spent most of their 20-90 s there and in the gather-side
        re-sort). A cheap per-partition diversity probe (unique count of
        the n_local-sized state) decides per round; the gather handles
        both message forms."""
        M = self.V + 1
        out = {}
        for p, pt in self.parts.items():
            n_distinct = len(np.unique(pt.state)) if pt.n_local else 0
            combine = n_distinct * 4 < max(1, pt.n_local)
            for q, (srcidx, inv, dq) in enumerate(pt.route):
                if len(srcidx) == 0:
                    out[(p, q)] = (np.empty(0, np.int64), None)
                    continue
                comp = dq[inv] * M + pt.state[srcidx]
                if combine:
                    u, counts = np.unique(comp, return_counts=True)
                    out[(p, q)] = (u, counts.astype(np.int64))
                else:
                    out[(p, q)] = (comp, None)
        return self._bundle(out)

    @staticmethod
    def _lpa_reduce_sorted(cs: np.ndarray, cc: np.ndarray | None):
        """(sorted keys, optional counts) → (unique keys, summed counts)
        via boundary reduceat — no inverse arrays, no scatter-``at``."""
        n = len(cs)
        starts = np.flatnonzero(cs[1:] != cs[:-1]) + 1
        starts = np.concatenate(([0], starts))
        if cc is None:
            tot = np.diff(np.append(starts, n))
        else:
            tot = np.add.reduceat(cc, starts)
        return cs[starts], tot.astype(np.int64)

    def lpa_gather(self, *bundles: dict) -> int:
        M = self.V + 1
        items = [kv for b in bundles for kv in b.items()]
        per_q: dict[int, list] = {q: [] for q in self.parts}
        for (p, q), m in sorted(items, key=lambda km: (km[0][1], km[0][0])):
            if len(m[0]):
                per_q[q].append(m)
        changed = 0
        for q, pt in self.parts.items():
            new_state = pt.state.copy()
            if per_q[q]:
                # raw piles: ONE in-place np.sort (no argsort/take) and
                # counts are plain segment lengths; combined piles:
                # argsort + reduceat; then a small merge if both exist
                partials = []
                raws = [m[0] for m in per_q[q] if m[1] is None]
                if raws:
                    comp = np.concatenate(raws)
                    comp.sort()
                    partials.append(self._lpa_reduce_sorted(comp, None))
                combs = [m for m in per_q[q] if m[1] is not None]
                if combs:
                    comp = np.concatenate([m[0] for m in combs])
                    cnt = np.concatenate([m[1] for m in combs])
                    order = np.argsort(comp, kind="stable")
                    partials.append(
                        self._lpa_reduce_sorted(comp[order], cnt[order])
                    )
                if len(partials) == 2:
                    comp = np.concatenate([p_[0] for p_ in partials])
                    cnt = np.concatenate([p_[1] for p_ in partials])
                    order = np.argsort(comp, kind="stable")
                    u, tot = self._lpa_reduce_sorted(comp[order], cnt[order])
                else:
                    u, tot = partials[0]
                d_u = u // M
                lab = u % M
                enc = tot * M + (M - 1 - lab)  # max count, then min label
                # u ascending ⇒ d_u non-decreasing ⇒ per-dst segments are
                # contiguous: segment-max via reduceat, no maximum.at
                dstarts = np.flatnonzero(d_u[1:] != d_u[:-1]) + 1
                dstarts = np.concatenate(([0], dstarts))
                new_state[d_u[dstarts]] = M - 1 - (
                    np.maximum.reduceat(enc, dstarts) % M
                )
            changed += int(np.count_nonzero(new_state != pt.state))
            pt.state = new_state
        return changed

    # -- checkpoint shards (per PARTITION, so resume is W-independent) -------
    def write_shards(self, it_dir: str, col: str) -> list[dict]:
        out = []
        for p, pt in self.parts.items():
            fname = f"state-{p:05d}.parquet"
            tbl = pa.table(
                {"id": pa.array(pt.local_ids()), col: pa.array(pt.state)}
            )
            pq.write_table(tbl, os.path.join(it_dir, fname))
            out.append({"part": p, "file": fname, "rows": tbl.num_rows})
        return out

    def load_shards(self, it_dir: str, col: str) -> bool:
        for p, pt in self.parts.items():
            tbl = pq.read_table(os.path.join(it_dir, f"state-{p:05d}.parquet"))
            ids = tbl["id"].to_numpy().astype(np.int64)
            vals = tbl[col].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            pt.state = np.asarray(vals[order])
        return True


class CsrEngine:
    """Driver-side BSP orchestrator over W CsrWorker actors (P partitions)."""

    def __init__(
        self,
        edges: ray.data.Dataset,
        num_vertices: int,
        num_partitions: int = 8,
        workdir: str = "/tmp/csr_engine",
        tag: str = "default",
        num_workers: int | None = None,
        weight_col: str | None = None,
    ) -> None:
        self.V = num_vertices
        self.P = num_partitions
        self.weight_col = weight_col
        # Edge identity: an order-independent content checksum keys BOTH the
        # cached partitioned layout and every checkpoint fingerprint, so a
        # different edge set can neither reuse a stale layout (same
        # workdir/tag/P) nor resume another graph's checkpoints (same P, V).
        # One extra column-pruned pass over (src, dst) — which also yields E
        # for free, used to auto-size the worker pool.
        self.checksum, self.E = edge_checksum_and_count(edges)
        if weight_col:
            # mix the weights into the identity so two weightings of the
            # same (src, dst) set get distinct layouts and fingerprints
            mod = (1 << 61) - 1
            wsum = 0
            for b in edges.select_columns(
                ["src", "dst", weight_col]
            ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
                src = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
                dst = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
                w = b[weight_col].to_numpy(zero_copy_only=False).astype(
                    np.uint64
                )
                with np.errstate(over="ignore"):
                    mix = (
                        src * np.uint64(0x9E3779B97F4A7C15)
                        ^ dst * np.uint64(0xC2B2AE3D27D4EB4F)
                    ) + w * np.uint64(0xD6E8FEB86659FD93)
                wsum = (wsum + int(np.sum(mix % np.uint64(mod)))) % mod
            self.checksum = (self.checksum * 31 + wsum) % mod
        if num_workers is None:
            session_cpus = int(ray.cluster_resources().get("CPU", num_partitions))
            num_workers = max(
                1,
                min(
                    session_cpus,
                    num_partitions,
                    -(-self.E // CSR_EDGES_PER_WORKER),
                ),
            )
        self.W = num_workers
        self.owner = [p % self.W for p in range(self.P)]
        self.fingerprint = (
            f"csr-p{self.P}-v{self.V}-e{self.checksum:016x}"
        )
        wtag = "_w" if weight_col else ""
        edge_dir = os.path.join(
            workdir,
            f"edges_{tag}{wtag}_p{num_partitions}_c{self.checksum:016x}",
        )
        marker = os.path.join(edge_dir, "_SUCCESS")
        if not os.path.exists(marker):  # partitioned layout is reusable
            import shutil

            shutil.rmtree(edge_dir, ignore_errors=True)
            partition_edges(
                edges, edge_dir, num_partitions, weight_col=weight_col
            )
            open(marker, "w").close()
        self.workers = [
            CsrWorker.remote(w, self.W, num_partitions, num_vertices)
            for w in range(self.W)
        ]
        ray.get(
            [a.build.remote(edge_dir, weight_col) for a in self.workers]
        )
        # one-time static routing exchange (dq arrays, actor-to-actor)
        dq_maps = ray.get([a.route_dq.remote() for a in self.workers])
        inbox: list[tuple[list, list]] = [([], []) for _ in range(self.W)]
        for dq_map in dq_maps:
            for (p, q), ref in dq_map.items():
                keys, refs = inbox[self.owner[q]]
                keys.append((p, q))
                refs.append(ref)
        ray.get(
            [
                self.workers[w].set_incoming_dq.remote(inbox[w][0], *inbox[w][1])
                for w in range(self.W)
            ]
        )

    def _exchange(self, scatter: str) -> list[list]:
        """Run scatter on all workers; each returns {dest_worker: ref of
        bundled (p, q)→msg dict}. The driver only routes ≤ W² refs."""
        outboxes = ray.get([getattr(a, scatter).remote() for a in self.workers])
        inbox: list[list] = [[] for _ in range(self.W)]
        for ob in outboxes:
            for w, ref in ob.items():
                inbox[w].append(ref)
        return inbox

    def _assemble(self) -> np.ndarray:
        state_maps = ray.get([a.get_states.remote() for a in self.workers])
        first = next(iter(state_maps[0].values()))
        out = np.empty(self.V, dtype=first.dtype)
        for sm in state_maps:
            for p, s in sm.items():
                out[p :: self.P] = s
        return out

    def _checkpoint(self, mgr, it, col, metric, parent):
        parts = ray.get(
            [a.write_shards.remote(mgr.iter_dir(it), col) for a in self.workers]
        )
        flat = sorted((m for sub in parts for m in sub), key=lambda m: m["part"])
        mgr.save_manifest(it, metric, parent, flat)

    def _resume(self, mgr, col):
        ck = mgr.latest()
        if ck is None:
            return None
        it_dir = mgr.iter_dir(ck.iteration)
        ray.get([a.load_shards.remote(it_dir, col) for a in self.workers])
        return ck

    def pagerank(
        self,
        damping: float = 0.85,
        tol: float = 1e-9,
        max_iters: int = 200,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        checkpoint_every: int = 1,
        checkpoint_keep_last: int | None = None,
        assemble: bool = True,
        reset_ids: "list | np.ndarray | None" = None,
    ) -> tuple[np.ndarray | None, int, bool]:
        """``assemble=False`` skips the V-sized driver array — state stays
        in the workers; drain it with ``write_states`` (the 10^12-vertex
        sink). ``reset_ids`` runs PERSONALIZED PageRank (same semantics
        as engine.pagerank(reset_ids=...)); the checkpoint kernel label
        carries the seed-set tag so a resume cannot load another
        personalization's ranks."""
        seeds = None
        kernel_label = "pagerank"
        if reset_ids is not None:
            seeds = sorted(int(x) for x in np.unique(np.asarray(reset_ids)))
            if not seeds:
                raise ValueError("personalized pagerank needs ≥1 seed vertex")
            if seeds[0] < 0 or seeds[-1] >= self.V:
                raise ValueError("seed id outside [0, num_vertices)")
            import hashlib as _hashlib

            tag = _hashlib.sha1(
                np.asarray(seeds, dtype=np.int64).tobytes()
            ).hexdigest()[:8]
            kernel_label = f"pagerank-ppr-{tag}"
        dmaps = ray.get([a.pr_init.remote(seeds) for a in self.workers])
        dangling = _sum_by_partition(dmaps)
        start = 0
        mgr = None
        if checkpoint_dir:
            mgr = CheckpointManager(
                checkpoint_dir,
                kernel=kernel_label,
                fingerprint=self.fingerprint,
                params={"damping": damping, "tol": tol},
                num_partitions=self.P,
                keep_last=checkpoint_keep_last,
            )
            if resume:
                ck = self._resume(mgr, "rank")
                if ck is not None:
                    if ck.manifest["metric"].get("converged"):
                        return (
                            self._assemble() if assemble else None,
                            ck.iteration + 1,
                            True,
                        )
                    start = ck.iteration + 1
                    dangling = ck.manifest["metric"]["dangling_mass"]
        converged = False
        it = start
        for it in range(start, max_iters):
            inbox = self._exchange("pr_scatter")
            results = ray.get(
                [
                    self.workers[w].pr_gather.remote(
                        damping, dangling, *inbox[w]
                    )
                    for w in range(self.W)
                ]
            )
            resid = max(r for r, _ in results)
            dangling = _sum_by_partition([d for _, d in results])
            converged = resid < tol
            if mgr and (it % checkpoint_every == 0 or converged):
                self._checkpoint(
                    mgr,
                    it,
                    "rank",
                    {
                        "linf_residual": resid,
                        "dangling_mass": dangling,
                        "converged": converged,
                    },
                    parent=it - 1 if it > start or start > 0 else None,
                )
            if converged:
                break
        return self._assemble() if assemble else None, it + 1, converged

    def connected_components(
        self,
        max_iters: int = 100,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        checkpoint_keep_last: int | None = None,
        assemble: bool = True,
    ) -> tuple[np.ndarray | None, int, bool]:
        """``assemble=False`` skips the V-sized driver array — state stays
        in the workers; drain it with ``write_states`` (the 10^12-vertex
        sink)."""
        return self._label_kernel(
            "cc", "component", max_iters, checkpoint_dir, resume,
            checkpoint_keep_last, assemble=assemble,
        )

    def label_propagation(
        self,
        max_rounds: int = 50,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        checkpoint_keep_last: int | None = None,
        assemble: bool = True,
    ) -> tuple[np.ndarray | None, int, bool]:
        """Synchronous LPA (neighbor mode, min tie-break) on the same BSP
        harness; semantics identical to engine.label_propagation/oracle.
        ``assemble=False`` as in ``connected_components``."""
        return self._label_kernel(
            "lpa", "label", max_rounds, checkpoint_dir, resume,
            checkpoint_keep_last, assemble=assemble,
        )

    def bfs_hops(
        self,
        sources: list,
        max_iters: int = 200,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        checkpoint_keep_last: int | None = None,
        assemble: bool = True,
    ) -> tuple[np.ndarray | None, int, bool]:
        """Frontier BFS on the BSP harness; semantics identical to
        engine.bfs_hops / oracle.bfs_oracle (unreached = int64 max).
        The checkpoint kernel label carries a source-set tag so a resume
        can never load another source set's hops."""
        import hashlib as _hashlib

        src = sorted(int(x) for x in sources)
        if not src:
            raise ValueError("bfs_hops needs at least one source vertex")
        if src[0] < 0 or src[-1] >= self.V:
            raise ValueError("source id outside [0, num_vertices)")
        tag = _hashlib.sha1(
            np.asarray(src, dtype=np.int64).tobytes()
        ).hexdigest()[:8]
        return self._label_kernel(
            "bfs", "hops", max_iters, checkpoint_dir, resume,
            checkpoint_keep_last, assemble=assemble,
            init_args=(src,), resume_hook="bfs_restore_frontier",
            manager_kernel=f"bfs-{tag}",
        )

    def sssp(
        self,
        sources: list,
        max_iters: int = 10_000,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        checkpoint_keep_last: int | None = None,
        assemble: bool = True,
    ) -> tuple[np.ndarray | None, int, bool]:
        """Weighted SSSP on the BSP harness (requires ``weight_col`` at
        construction); semantics identical to engine.sssp / oracle.
        Checkpoint shards hold the ENCODED state (see worker comment);
        kernel label carries the source-set tag."""
        import hashlib as _hashlib

        if not self.weight_col:
            raise ValueError("CsrEngine.sssp needs weight_col at construction")
        src = sorted(int(x) for x in sources)
        if not src:
            raise ValueError("sssp needs at least one source vertex")
        if src[0] < 0 or src[-1] >= self.V:
            raise ValueError("source id outside [0, num_vertices)")
        tag = _hashlib.sha1(
            np.asarray(src, dtype=np.int64).tobytes()
        ).hexdigest()[:8]
        st, iters, conv = self._label_kernel(
            "sssp", "sssp_state", max_iters, checkpoint_dir, resume,
            checkpoint_keep_last, assemble=assemble,
            init_args=(src,), resume_hook="sssp_restore",
            manager_kernel=f"sssp-{tag}",
        )
        if st is not None:
            neg = st < 0
            st = np.where(neg, -st - 1, st)
        return st, iters, conv

    def k_core(
        self,
        k: int,
        max_iters: int = 10_000,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        checkpoint_keep_last: int | None = None,
        assemble: bool = True,
    ) -> tuple[np.ndarray | None, int, bool]:
        """Decrement-peel k-core on the BSP harness; semantics identical
        to engine.k_core / oracle.k_core_oracle (returns 1/0 membership).
        Checkpoint shards hold the ENCODED state column (see the worker
        encoding comment); the kernel label carries k so a resume cannot
        load a different k's peel."""
        if k < 1:
            raise ValueError("k must be >= 1")
        st, iters, conv = self._label_kernel(
            "kcore", "kcore_state", max_iters, checkpoint_dir, resume,
            checkpoint_keep_last, assemble=assemble,
            init_args=(int(k),), resume_hook="kcore_restore",
            manager_kernel=f"kcore{int(k)}",
        )
        if st is not None:
            st = (st >= 0).astype(np.int64)
        return st, iters, conv

    def _label_kernel(
        self,
        kernel: str,
        col: str,
        max_iters: int,
        checkpoint_dir: str | None,
        resume: bool,
        checkpoint_keep_last: int | None = None,
        assemble: bool = True,
        init_args: tuple = (),
        resume_hook: str | None = None,
        manager_kernel: str | None = None,
    ) -> tuple[np.ndarray | None, int, bool]:
        """Shared min-label / mode-label superstep loop (CC, LPA, BFS)
        with per-partition checkpointing identical to pagerank's.
        ``resume_hook`` names a worker method called with the resume
        iteration to rebuild derived state (the BFS frontier);
        ``manager_kernel`` overrides the checkpoint kernel label when the
        run is parameterized (BFS sources)."""
        ray.get(
            [getattr(a, f"{kernel}_init").remote(*init_args)
             for a in self.workers]
        )
        start = 0
        mgr = None
        if checkpoint_dir:
            mgr = CheckpointManager(
                checkpoint_dir,
                kernel=manager_kernel or kernel,
                fingerprint=self.fingerprint,
                num_partitions=self.P,
                keep_last=checkpoint_keep_last,
            )
            if resume:
                ck = self._resume(mgr, col)
                if ck is not None:
                    if ck.manifest["metric"].get("changed") == 0.0:
                        return (
                            self._assemble() if assemble else None,
                            ck.iteration + 1,
                            True,
                        )
                    start = ck.iteration + 1
                    if resume_hook:
                        ray.get(
                            [getattr(a, resume_hook).remote(start)
                             for a in self.workers]
                        )
        converged = False
        it = start
        for it in range(start, max_iters):
            inbox = self._exchange(f"{kernel}_scatter")
            changed = sum(
                ray.get(
                    [
                        getattr(self.workers[w], f"{kernel}_gather").remote(
                            *inbox[w]
                        )
                        for w in range(self.W)
                    ]
                )
            )
            converged = changed == 0
            if mgr:
                self._checkpoint(
                    mgr,
                    it,
                    col,
                    {"changed": float(changed)},
                    parent=it - 1 if it > start or start > 0 else None,
                )
            if converged:
                break
        return self._assemble() if assemble else None, it + 1, converged

    def write_states(self, out_dir: str, col: str) -> int:
        """Write the CURRENT per-vertex state as per-partition parquet
        shards directly from the workers — no V-sized driver array (the
        ``_assemble`` path is the small-V convenience; this is the sink a
        10^12-vertex run uses). Returns total rows written."""
        os.makedirs(out_dir, exist_ok=True)
        parts = ray.get(
            [a.write_shards.remote(out_dir, col) for a in self.workers]
        )
        flat = sorted((m for sub in parts for m in sub), key=lambda m: m["part"])
        with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
            import json

            json.dump({"num_partitions": self.P, "column": col, "parts": flat}, f)
        return sum(m["rows"] for m in flat)

    def shutdown(self) -> None:
        for a in self.workers:
            ray.kill(a)
        self.workers = []
