"""CSR actor-pool engine: partition-local adjacency, BSP supersteps.

The scale-out counterpart of the broadcast engine (engine.py). The broadcast
engine ships the whole V-sized state vector to every task each superstep —
exact, but the state must fit one object. Here (SURVEY.md §4.3):

- The edge table is hash-partitioned ONCE by ``src % P`` and laid out as
  partitioned Parquet (``part=<p>/``) — the resumable on-disk layout; P is
  fixed per run and recorded in the checkpoint manifest.
- P long-lived actors each read their shard once and build a CSR
  (indptr/indices over local sources) in ``__init__``-equivalent ``build()``
  — setup once per actor, supersteps stream only small message tables.
- Superstep = BSP scatter/gather: each actor computes per-dst-partition
  pre-aggregated messages from its local state (the combiner — a hub dst
  receives ≤ P partial rows), peers fetch only their slice via per-pair
  object refs (actor-to-actor plasma transfer, never through the driver),
  reduce into their local state, and report a local convergence metric.
  The driver only sequences barriers and sums P scalars.

Rationale for raw actors: Ray Data's map_batches actor pools don't pin a
stable partition→actor assignment across iterations, so per-partition
mutable CSR state genuinely can't be expressed in the Dataset API — this is
the documented escape hatch. Everything around it (partitioning, layout,
message pre-aggregation) keeps the Dataset/groupby shapes.

Kernels: PageRank and connected components (LPA slots into the same
scatter/gather with the count-mode reduce). Results must equal the
broadcast engine bitwise-or-allclose; tests enforce it.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..state.checkpoints import CheckpointManager


def partition_edges(
    edges: ray.data.Dataset, out_dir: str, num_partitions: int
) -> str:
    """Hash-partition the edge table by src % P into partitioned Parquet."""

    def add_part(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((src % num_partitions).astype(np.int64))
        )

    (
        edges.select_columns(["src", "dst"])
        .map_batches(add_part, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["part"])
    )
    return out_dir


@ray.remote
class CsrPartition:
    """Owns vertices {id : id % P == pid}: their out-edge CSR + state slice."""

    def __init__(self, pid: int, num_partitions: int, num_vertices: int) -> None:
        self.pid = pid
        self.P = num_partitions
        self.V = num_vertices
        self.n_local = (num_vertices - pid + num_partitions - 1) // num_partitions
        self.indptr: np.ndarray | None = None
        self.indices: np.ndarray | None = None
        self.out_deg: np.ndarray | None = None
        self.state: np.ndarray | None = None
        # per-dst-partition precomputed routing (built once; edges are
        # static): for destination partition q —
        #   srcidx[q]: local src index of each edge to q (contiguous array →
        #              the per-superstep gather contrib[srcidx] reads a
        #              small cache-resident vector sequentially)
        #   inv[q]:    compacted dst index of each edge (bincount bins)
        #   dq[q]:     compacted local dst ids in q — STATIC, exchanged to
        #              peer q ONCE at build; supersteps ship sums only
        # Makes a superstep O(E/P) per actor with sequential streams, and
        # halves message bytes vs re-sending dst ids every round.
        self.route: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self.in_dq: list[np.ndarray] = []  # peer p's dq targeting me

    # -- setup (once per actor) --------------------------------------------
    def build(self, edge_dir: str) -> int:
        part_dir = os.path.join(edge_dir, f"part={self.pid}")
        if os.path.isdir(part_dir):
            tbl = pq.read_table(part_dir, columns=["src", "dst"])
            src = tbl["src"].to_numpy().astype(np.int64)
            dst = tbl["dst"].to_numpy().astype(np.int64)
        else:  # partition with no edges
            src = np.empty(0, dtype=np.int64)
            dst = np.empty(0, dtype=np.int64)
        local = src // self.P  # local dense index of each src
        order = np.argsort(local, kind="stable")
        local, self.indices = local[order], dst[order]
        counts = np.bincount(local, minlength=self.n_local)
        self.indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.out_deg = counts.astype(np.float64)
        dst_part = self.indices % self.P
        src_of_edge = np.repeat(
            np.arange(self.n_local, dtype=np.int64), np.diff(self.indptr)
        )
        order_q = np.argsort(dst_part, kind="stable")
        bounds = np.searchsorted(dst_part[order_q], np.arange(self.P + 1))
        for q in range(self.P):
            sel = order_q[bounds[q] : bounds[q + 1]]
            dq, inv = np.unique(self.indices[sel] // self.P, return_inverse=True)
            self.route.append((src_of_edge[sel], inv.astype(np.int64), dq))
        return len(src)

    def route_dq(self) -> list[ray.ObjectRef]:
        """One-time routing exchange: my static dq arrays, one ref per peer."""
        return [ray.put(dq) for _, _, dq in self.route]

    def set_incoming_dq(self, *dqs: np.ndarray) -> bool:
        self.in_dq = list(dqs)
        return True

    def local_ids(self) -> np.ndarray:
        return np.arange(self.n_local, dtype=np.int64) * self.P + self.pid

    # -- generic state access ----------------------------------------------
    def set_state(self, values: np.ndarray) -> None:
        self.state = values.astype(self.state.dtype if self.state is not None else values.dtype)

    def get_state(self) -> np.ndarray:
        return self.state

    # -- PageRank -----------------------------------------------------------
    def pr_init(self) -> float:
        self.state = np.full(self.n_local, 1.0 / self.V)
        return self.pr_dangling_mass()

    def pr_dangling_mass(self) -> float:
        return float(self.state[self.out_deg == 0].sum())

    def pr_scatter(self) -> list[ray.ObjectRef]:
        """Per-dst-partition (dst, partial_sum) messages, one plasma object
        per destination so peers fetch exactly their slice (returned as a
        list of P refs — a single scatter RPC instead of P² take calls)."""
        contrib = np.where(self.out_deg > 0, self.state / np.maximum(self.out_deg, 1), 0.0)
        out = []
        for srcidx, inv, dq in self.route:
            sums = (
                np.bincount(inv, weights=contrib[srcidx], minlength=len(dq))
                if len(dq)
                else np.zeros(0)
            )
            out.append(ray.put(sums))
        return out

    def pr_gather(
        self, damping: float, dangling_mass: float,
        *msgs: np.ndarray,
    ) -> tuple[float, float]:
        # varargs: Ray resolves top-level ObjectRef args only, so each peer
        # message must be its own argument for actor-to-actor transfer.
        # Messages are sums-only; the target ids are the static in_dq
        # exchanged at build.
        sums = np.zeros(self.n_local)
        for u, s in zip(self.in_dq, msgs):
            if len(u):
                sums += np.bincount(u, weights=s, minlength=self.n_local)
        new_state = (1.0 - damping) / self.V + damping * (
            sums + dangling_mass / self.V
        )
        resid = float(np.max(np.abs(new_state - self.state))) if self.n_local else 0.0
        self.state = new_state
        return resid, self.pr_dangling_mass()

    # -- Connected components ----------------------------------------------
    def cc_init(self) -> bool:
        self.state = self.local_ids().astype(np.int64)
        return True

    def cc_scatter(self) -> list[ray.ObjectRef]:
        out = []
        for srcidx, inv, dq in self.route:
            mins = np.full(len(dq), np.iinfo(np.int64).max, dtype=np.int64)
            if len(srcidx):
                np.minimum.at(mins, inv, self.state[srcidx])
            out.append(ray.put(mins))
        return out

    def cc_gather(self, *msgs: np.ndarray) -> int:
        incoming = np.full(self.n_local, np.iinfo(np.int64).max, dtype=np.int64)
        for u, mn in zip(self.in_dq, msgs):
            if len(u):
                np.minimum.at(incoming, u, mn)
        new_state = np.minimum(self.state, incoming)
        changed = int(np.count_nonzero(new_state != self.state))
        self.state = new_state
        return changed

    # -- Label propagation (synchronous, neighbor mode, min-tie-break) ------
    def lpa_init(self) -> bool:
        self.state = self.local_ids().astype(np.int64)
        return True

    def lpa_scatter(self) -> list[ray.ObjectRef]:
        """Messages are (composite key = local_dst·M + label, count) pairs —
        keys change every round (labels move), so unlike PR/CC the key
        arrays ship with the counts."""
        M = self.V + 1
        out = []
        for srcidx, inv, dq in self.route:
            if len(srcidx) == 0:
                out.append(ray.put((np.empty(0, np.int64), np.empty(0, np.int64))))
                continue
            labels = self.state[srcidx]
            comp = dq[inv] * M + labels
            u, counts = np.unique(comp, return_counts=True)
            out.append(ray.put((u, counts.astype(np.int64))))
        return out

    def lpa_gather(self, *msgs: tuple[np.ndarray, np.ndarray]) -> int:
        M = self.V + 1
        keys = [m[0] for m in msgs if len(m[0])]
        cnts = [m[1] for m in msgs if len(m[0])]
        new_state = self.state.copy()
        if keys:
            comp = np.concatenate(keys)
            cnt = np.concatenate(cnts)
            u, inv2 = np.unique(comp, return_inverse=True)
            tot = np.bincount(inv2, weights=cnt).astype(np.int64)
            d_u = u // M
            lab = u % M
            enc = tot * M + (M - 1 - lab)  # max count, then min label
            best = np.full(self.n_local, -1, dtype=np.int64)
            np.maximum.at(best, d_u, enc)
            has = best >= 0
            new_state[has] = M - 1 - (best[has] % M)
        changed = int(np.count_nonzero(new_state != self.state))
        self.state = new_state
        return changed

    # -- checkpoint shards (each partition writes/reads its own file) -------
    def write_shard(self, it_dir: str, col: str) -> dict:
        fname = f"state-{self.pid:05d}.parquet"
        tbl = pa.table(
            {"id": pa.array(self.local_ids()), col: pa.array(self.state)}
        )
        pq.write_table(tbl, os.path.join(it_dir, fname))
        return {"part": self.pid, "file": fname, "rows": tbl.num_rows}

    def load_shard(self, it_dir: str, col: str) -> bool:
        tbl = pq.read_table(os.path.join(it_dir, f"state-{self.pid:05d}.parquet"))
        ids = tbl["id"].to_numpy().astype(np.int64)
        vals = tbl[col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        self.state = np.asarray(vals[order])
        return True


class CsrEngine:
    """Driver-side BSP orchestrator over P CsrPartition actors."""

    def __init__(
        self,
        edges: ray.data.Dataset,
        num_vertices: int,
        num_partitions: int = 8,
        workdir: str = "/tmp/csr_engine",
        tag: str = "default",
    ) -> None:
        self.V = num_vertices
        self.P = num_partitions
        edge_dir = os.path.join(workdir, f"edges_{tag}_p{num_partitions}")
        marker = os.path.join(edge_dir, "_SUCCESS")
        if not os.path.exists(marker):  # partitioned layout is reusable
            import shutil

            shutil.rmtree(edge_dir, ignore_errors=True)
            partition_edges(edges, edge_dir, num_partitions)
            open(marker, "w").close()
        self.actors = [
            CsrPartition.remote(p, num_partitions, num_vertices)
            for p in range(num_partitions)
        ]
        ray.get([a.build.remote(edge_dir) for a in self.actors])
        # one-time static routing exchange (dq arrays, actor-to-actor)
        dq_refs = ray.get([a.route_dq.remote() for a in self.actors])
        ray.get(
            [
                self.actors[q].set_incoming_dq.remote(
                    *[dq_refs[p][q] for p in range(self.P)]
                )
                for q in range(self.P)
            ]
        )

    def _exchange(self, scatter: str) -> list[list[ray.ObjectRef]]:
        # one RPC per actor; each returns P message refs (its outbox)
        outboxes = ray.get([getattr(a, scatter).remote() for a in self.actors])
        return [[outboxes[p][q] for p in range(self.P)] for q in range(self.P)]

    def _assemble(self) -> np.ndarray:
        slices = ray.get([a.get_state.remote() for a in self.actors])
        out = np.empty(self.V, dtype=slices[0].dtype if slices else np.float64)
        for p, s in enumerate(slices):
            out[p :: self.P] = s
        return out

    def _checkpoint(self, mgr, it, col, metric, parent):
        # every partition writes its own shard; manifest written LAST
        parts = ray.get(
            [a.write_shard.remote(mgr.iter_dir(it), col) for a in self.actors]
        )
        mgr.save_manifest(it, metric, parent, parts)

    def _resume(self, mgr, col):
        ck = mgr.latest()
        if ck is None:
            return None
        it_dir = mgr.iter_dir(ck.iteration)
        ray.get([a.load_shard.remote(it_dir, col) for a in self.actors])
        return ck

    def pagerank(
        self,
        damping: float = 0.85,
        tol: float = 1e-9,
        max_iters: int = 200,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        checkpoint_every: int = 1,
    ) -> tuple[np.ndarray, int, bool]:
        dangling = sum(ray.get([a.pr_init.remote() for a in self.actors]))
        start = 0
        mgr = None
        if checkpoint_dir:
            mgr = CheckpointManager(
                checkpoint_dir,
                kernel="pagerank",
                fingerprint=f"csr-p{self.P}-v{self.V}",
                params={"damping": damping, "tol": tol},
                num_partitions=self.P,
            )
            if resume:
                ck = self._resume(mgr, "rank")
                if ck is not None:
                    if ck.manifest["metric"].get("converged"):
                        return self._assemble(), ck.iteration + 1, True
                    start = ck.iteration + 1
                    dangling = ck.manifest["metric"]["dangling_mass"]
        converged = False
        it = start
        for it in range(start, max_iters):
            inboxes = self._exchange("pr_scatter")
            results = ray.get(
                [
                    self.actors[q].pr_gather.remote(damping, dangling, *inboxes[q])
                    for q in range(self.P)
                ]
            )
            resid = max(r for r, _ in results)
            dangling = sum(d for _, d in results)
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
        return self._assemble(), it + 1, converged

    def label_propagation(
        self, max_rounds: int = 50
    ) -> tuple[np.ndarray, int, bool]:
        """Synchronous LPA (neighbor mode, min tie-break) on the same BSP
        harness; semantics identical to engine.label_propagation/oracle."""
        ray.get([a.lpa_init.remote() for a in self.actors])
        converged = False
        it = 0
        for it in range(max_rounds):
            inboxes = self._exchange("lpa_scatter")
            changed = sum(
                ray.get(
                    [
                        self.actors[q].lpa_gather.remote(*inboxes[q])
                        for q in range(self.P)
                    ]
                )
            )
            if changed == 0:
                converged = True
                break
        return self._assemble(), it + 1, converged

    def connected_components(
        self, max_iters: int = 100
    ) -> tuple[np.ndarray, int, bool]:
        ray.get([a.cc_init.remote() for a in self.actors])
        converged = False
        it = 0
        for it in range(max_iters):
            inboxes = self._exchange("cc_scatter")
            changed = sum(
                ray.get(
                    [
                        self.actors[q].cc_gather.remote(*inboxes[q])
                        for q in range(self.P)
                    ]
                )
            )
            if changed == 0:
                converged = True
                break
        return self._assemble(), it + 1, converged

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
