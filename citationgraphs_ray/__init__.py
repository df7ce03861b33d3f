"""citationgraphs_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference library ``wujunfeng1/CitationGraphs`` (a single-file, in-memory Go
package; see /root/reference/CitationGraphs.go), re-expressed as streaming
Ray Data pipelines over Arrow batches:

- ``corpus``      — deterministic synthetic source-code Parquet corpus
                    (BASELINE.json input_hint: repo/path/commit/lang/content)
- ``stages``      — stateless/stateful map_batches stages: edge extraction,
                    text normalization, dedup (exact/minhash/simhash/...),
                    similarity search, multimodal plumbing
- ``graph``       — the four iterative kernels (PageRank, connected
                    components, label propagation, triangle counting) plus a
                    superstep harness with checkpoints and a NumPy oracle
- ``functions``   — relational analytics matching the reference surface:
                    co-occurrence, TF-IDF, lift filters, trends, community
                    comparison metrics (RI/ARI/MI/NMI/AMI/modularity/CPM)
- ``sources``     — the reference's 3-CSV citation-graph conformance I/O and
                    memberships I/O

Design rules (SURVEY.md §4.3): edge table ``(src:int64, dst:int64)`` is the
canonical graph representation; per-vertex state is always a table
``(id, value)``; wide steps are groupby-aggregates with per-batch partial
pre-aggregation; small sides are broadcast via ``ray.put``; nothing in this
package calls ``ray.init``/``ray.shutdown`` (sessions are owned by bench.py,
CLIs and the test fixture).
"""

import os as _os

# Polars sizes its Rust thread pool to every visible core at first import.
# Inside Ray worker processes (one task per CPU slot already) that means
# 32 concurrent tasks × 32-thread pools — pure oversubscription and bus
# contention on the hot extraction/hash kernels. One thread per task is
# the correct sizing; the env var must be set before polars' first import,
# and this package is imported in every worker before any stage runs.
# Scoped to WORKER processes only — clamping the driver (and any user
# process that merely imports this package) would be an unwanted global
# side effect on their own polars usage.


def _in_ray_worker_process() -> bool:
    try:
        import ray._private.worker as _rw

        return _rw.global_worker.mode == _rw.WORKER_MODE
    except Exception:
        return False


if _in_ray_worker_process():
    _os.environ.setdefault("POLARS_MAX_THREADS", "1")

__version__ = "0.1.0"
