"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Nothing here (or in the library) calls ``ray.init``/``ray.shutdown`` — the
driver owns the session. See citationgraphs_ray/pipelines/queries.py for
the query registry and the Ray↔SQL parity conventions.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive the edge table
    from lineitem, run PageRank to convergence, join in/out degrees —
    returns a per-vertex analytics table (id, rank, out_degree, in_degree).
    """
    import numpy as np
    import pyarrow as pa
    import ray.data

    from citationgraphs_ray.graph.engine import pagerank
    from citationgraphs_ray.pipelines.queries import GRAPH_MOD, derive_edges
    from citationgraphs_ray.utils import dataset_to_dense_array

    sf_dir = "/root/testdata/sf0.001"
    edges = derive_edges(sf_dir).materialize()
    res = pagerank(edges, GRAPH_MOD, tol=1e-9)
    out_deg = dataset_to_dense_array(
        edges.groupby("src").count(), "src", "count()", GRAPH_MOD, 0, np.int64
    )
    in_deg = dataset_to_dense_array(
        edges.groupby("dst").count(), "dst", "count()", GRAPH_MOD, 0, np.int64
    )
    ids = np.arange(GRAPH_MOD, dtype=np.int64)
    present = (out_deg > 0) | (in_deg > 0)
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(ids[present]),
                "rank": pa.array(res.state[present]),
                "out_degree": pa.array(out_deg[present]),
                "in_degree": pa.array(in_deg[present]),
            }
        )
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from citationgraphs_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from citationgraphs_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
