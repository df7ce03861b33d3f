"""ordered_prefix_sum + pack_sequences: numpy/DuckDB parity, partition
invariance, dtype, empty input."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from citationgraphs_ray.stages.packing import pack_sequences
from citationgraphs_ray.utils import ordered_prefix_sum


def _ds(ids, vals, parallelism=1):
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "n": pa.array(vals, pa.int64())}
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(parallelism) if parallelism > 1 else ds


def test_prefix_sum_matches_numpy():
    rng = np.random.default_rng(3)
    ids = rng.permutation(200).astype(np.int64)
    vals = rng.integers(0, 50, size=200).astype(np.int64)
    out = (
        ordered_prefix_sum(_ds(ids, vals), "doc_id", "n", "off")
        .to_pandas()
        .sort_values("doc_id")
    )
    order = np.argsort(ids, kind="stable")
    want = np.concatenate([[0], np.cumsum(vals[order])[:-1]])
    assert np.array_equal(out["off"].to_numpy(), want)
    assert out["off"].dtype == np.int64  # integer input -> int64 scan


@pytest.mark.parametrize("parts", [1, 4, 13])
def test_prefix_sum_partition_invariant(parts):
    rng = np.random.default_rng(5)
    ids = rng.permutation(500).astype(np.int64)
    vals = rng.integers(1, 9, size=500).astype(np.int64)
    out = (
        ordered_prefix_sum(_ds(ids, vals, parts), "doc_id", "n", "off")
        .to_pandas()
        .sort_values("doc_id")["off"]
        .to_numpy()
    )
    base = (
        ordered_prefix_sum(_ds(ids, vals, 1), "doc_id", "n", "off")
        .to_pandas()
        .sort_values("doc_id")["off"]
        .to_numpy()
    )
    assert np.array_equal(out, base)


def test_prefix_sum_float_values():
    out = (
        ordered_prefix_sum(
            ray.data.from_arrow(
                pa.table(
                    {"doc_id": pa.array([2, 0, 1], pa.int64()),
                     "v": pa.array([0.5, 1.25, 2.0])}
                )
            ),
            "doc_id",
            "v",
            "off",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert np.allclose(out["off"].to_numpy(), [0.0, 1.25, 3.25])


def test_pack_sequences_matches_duckdb_window():
    rng = np.random.default_rng(11)
    ids = rng.permutation(300).astype(np.int64)
    vals = rng.integers(1, 400, size=300).astype(np.int64)
    got = (
        pack_sequences(_ds(ids, vals, 5), "n", max_len=512)
        .to_pandas()
        .sort_values("doc_id")
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, n BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(zip(ids.tolist(), vals.tolist()))
    )
    want = con.execute(
        """SELECT doc_id,
                  (SUM(n) OVER (ORDER BY doc_id) - n)::BIGINT AS start_offset,
                  ((SUM(n) OVER (ORDER BY doc_id) - n) // 512)::BIGINT AS seq_id
           FROM t ORDER BY doc_id"""
    ).df()
    assert np.array_equal(
        got["start_offset"].to_numpy(), want["start_offset"].to_numpy()
    )
    assert np.array_equal(got["seq_id"].to_numpy(), want["seq_id"].to_numpy())


def test_pack_sequences_rejects_bad_maxlen():
    with pytest.raises(ValueError):
        pack_sequences(_ds([0], [1]), "n", max_len=0)


def test_prefix_sum_rejects_nulls():
    t = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "n": pa.array([1, None, 3], pa.int64())}
    )
    with pytest.raises(Exception, match="null"):
        ordered_prefix_sum(
            ray.data.from_arrow(t), "doc_id", "n", "off"
        ).materialize()
