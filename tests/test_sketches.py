"""Sampling / quantile / sketch operators (stages/sketches.py).

Covers: DuckDB-parity of the hash-sample and stratified-sample SQL
twins, exact-quantile equivalence with numpy order statistics (incl.
degenerate float intervals and duplicate-heavy data), heavy-hitter
exactness under planted Zipf skew with cardinality ≫ capacity, and
HyperLogLog accuracy + mergeability.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from citationgraphs_ray.stages.sketches import (
    _clz64,
    _mg_compress,
    approx_distinct,
    exact_quantiles,
    hash_bucket,
    hash_sample,
    heavy_hitters,
    hll_estimate,
    hll_registers,
    stratified_sample,
)

SF = "/root/testdata/sf0.001"


def _orders_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/orders.parquet").to_pandas()


def test_hash_bucket_matches_duckdb_hugeint_twin():
    keys = np.array([0, 1, 2, 7, 123456789, 2**31, 2**40 + 12345])
    py = hash_bucket(keys, seed=41).tolist()
    sql = duckdb.sql(
        """
        SELECT ((((k + 41)::HUGEINT * 11400714819323198485)
                 % 18446744073709551616) // 4294967296 % 10000)::BIGINT
        FROM (SELECT unnest([0,1,2,7,123456789,2147483648,
                             1099511640121]) AS k)
        """
    ).fetchall()
    assert py == [r[0] for r in sql]


def test_hash_sample_deterministic_subset_and_rate():
    df = _orders_df()
    ds = ray.data.from_pandas(df)
    s1 = hash_sample(ds, "o_orderkey", 0.2, seed=41).to_pandas()
    s2 = hash_sample(
        ray.data.from_pandas(df).repartition(7), "o_orderkey", 0.2, seed=41
    ).to_pandas()
    a = s1.sort_values("o_orderkey").reset_index(drop=True)
    b = s2.sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # partition-invariant
    # subset of the input, correct-ish rate (binomial tolerance)
    assert set(a.o_orderkey) <= set(df.o_orderkey)
    rate = len(a) / len(df)
    assert 0.12 < rate < 0.28
    # a different seed yields a different sample
    s3 = hash_sample(ds, "o_orderkey", 0.2, seed=99).to_pandas()
    assert set(s3.o_orderkey) != set(a.o_orderkey)


def test_hash_sample_matches_sql_twin():
    df = _orders_df()
    got = (
        hash_sample(ray.data.from_pandas(df), "o_orderkey", 0.05, seed=41)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            """
        SELECT * FROM df
        WHERE ((((o_orderkey + 41)::HUGEINT * 11400714819323198485)
                % 18446744073709551616) // 4294967296) % 10000 < 500
        ORDER BY o_orderkey
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_stratified_sample_matches_sql_twin_and_counts():
    df = _orders_df()
    got = (
        stratified_sample(
            ray.data.from_pandas(df).repartition(5),
            "o_orderpriority",
            "o_orderkey",
            n=7,
            seed=7,
        )
        .to_pandas()
        .sort_values(["o_orderpriority", "o_orderkey"])
        .reset_index(drop=True)
    )
    per = got.groupby("o_orderpriority").size()
    full = df.groupby("o_orderpriority").size()
    for stratum, n_stratum in full.items():
        assert per.get(stratum, 0) == min(7, n_stratum)
    want = (
        duckdb.sql(
            """
        SELECT * FROM df
        QUALIFY row_number() OVER (
          PARTITION BY o_orderpriority
          ORDER BY (((o_orderkey + 7)::HUGEINT * 11400714819323198485)
                    % 18446744073709551616) // 4294967296, o_orderkey
        ) <= 7
        ORDER BY o_orderpriority, o_orderkey
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want
    )


def _disc(vals: np.ndarray, q: float) -> float:
    s = np.sort(vals)
    return float(s[max(1, math.ceil(q * len(s))) - 1])


def test_exact_quantiles_matches_numpy_order_stats():
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [rng.lognormal(3, 2, 20_000), rng.normal(-50, 1, 5_000)]
    )
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(9)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = exact_quantiles(ds, "x", qs, bins=64, cutoff=100)
    for q, v in got:
        assert v == _disc(vals, q), q


def test_exact_quantiles_duplicate_heavy_and_degenerate():
    # 90% of the mass is ONE value; another chunk is two adjacent floats
    base = np.float64(1.25)
    nxt = np.nextafter(base, 2.0)
    vals = np.concatenate(
        [
            np.full(50_000, base),
            np.full(20_000, nxt),
            np.linspace(10, 20, 1_000),
        ]
    )
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(4)
    qs = [0.1, 0.5, 0.71, 0.95]
    got = exact_quantiles(ds, "x", qs, bins=16, cutoff=10)
    for q, v in got:
        assert v == _disc(vals, q), q


def test_exact_quantiles_matches_duckdb_disc():
    df = _orders_df()
    ds = ray.data.from_pandas(df)
    qs = [0.1, 0.5, 0.9]
    got = dict(exact_quantiles(ds, "o_totalprice", qs))
    for q in qs:
        want = duckdb.sql(
            f"SELECT quantile_disc(o_totalprice, {q}) FROM df"
        ).fetchone()[0]
        assert got[q] == want


def test_exact_quantiles_tiny_and_nan():
    df = pd.DataFrame({"x": [np.nan, 5.0, np.nan, 1.0, 3.0]})
    got = dict(exact_quantiles(ray.data.from_pandas(df), "x", [0.0, 0.5, 1.0]))
    assert got[0.0] == 1.0 and got[0.5] == 3.0 and got[1.0] == 5.0


def test_mg_compress_guarantee():
    # any value with freq > N/(m+1) must survive one compression
    rng = np.random.default_rng(0)
    vals = np.arange(1000)
    cnts = rng.integers(1, 50, 1000)
    cnts[17] = cnts.sum() // 4  # planted heavy hitter
    kept, kw = _mg_compress(vals, cnts, 64)
    assert 17 in kept
    assert len(kept) <= 64
    # underestimates only, by at most the subtracted threshold
    orig = dict(zip(vals.tolist(), cnts.tolist()))
    for v, w in zip(kept.tolist(), kw.tolist()):
        assert 0 < w <= orig[v]


def test_heavy_hitters_exact_under_planted_zipf():
    rng = np.random.default_rng(11)
    # cardinality 50k with capacity 1024 → compression path exercised
    zipf = rng.zipf(1.3, 300_000)
    zipf = zipf[zipf < 50_000]
    ds = ray.data.from_pandas(pd.DataFrame({"v": zipf})).repartition(8)
    got = heavy_hitters(ds, "v", k=10, capacity=1024).to_pandas()
    want = (
        pd.DataFrame({"v": zipf})
        .groupby("v")
        .size()
        .reset_index(name="cnt")
        .sort_values(["cnt", "v"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert got.v.tolist() == want.v.tolist()
    assert got.cnt.tolist() == want.cnt.tolist()


def test_heavy_hitters_strings():
    words = ["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 30 + list(
        f"w{i}" for i in range(200)
    )
    ds = ray.data.from_pandas(pd.DataFrame({"w": words})).repartition(3)
    got = heavy_hitters(ds, "w", k=3, capacity=64).to_pandas()
    assert got.w.tolist() == ["alpha", "beta", "gamma"]
    assert got.cnt.tolist() == [50, 30, 30]


def test_clz64_exact():
    w = np.array(
        [0, 1, 2, 3, 2**52 + 1, 2**53, 2**63, 2**64 - 1, 2**31], dtype=np.uint64
    )
    want = [64, 63, 62, 62, 11, 10, 0, 0, 32]
    assert _clz64(w).tolist() == want


def test_hll_accuracy_and_merge():
    n = 60_000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(6)
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - n) / n < 0.05  # 3σ for p=12 is ~4.9%
    # mergeability: registers(A ∪ B) == max(registers(A), registers(B))
    a = ray.data.from_pandas(df.iloc[: n // 2])
    b = ray.data.from_pandas(df.iloc[n // 3 :])  # overlapping halves
    u = ray.data.from_pandas(pd.concat([df.iloc[: n // 2], df.iloc[n // 3 :]]))
    ra, rb = hll_registers(a, "k"), hll_registers(b, "k")
    ru = hll_registers(u, "k")
    assert np.array_equal(ru, np.maximum(ra, rb))


def test_hll_strings_and_small_range():
    words = [f"token_{i}" for i in range(300)] * 5
    ds = ray.data.from_pandas(pd.DataFrame({"w": words})).repartition(4)
    est = approx_distinct(ds, "w", p=12)
    # linear-counting regime: near-exact for 300 ≪ 4096 registers
    assert abs(est - 300) <= 12
    e0 = hll_estimate(np.zeros(4096, dtype=np.uint8))
    assert e0 == 0


def test_exact_quantiles_degenerate_interval_counting_path():
    # millions of rows on TWO adjacent floats with a tiny cutoff: the
    # final pass must resolve by counting (kind -2/-3 rows), never by
    # collecting the (arbitrarily large) in-interval values
    base = np.float64(7.5)
    nxt = np.nextafter(base, 8)
    vals = np.concatenate([np.full(200_000, base), np.full(100_000, nxt)])
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(6)
    res = dict(exact_quantiles(ds, "x", [0.5, 0.7], bins=8, cutoff=10))
    assert res[0.5] == base and res[0.7] == nxt


def test_hash_sample_rejects_negative_keys():
    df = pd.DataFrame({"k": [-1, 2, 3]})
    with pytest.raises(Exception):
        hash_sample(ray.data.from_pandas(df), "k", 0.5).to_pandas()


def test_exact_quantiles_rejects_inf():
    t = pa.table({"v": pa.array([1.0, float("inf"), 3.0])})
    with pytest.raises(Exception, match="non-finite"):
        exact_quantiles(ray.data.from_arrow(t), "v", [0.5])


def test_rate_sample_by_stratum_matches_per_stratum_hash_sample():
    """Per-stratum rates over ONE shared key hash: the mixed sample of a
    stratum equals hash_sample at that stratum's rate — partitioning-
    and composition-invariant by construction."""
    from citationgraphs_ray.stages.sketches import rate_sample_by_stratum

    n = 4000
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "s": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )
    rates = {"s0": 1.0, "s1": 0.3}
    mixed = rate_sample_by_stratum(
        ray.data.from_arrow(t).repartition(7), "s", "k", rates,
        default_rate=0.0,
    ).to_pandas()
    assert set(mixed[mixed["s"] == "s2"]["k"]) == set()
    assert set(mixed[mixed["s"] == "s0"]["k"]) == set(range(0, n, 3))
    one = hash_sample(
        ray.data.from_arrow(t), "k", 0.3
    ).to_pandas()
    want_s1 = set(one[one["s"] == "s1"]["k"])
    assert set(mixed[mixed["s"] == "s1"]["k"]) == want_s1
    assert 0 < len(want_s1) < n // 3


def test_decontaminate_drops_benchmark_members_keeps_rest():
    from citationgraphs_ray.stages.decontam import decontaminate

    corpus_texts = [f"unique document number {i} " + "filler " * 20 for i in range(40)]
    docs = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(np.arange(40, dtype=np.int64)),
             "text": pa.array(corpus_texts)}
        )
    )
    # benchmark = docs 0-4 verbatim plus an unrelated doc
    bench = ray.data.from_arrow(
        pa.table({"text": pa.array(corpus_texts[:5] + ["totally elsewhere"])})
    )
    kept = decontaminate(docs, bench).to_pandas()
    assert set(kept["doc_id"]) == set(range(5, 40))


def test_approx_distinct_by_accuracy_and_partition_invariance():
    from citationgraphs_ray.stages.sketches import approx_distinct_by

    rng = np.random.default_rng(17)
    planted = {"a": 50, "b": 1000, "c": 20000, "d": 1}
    rows_g, rows_v = [], []
    for g, card in planted.items():
        vals = rng.choice(card * 10, size=card, replace=False).astype(np.int64)
        reps = np.repeat(vals, rng.integers(1, 4, size=card))  # dup rows
        rows_g.extend([g] * len(reps))
        rows_v.extend(reps.tolist())
    order = rng.permutation(len(rows_g))
    t = pa.table(
        {
            "g": pa.array([rows_g[i] for i in order]),
            "v": pa.array(np.array(rows_v, dtype=np.int64)[order]),
        }
    )
    got = (
        approx_distinct_by(ray.data.from_arrow(t).repartition(9), "g", "v")
        .to_pandas()
        .set_index("g")["approx_distinct"]
    )
    for g, card in planted.items():
        err = abs(got[g] - card) / card
        assert err < 0.08, (g, card, got[g])
    # partitioning must not change a deterministic sketch
    got1 = (
        approx_distinct_by(ray.data.from_arrow(t), "g", "v")
        .to_pandas()
        .set_index("g")["approx_distinct"]
    )
    assert got.sort_index().equals(got1.sort_index())


def test_approx_distinct_by_null_group_is_its_own_group():
    from citationgraphs_ray.stages.sketches import approx_distinct_by

    t = pa.table(
        {
            "g": pa.array(["a", None, "b", None, "a"]),
            "v": pa.array([1, 2, 3, 4, 1], pa.int64()),
        }
    )
    got = approx_distinct_by(ray.data.from_arrow(t), "g", "v").to_pandas()
    by = {
        ("<null>" if pd.isna(k) else k): v
        for k, v in zip(got["g"], got["approx_distinct"])
    }
    # small exact range: linear counting is exact here
    assert by == {"a": 1, "b": 1, "<null>": 2}


def test_approx_distinct_by_group_keys_beyond_2_53_with_nulls():
    # int64 group keys > 2^53 + a null row: the old pandas-factorize hop
    # coerced the column to float64 and ROUNDED adjacent keys together;
    # the Arrow dictionary-encode path must keep them distinct and exact.
    from citationgraphs_ray.stages.sketches import approx_distinct_by

    big = (1 << 60) + 1
    t = pa.table(
        {
            "g": pa.array([big, big + 1, big, None], pa.int64()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    from citationgraphs_ray.utils import collect_table

    # stay in Arrow for the check too — pandas would float64-round the keys
    got = collect_table(approx_distinct_by(ray.data.from_arrow(t), "g", "v"))
    assert got.schema.field("g").type == pa.int64()
    by = {
        ("<null>" if k is None else k): v
        for k, v in zip(got["g"].to_pylist(), got["approx_distinct"].to_pylist())
    }
    assert by == {big: 2, big + 1: 1, "<null>": 1}


def test_grouped_exact_quantiles_matches_per_group_numpy():
    from citationgraphs_ray.stages.sketches import grouped_exact_quantiles

    rng = np.random.default_rng(11)
    gs = rng.choice(["a", "b", "c"], size=30_000)
    vals = np.where(
        gs == "a",
        rng.lognormal(3, 2, 30_000),
        np.where(gs == "b", rng.normal(-50, 4, 30_000), rng.uniform(0, 1, 30_000)),
    )
    ds = ray.data.from_pandas(pd.DataFrame({"g": gs, "x": vals})).repartition(7)
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    got = grouped_exact_quantiles(ds, "g", "x", qs, bins=64, cutoff=100)
    rows = list(zip(got["grp"].to_pylist(), got["q"].to_pylist(), got["value"].to_pylist()))
    assert len(rows) == 15
    for g, q, v in rows:
        assert v == _disc(vals[gs == g], q), (g, q)


def test_grouped_exact_quantiles_nan_and_int_groups():
    from citationgraphs_ray.stages.sketches import grouped_exact_quantiles

    df = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2, 2, 2],
            "x": [np.nan, 5.0, 1.0, 3.0, np.nan, 7.0, 2.0],
        }
    )
    got = grouped_exact_quantiles(
        ray.data.from_pandas(df), "g", "x", [0.0, 0.5, 1.0]
    )
    d = {
        (g, q): v
        for g, q, v in zip(
            got["grp"].to_pylist(), got["q"].to_pylist(), got["value"].to_pylist()
        )
    }
    assert got["grp"].type == pa.int64()
    assert d[(1, 0.0)] == 1.0 and d[(1, 0.5)] == 1.0 and d[(1, 1.0)] == 5.0
    assert d[(2, 0.5)] == 3.0 and d[(2, 1.0)] == 7.0


def test_grouped_exact_quantiles_duplicate_heavy_group():
    from citationgraphs_ray.stages.sketches import grouped_exact_quantiles

    base = np.float64(1.25)
    nxt = np.nextafter(base, 2.0)
    vals = np.concatenate(
        [np.full(40_000, base), np.full(15_000, nxt), np.linspace(10, 20, 500)]
    )
    gs = np.array(["hot"] * 55_000 + ["cold"] * 500)
    ds = ray.data.from_pandas(pd.DataFrame({"g": gs, "x": vals})).repartition(5)
    got = grouped_exact_quantiles(ds, "g", "x", [0.5, 0.8], bins=16, cutoff=10)
    for g, q, v in zip(
        got["grp"].to_pylist(), got["q"].to_pylist(), got["value"].to_pylist()
    ):
        assert v == _disc(vals[gs == g], q), (g, q)


def test_weighted_sample_rate_scales_with_weight():
    from citationgraphs_ray.stages.sketches import weighted_sample

    n = 40_000
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {"k": np.arange(n), "w": rng.integers(0, 5, n).astype(np.int64)}
    )
    got = weighted_sample(
        ray.data.from_pandas(df).repartition(6), "k", "w", 1000, seed=41
    ).to_pandas()
    # w=0 rows can never be sampled
    assert (got.w > 0).all()
    # empirical rate per weight ≈ w/10 (binomial tolerance)
    full = df.groupby("w").size()
    samp = got.groupby("w").size()
    for w in (1, 2, 3, 4):
        rate = samp.get(w, 0) / full[w]
        assert abs(rate - w * 0.1) < 0.02, (w, rate)
    # deterministic + partition-invariant
    again = weighted_sample(
        ray.data.from_pandas(df).repartition(13), "k", "w", 1000, seed=41
    ).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("k").reset_index(drop=True),
        again.sort_values("k").reset_index(drop=True),
    )


def test_weighted_sample_caps_at_certainty_and_guards():
    from citationgraphs_ray.stages.sketches import weighted_sample

    df = pd.DataFrame({"k": np.arange(500), "w": np.full(500, 1000)})
    got = weighted_sample(ray.data.from_pandas(df), "k", "w", 100, seed=1)
    assert got.count() == 500  # w·rate ≥ 10000 → probability 1
    with pytest.raises(ValueError, match="rate_per_10k"):
        weighted_sample(ray.data.from_pandas(df), "k", "w", 10001)
    bad = pd.DataFrame({"k": [1], "w": [-2]})
    with pytest.raises(Exception):
        weighted_sample(
            ray.data.from_pandas(bad), "k", "w", 10
        ).materialize()
    frac = pd.DataFrame({"k": [1], "w": [1.5]})
    with pytest.raises(Exception):
        weighted_sample(
            ray.data.from_pandas(frac), "k", "w", 10
        ).materialize()
