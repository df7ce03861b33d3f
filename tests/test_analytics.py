"""Relational analytics vs DuckDB / pandas oracles on the testdata tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from citationgraphs_ray.functions.cooccur import (
    bm25,
    doc_cooccurrence,
    doc_frequencies,
    strongly_connected_pairs,
    tfidf,
    top_k_tfidf_per_doc,
    word_cooccurrence,
)
from citationgraphs_ray.functions.metrics import (
    communities_from_memberships,
    compare_partitions,
    contingency_table,
    cpm,
    soft_modularity,
)
from citationgraphs_ray.functions.trends import (
    counts_by_year,
    emerging_trends,
    neighbor_ranks,
    rank_jumps,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet").materialize()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    return c


def test_doc_frequencies(docs, con):
    got = doc_frequencies(docs).to_pandas().sort_values("word").reset_index(drop=True)
    exp = con.sql(
        """SELECT word, count(DISTINCT doc_id) AS df FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
             FROM documents) WHERE word <> '' GROUP BY word ORDER BY word"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_doc_cooccurrence(docs, con):
    got = (
        doc_cooccurrence(docs)
        .to_pandas()
        .sort_values(["w1", "w2"])
        .reset_index(drop=True)
    )
    exp = con.sql(
        """WITH words AS (
             SELECT DISTINCT doc_id, unnest(string_split(lower(text),' ')) AS w
             FROM documents)
           SELECT a.w AS w1, b.w AS w2, count(*) AS freq
           FROM words a JOIN words b ON a.doc_id = b.doc_id AND a.w < b.w
           GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_word_cooccurrence_weights(docs):
    # pandas oracle on a few docs
    sample = docs.limit(20).to_pandas()
    got = (
        word_cooccurrence(ray.data.from_pandas(sample))
        .to_pandas()
        .set_index(["w1", "w2"])["weight"]
    )
    from collections import Counter
    from itertools import combinations

    exp = Counter()
    for _, r in sample.iterrows():
        c = Counter(r.text.lower().split())
        for a, b in combinations(sorted(c), 2):
            exp[(a, b)] += c[a] * c[b]
    assert len(got) == len(exp)
    for k, v in exp.items():
        assert got[k] == v


def test_tfidf_and_topk(docs, con):
    got = tfidf(docs).to_pandas().sort_values(["doc_id", "word"]).reset_index(drop=True)
    exp = con.sql(
        """WITH tok AS (
             SELECT doc_id, unnest(string_split(lower(text),' ')) AS word
             FROM documents),
           tf AS (SELECT doc_id, word, count(*)::DOUBLE AS tf FROM tok GROUP BY 1,2),
           df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
           n AS (SELECT count(*)::DOUBLE AS n FROM documents)
           SELECT doc_id, word, tf, ln(n.n / df.df) AS idf, tf * ln(n.n/df.df) AS tfidf
           FROM tf JOIN df USING (word) CROSS JOIN n ORDER BY doc_id, word"""
    ).df()
    assert len(got) == len(exp)
    assert np.allclose(got.tfidf.to_numpy(), exp.tfidf.to_numpy())
    top = top_k_tfidf_per_doc(tfidf(docs), k=3).to_pandas()
    assert (top.groupby("doc_id").size() <= 3).all()


def test_bm25_matches_sql(docs, con):
    got = (
        bm25(docs)
        .to_pandas()
        .sort_values(["doc_id", "word"])
        .reset_index(drop=True)
    )
    exp = con.sql(
        """WITH tok AS (
             SELECT doc_id, unnest(string_split(lower(text),' ')) AS word
             FROM documents),
           tf AS (SELECT doc_id, word, count(*)::DOUBLE AS tf FROM tok GROUP BY 1,2),
           dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
           df AS (SELECT word, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY 1),
           n AS (SELECT count(*)::DOUBLE AS n FROM documents),
           ad AS (SELECT avg(dl) AS avgdl FROM dl)
           SELECT tf.doc_id, tf.word,
                  ln(1 + (n.n - df.df + 0.5) / (df.df + 0.5))
                    * tf.tf * 2.2
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / ad.avgdl)) AS bm25
           FROM tf JOIN df USING (word)
           JOIN dl ON dl.doc_id = tf.doc_id, n, ad
           ORDER BY tf.doc_id, tf.word"""
    ).df()
    assert len(got) == len(exp)
    assert np.allclose(got.bm25.to_numpy(), exp.bm25.to_numpy())
    # dl is consistent with tf by construction: dl = sum of tf per doc
    per_doc = got.groupby("doc_id").agg(tf_sum=("tf", "sum"), dl=("dl", "first"))
    assert np.array_equal(per_doc.tf_sum.to_numpy(), per_doc.dl.to_numpy())
    top = top_k_tfidf_per_doc(bm25(docs), k=3, value_col="bm25").to_pandas()
    assert (top.groupby("doc_id").size() <= 3).all()


def test_strongly_connected_pairs(docs):
    got = strongly_connected_pairs(docs, thres_freq=5, thres_ratio=1.1).to_pandas()
    # every kept pair satisfies both predicates
    assert (got.actual >= 5).all()
    assert (got.actual >= 1.1 * got.expected).all()


# ---- metrics --------------------------------------------------------------


def _assign(ids, comms):
    return ray.data.from_arrow(
        pa.table({"id": pa.array(ids, type=pa.int64()), "community": pa.array(comms, type=pa.int64())})
    )


def test_compare_partitions_vs_sklearn_formulas():
    rng = np.random.default_rng(0)
    n = 200
    c1 = rng.integers(0, 4, n)
    c2 = (c1 + (rng.random(n) < 0.3).astype(int)) % 4  # correlated
    ct = contingency_table(_assign(range(n), c1), _assign(range(n), c2))
    got = compare_partitions(ct)
    # independent reference implementation (dict-based)
    from collections import Counter

    pairs = Counter(zip(c1, c2))
    nij = np.zeros((4, 4))
    for (i, j), v in pairs.items():
        nij[i, j] = v
    a, b = nij.sum(1), nij.sum(0)

    def c2f(x):
        return x * (x - 1) / 2

    sum_ij = c2f(nij).sum()
    ri = (c2f(n) + 2 * sum_ij - c2f(a).sum() - c2f(b).sum()) / c2f(n)
    assert abs(got.ri - ri) < 1e-12
    exp_ij = c2f(a).sum() * c2f(b).sum() / c2f(n)
    ari = (sum_ij - exp_ij) / (0.5 * (c2f(a).sum() + c2f(b).sum()) - exp_ij)
    assert abs(got.ari - ari) < 1e-12
    # identical partitions → perfect scores
    perfect = compare_partitions(
        contingency_table(_assign(range(n), c1), _assign(range(n), c1))
    )
    assert perfect.ri == 1.0 and abs(perfect.ari - 1.0) < 1e-12
    assert abs(perfect.nmi - 1.0) < 1e-12
    assert perfect.ami == pytest.approx(1.0, abs=1e-9)
    assert 0 <= got.ami <= 1.0 + 1e-9


def test_modularity_and_cpm_oracle():
    rng = np.random.default_rng(1)
    n, k = 60, 4
    mat = rng.random((n, k))
    mat /= mat.sum(1, keepdims=True)
    ms = ray.data.from_arrow(
        pa.table({"id": pa.array(range(n), type=pa.int64()), "membership": pa.array(list(mat))})
    )
    comms = communities_from_memberships(ms)
    got_m = soft_modularity(ms, comms)
    got_c = cpm(ms, comms, gamma=0.4)
    # O(n²) oracle
    N = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = N @ N.T
    s = cos.sum(1)
    T = s.sum()
    labels = np.argmax(mat, axis=1)
    exp_m = sum(
        cos[np.ix_(idx, idx)].sum() - s[idx].sum() ** 2 / T
        for c in range(k)
        for idx in [np.flatnonzero(labels == c)]
    )
    exp_c = sum(
        cos[np.ix_(idx, idx)].sum() - 0.4 * len(idx) ** 2
        for c in range(k)
        for idx in [np.flatnonzero(labels == c)]
    )
    assert got_m == pytest.approx(exp_m, rel=1e-9)
    assert got_c == pytest.approx(exp_c, rel=1e-9)


# ---- trends ---------------------------------------------------------------


def test_emerging_trends():
    rows = []
    # label "hot": 1 far occurrence, 5 recent; label "old": 5 far, 5 recent
    rows += [("hot", 2000)] + [("hot", 2023)] * 5
    rows += [("old", 2000)] * 5 + [("old", 2023)] * 5
    ds = ray.data.from_items([{"label": l, "year": y} for l, y in rows])
    got = emerging_trends(ds, "label", "year", 2010, 2024, low_threshold=3, high_threshold=4).to_pandas()
    assert list(got.label) == ["hot"]
    assert got.far_count.iloc[0] == 1 and got.recent_count.iloc[0] == 5


def test_counts_by_year():
    ds = ray.data.from_items(
        [{"k": "a", "year": 2000}, {"k": "a", "year": 2000}, {"k": "b", "year": 2001}]
    )
    got = counts_by_year(ds, "k").to_pandas().sort_values(["k", "year"])
    assert list(got.n) == [2, 1]


def test_rank_jumps_and_neighbor_ranks():
    sims = ray.data.from_items(
        [
            {"phrase1": "p", "phrase2": "x", "sim": 0.9},
            {"phrase1": "p", "phrase2": "y", "sim": 0.5},
            {"phrase1": "p", "phrase2": "z", "sim": 0.5},
        ]
    )
    ranks = neighbor_ranks(sims).to_pandas().set_index("phrase2")["rank"]
    assert ranks["x"] == 1 and ranks["y"] == 2 and ranks["z"] == 3  # tie → asc
    prev = ray.data.from_items(
        [{"phrase1": "p", "phrase2": "x", "rank": 5}, {"phrase1": "p", "phrase2": "y", "rank": 2}]
    )
    cur = ray.data.from_items(
        [{"phrase1": "p", "phrase2": "x", "rank": 1}, {"phrase1": "p", "phrase2": "y", "rank": 4}]
    )
    j = rank_jumps(prev, cur, min_jump=1).to_pandas()
    assert list(j.phrase2) == ["x"] and j.jump.iloc[0] == 4


def test_corpusx_concurrences_matches_reference_semantics():
    """A3: cross-group-only, count-weighted, symmetric — brute-force
    nested-loop oracle mirroring CitationGraphs.go:740-830."""
    import pyarrow as pa
    import ray.data

    from citationgraphs_ray.functions.cooccur import corpusx_concurrences

    docs = {
        0: [["a", "b", "a"], ["b", "c"], ["a"]],
        1: [["x", "y"], ["y", "x"]],
        2: [["solo"]],
    }
    rows = {"doc_id": [], "group_id": [], "words": []}
    for d, groups in docs.items():
        for g, ws in enumerate(groups):
            rows["doc_id"].append(d)
            rows["group_id"].append(g)
            rows["words"].append(ws)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
                "group_id": pa.array(rows["group_id"], type=pa.int64()),
                "words": pa.array(rows["words"], type=pa.list_(pa.string())),
            }
        )
    )
    got = {
        (r.w1, r.w2): r.weight
        for r in corpusx_concurrences(ds).to_pandas().itertuples()
    }
    # brute-force Go-shaped oracle
    from collections import Counter, defaultdict

    exp: dict = defaultdict(float)
    for groups in docs.values():
        cnts = [Counter(g) for g in groups]
        for i1, c1 in enumerate(cnts):
            for w1, n1 in c1.items():
                for i2, c2 in enumerate(cnts):
                    if i1 == i2:
                        continue
                    for w2, n2 in c2.items():
                        if w1 != w2:
                            exp[(w1, w2)] += n1 * n2
    assert got == dict(exp)
    # symmetry (reference accumulates both orientations)
    for (w1, w2), v in got.items():
        assert got[(w2, w1)] == v


def test_two_hop_regimes_agree():
    """Dense boolean-A² regime == forced join regime (sf0.001)."""
    from citationgraphs_ray.pipelines.queries import q_two_hop_counts

    sf = "/root/testdata/sf0.001"
    a = q_two_hop_counts(sf, mode="dense").to_pandas().sort_values("id")
    b = (
        q_two_hop_counts(sf, mode="join")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    a = a.reset_index(drop=True)
    assert a.equals(b[["id", "n_two_hop"]].astype(a.dtypes.to_dict()))


def test_unigram_logprob_matches_sql(docs, con):
    from citationgraphs_ray.functions.cooccur import unigram_logprob

    got = (
        unigram_logprob(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = con.sql(
        """WITH tok AS (
             SELECT doc_id, unnest(string_split(lower(text),' ')) AS word
             FROM documents),
           cnt AS (SELECT word, count(*)::DOUBLE AS c FROM tok GROUP BY 1),
           tot AS (SELECT count(*)::DOUBLE AS n FROM tok)
           SELECT tok.doc_id, count(*) AS n_tokens,
                  avg(ln(cnt.c / tot.n)) AS mean_logprob
           FROM tok JOIN cnt USING (word), tot
           GROUP BY tok.doc_id ORDER BY tok.doc_id"""
    ).df()
    assert got.n_tokens.tolist() == exp.n_tokens.tolist()
    assert np.allclose(got.mean_logprob, exp.mean_logprob, atol=1e-6)
    # every score is a negative log-prob; docs of common words score higher
    assert (got.mean_logprob < 0).all()
