"""Vocabulary minting + document encoding + Word2Phrase (C1-C5, A6-A8).

Reference semantics: ``Corpus.AddDoc`` assigns dense word ids first-seen
into a global mutable dict (CitationGraphs.go:143-158) — map-iteration-order
dependent, hence nondeterministic. Here vocab ids are the rank over SORTED
tokens (deterministic, order-independent): tokenize → groupby(token) (dedup
+ df in one shuffle) → sort → zip_with_index → broadcast dict → encode.

``Word2Phrase`` (CitationGraphs.go:298-419, A6/A7) promotes high-scoring
bigrams to phrase tokens by greedy left-to-right rewrite, iterated
``num_iters`` times; ``Word2PhraseEx`` (423-563, A8) scores with forward and
reverse conditional frequencies. Both are: two grouped counts (unigram +
lag-pair), a driver-side threshold on the (small) accepted-bigram table,
broadcast, and a per-doc greedy rewrite in map_batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..utils import collect_table, fast_grouped_agg, zip_with_index


def tokenize_docs(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(doc_id, tokens: list<string>) — order-preserving (CorpusSeq shape,
    C3: sequences feed bigram mining, CitationGraphs.go:193-209)."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = [(t or "").lower().split() for t in batch[text_col].to_pylist()]
        return pa.table(
            {id_col: batch[id_col], "tokens": pa.array(toks, type=pa.list_(pa.string()))}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def build_vocab(tokenized: ray.data.Dataset) -> ray.data.Dataset:
    """(word, word_id, freq) — dense ids ranked over sorted tokens."""

    def explode(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for toks in batch["tokens"].to_pylist():
            words.extend(toks)
        return pa.table({"word": pa.array(words, type=pa.string())})

    counts = fast_grouped_agg(
        tokenized.map_batches(explode, batch_format="pyarrow"),
        ["word"],
        count_as="freq",
    ).sort("word")
    return zip_with_index(counts, col="word_id")


def vocab_dict(vocab: ray.data.Dataset) -> dict[str, int]:
    tbl = collect_table(vocab)
    return dict(zip(tbl["word"].to_pylist(), tbl["word_id"].to_pylist()))


def encode_docs(
    tokenized: ray.data.Dataset, vocab: dict[str, int] | ray.data.Dataset
) -> ray.data.Dataset:
    """(doc_id, word_ids: list<int64>) — order-preserving encode via the
    broadcast vocab dict (the C4 barrier: vocab first, encode second)."""
    if isinstance(vocab, ray.data.Dataset):
        vocab = vocab_dict(vocab)
    ref = ray.put(vocab)

    class Encode:
        def __init__(self) -> None:
            self.v = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = [
                [self.v[w] for w in toks if w in self.v]
                for toks in batch["tokens"].to_pylist()
            ]
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "word_ids": pa.array(out, type=pa.list_(pa.int64())),
                }
            )

    return tokenized.map_batches(Encode, batch_format="pyarrow", concurrency=(1, 4))


def translate_vocab(
    sub_vocab: dict[str, int], super_vocab: dict[str, int]
) -> dict[int, int]:
    """C5 (CitationGraphs.go:932-981): re-key sub-corpus ids into the
    super-corpus vocab; raises if not a subset (reference log.Fatal)."""
    out: dict[int, int] = {}
    for w, old in sub_vocab.items():
        if w not in super_vocab:
            raise KeyError(f"word {w!r} missing from super vocab")
        out[old] = super_vocab[w]
    return out


# ---------------------------------------------------------------------------
# Word2Phrase
# ---------------------------------------------------------------------------


def _bigram_tables(
    tokenized: ray.data.Dataset,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Unigram freqs + forward bigram freqs via grouped counts (A6)."""

    def uni(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for toks in batch["tokens"].to_pylist():
            words.extend(toks)
        return pa.table({"w": pa.array(words, type=pa.string())})

    def bi(batch: pa.Table) -> pa.Table:
        w1: list[str] = []
        w2: list[str] = []
        for toks in batch["tokens"].to_pylist():
            for a, b in zip(toks, toks[1:]):
                w1.append(a)
                w2.append(b)
        return pa.table(
            {"w1": pa.array(w1, type=pa.string()), "w2": pa.array(w2, type=pa.string())}
        )

    uni_df = fast_grouped_agg(
        tokenized.map_batches(uni, batch_format="pyarrow"), ["w"], count_as="count()"
    ).to_pandas()
    bi_df = fast_grouped_agg(
        tokenized.map_batches(bi, batch_format="pyarrow"),
        ["w1", "w2"],
        count_as="count()",
    ).to_pandas()
    return uni_df, bi_df


def accepted_bigrams(
    uni_df: pd.DataFrame,
    bi_df: pd.DataFrame,
    min_freq: int,
    min_score: float,
) -> pd.DataFrame:
    """Vectorized accepted-bigram selection: rows of ``bi_df`` with
    freq ≥ min_freq and (freq - min_freq)/(f1·f2) ≥ min_score. Pure
    pandas/numpy column ops over the (already thresholded-small) grouped
    counts — no Python row loop."""
    m = bi_df[bi_df["count()"] >= min_freq]
    if m.empty:
        return m
    f = uni_df.set_index("w")["count()"]
    f1 = m["w1"].map(f).to_numpy(dtype=np.float64)
    f2 = m["w2"].map(f).to_numpy(dtype=np.float64)
    score = (m["count()"].to_numpy(dtype=np.float64) - min_freq) / (f1 * f2)
    return m[score >= min_score]


def word2phrase(
    tokenized: ray.data.Dataset,
    num_iters: int = 2,
    min_freq: int = 5,
    min_score: float = 1e-4,
    delimiter: str = "_",
) -> ray.data.Dataset:
    """A7: promote bigrams with score = (freq - min_freq) / (f1 · f2) ≥
    min_score into joined phrase tokens, greedy left-to-right, repeated
    ``num_iters`` times (recursion in the reference, 341-419).

    Returns re-written ``(doc_id, tokens)``. The accepted-bigram dict is
    small (thresholded) and broadcast; counting is two grouped aggregates.
    """
    ds = tokenized
    for _ in range(num_iters):
        uni_df, bi_df = _bigram_tables(ds)
        acc = accepted_bigrams(uni_df, bi_df, min_freq, min_score)
        accepted = set(zip(acc["w1"], acc["w2"]))
        if not accepted:
            break
        acc_ref = ray.put(accepted)

        class Rewrite:
            def __init__(self) -> None:
                self.acc = ray.get(acc_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                out: list[list[str]] = []
                for toks in batch["tokens"].to_pylist():
                    res: list[str] = []
                    i = 0
                    while i < len(toks):
                        if i + 1 < len(toks) and (toks[i], toks[i + 1]) in self.acc:
                            res.append(toks[i] + delimiter + toks[i + 1])
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    out.append(res)
                return pa.table(
                    {
                        "doc_id": batch["doc_id"],
                        "tokens": pa.array(out, type=pa.list_(pa.string())),
                    }
                )

        ds = ds.map_batches(
            Rewrite, batch_format="pyarrow", concurrency=(1, 4)
        ).materialize()
    return ds


def word2phrase_ex(
    tokenized: ray.data.Dataset,
    num_iters: int = 2,
    min_freq: int = 5,
    min_score: float = 1.5,
    delimiter: str = "_",
) -> ray.data.Dataset:
    """A8 variant (Word2PhraseEx, 423-563): score with forward AND reverse
    conditionals — score = (f/avg_fwd(w1)) · (f/avg_rev(w2)) where avg_fwd
    is w1's mean successor frequency and avg_rev w2's mean predecessor
    frequency; accept if freq ≥ min_freq and score ≥ min_score."""
    ds = tokenized
    for _ in range(num_iters):
        _, bi_df = _bigram_tables(ds)
        fwd = bi_df.groupby("w1")["count()"].mean().to_dict()
        rev = bi_df.groupby("w2")["count()"].mean().to_dict()
        accepted: set[tuple[str, str]] = set()
        for w1, w2, f in zip(bi_df["w1"], bi_df["w2"], bi_df["count()"]):
            if f < min_freq:
                continue
            score = (f / fwd[w1]) * (f / rev[w2])
            if score >= min_score:
                accepted.add((w1, w2))
        if not accepted:
            break
        acc_ref = ray.put(accepted)

        class Rewrite:
            def __init__(self) -> None:
                self.acc = ray.get(acc_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                out: list[list[str]] = []
                for toks in batch["tokens"].to_pylist():
                    res: list[str] = []
                    i = 0
                    while i < len(toks):
                        if i + 1 < len(toks) and (toks[i], toks[i + 1]) in self.acc:
                            res.append(toks[i] + delimiter + toks[i + 1])
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    out.append(res)
                return pa.table(
                    {
                        "doc_id": batch["doc_id"],
                        "tokens": pa.array(out, type=pa.list_(pa.string())),
                    }
                )

        ds = ds.map_batches(
            Rewrite, batch_format="pyarrow", concurrency=(1, 4)
        ).materialize()
    return ds
