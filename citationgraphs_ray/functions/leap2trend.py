"""Per-year embedding pipeline + Leap2Trend (S5, T4-T7, lifecycle E3).

Reference flow (CitationGraphs.go:3799-3866, 4105-4331): write cumulative
per-year training text (English-gated), train CBOW word2vec per year
(external ``wego`` lib — T4), then per year compute all-pairs cosine
against the high-frequency vocabulary (T5), rank neighbors (T6), join with
the previous year's ranks and emit rank jumps (T7).

Two trainers behind the same call boundary (year corpus → word→vector
map): ``SgnsEmbedder`` — a real seeded numpy skip-gram-negative-sampling
word2vec (T4 closed semantically; the reference's external CBOW lib has
the same Window/Negatives/Dim shape) — and ``DeterministicEmbedder``, a
cheap corpus-dependent stand-in (base hash-gaussians blended with
co-occurrence means) kept as the fast default for fixture pipelines.
External trainers (gensim etc.) plug in via the ``embedder`` hook.

Cross-year state (previous year's ranks) is a Dataset carried by the driver
loop, exactly the E3 checkpoint shape.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..utils import list_column_to_matrix

from .trends import neighbor_ranks, rank_jumps


def save_word2vec_training_data(
    docs: ray.data.Dataset,
    out_prefix: str,
    year_start: int,
    year_end: int,
) -> list[str]:
    """S5 (3799-3866): per year y in [start, end], write one text file with
    all English docs of year ≤ y (cumulative windows) plus a parallel id
    file. docs = (doc_id, year, is_english, tokens)."""
    os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
    written: list[str] = []
    base = docs.filter(expr="is_english == True")
    for y in range(year_start, year_end + 1):
        sub = base.filter(expr=f"year <= {y}").sort("doc_id")
        txt = f"{out_prefix}-{y}.txt"
        ids = f"{out_prefix}-{y}.ids"
        with open(txt, "w") as ft, open(ids, "w") as fi:
            for row in sub.iter_rows():
                ft.write(" ".join(row["tokens"]) + "\n")
                fi.write(f"{row['doc_id']}\n")
        written.append(txt)
    return written


class DeterministicEmbedder:
    """T4 stub: word → R^dim, seeded by word hash, blended with the mean
    base vector of in-window co-occurring words (corpus-dependent)."""

    def __init__(self, dim: int = 32, window: int = 5, blend: float = 0.5) -> None:
        self.dim, self.window, self.blend = dim, window, blend

    def _base(self, word: str) -> np.ndarray:
        import hashlib

        seed = int.from_bytes(
            hashlib.blake2b(word.encode(), digest_size=8).digest(), "little"
        )
        return np.random.default_rng(seed).standard_normal(self.dim)

    def fit(self, token_lists: list[list[str]]) -> dict[str, np.ndarray]:
        ctx_sum: dict[str, np.ndarray] = defaultdict(lambda: np.zeros(self.dim))
        ctx_n: dict[str, int] = defaultdict(int)
        bases: dict[str, np.ndarray] = {}
        for toks in token_lists:
            for i, w in enumerate(toks):
                if w not in bases:
                    bases[w] = self._base(w)
            for i, w in enumerate(toks):
                lo, hi = max(0, i - self.window), min(len(toks), i + self.window + 1)
                for j in range(lo, hi):
                    if j == i:
                        continue
                    ctx_sum[w] += bases[toks[j]]
                    ctx_n[w] += 1
        out: dict[str, np.ndarray] = {}
        for w, b in bases.items():
            v = b.copy()
            if ctx_n[w]:
                v = (1 - self.blend) * b + self.blend * (ctx_sum[w] / ctx_n[w])
            out[w] = v
        return out


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))


class SgnsEmbedder:
    """T4, real training: seeded skip-gram negative-sampling word2vec in
    numpy, behind the same ``fit`` boundary as ``DeterministicEmbedder``.

    The reference delegates to an external CBOW lib (wego) with Window 5 /
    Negatives 5 / Dim 100 (CitationGraphs.go:4110-4127); this is the same
    hyperparameter shape with smaller fixture-scale defaults, fully
    deterministic per seed. Updates are vectorized minibatch SGD
    (``np.add.at`` scatter — no per-pair Python loop); negatives are drawn
    from the unigram^0.75 distribution via one searchsorted per batch.
    """

    def __init__(
        self,
        dim: int = 32,
        window: int = 5,
        negatives: int = 5,
        epochs: int = 10,
        lr: float = 0.05,
        seed: int = 42,
        batch: int = 512,
    ) -> None:
        self.dim, self.window, self.negatives = dim, window, negatives
        self.epochs, self.lr, self.seed, self.batch = epochs, lr, seed, batch

    def fit(self, token_lists: list[list[str]]) -> dict[str, np.ndarray]:
        words = sorted({w for toks in token_lists for w in toks})
        if not words:
            return {}
        wid = {w: i for i, w in enumerate(words)}
        V, d = len(words), self.dim
        counts = np.zeros(V, dtype=np.float64)
        centers: list[np.ndarray] = []
        contexts: list[np.ndarray] = []
        for toks in token_lists:
            ids = np.array([wid[w] for w in toks], dtype=np.int64)
            np.add.at(counts, ids, 1.0)
            n = len(ids)
            for off in range(1, min(self.window, n - 1) + 1):
                a, b = ids[:-off], ids[off:]
                centers.append(a)
                contexts.append(b)
                centers.append(b)  # symmetric skip-gram pairs
                contexts.append(a)
        if not centers:
            rng0 = np.random.default_rng(self.seed)
            return {
                w: rng0.standard_normal(d) / np.sqrt(d) for w in words
            }
        C = np.concatenate(centers)
        O = np.concatenate(contexts)
        noise = counts**0.75
        noise_cum = np.cumsum(noise / noise.sum())
        rng = np.random.default_rng(self.seed)
        W_in = (rng.random((V, d)) - 0.5) / d
        W_out = np.zeros((V, d))
        k, lr = self.negatives, self.lr
        for _ in range(self.epochs):
            perm = rng.permutation(len(C))
            for s in range(0, len(perm), self.batch):
                idx = perm[s : s + self.batch]
                c, o = C[idx], O[idx]
                B = len(c)
                neg = np.searchsorted(noise_cum, rng.random((B, k)))
                neg = np.minimum(neg, V - 1)
                v = W_in[c]  # (B, d)
                u = W_out[o]
                un = W_out[neg]  # (B, k, d)
                g_pos = _sigmoid((v * u).sum(1)) - 1.0  # (B,)
                s_neg = _sigmoid(np.einsum("bkd,bd->bk", un, v))  # (B, k)
                grad_v = g_pos[:, None] * u + np.einsum("bk,bkd->bd", s_neg, un)
                grad_u = g_pos[:, None] * v
                grad_un = s_neg[..., None] * v[:, None, :]
                # average (not sum) each word's in-batch contributions: a
                # word occurring m times in the batch would otherwise take
                # an m-times step and diverge on small vocabularies
                cnt_c = np.bincount(c, minlength=V)[c]
                cnt_o = np.bincount(o, minlength=V)[o]
                negr = neg.ravel()
                cnt_n = np.bincount(negr, minlength=V)[negr]
                np.add.at(W_in, c, -lr * grad_v / cnt_c[:, None])
                np.add.at(W_out, o, -lr * grad_u / cnt_o[:, None])
                np.add.at(
                    W_out,
                    negr,
                    -lr * grad_un.reshape(-1, d) / cnt_n[:, None],
                )
        return {w: W_in[wid[w]].copy() for w in words}


def phrase_similarities(
    vectors: dict[str, np.ndarray],
    high_freq: list[str],
) -> ray.data.Dataset:
    """T5 (computePhraseSimilarities, 4139-4205): cosine of every word
    against the high-frequency set — the high-freq matrix is the broadcast
    small side; word blocks stream through map_batches."""
    hf = sorted(high_freq)
    H = np.stack([vectors[w] for w in hf])
    H = H / np.maximum(np.linalg.norm(H, axis=1, keepdims=True), 1e-12)
    hf_ref = ray.put((hf, H))
    words = sorted(vectors)
    W = np.stack([vectors[w] for w in words])
    W = W / np.maximum(np.linalg.norm(W, axis=1, keepdims=True), 1e-12)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "phrase1": pa.array(words),
                "vec": pa.array([row.tolist() for row in W]),
            }
        )
    )

    class Score:
        def __init__(self) -> None:
            self.hf, self.H = ray.get(hf_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = list_column_to_matrix(batch["vec"])
            sims = V @ self.H.T  # (B, |hf|)
            p1 = np.repeat(batch["phrase1"].to_pylist(), len(self.hf))
            p2 = np.tile(self.hf, len(V))
            keep = p1 != p2
            return pa.table(
                {
                    "phrase1": pa.array(p1[keep]),
                    "phrase2": pa.array(p2[keep]),
                    "sim": pa.array(sims.ravel()[keep]),
                }
            )

    return ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 4))


def leap2trend(
    docs_by_year: dict[int, list[list[str]]],
    min_freq: int = 3,
    min_jump: int = 1,
    embedder: DeterministicEmbedder | None = None,
) -> dict[int, ray.data.Dataset]:
    """T7 (Leap2Trend, 4237-4331): per year — embed the cumulative corpus,
    filter high-freq words, all-pairs cosine vs high-freq set (T5), rank
    neighbors (T6), join against previous year's ranks → rank jumps sorted
    desc. Returns {year: jumps dataset}; first year has no output."""
    embedder = embedder or DeterministicEmbedder()
    years = sorted(docs_by_year)
    prev_ranks: ray.data.Dataset | None = None
    out: dict[int, ray.data.Dataset] = {}
    cumulative: list[list[str]] = []
    for y in years:
        cumulative = cumulative + docs_by_year[y]
        vectors = embedder.fit(cumulative)
        freqs: dict[str, int] = defaultdict(int)
        for toks in cumulative:
            for w in toks:
                freqs[w] += 1
        high = [w for w, f in freqs.items() if f >= min_freq]
        if len(high) < 2:
            continue
        sims = phrase_similarities(vectors, high)
        # reference ranks only high-freq phrases against each other
        # (4291-4297) — vectorized Arrow is_in mask, not a per-row UDF
        hf_arr = pa.array(sorted(set(high)))
        sims = sims.map_batches(
            lambda t: t.filter(pc.is_in(t["phrase1"], value_set=hf_arr)),
            batch_format="pyarrow",
        )
        ranks = neighbor_ranks(sims).materialize()
        if prev_ranks is not None:
            out[y] = rank_jumps(prev_ranks, ranks, min_jump=min_jump)
        prev_ranks = ranks
    return out


def write_vec_file(vectors: dict[str, np.ndarray], file_name: str) -> None:
    """S6: word2vec-text ``.vec`` format — header ``<n> <dim>``, then one
    ``word v1 v2 ...`` line per word (CitationGraphs.go:4128-4136 writes,
    4252-4266 reads). Words sorted for determinism."""
    words = sorted(vectors)
    dim = len(next(iter(vectors.values()))) if words else 0
    with open(file_name, "w") as f:
        f.write(f"{len(words)} {dim}\n")
        for w in words:
            f.write(w + " " + " ".join(f"{x:.6f}" for x in vectors[w]) + "\n")


def read_vec_file(file_name: str) -> dict[str, np.ndarray]:
    """S7: parse a ``.vec`` file back to word → vector."""
    out: dict[str, np.ndarray] = {}
    with open(file_name) as f:
        header = f.readline().split()
        dim = int(header[1]) if len(header) == 2 else None
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < 2:
                continue
            vec = np.array([float(x) for x in parts[1:]], dtype=np.float64)
            if dim is not None and len(vec) != dim:
                raise ValueError(
                    f"vector for {parts[0]!r} has dim {len(vec)} != {dim}"
                )
            out[parts[0]] = vec
    return out
