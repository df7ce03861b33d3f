"""Corpus builders over the citation-graph tables (SURVEY.md C1-C3, G3).

Reference semantics (CitationGraphs.go:2390-2775): per main node, tokenize
the node's own title and — for corpusType ≤ 0 — also the titles of its
ref-neighbors (a join along out-edges); corpusType 2 uses all nodes;
corpusType 3 uses stemmed labels. Doc order in the reference equals
``ToBeAnalyzed`` order; here every row carries an explicit ``doc_id`` (the
main-node index) so no block-order assumption exists (SURVEY.md §2.11).

Builders:
- ``main_node_index`` (G3): (id, main_idx) dense index over main nodes —
  filter + sorted rank (reference: idxMainNodes dict, 1447/2779-2785).
- ``build_corpus``   (C1/C3 shapes): (doc_id, id, tokens) per doc.
- ``build_corpus_x`` (C2 shape): (doc_id, group_id, words) — one group per
  candidate phrase (feeds exclusions / CorpusX co-occurrence).
- ``build_corpus_seq`` (C3): order-preserving tokens + year + is_english
  side columns.

The ref-title gather is ``edges ⋈ nodes ON dst=id → groupby(src).collect``
done as a broadcast merge + grouped string concat (titles are the small
side at fixture scale; at corpus scale this becomes the Dataset.join +
collect shape noted in SURVEY §2.5 C1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.phrases import all_possible_phrases, stem_phrase
from ..stages.text import LangIdHeuristic
from ..utils import broadcast_merge, collect_table, zip_with_index

CORPUS_MAIN_WITH_REFS = 0  # main nodes, own+ref titles (reference type<=0)
CORPUS_MAIN_ONLY = 1  # main nodes, own title only
CORPUS_ALL = 2  # all nodes, own title only
CORPUS_LABELS = 3  # main nodes, stemmed labels


def main_node_index(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """G3: (id, main_idx) — dense rank over main nodes sorted by id."""
    main = nodes.filter(expr="is_main == True").select_columns(["id"]).sort("id")
    return zip_with_index(main, col="main_idx")


def _tokens(s: str) -> list[str]:
    return (s or "").lower().split()


def build_corpus(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    corpus_type: int = CORPUS_MAIN_WITH_REFS,
) -> ray.data.Dataset:
    """C1: (doc_id, id, tokens list<string>).

    corpus_type semantics per the reference switch (2382-2389): ≤0 gathers
    ref-neighbor titles too; 2 covers all nodes; 3 uses stemmed labels
    (nodes must then carry a ``labels`` list column).

    Scale contract: the ref-title gather builds a src→tokens map on the
    driver — sized to the citation-CSV graphs this builder exists for
    (reference format, ≤10^6 titles). At corpus scale the same shape is
    the broadcast_merge + a groupby(src) concat; not needed for any
    current input.
    """
    if corpus_type == CORPUS_LABELS:
        base = nodes.filter(expr="is_main == True")

        def lab_tokens(t: pa.Table) -> pa.Table:
            toks = [
                [w for lab in (labs or []) for w in stem_phrase(lab).split()]
                for labs in t["labels"].to_pylist()
            ]
            return pa.table(
                {
                    "id": t["id"],
                    "tokens": pa.array(toks, type=pa.list_(pa.string())),
                }
            )

        docs = base.map_batches(lab_tokens, batch_format="pyarrow")
    else:
        base = (
            nodes
            if corpus_type == CORPUS_ALL
            else nodes.filter(expr="is_main == True")
        )
        own = base.map_batches(
            lambda t: pa.table(
                {
                    "id": t["id"],
                    "tokens": pa.array(
                        [_tokens(x) for x in t["title"].to_pylist()],
                        type=pa.list_(pa.string()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        if corpus_type <= CORPUS_MAIN_WITH_REFS:
            # gather ref-neighbor titles: edges ⋈ titles ON dst=id,
            # grouped concat per src, merged into the own-token rows
            titles = nodes.select_columns(["id", "title"])
            j = broadcast_merge(
                edges.select_columns(["src", "dst"]),
                titles,
                left_on="dst",
                right_on="id",
            )
            ref_tbl = collect_table(
                j.map_batches(
                    lambda t: pa.table(
                        {"src": t["src"], "title": t["title"]}
                    ),
                    batch_format="pyarrow",
                )
            ).to_pandas()
            ref_tokens: dict[int, list[str]] = {}
            for src, grp in ref_tbl.sort_values(["src", "title"]).groupby("src"):
                toks: list[str] = []
                for title in grp["title"]:
                    toks.extend(_tokens(title))
                ref_tokens[int(src)] = toks
            ref_ref = ray.put(ref_tokens)

            class AddRefs:
                def __init__(self) -> None:
                    self.refs = ray.get(ref_ref)

                def __call__(self, t: pa.Table) -> pa.Table:
                    toks = [
                        list(own_t) + self.refs.get(int(i), [])
                        for i, own_t in zip(
                            t["id"].to_pylist(), t["tokens"].to_pylist()
                        )
                    ]
                    return pa.table(
                        {
                            "id": t["id"],
                            "tokens": pa.array(toks, type=pa.list_(pa.string())),
                        }
                    )

            own = own.map_batches(
                AddRefs, batch_format="pyarrow", concurrency=(1, 4)
            )
        docs = own

    # explicit doc ids = rank over sorted node id (order-independence)
    return zip_with_index(docs.sort("id"), col="doc_id")


def build_corpus_x(
    nodes: ray.data.Dataset,
    corpus_type: int = CORPUS_ALL,
) -> ray.data.Dataset:
    """C2: (doc_id, group_id, words list<string>) — one group per candidate
    phrase = each word's sub-phrase expansion (M7) of title bigram windows.
    Feeds exclusions (A5) and CorpusX co-occurrence (A3/A4)."""
    base = (
        nodes if corpus_type == CORPUS_ALL else nodes.filter(expr="is_main == True")
    )

    def groups(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        gids: list[int] = []
        words: list[list[str]] = []
        for i, title in zip(t["id"].to_pylist(), t["title"].to_pylist()):
            toks = _tokens(title)
            # candidate phrases = consecutive word bigrams (+ last unigram)
            cands = [" ".join(toks[k : k + 2]) for k in range(0, len(toks), 2)]
            for g, cand in enumerate(cands):
                ids.append(i)
                gids.append(g)
                words.append(all_possible_phrases(cand))
        return pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "group_id": pa.array(gids, type=pa.int64()),
                "words": pa.array(words, type=pa.list_(pa.string())),
            }
        )

    out = base.map_batches(groups, batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.rename_columns(["doc_id", "group_id", "words"]),
        batch_format="pyarrow",
    )


def build_corpus_seq(
    nodes: ray.data.Dataset,
    corpus_type: int = CORPUS_ALL,
) -> ray.data.Dataset:
    """C3: (doc_id, id, year, is_english, tokens) — order-preserving, with
    the language gate column (reference gates via langdet, 2700-2705)."""
    base = (
        nodes if corpus_type == CORPUS_ALL else nodes.filter(expr="is_main == True")
    )

    def fn(t: pa.Table) -> pa.Table:
        titles = t["title"].to_pylist()
        toks = [_tokens(x) for x in titles]
        is_en = [LangIdHeuristic.detect(x or "") in ("en", "und") for x in titles]
        return pa.table(
            {
                "id": t["id"],
                "year": t["year"],
                "is_english": pa.array(is_en),
                "tokens": pa.array(toks, type=pa.list_(pa.string())),
            }
        )

    out = base.map_batches(fn, batch_format="pyarrow")
    return zip_with_index(out.sort("id"), col="doc_id")


def write_rank_jumps_csv(jumps: ray.data.Dataset, file_name: str) -> None:
    """S8 (Leap2Trend CSV writer, 4321-4326): ``idx, phrase1, phrase2,
    jump`` rows in jump-desc order."""
    df = jumps.to_pandas()
    with open(file_name, "w") as f:
        f.write("idx, phrase1, phrase2, jump\n")
        for i, r in enumerate(df.itertuples()):
            f.write(f"{i}, {r.phrase1}, {r.phrase2}, {r.jump}\n")
