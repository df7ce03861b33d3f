"""CSV conformance round-trip (F4), memberships I/O, leap2trend pipeline."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from citationgraphs_ray.functions.leap2trend import (
    DeterministicEmbedder,
    leap2trend,
    phrase_similarities,
    save_word2vec_training_data,
)
from citationgraphs_ray.sources.csv_conformance import (
    CitationGraphTables,
    load_citation_graph,
    load_memberships_json,
    save_citation_graph,
    save_memberships_json,
)


def _fixture_graph():
    nodes = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], type=pa.int64()),
                "is_main": pa.array([True, False, True]),
                "year": pa.array([2001, 2002, 2003], type=pa.int64()),
                "title": pa.array(
                    [
                        "Learning, Fast and Slow",  # comma → [comma] escaping
                        "Graphs &amp; Matrices",  # HTML entity
                        "Caf&//x00e9; Networks",  # unicode escape
                    ]
                ),
            }
        )
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 1, 2, 3], type=pa.int64()),  # dup (1,2)
                "dst": pa.array([2, 2, 1, 1], type=pa.int64()),  # + reverse
            }
        )
    )
    labels = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 1, 3], type=pa.int64()),
                "label": pa.array(["ml", "graphs", "nets"]),
            }
        )
    )
    return CitationGraphTables(nodes, edges, labels)


def test_csv_roundtrip_fixpoint(tmp_path):
    g = _fixture_graph()
    p = str(tmp_path)
    save_citation_graph(p, "ijcai", g)
    loaded = load_citation_graph(p, "ijcai")
    ndf = loaded.nodes.to_pandas().sort_values("id")
    # [comma] escaping round-trips; entities/escapes tidied on load
    assert ndf.title.iloc[0] == "Learning, Fast and Slow"
    assert ndf.title.iloc[1] == "Graphs & Matrices"
    assert "é" in ndf.title.iloc[2]
    assert list(ndf.is_main) == [True, False, True]
    # edges deduped but DIRECTION PRESERVED (reference writes the directed
    # citer→cited set; CitationGraphs.go:2003-2026 never re-orients)
    edf = loaded.edges.to_pandas().sort_values(["src", "dst"])
    assert list(map(tuple, edf.to_numpy())) == [(1, 2), (2, 1), (3, 1)]
    # second save → identical files (fixpoint)
    p2 = str(tmp_path / "again")
    save_citation_graph(p2, "ijcai", loaded)
    for f in ["nodes", "edges", "labels"]:
        a = open(f"{p}/ijcai-citation-graph-{f}.csv").read()
        b = open(f"{p2}/ijcai-citation-graph-{f}.csv").read()
        assert a == b, f


def test_csv_save_preserves_direction(tmp_path):
    """An asymmetric edge set must round-trip with direction intact: a
    (min,max) canonicalization would flip (5,4) to (4,5) and merge nothing
    here, so any reorientation is visible."""
    nodes = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([4, 5, 6], type=pa.int64()),
                "is_main": pa.array([True, True, True]),
                "year": pa.array([2000, 2000, 2000], type=pa.int64()),
                "title": pa.array(["a", "b", "c"]),
            }
        )
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([5, 6], type=pa.int64()),
                "dst": pa.array([4, 4], type=pa.int64()),
            }
        )
    )
    labels = ray.data.from_arrow(
        pa.table({"id": pa.array([4], type=pa.int64()), "label": pa.array(["x"])})
    )
    g = CitationGraphTables(nodes, edges, labels)
    save_citation_graph(str(tmp_path), "d", g)
    loaded = load_citation_graph(str(tmp_path), "d")
    edf = loaded.edges.to_pandas().sort_values(["src", "dst"])
    assert list(map(tuple, edf.to_numpy())) == [(5, 4), (6, 4)]


def test_csv_malformed_header_raises(tmp_path):
    g = _fixture_graph()
    save_citation_graph(str(tmp_path), "x", g)
    f = tmp_path / "x-citation-graph-nodes.csv"
    content = f.read_text().splitlines()
    content[0] = "#id, wrong, year, title"
    f.write_text("\n".join(content) + "\n")
    with pytest.raises(ValueError, match="Incorrect file format"):
        load_citation_graph(str(tmp_path), "x")


def test_malformed_numeric_zero_valued(tmp_path):
    save_citation_graph(str(tmp_path), "z", _fixture_graph())
    f = tmp_path / "z-citation-graph-nodes.csv"
    lines = f.read_text().splitlines()
    lines.append("oops, true, notayear, Broken Row")
    f.write_text("\n".join(lines) + "\n")
    loaded = load_citation_graph(str(tmp_path), "z")
    row = loaded.nodes.to_pandas().set_index("title").loc["Broken Row"]
    assert row.id == 0 and row.year == 0  # strconv-discard semantics


def test_memberships_json_roundtrip(tmp_path):
    ms = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([5, 2], type=pa.int64()),
                "membership": pa.array([[0.5, 0.5], [0.9, 0.1]]),
            }
        )
    )
    f = str(tmp_path / "m.json")
    save_memberships_json(ms, f)
    back = load_memberships_json(f).to_pandas().sort_values("id")
    assert list(back.id) == [2, 5]
    assert list(back.membership.iloc[0]) == [0.9, 0.1]


def test_save_w2v_training_data(tmp_path):
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "year": 2000, "is_english": True, "tokens": ["a", "b"]},
            {"doc_id": 1, "year": 2001, "is_english": True, "tokens": ["c"]},
            {"doc_id": 2, "year": 2001, "is_english": False, "tokens": ["x"]},
        ]
    )
    prefix = str(tmp_path / "w2v")
    files = save_word2vec_training_data(docs, prefix, 2000, 2001)
    assert open(files[0]).read() == "a b\n"  # year 2000: only doc 0
    assert open(files[1]).read() == "a b\nc\n"  # cumulative; non-english gated
    assert open(prefix + "-2001.ids").read() == "0\n1\n"


def test_embedder_deterministic_and_corpus_sensitive():
    e = DeterministicEmbedder(dim=16)
    v1 = e.fit([["alpha", "beta"], ["alpha", "gamma"]])
    v2 = e.fit([["alpha", "beta"], ["alpha", "gamma"]])
    assert np.allclose(v1["alpha"], v2["alpha"])
    v3 = e.fit([["alpha", "delta"], ["alpha", "delta"]])
    assert not np.allclose(v1["alpha"], v3["alpha"])  # context shifts vector


def test_sgns_related_tokens_rank_closer():
    """Real SGNS training (T4): tokens that co-occur must embed closer
    than tokens from a disjoint cluster, deterministically per seed."""
    from citationgraphs_ray.functions.leap2trend import SgnsEmbedder

    rng = np.random.default_rng(0)
    fruit = ["apple", "banana", "cherry", "plum"]
    animal = ["dog", "cat", "wolf", "fox"]
    docs = []
    for _ in range(150):
        docs.append(list(rng.choice(fruit, size=6)))
        docs.append(list(rng.choice(animal, size=6)))
    emb = SgnsEmbedder(dim=16, seed=11)
    v1 = emb.fit(docs)
    v2 = emb.fit(docs)
    for w in fruit + animal:
        assert np.allclose(v1[w], v2[w])  # deterministic per seed

    def cos(a, b):
        return float(
            np.dot(v1[a], v1[b])
            / (np.linalg.norm(v1[a]) * np.linalg.norm(v1[b]))
        )

    within = np.mean([cos("apple", w) for w in ("banana", "cherry", "plum")])
    across = np.mean([cos("apple", w) for w in animal])
    assert within > across + 0.2, (within, across)


def test_leap2trend_runs_on_sgns_vectors():
    """Leap2Trend end-to-end on learned (not stub) vectors."""
    from citationgraphs_ray.functions.leap2trend import SgnsEmbedder

    docs_by_year = {
        2000: [["spark", "engine", "data"] * 3, ["ray", "engine", "cloud"] * 3],
        2001: [["ray", "data", "engine"] * 5] * 3,
        2002: [["spark", "cloud", "cloud"] * 4] * 3,
    }
    out = leap2trend(
        docs_by_year,
        min_freq=3,
        min_jump=0,
        embedder=SgnsEmbedder(dim=8, epochs=2, seed=1),
    )
    assert out and set(out) <= {2001, 2002}
    frames = [ds.to_pandas() for ds in out.values()]
    assert sum(len(f) for f in frames) > 0
    for f in frames:
        if len(f):
            assert list(f.columns) == ["phrase1", "phrase2", "jump"]


def test_leap2trend_emits_jumps():
    docs_by_year = {
        2000: [["spark", "engine", "data"] * 3, ["ray", "engine", "cloud"] * 3],
        2001: [["ray", "data", "engine"] * 5] * 3,
        2002: [["spark", "cloud", "cloud"] * 4] * 3,
    }
    out = leap2trend(docs_by_year, min_freq=3, min_jump=1)
    assert set(out) <= {2001, 2002} and out  # first year never emits
    for y, ds in out.items():
        df = ds.to_pandas()
        assert list(df.columns) == ["phrase1", "phrase2", "jump"]
        if len(df) > 1:
            assert (np.diff(df.jump.to_numpy()) <= 0).all()  # sorted desc


from hypothesis import given, settings, strategies as st

_title_st = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="\n\r",  # row format is line-based
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(titles=st.lists(_title_st, min_size=1, max_size=5))
def test_csv_title_roundtrip_property(tmp_path_factory, titles):
    """Any comma/entity-bearing title must survive save→load→save with
    the second save byte-identical to the first (fixpoint property)."""
    import shutil

    from citationgraphs_ray.stages.text import tidy_title

    base = tmp_path_factory.mktemp("prop")
    n = len(titles)
    nodes = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(range(n), type=pa.int64()),
                "is_main": pa.array([True] * n),
                "year": pa.array([2000 + i for i in range(n)], type=pa.int64()),
                "title": pa.array(titles, type=pa.string()),
            }
        )
    )
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array([0], type=pa.int64()), "dst": pa.array([0], type=pa.int64())}
        )
    )
    labels = ray.data.from_arrow(
        pa.table({"id": pa.array([0], type=pa.int64()), "label": pa.array(["x"])})
    )
    g = CitationGraphTables(nodes, edges, labels)
    p1 = str(base / "a")
    p2 = str(base / "b")
    save_citation_graph(p1, "t", g)
    loaded = load_citation_graph(p1, "t")
    # loaded titles are the tidied forms (load applies TidyTitle)
    got = loaded.nodes.to_pandas().sort_values("id").title.tolist()
    exp = [tidy_title(t) for t in titles]
    assert got == exp
    save_citation_graph(p2, "t", loaded)
    a = open(f"{p1}/t-citation-graph-nodes.csv").read()
    b = open(f"{p2}/t-citation-graph-nodes.csv").read()
    assert a == b
    shutil.rmtree(base, ignore_errors=True)
