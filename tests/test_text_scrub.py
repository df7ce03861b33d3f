"""scrub_text_batch: RE2 mask-chain parity with the DuckDB oracle chain."""

import duckdb
import pyarrow as pa

from citationgraphs_ray.stages.text import (
    SCRUB_EMAIL_RE,
    SCRUB_ENTITY_RE,
    SCRUB_URL_RE,
    SCRUB_WS_RE,
    scrub_text_batch,
)

SAMPLES = [
    "plain text with  double  spaces ",
    "see https://example.com/a?q=1#f and http://x.io too",
    "mail me at first.last+tag@sub.example.co.uk today",
    "customer and supplier and customers (no partial mask)",
    "https://a.io a@b.io customer\t\nmixed   everything",
    "trailing nbsp\u00a0",   # non-ASCII whitespace: RE2 \s skips it in
    "\u00a0leading nbsp",    # BOTH engines; trim must be ASCII-only too
    "",
    None,
]


def test_scrub_masks_and_normalizes():
    out = scrub_text_batch(pa.table({"text": SAMPLES}))
    got = out["scrubbed"].to_pylist()
    assert got[0] == "plain text with double spaces"
    assert got[1] == "see <URL> and <URL> too"
    assert got[2] == "mail me at <EMAIL> today"
    # \b keeps 'customers' unmasked
    assert got[3] == "<ENTITY> and <ENTITY> and customers (no partial mask)"
    assert got[4] == "<URL> <EMAIL> <ENTITY> mixed everything"
    # NBSP is untouched end-to-end (ASCII trim + ASCII \s — SQL parity)
    assert got[5] == "trailing nbsp\u00a0"
    assert got[6] == "\u00a0leading nbsp"
    assert got[7] == "" and got[8] is None
    n = out["n_chars_scrubbed"].to_pylist()
    assert n == [len(s) if s is not None else None for s in got]


def test_scrub_matches_duckdb_chain():
    """The exact pattern strings produce identical output in DuckDB —
    the property the scrubbed_docs oracle depends on."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in SAMPLES])
    sql = f"""
      SELECT trim(regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, '{SCRUB_URL_RE}', '<URL>', 'g'),
            '{SCRUB_EMAIL_RE}', '<EMAIL>', 'g'),
          '{SCRUB_ENTITY_RE}', '<ENTITY>', 'g'),
        '{SCRUB_WS_RE}', ' ', 'g'), ' ') FROM t"""
    want = [r[0] for r in con.execute(sql).fetchall()]
    got = scrub_text_batch(pa.table({"text": SAMPLES}))["scrubbed"].to_pylist()
    assert got == want


def test_repetition_scores_hand_checked_and_multichunk():
    import pyarrow as pa
    import numpy as np
    from citationgraphs_ray.stages.text import repetition_score_batch

    docs = [
        "a b a b a b",          # 6 words, 2 distinct; bigrams: ab×3, ba×2 → 3/5
        "x y z",                # all distinct; bigrams xy, yz → 1/2
        "solo",                 # 1 word → no bigrams
        "",                     # '' splits to [''] → 1 word, dup 0
        "q q",                  # 2 words 1 distinct; 1 bigram → 1.0
    ]
    # two chunks to exercise the chunked dictionary-encode path
    col = pa.chunked_array([docs[:2], docs[2:]])
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": col})
    out = repetition_score_batch(t)
    assert out["n_words"].to_pylist() == [6, 3, 1, 1, 2]
    assert np.allclose(
        out["dup_word_frac"].to_pylist(),
        [1 - 2 / 6, 0.0, 0.0, 0.0, 0.5],
        atol=1e-6,
    )
    assert np.allclose(
        out["top_bigram_frac"].to_pylist(),
        [3 / 5, 1 / 2, 0.0, 0.0, 1.0],
        atol=1e-6,
    )


def test_repetition_scores_matches_duckdb():
    import duckdb
    import pandas as pd
    import pyarrow as pa
    from citationgraphs_ray.stages.text import repetition_score_batch

    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "the cat the cat the cat",
                "one  two", # double space → empty token, SQL-parity
                "a",
                "w1 w2 w1 w2 w3",
            ],
        }
    )
    got = repetition_score_batch(pa.Table.from_pandas(df)).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    from citationgraphs_ray.pipelines.queries import ORACLE_SQL

    want = con.execute(
        ORACLE_SQL["repetition_scores"] + " ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True), want
    )
