"""Sequence packing for LLM training-data assembly.

GPT-style concat-then-chunk packing: documents are concatenated in a
deterministic order and the token stream is chunked every ``max_len``
tokens; each document is assigned to the chunk containing its FIRST
token. This is the packing semantics that is both what large-scale
training pipelines do (fixed-length blocks over a concatenated corpus)
and a pure function of the ordered prefix sum — so it distributes as
one scan (utils.ordered_prefix_sum: range-partitioned sort + block-
offset pattern, only per-block scalars on the driver) and has an exact
ANSI-SQL window-function twin for the correctness gate.

(First-fit bin packing — no doc split across chunks — is a sequential
recurrence with no bounded-depth distributed form; concat-then-chunk is
the scalable contract, and downstream loaders mask cross-doc attention.)
"""

from __future__ import annotations

import ray.data

from ..utils import ordered_prefix_sum


def pack_sequences(
    docs: ray.data.Dataset,
    token_col: str,
    max_len: int,
    order_col: str = "doc_id",
    presorted: bool = False,
) -> ray.data.Dataset:
    """Append ``start_offset`` (exclusive token prefix-sum in
    ``order_col`` order) and ``seq_id`` (= start_offset // max_len, the
    training chunk holding the document's first token)."""
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    with_off = ordered_prefix_sum(
        docs, order_col, token_col, out_col="start_offset",
        presorted=presorted,
    )
    import pyarrow.compute as pc

    return with_off.add_column(
        "seq_id",
        lambda t: pc.divide(t["start_offset"].combine_chunks(), max_len),
        batch_format="pyarrow",
    )
