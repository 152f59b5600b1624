"""Real byte-level BPE: the vectorized batch kernel vs the GPT-2-style
pure-Python reference (differential + hypothesis fuzz), the merge-table
invariants that make rank-order application valid, and the chained-replace
DuckDB oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sketchlib.bpe import (
    MERGES,
    SEED_TEXT,
    _batch_buffers,
    _encode_concat,
    bpe_count_oracle_sql,
    encode_reference,
    train_merges,
)


def _kernel_encode(texts: list[str]) -> list[list[int]]:
    t, seg, n = _batch_buffers(pd.Series(texts))
    t, seg = _encode_concat(t, seg, MERGES)
    live = t >= 0
    t, seg = t[live], seg[live]
    bounds = np.searchsorted(seg, np.arange(n + 1))
    return [t[bounds[i]: bounds[i + 1]].tolist() for i in range(n)]


def test_merge_table_shape():
    """Training is deterministic; every merge's components predate its
    output id — the property that makes one-sweep-per-rank equal to the
    GPT-2 min-rank-present loop."""
    assert MERGES == train_merges()
    assert len(MERGES) == 48
    for r, (a, b) in enumerate(MERGES):
        assert 0 <= a < 256 + r and 0 <= b < 256 + r
    # the table actually learns multi-level merges (a merged token reused)
    assert any(a >= 256 or b >= 256 for a, b in MERGES)


def test_kernel_matches_reference_basics():
    texts = [
        "the quick brown fox",
        "training the model on training data",
        "aaaa bbbb the the the",
        "",
        "héllo ✓ über naïve",
        "x" * 500,
        SEED_TEXT,
        "  \n\t  ",
        "the",
    ]
    assert _kernel_encode(texts) == [encode_reference(s) for s in texts]


def test_roundtrip_decodable():
    """BPE is lossless: expanding merges recovers the original bytes."""
    expand = {256 + r: p for r, p in enumerate(MERGES)}

    def decode(ids):
        out = []
        stack = list(reversed(ids))
        while stack:
            t = stack.pop()
            if t in expand:
                a, b = expand[t]
                stack.extend((b, a))
            else:
                out.append(t)
        return bytes(out)

    for s in ["the training data ✓", "aaaa", SEED_TEXT]:
        assert decode(encode_reference(s)) == s.encode()


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("the quickbrownfx aing.é✓\n\t")), max_size=60
        ),
        min_size=1,
        max_size=8,
    )
)
def test_kernel_matches_reference_fuzz(texts):
    """Adversarial differential: batched vectorized sweeps == per-document
    GPT-2 loop on merge-dense alphabets (runs of 'aaaa', multibyte chars,
    empty docs, boundary adjacency between docs)."""
    assert _kernel_encode(texts) == [encode_reference(s) for s in texts]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("the quickbrownfx aing.é✓")), max_size=40
        ),
        min_size=1,
        max_size=5,
    )
)
def test_oracle_matches_reference_fuzz(texts):
    """The chained-replace SQL oracle counts EXACTLY what the reference
    encoder produces (anchor alignment makes replace == the numpy sweep)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    got = dict(con.sql(bpe_count_oracle_sql()).fetchall())
    assert got == {i: len(encode_reference(s)) for i, s in enumerate(texts)}


def test_spark_bpe_token_count(spark):
    """End-to-end Spark kernel: counts match the reference per doc; NULL
    text drops; tiny Arrow batches (multiple mapInPandas batches) agree."""
    from sketchlib.bpe import bpe_token_count

    rows = [(0, "the training data"), (1, ""), (2, None), (3, "aaaa the the"),
            (4, "héllo ✓ " * 20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_bpe_real_tokens"]
           for r in bpe_token_count(df).collect()}
    want = {i: len(encode_reference(s)) for i, s in rows if s is not None}
    assert got == want

def test_spark_bpe_token_ids_and_ids_oracle(spark):
    """Full-encoding surface: Spark token_ids match the reference encoder,
    and the ids ORACLE parses the anchor-code string back to the same
    arrays (hex-payload round trip)."""
    from sketchlib.bpe import bpe_ids_oracle_sql, bpe_token_ids

    rows = [(0, "the training data"), (1, ""), (2, None),
            (3, "aaaa the the"), (4, "héllo ✓ über")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: list(r["token_ids"]) for r in bpe_token_ids(df).collect()}
    want = {i: encode_reference(s) for i, s in rows if s is not None}
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oids = {d: list(v) for d, v in con.sql(bpe_ids_oracle_sql()).fetchall()}
    assert oids == want
