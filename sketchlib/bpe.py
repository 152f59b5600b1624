"""Real byte-level BPE with a small FIXED merge table (VERDICT r5 #8).

``doc_token_count_bpe`` (textops) is a regex approximation of subword
counts; this module applies REAL BPE mechanics — Sennrich et al. 2016
merge training, GPT-2-style (Radford et al. 2019) rank-ordered merge
application over raw utf-8 bytes — so packing / token-budget operators can
match what a production tokenizer produces.

Design:

- **Merge table**: ``MERGES`` is trained at import time on a fixed
  embedded seed text by a pure-Python byte-level BPE trainer (most
  frequent adjacent pair wins, ties broken by smallest pair — fully
  deterministic, sub-millisecond). The table is data, not code: swap in a
  real tokenizer's merges (same (a, b) → 256+rank shape) in production.
- **Batch kernel**: the Arrow batch's texts concatenate into ONE int32
  token buffer with a ``-1`` sentinel between documents (a pair never
  matches across the sentinel, so no merge crosses a document boundary);
  each merge is a single vectorized numpy sweep — match mask, leftmost-
  first overlap alternation (only an ``a == b`` merge can self-overlap;
  runs resolve by position parity), scatter-assign + one boolean
  compaction. No per-document Python loop.
- **Rank-order equivalence**: applying each merge once, in rank order,
  equals GPT-2's iterate-on-min-rank-present loop because a merge's pair
  components always have smaller ids than the token it creates — a later
  merge can never produce an earlier merge's pair, and a merge cannot
  recreate its own pair (its output id differs from both inputs). The
  per-document :func:`encode_reference` model implements the GPT-2 loop
  verbatim; tests/test_bpe.py differential-fuzzes the two.
- **SQL oracle**: every token is rendered as an ANCHOR-ALIGNED code
  ``'g' + HEX4(id)`` — ``g`` never occurs inside the hex payload, so a
  concatenated two-code pattern can only match at a code boundary, and
  SQL ``replace()`` (leftmost-first, non-overlapping, resumes after the
  replacement) reproduces the numpy sweep EXACTLY. The oracle is the hex
  dump of the utf-8 bytes re-chunked into codes, piped through one
  ``replace`` per merge; ``length / 5`` is the token count.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed seed corpus for the embedded merge table — generic English with
#: enough repetition to learn spaces-prefixed subwords (the GPT-2 shape)
SEED_TEXT = (
    "the quick brown fox jumps over the lazy dog. "
    "the web page the crawler fetched links to the other web pages. "
    "training data pipelines deduplicate the training documents before "
    "training the model on the deduplicated training data. "
    "a distributed sketch library builds mergeable sketches over web "
    "pages and merges the sketches into one sketch per partition. "
    "and the ing ing ing tion tion er er re re in in on on at at en en "
)

N_MERGES = 48


def _sweep_list(seq: list[int], pair: tuple[int, int], new: int) -> list[int]:
    """One leftmost-first non-overlapping merge sweep (pure-Python model)."""
    out, i = [], 0
    a, b = pair
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(new)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def train_merges(text: str = SEED_TEXT, n_merges: int = N_MERGES) -> list[tuple[int, int]]:
    """Deterministic byte-level BPE training: ``n_merges`` rounds of
    merge-the-most-frequent-adjacent-pair over the seed byte sequence,
    ties broken by the smallest (a, b) pair. New token ids are
    ``256 + rank``."""
    seq = list(text.encode("utf-8"))
    merges: list[tuple[int, int]] = []
    for r in range(n_merges):
        counts = Counter(zip(seq, seq[1:]))
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        seq = _sweep_list(seq, best, 256 + r)
    return merges


#: the fixed merge table (computed once at import; deterministic)
MERGES: list[tuple[int, int]] = train_merges()


def encode_reference(text: str, merges: list[tuple[int, int]] | None = None) -> list[int]:
    """GPT-2-style reference encoder (per-document, pure Python): repeatedly
    find the LOWEST-RANK merge whose pair is present and sweep it. The
    differential model for the vectorized batch kernel."""
    merges = MERGES if merges is None else merges
    ranks = {p: i for i, p in enumerate(merges)}
    seq = list(text.encode("utf-8"))
    while len(seq) > 1:
        present = set(zip(seq, seq[1:]))
        r = min((ranks[p] for p in present if p in ranks), default=None)
        if r is None:
            break
        seq = _sweep_list(seq, merges[r], 256 + r)
    return seq


def _encode_concat(t: np.ndarray, seg: np.ndarray, merges: list[tuple[int, int]]):
    """Apply the merge table to a sentinel-separated concatenated token
    buffer: one vectorized sweep per merge. Returns (tokens, segments)
    with sentinels still in place."""
    for r, (a, b) in enumerate(merges):
        if t.size < 2:
            break
        m = (t[:-1] == a) & (t[1:] == b)
        idx = np.flatnonzero(m)
        if idx.size == 0:
            continue
        if a == b:
            # self-overlapping runs: leftmost-first alternation by
            # position parity within each run of consecutive matches
            starts = np.diff(idx, prepend=idx[0] - 2) != 1
            run_start = np.maximum.accumulate(np.where(starts, idx, np.int64(-1)))
            idx = idx[(idx - run_start) % 2 == 0]
        t[idx] = 256 + r
        keep = np.ones(t.size, dtype=bool)
        keep[idx + 1] = False
        t, seg = t[keep], seg[keep]
    return t, seg


def _batch_buffers(texts) -> tuple[np.ndarray, np.ndarray, int]:
    """Concatenate a pandas Series of strings into the sentinel-separated
    int32 token buffer + per-token document index (all vectorized)."""
    enc = texts.str.encode("utf-8")
    lens = enc.str.len().to_numpy(dtype=np.int64)
    n = len(lens)
    out_len = lens + 1  # each doc followed by one -1 sentinel
    t = np.full(int(lens.sum()) + n, -1, dtype=np.int32)
    seg = np.repeat(np.arange(n), out_len)
    mask = np.ones(t.size, dtype=bool)
    mask[np.cumsum(out_len) - 1] = False  # sentinel slots
    if lens.sum():
        t[mask] = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int32)
    return t, seg, n


def bpe_token_count(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """(id, n_bpe_real_tokens) via the vectorized batch kernel. NULL texts
    drop by contract (same as every text operator / the SQL oracle's
    ``text IS NOT NULL``); empty text counts 0 tokens."""
    from pyspark.sql import types as T

    merges = MERGES if merges is None else merges
    out_schema = T.StructType(
        [docs.schema[id_col], T.StructField("n_bpe_real_tokens", T.LongType())]
    )
    base = docs.where(F.col(text_col).isNotNull()).select(id_col, text_col)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            t, seg, n = _batch_buffers(pdf[text_col])
            t, seg = _encode_concat(t, seg, merges)
            counts = np.bincount(seg[t >= 0], minlength=n)
            yield pd.DataFrame(
                {id_col: pdf[id_col].reset_index(drop=True), "n_bpe_real_tokens": counts}
            )

    return base.mapInPandas(run, out_schema)


def bpe_token_ids(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """(id, token_ids array<int>) — the full encoding, same kernel."""
    from pyspark.sql import types as T

    merges = MERGES if merges is None else merges
    out_schema = T.StructType(
        [docs.schema[id_col], T.StructField("token_ids", T.ArrayType(T.IntegerType()))]
    )
    base = docs.where(F.col(text_col).isNotNull()).select(id_col, text_col)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            t, seg, n = _batch_buffers(pdf[text_col])
            t, seg = _encode_concat(t, seg, merges)
            live = t >= 0
            t, seg = t[live], seg[live]
            bounds = np.searchsorted(seg, np.arange(n + 1))
            ids = [t[bounds[i]: bounds[i + 1]] for i in range(n)]
            yield pd.DataFrame(
                {id_col: pdf[id_col].reset_index(drop=True), "token_ids": ids}
            )

    return base.mapInPandas(run, out_schema)


def _code(tid: int) -> str:
    """Anchor-aligned token code: 'g' + 4 uppercase hex chars. 'g' cannot
    appear in the hex payload, so two-code patterns only match at code
    boundaries inside a concatenated code string."""
    return "g" + format(tid, "04X")


def bpe_codes_expr_sql(merges: list[tuple[int, int]] | None = None) -> str:
    """The DuckDB expression producing the encoded anchor-code string for
    the ``text`` column: hex-dump the utf-8 bytes, re-chunk into anchor
    codes, apply every merge as one ``replace`` (leftmost-first
    non-overlapping — exactly the numpy sweep)."""
    merges = MERGES if merges is None else merges
    expr = r"regexp_replace(hex(encode(text)), '([0-9A-F]{2})', 'g00\1', 'g')"
    for r, (a, b) in enumerate(merges):
        expr = f"replace({expr}, '{_code(a)}{_code(b)}', '{_code(256 + r)}')"
    return expr


def bpe_count_expr_sql(merges: list[tuple[int, int]] | None = None) -> str:
    """DuckDB expression for the per-document real-BPE token count."""
    return f"CAST(length({bpe_codes_expr_sql(merges)}) // 5 AS BIGINT)"


def bpe_count_oracle_sql(
    merges: list[tuple[int, int]] | None = None, table: str = "documents"
) -> str:
    """DuckDB oracle: anchor-code encoding, count codes by length/5."""
    return (
        f"SELECT doc_id, {bpe_count_expr_sql(merges)} AS n_bpe_real_tokens "
        f"FROM {table} WHERE text IS NOT NULL"
    )


def bpe_ids_oracle_sql(
    merges: list[tuple[int, int]] | None = None, table: str = "documents"
) -> str:
    """DuckDB oracle for the FULL encoding: slice the anchor-code string
    back into codes and parse each 4-hex payload as the token id."""
    expr = bpe_codes_expr_sql(merges)
    return (
        "SELECT doc_id, "
        f"list_transform(regexp_extract_all({expr}, 'g([0-9A-F]{{4}})', 1), "
        "x -> CAST(CAST('0x' || x AS BIGINT) AS INTEGER)) AS token_ids "
        f"FROM {table} WHERE text IS NOT NULL"
    )
