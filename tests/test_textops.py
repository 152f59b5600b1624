"""Text-analysis operator tests: portable-SQL parity pieces are covered by
the oracle gate; these check semantic ground truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.textops import (
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_simhash,
    with_token_count,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_lang_id_stopword_heuristic(spark):
    df = _df(
        spark,
        [
            "here the cat and the dog of a farm a",
            "der hund und die katze und das haus",
            "le chat et les chiens et une maison",
            "xyzzy qwerty plugh",  # no stopwords at all
        ],
    )
    out = {r["doc_id"]: r["pred_lang"] for r in with_lang_id(df).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "fr"
    assert out[3] == "und"


def test_token_count_matches_python(spark, docs):
    rows = with_token_count(docs).join(docs.select("doc_id", "text"), "doc_id").collect()
    for r in rows[:200]:
        assert r["n_tokens"] == len(r["text"].split()), r["doc_id"]


def test_quality_fields(spark, docs):
    out = with_quality(docs).collect()
    for r in out:
        assert r["quality_bucket"] in ("too_short", "too_long", "ok", "empty")
        if r["n_tokens"]:
            assert 0 < r["avg_token_len"] < 50


def test_fingerprint_normalizes_whitespace(spark):
    df = _df(spark, ["Hello   World", "hello world", "HELLO\t\tWORLD ", "different text"])
    fps = [r["fingerprint"] for r in with_fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def test_simhash_ground_truth(spark):
    texts = ["the quick brown fox jumps", "the quick brown fox jumped", "totally unrelated words here"]
    df = _df(spark, texts)
    got = {r["doc_id"]: r["simhash"] for r in with_simhash(df).collect()}
    # ground truth from Spark's own xxhash64 of each token, majority per bit
    toks = df.select("doc_id", F.explode(F.split("text", r"\s+")).alias("t")).withColumn(
        "h", F.xxhash64("t")
    )
    byid = {}
    for r in toks.collect():
        byid.setdefault(r["doc_id"], []).append(r["h"] & 0xFFFFFFFFFFFFFFFF)
    for d, hs in byid.items():
        bits = 0
        for b in range(64):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if vote > 0:
                bits |= 1 << b
        expect = bits - (1 << 64) if bits >= (1 << 63) else bits
        assert got[d] == expect, d
    # near-identical docs → small hamming distance; unrelated → large
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(got[0], got[1]) <= 16
    assert ham(got[0], got[2]) > 16


def test_pack_sequences_matches_sequential_reference(spark, sf_dir):
    """The two-phase distributed prefix sum must equal a driver-side
    sequential pass over the same hash order, under any input
    partitioning, and bins must be contiguous token ranges."""
    import hashlib

    from sketchlib.textops import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["start_off"])
        for r in pack_sequences(docs, budget=512).collect()
    }
    out_rep = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["start_off"])
        for r in pack_sequences(docs.repartition(13), budget=512).collect()
    }
    assert out == out_rep  # partitioning-independent
    rows = sorted(
        ((hashlib.md5(str(d).encode()).hexdigest(), d, nt) for d, (nt, _, _) in out.items())
    )
    cum = 0
    for _, d, nt in rows:
        assert out[d] == (nt, cum // 512, cum % 512), d
        cum += nt


def test_pack_sequences_rejects_bad_budget(spark, sf_dir):
    from sketchlib.textops import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_pack_batches_bins_are_exact_contiguous_slices(spark):
    """Materialized bins must (a) each hold exactly `budget` ids except
    the last, (b) concatenate — in bin order — to the concat of the docs
    in the layout's hash order, (c) be identical under repartitioning,
    and (d) drop zero-token docs without disturbing neighbours."""
    import hashlib

    from sketchlib.textops import pack_batches

    rows = [(i, list(range(i * 100, i * 100 + n))) for i, n in enumerate([5, 0, 13, 7, 31, 2, 0, 19])]
    ids = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
    got = {r["bin_id"]: r for r in pack_batches(ids, budget=16).collect()}
    got_rep = {
        r["bin_id"]: (r["token_ids"], r["n_docs"], r["n_tokens"])
        for r in pack_batches(ids.repartition(5), budget=16).collect()
    }
    assert {b: (r["token_ids"], r["n_docs"], r["n_tokens"]) for b, r in got.items()} == got_rep
    order = sorted(rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    stream = [t for _, toks in order for t in toks]
    assert set(got) == set(range((len(stream) + 15) // 16))
    flat = [t for b in sorted(got) for t in got[b]["token_ids"]]
    assert flat == stream
    for b in sorted(got)[:-1]:
        assert len(got[b]["token_ids"]) == 16, b
    for b, r in got.items():
        assert r["n_tokens"] == len(r["token_ids"])
        assert r["n_docs"] >= 1

    with pytest.raises(ValueError):
        pack_batches(ids, budget=0)


def test_pack_batches_randomized_differential(spark):
    """Seeded random corpora (ragged lengths, zero-token docs, duplicate
    lengths, budgets that divide and don't divide the stream) against a
    pure-Python concat-then-chunk packer — every bin's ids, doc count,
    and token count must match exactly."""
    import hashlib

    import numpy as np

    from sketchlib.textops import pack_batches

    rng = np.random.default_rng(77)
    for trial in range(4):
        n = int(rng.integers(3, 20))
        budget = int(rng.choice([4, 16, 17, 64]))
        rows = [
            (int(i), [int(x) for x in rng.integers(0, 1000, size=int(rng.integers(0, 40)))])
            for i in range(n)
        ]
        order = sorted(rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
        stream = [(d, t) for d, toks in order for t in toks]
        want = {}
        for pos, (d, t) in enumerate(stream):
            b = pos // budget
            ids, docs = want.setdefault(b, ([], set()))
            ids.append(t)
            docs.add(d)
        df = spark.createDataFrame(rows, "doc_id long, token_ids array<int>")
        got = {r["bin_id"]: r for r in pack_batches(df, budget=budget).collect()}
        assert set(got) == set(want), (trial, budget)
        for b, (ids, docs) in want.items():
            assert got[b]["token_ids"] == ids, (trial, b)
            assert got[b]["n_tokens"] == len(ids), (trial, b)
            # n_docs counts SEGMENTS (a straddling doc counts once per bin)
            assert got[b]["n_docs"] == len(docs), (trial, b)


def test_repetition_stats_ground_truth(spark):
    from sketchlib.textops import with_repetition_stats

    df = _df(spark, ["a a b", "x y x y x", "", "solo"])
    out = {
        r["doc_id"]: (r["n_tokens"], r["dup_token_frac"], r["top_2gram_frac"])
        for r in with_repetition_stats(df).collect()
    }
    # "a a b": tokens [a,a,b] -> 1 dup of 3; grams [a a, a b] -> top 1/2
    assert out[0] == (3, pytest.approx(1 / 3), pytest.approx(0.5))
    # "x y x y x": 5 tokens 2 uniq; grams [x y, y x, x y, y x] -> top 2/4
    assert out[1] == (5, pytest.approx(3 / 5), pytest.approx(0.5))
    assert out[2] == (0, 0.0, 0.0)  # empty text
    assert out[3] == (1, 0.0, 0.0)  # single token: no 2-grams


def test_pii_scrub_ground_truth(spark):
    from sketchlib.textops import with_pii_scrub

    df = _df(
        spark,
        [
            "mail me at jo.doe+x@sub.example.org today",
            "call +1 (555) 123-4567 or visit 192.168.1.100 now",
            "nothing sensitive here at all",
        ],
    )
    out = {
        r["doc_id"]: (r["scrubbed"], r["n_email"], r["n_ipv4"], r["n_phone"])
        for r in with_pii_scrub(df).collect()
    }
    assert out[0] == ("mail me at <EMAIL> today", 1, 0, 0)
    assert out[1] == ("call <PHONE> or visit <IP> now", 0, 1, 1)
    assert out[2] == ("nothing sensitive here at all", 0, 0, 0)


def test_top_terms_ground_truth(spark):
    from sketchlib.textops import top_terms

    df = _df(spark, ["apple apple banana", "banana cherry", "cherry cherry cherry"])
    rows = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["score"])
        for r in top_terms(df, k=3).collect()
    }
    # df: apple 1, banana 2, cherry 2
    assert rows[(0, 1)] == ("apple", 2, 1, 2.0)
    assert rows[(0, 2)] == ("banana", 1, 2, 0.5)
    # doc 1: equal scores 0.5 — tie broken by term ascending
    assert rows[(1, 1)] == ("banana", 1, 2, 0.5)
    assert rows[(1, 2)] == ("cherry", 1, 2, 0.5)
    assert rows[(2, 1)] == ("cherry", 3, 2, 1.5)
    assert len(rows) == 5  # k caps at per-doc vocabulary


def test_gopher_quality_filter_rules(spark):
    from sketchlib.textops import gopher_quality_filter

    ok = "the quick brown fox jumps over a lazy dog tonight again"  # 11 distinct
    df = _df(spark, [ok, "tiny doc", "spam " * 40 + "x y z a b c d e f g"])
    out = {r["doc_id"]: (r["keep"], r["reason"]) for r in gopher_quality_filter(df).collect()}
    assert out[0] == (True, "keep")
    assert out[1] == (False, "too_short")  # rule order: length before repetition
    assert out[2] == (False, "dup_tokens")


def test_pii_scrub_counts_match_replacements(spark):
    """A digit-only email local part is phone-shaped: counting on the
    original text would double-count; counts must equal replacements."""
    from sketchlib.textops import with_pii_scrub

    df = _df(spark, ["reach me at 5551234567@example.com ok"])
    r = with_pii_scrub(df).collect()[0]
    assert r["scrubbed"] == "reach me at <EMAIL> ok"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 0, 0)


def test_repetition_and_span_stats_differential_random_corpus(spark):
    """Differential vs a pure-Python reference over a seeded random corpus
    (messy whitespace/case included — exercises normalization too)."""
    import random
    from collections import Counter

    from sketchlib.dedup import cross_doc_span_stats
    from sketchlib.textops import with_repetition_stats

    rng = random.Random(1234)
    vocab = ["Alpha", "beta", "GAMMA", "delta", "x1", "y,z", "q."]
    texts = []
    for _ in range(200):
        k = rng.randint(0, 40)
        toks = [rng.choice(vocab) for _ in range(k)]
        sep = lambda: rng.choice([" ", "  ", "\t", " \t "])
        texts.append(sep().join(toks) if toks else rng.choice(["", "   "]))
    df = _df(spark, texts)

    def norm_tokens(t):
        return [w for w in t.lower().split() if w]

    exp_rep, exp_span = {}, {}
    span_docs = Counter()
    per_doc_spans = {}
    for i, t in enumerate(texts):
        toks = norm_tokens(t)
        n = len(toks)
        uniq = len(set(toks))
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        top = Counter(grams).most_common(1)[0][1] if grams else 0
        exp_rep[i] = (
            n,
            (n - uniq) / n if n else 0.0,
            top / len(grams) if grams else 0.0,
        )
        spans = [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
        per_doc_spans[i] = Counter(spans)
        for s in set(spans):
            span_docs[s] += 1
    for i in range(len(texts)):
        c = per_doc_spans[i]
        tot = sum(c.values())
        dup = sum(v for s, v in c.items() if span_docs[s] >= 2)
        exp_span[i] = (tot, dup, dup / tot if tot else 0.0)

    got_rep = {
        r["doc_id"]: (r["n_tokens"], r["dup_token_frac"], r["top_2gram_frac"])
        for r in with_repetition_stats(df).collect()
    }
    assert got_rep == exp_rep
    got_span = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"], r["dup_span_frac"])
        for r in cross_doc_span_stats(df, n=3).collect()
    }
    assert got_span == exp_span


def test_top_terms_differential_random_corpus(spark):
    import random
    from collections import Counter

    from sketchlib.textops import top_terms

    rng = random.Random(99)
    vocab = ["a", "bb", "ccc", "dd", "e", "ff", "g"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))) for _ in range(120)]
    df = _df(spark, texts)
    tfs = [Counter(t.split()) for t in texts]
    dfreq = Counter()
    for c in tfs:
        dfreq.update(set(c))
    exp = {}
    for i, c in enumerate(tfs):
        ranked = sorted(((-(tf / dfreq[w]), w, tf) for w, tf in c.items()))[:3]
        for rank, (negs, w, tf) in enumerate(ranked, 1):
            exp[(i, rank)] = (w, tf, dfreq[w], -negs)
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["score"])
        for r in top_terms(df, k=3).collect()
    }
    assert got == exp


def test_bigram_lm_scores_hand_computed(spark):
    """Self-fit bigram LM on a corpus small enough to score by hand:
    corpus 'a b a b' + 'a b' has bigrams {a b: 3, b a: 1}, total 4, so
    pq(a b) = 750000, pq(b a) = 250000. Docs with < 2 tokens (or NULL)
    drop."""
    from sketchlib.textops import bigram_lm_scores

    rows = [(0, "a b a b"), (1, "a b"), (2, "x"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["lm_score_q"], r["n_bigrams"], r["lm_avg_q"])
        for r in bigram_lm_scores(df).collect()
    }
    assert got == {
        0: (750000 + 250000 + 750000, 3, 1750000 // 3),
        1: (750000, 1, 750000),
    }


def test_classifier_score_cross_engine_exact(spark):
    """Hashed-linear classifier scores are engine-EXACT integers (bucket
    mod + weight mod + integer sum — no float anywhere), NULL text drops,
    empty/whitespace text scores 0 (keep), and the decision column is the
    pure threshold."""
    import duckdb

    from sketchlib.textops import classifier_score_sql, with_classifier_score

    rows = [(0, "the quick brown fox"), (1, ""), (2, None), (3, "   \t "),
            (4, "Hé  llo   Wörld x"), (5, "spam " * 30 + "signal")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["quality_score"], r["quality_keep"])
           for r in with_classifier_score(df).collect()}
    assert 2 not in out  # NULL dropped
    assert out[1] == (0, True) and out[3] == (0, True)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = dict(con.sql(
        "SELECT doc_id, " + classifier_score_sql("duckdb")
        + " AS s FROM documents WHERE text IS NOT NULL").fetchall())
    assert oracle == {k: v[0] for k, v in out.items()}
    for k, (s, keep) in out.items():
        assert keep == (s >= 0)


def test_ccnet_bucket_assignment_hand_computed(spark):
    """Cutoff-threshold thirds over a hand-built (doc_id, lang, score)
    relation: 9 'en' docs scored 1..9 split exactly head={9,8,7},
    middle={6,5,4}, tail={3,2,1}; a tied score class spanning a boundary
    goes whole to ONE bucket (cum_before rule); NULL lang buckets among
    itself, never dropped."""
    from sketchlib.textops import _ccnet_assign

    rows = [(i, "en", i) for i in range(1, 10)]
    # 'fr': scores [5, 5, 5, 1] — the 5-class straddles the 1/3 boundary;
    # cum_before(5)=0 < 4/3 -> ALL three 5s are head, 1 is tail
    # (cum_before(1)=3, 3*3=9 >= 2*4)
    rows += [(10, "fr", 5), (11, "fr", 5), (12, "fr", 5), (13, "fr", 1)]
    rows += [(20, None, 2), (21, None, 1)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, lm_avg_q long")
    got = {r["doc_id"]: (r["ppl_bucket"], r["ccnet_keep"])
           for r in _ccnet_assign(d).collect()}
    want = {}
    for i in range(1, 10):
        b = "head" if i >= 7 else ("middle" if i >= 4 else "tail")
        want[i] = (b, b != "tail")
    want.update({10: ("head", True), 11: ("head", True), 12: ("head", True),
                 13: ("tail", False)})
    # NULL lang: 2 docs -> cum_before(2)=0 head; cum_before(1)=1, 3 >= 1*... 
    # 1*3=3 >= n=2 and 3 < 2*2 -> middle
    want.update({20: ("head", True), 21: ("middle", True)})
    assert got == want


def test_ccnet_buckets_end_to_end_partitions_the_scored_docs(spark):
    """ccnet_buckets = bigram_lm_scores + assignment: every scored doc
    appears exactly once, buckets are a partition per (lang), and the
    head third never scores below the tail third within a lang."""
    from sketchlib.textops import bigram_lm_scores, ccnet_buckets

    rows = [(i, "good text with shared bigrams " * 3, "en") for i in range(6)]
    rows += [(i, f"rare w{i} v{i} u{i} t{i}", "en") for i in range(6, 12)]
    rows += [(i, "autre texte partagé ici " * 2, "fr") for i in range(12, 16)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(df).collect()
    scored = {r["doc_id"] for r in bigram_lm_scores(df).collect()}
    assert {r["doc_id"] for r in out} == scored and len(out) == len(scored)
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        heads = [r["lm_avg_q"] for r in rs if r["ppl_bucket"] == "head"]
        tails = [r["lm_avg_q"] for r in rs if r["ppl_bucket"] == "tail"]
        if heads and tails:
            assert min(heads) > max(tails), lang
        for r in rs:
            assert r["ccnet_keep"] == (r["ppl_bucket"] != "tail")


def test_charset_profile_hand_computed(spark):
    """Codepoint-class counts on hand-built rows: CJK/Cyrillic/Arabic
    ranges, astral emoji count toward totals only, U+FFFD and stray C0
    controls flip the keep-decision while tab/newline do not."""
    import duckdb

    from sketchlib.textops import charset_profile_cols, with_charset_profile

    rows = [
        (0, "ab YZ"),
        (1, "漢字 test Ж ب"),
        (2, "bad � decode"),
        (3, "ctrl\x01here"),
        (4, "tab\tand\nnewline ok"),
        (5, "emoji \U0001f600 only"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in with_charset_profile(df).collect()}
    assert 6 not in got
    assert (got[0]["n_latin"], got[0]["n_chars_cp"]) == (4, 5)
    assert (got[1]["n_cjk"], got[1]["n_cyrillic"], got[1]["n_arabic"]) == (2, 1, 1)
    assert got[2]["n_replacement"] == 1 and not got[2]["charset_keep"]
    assert got[3]["n_control"] == 1 and not got[3]["charset_keep"]
    assert got[4]["n_control"] == 0 and got[4]["charset_keep"]
    assert got[5]["n_chars_cp"] == len("emoji X only")  # astral = 1 codepoint
    # cross-engine parity on the same rows
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    cols = charset_profile_cols("duckdb")
    keep = cols.pop("charset_keep")
    inner = ", ".join(f"{v} AS {k}" for k, v in cols.items())
    oracle = con.sql(
        f"SELECT *, {keep} AS charset_keep FROM "
        f"(SELECT doc_id, {inner} FROM documents WHERE text IS NOT NULL)"
    ).df()
    for _, row in oracle.iterrows():
        d = int(row["doc_id"])
        for c in ("n_chars_cp", "n_latin", "n_cjk", "n_cyrillic", "n_arabic",
                  "n_replacement", "n_control"):
            assert int(row[c]) == got[d][c], (d, c)
        assert bool(row["charset_keep"]) == got[d]["charset_keep"], d


def test_compression_ratio_differential_and_signal(spark):
    """mapInPandas zlib ratios equal the direct pure-Python computation
    row for row; repetitive text shows a far larger ratio than varied
    text; NULL text drops; empty text is safe (zlib header > input)."""
    import zlib

    from sketchlib.textops import with_compression_ratio

    rows = [
        (0, "spam " * 400),
        (1, "The quick brown fox jumps over the lazy dog near a riverbank."),
        (2, ""),
        (3, None),
        (4, "Hé wörld \U0001f600 mixed unicode content with ünïcödé bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bytes"], r["n_zlib_bytes"], r["compression_ratio_pm"])
           for r in with_compression_ratio(df).collect()}
    assert 3 not in got
    for d, t in rows:
        if t is None:
            continue
        b = t.encode("utf-8")
        z = zlib.compress(b, 6)
        assert got[d] == (len(b), len(z), len(b) * 1000 // len(z)), d
    assert got[0][2] > 5000           # heavy repetition: >5:1
    assert got[1][2] < 1500           # natural prose: ~1:1 at this length
