"""Dedup operator tests: exact, n-gram Jaccard, MinHash-LSH recall,
SimHash near-dups, embedding near-dups — on a controlled corpus with known
duplicates plus the real documents table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.dedup import (
    dedup_exact,
    embedding_lsh_pairs,
    embedding_near_dups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """60 base docs + 20 near-duplicates (one word changed) + 2 exact dups."""
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(60)]
    rows = [(i, t) for i, t in enumerate(texts)]
    for j in range(20):  # near-dup of doc j: change one middle word
        words = texts[j].split()
        words[20] = "CHANGED"
        rows.append((100 + j, " ".join(words)))
    rows.append((200, texts[0]))  # exact dup
    rows.append((201, texts[1]))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_dedup_exact(spark, corpus):
    out = dedup_exact(corpus)
    assert out.count() == 80  # 82 docs, 2 exact dups collapse
    dups = {r["keep_doc_id"]: r["group_size"] for r in out.filter("group_size > 1").collect()}
    assert dups == {0: 2, 1: 2}


def test_ngram_jaccard_ground_truth(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z q")], "doc_id long, text string"
    )
    # bigram sets: {ab,bc,cd} vs {ab,bc,ce}: inter 2, union 4 → 0.5
    out = {(r["doc_a"], r["doc_b"]): r["jaccard_e6"] for r in ngram_jaccard_pairs(df, 0.1).collect()}
    assert out == {(1, 2): 500000}


def test_minhash_lsh_recall_and_precision(spark, corpus):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard_e6"]
        for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    }
    # the 20 near-dup pairs (2 changed bigrams of 39 → J≈0.9) and 2 exact dups
    assert len(exact) >= 22
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard_e6"]
        for r in minhash_lsh_pairs(corpus, threshold=0.5).collect()
    }
    assert set(lsh) <= set(exact)  # precision 1: every pair exact-verified
    recall = len(lsh) / len(exact)
    assert recall >= 0.95, f"LSH recall {recall}"
    for k, v in lsh.items():
        assert v == exact[k]


def test_simhash_near_dups(spark, corpus):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_dups(corpus, max_hamming=10).collect()}
    # exact dups have hamming 0
    assert (0, 200) in pairs and (1, 201) in pairs
    # block count derives from max_hamming (11 blocks), so recall is 1:
    # EVERY pair within the radius must be found — cross-check vs the
    # brute-force Hamming distances of the fingerprints themselves
    from sketchlib.textops import with_simhash

    sims = {r["doc_id"]: r["simhash"] for r in with_simhash(corpus).collect()}
    ids = sorted(sims)
    truth = {
        (a, b): bin((sims[a] ^ sims[b]) & (2**64 - 1)).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sims[a] ^ sims[b]) & (2**64 - 1)).count("1") <= 10
    }
    assert pairs == truth


def test_simhash_near_dups_rejects_bad_radius(spark, corpus):
    with pytest.raises(ValueError):
        simhash_near_dups(corpus, max_hamming=64)


def test_embedding_near_dups(spark):
    rng = np.random.default_rng(6)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(20)]
    # 3 near-dups: tiny perturbations of vectors 0..2
    for j in range(3):
        rows.append((100 + j, (base[j] + 0.01 * rng.standard_normal(16).astype(np.float32)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["vec_a"], r["vec_b"]): r["cosine_e4"] for r in embedding_near_dups(df, 0.95).collect()}
    for j in range(3):
        assert (j, 100 + j) in pairs
        assert pairs[(j, 100 + j)] > 9900
    assert len(pairs) == 3  # random 16-dim gaussians don't hit 0.95


def test_ngram_jaccard_max_df(spark, corpus):
    """max_df bounds pair-generation group size; jaccard values of surviving
    pairs stay EXACT (intersections recomputed over full sets)."""
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard_e6"]
        for r in ngram_jaccard_pairs(corpus, 0.5).collect()
    }
    same = {
        (r["doc_a"], r["doc_b"]): r["jaccard_e6"]
        for r in ngram_jaccard_pairs(corpus, 0.5, max_df=10_000).collect()
    }
    assert same == full
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard_e6"]
        for r in ngram_jaccard_pairs(corpus, 0.5, max_df=2).collect()
    }
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert v == full[k]  # exact values even under capping


def test_minhash_bucket_cap(spark, corpus):
    """max_bucket_size drops only degenerate buckets: a generous cap keeps
    the output identical; the capped output is always a subset."""
    full = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(corpus, 0.5).collect()}
    same = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(corpus, 0.5, max_bucket_size=10_000).collect()
    }
    assert same == full
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(corpus, 0.5, max_bucket_size=2).collect()
    }
    assert capped <= full


def test_near_dup_clusters_known_graph(spark):
    """Min-label components on a known graph: a 4-chain (propagation needs
    multiple rounds), a triangle, an isolated pair."""
    from sketchlib.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (20, 21), (21, 22), (20, 22), (10, 11)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_near_dup_clusters_on_corpus(spark, corpus):
    """End-to-end survivor selection over the controlled corpus: every
    near-dup pair lands in one cluster keyed by its minimum doc_id."""
    from sketchlib.dedup import near_dup_clusters

    pairs = ngram_jaccard_pairs(corpus, threshold=0.5)
    clusters = {r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(pairs).collect()}
    for j in range(20):  # near-dup of doc j is 100+j
        assert clusters[100 + j] == j
    assert clusters[200] == 0 and clusters[201] == 1


def test_embedding_lsh_pairs_recall(spark):
    """Banded sign-LSH pairwise dedup vs the brute-force baseline: precision
    must be 1 (exact re-score) and recall ≥0.95 at threshold 0.9 on planted
    near-dups."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 32)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(40)]
    for j in range(10):  # planted near-dups of vectors 0..9
        rows.append((100 + j, (base[j] + 0.05 * rng.standard_normal(32).astype(np.float32)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["vec_a"], r["vec_b"]): r["cosine_e4"] for r in embedding_near_dups(df, 0.9).collect()}
    lsh = {(r["vec_a"], r["vec_b"]): r["cosine_e4"] for r in embedding_lsh_pairs(df, 0.9).collect()}
    assert len(exact) >= 10
    assert set(lsh) <= set(exact)  # precision 1
    assert len(lsh) / len(exact) >= 0.95  # recall
    for k, v in lsh.items():
        assert v == exact[k]  # identical exact re-scores


def test_embedding_lsh_pairs_empty_input(spark):
    """An empty corpus has no near-dup pairs — must return the empty result
    (correct schema), not crash on dimension inference (ADVICE r2)."""
    from sketchlib.dedup import embedding_lsh_pairs

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = embedding_lsh_pairs(empty, threshold=0.5)
    assert out.columns == ["vec_a", "vec_b", "cosine_e4"]
    assert out.count() == 0


def test_star_components_long_chain(spark):
    """A 201-node path graph (diameter 200): min-label propagation cannot
    finish in 25 rounds (it moves the label one hop per round and raises
    rather than mislabel), while the star algorithm converges in O(log² n)
    rounds and labels the whole chain with its minimum node."""
    from sketchlib.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(pairs, algorithm="star").collect()
    }
    assert got == {i: 0 for i in range(201)}
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(pairs, max_iters=25).collect()


def test_star_equals_propagation_random_graphs(spark):
    """Both algorithms must produce identical labelings on random graphs
    (multiple components, varied shapes)."""
    import random

    from sketchlib.dedup import near_dup_clusters

    rng = random.Random(5)
    edges = set()
    # several islands: cliques, chains, stars, singleton pairs
    for base in (0, 100, 200, 300):
        nodes = [base + i for i in range(rng.randint(2, 20))]
        for _ in range(len(nodes) * 2):
            u, v = rng.sample(nodes, 2)
            edges.add((min(u, v), max(u, v)))
    pairs = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
    prop = {
        (r["doc_id"], r["cluster_id"])
        for r in near_dup_clusters(pairs, algorithm="propagation").collect()
    }
    star = {
        (r["doc_id"], r["cluster_id"])
        for r in near_dup_clusters(pairs, algorithm="star").collect()
    }
    assert prop == star
    assert near_dup_clusters(pairs, algorithm="star").count() == len(
        {n for e in edges for n in e}
    )


def test_near_dup_clusters_rejects_unknown_algorithm(spark):
    from sketchlib.dedup import near_dup_clusters

    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="unknown algorithm"):
        near_dup_clusters(pairs, algorithm="galaxy")


def test_cross_doc_span_stats_ground_truth(spark):
    from sketchlib.dedup import cross_doc_span_stats

    df = spark.createDataFrame(
        [
            (0, "a b c"),  # spans(n=2): "a b","b c" — "a b" shared with doc 1
            (1, "a b x"),
            (2, "q r"),  # unique span
            (3, "z"),  # shorter than n: no spans
            (4, "m n m n"),  # within-doc repeat only: NOT a cross-doc dup
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"], r["dup_span_frac"])
        for r in cross_doc_span_stats(df, n=2).collect()
    }
    assert out[0] == (2, 1, pytest.approx(0.5))
    assert out[1] == (2, 1, pytest.approx(0.5))
    assert out[2] == (1, 0, 0.0)
    assert out[3] == (0, 0, 0.0)
    assert out[4] == (3, 0, 0.0)


def test_cross_doc_span_stats_rejects_bad_n(spark, corpus):
    from sketchlib.dedup import cross_doc_span_stats

    with pytest.raises(ValueError):
        cross_doc_span_stats(corpus, n=1)


def test_span_stats_leaves_no_cache_entries(spark, corpus):
    """VERDICT r4 #6: the materialized span table must not accumulate
    session-lifetime CacheManager entries per call — the eager
    localCheckpoint materializes without registering a persist, and its
    blocks are ContextCleaner-released when the plan is GC'd. Two
    sequential materialized calls leave the cache manager unchanged."""
    from sketchlib.dedup import cross_doc_span_stats

    cm = spark._jsparkSession.sharedState().cacheManager()

    def n_cached() -> int:
        try:
            return cm.cachedData().size()
        except Exception:
            return 0 if cm.isEmpty() else 1

    before = n_cached()
    for _ in range(2):
        cross_doc_span_stats(corpus, n=3, materialize=True).collect()
    assert n_cached() == before


def test_benchmark_span_overlap_counts_known_contamination(spark):
    """Decontamination: a training doc sharing a 3-gram span with a
    benchmark doc is flagged with the exact distinct-overlap count; clean
    docs are absent; NULL-id docs drop; repeated spans count once."""
    from sketchlib.dedup import benchmark_span_overlap

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),          # shares 'the quick brown' + 'quick brown fox'
            (2, "totally unrelated text here now"),     # clean
            (3, "quick brown fox quick brown fox"),     # repeated span counts ONCE
            (None, "the quick brown fox"),              # NULL id drops
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "see the quick brown fox run")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["n_overlap_spans"]
        for r in benchmark_span_overlap(train, bench, n=3).collect()
    }
    # bench 3-gram spans: {see the quick, the quick brown, quick brown fox,
    # brown fox run}; doc1 overlaps 2, doc3 overlaps 1 (distinct)
    assert got == {1: 2, 3: 1}


def test_benchmark_span_overlap_via_filter_equals_exact(spark, sf_dir):
    """The cuckoo-runtime-filter decontamination path must return EXACTLY
    the equi-join path's result (no false negatives from the filter; false
    positives removed by the exact semi join inside)."""
    from pyspark.sql import functions as F

    from sketchlib.dedup import benchmark_span_overlap
    from sketchlib.relops import sample_by_hash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = sample_by_hash(docs, "CAST(doc_id AS STRING)", "28")
    train = docs.filter(F.expr("md5(CAST(doc_id AS STRING)) >= '28'"))
    exact = sorted(
        tuple(r) for r in benchmark_span_overlap(train, bench, n=5).collect()
    )
    sketched = sorted(
        tuple(r)
        for r in benchmark_span_overlap(train, bench, n=5, via_filter=True).collect()
    )
    assert sketched == exact and len(exact) > 0


def test_benchmark_span_overlap_hot_span_skew(spark):
    """Skew edge: EVERY doc shares one boilerplate span with the benchmark
    (the hot-key worst case for the span join). Counts must stay exact —
    each doc overlaps on exactly the boilerplate span (distinct
    semantics), on both the equi-join and the runtime-filter paths."""
    from sketchlib.dedup import benchmark_span_overlap

    boiler = "all rights reserved copyright"
    train = spark.createDataFrame(
        [(i, f"doc body {i} unique words here {boiler}") for i in range(200)],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(900, f"footer {boiler} footer end")], "doc_id bigint, text string"
    )
    for via in (False, True):
        got = {
            r["doc_id"]: r["n_overlap_spans"]
            for r in benchmark_span_overlap(train, bench, n=4, via_filter=via).collect()
        }
        assert got == {i: 1 for i in range(200)}, (via, len(got))


def test_paragraph_dedup_first_occurrence_and_reassembly(spark):
    """Global first-occurrence (doc_id, pos) keeps doc 1's paragraphs
    whole, strips the repeats from doc 2, preserves order on survivors,
    dedups on the WS-NORMALIZED identity while keeping the RAW first
    occurrence, retains all-duplicate docs with empty kept_text, and
    drops NULL-text docs."""
    from sketchlib.dedup import paragraph_dedup

    rows = [
        (1, "alpha\nbeta\n\ngamma"),
        (2, "beta\ndelta\nalpha"),          # beta+alpha are repeats
        (3, "  alpha  \n epsilon"),         # norm-dup of alpha; raw kept_text check
        (4, "alpha\nbeta"),                 # every paragraph a duplicate
        (5, None),                          # dropped
        (6, "\n\n\n"),                      # zero non-empty paragraphs: absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["kept_text"], r["n_paras"], r["n_kept"])
           for r in paragraph_dedup(df).collect()}
    assert got == {
        1: ("alpha\nbeta\ngamma", 3, 3),
        2: ("delta", 3, 1),
        3: (" epsilon", 2, 1),
        4: ("", 2, 0),
    }
