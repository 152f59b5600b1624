"""Training-data-pipeline queries: text analysis, dedup, similarity,
multimodal — registered into the same oracle-checked registry as the
sketch queries (SURVEY.md §2.6-2.10 + task-mandated pipeline operators).

Where the operator is expressible as portable SQL, the oracle runs the SAME
fragments in DuckDB (true expression parity). Approximate operators
(SimHash, MinHash-LSH) are rows-only here and ground-truth-tested in
pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sketchlib.queries import _docs, register
from sketchlib.textops import (
    _PAD_T,
    fingerprint_sql,
    lang_id_sql,
    norm_text_sql,
    quality_sql,
    token_count_sql,
    with_fingerprint,
    with_lang_id,
    with_quality,
    with_simhash,
    with_token_count,
)

# ------------------------------------------------------------ text ops

_SCORES, _PRED = lang_id_sql()

_LANG_ORACLE = (
    f"WITH t AS (SELECT doc_id, {_PAD_T} AS __t FROM documents), "
    f"s AS (SELECT doc_id, {', '.join(_SCORES)} FROM t) "
    f"SELECT doc_id, {_PRED} AS pred_lang FROM s"
)


@register("lang_id_heuristic", _LANG_ORACLE)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-count language ID — identical SQL fragments run in Spark and
    DuckDB, so the gate checks expression-level parity."""
    return with_lang_id(_docs(spark, sf_dir))


@register(
    "doc_token_count",
    f"SELECT doc_id, {token_count_sql('duckdb')} AS n_tokens FROM documents",
)
def doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_token_count(_docs(spark, sf_dir))


@register(
    "doc_quality",
    f"SELECT doc_id, {', '.join(quality_sql('duckdb'))} FROM documents",
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_quality(_docs(spark, sf_dir))


@register(
    "doc_fingerprint",
    f"SELECT doc_id, {fingerprint_sql('duckdb')} AS fingerprint FROM documents",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_fingerprint(_docs(spark, sf_dir))


@register("simhash_fingerprints", None)  # Spark-native (xxhash64); pytest ground truth
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_simhash(_docs(spark, sf_dir))


# -------------------------------------------------------------- dedup

@register(
    "dedup_exact_docs",
    f"SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS group_size "
    f"FROM documents GROUP BY {norm_text_sql('duckdb')}",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sketchlib.dedup import dedup_exact

    return dedup_exact(_docs(spark, sf_dir))


_JACCARD_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ')), ' ') AS w
  FROM documents),
bg AS (
  SELECT DISTINCT doc_id, bigram
  FROM toks, UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS t(bigram)
  WHERE len(w) >= 2),
sz AS (SELECT doc_id, COUNT(*) AS s FROM bg GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM bg a JOIN bg b USING (bigram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(FLOOR(i * 1.0 / (sa.s + sb.s - i) * 1000000) AS BIGINT) AS jaccard_e6
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.5
"""


@register("dedup_ngram_jaccard", _JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard near-dup pairs at threshold 0.5 (the exact
    verifier the LSH methods are checked against)."""
    from sketchlib.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5)


# DOUBLE[] casts: duckdb's float32 list kernels differ from Spark's double
# fold by ~1 ulp, which flips 4th-decimal roundings
_EMB_DUP_ORACLE = """
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS c
  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
SELECT vec_a, vec_b, CAST(FLOOR(ROUND(c, 4) * 10000) AS BIGINT) AS cosine_e4
FROM pairs WHERE c >= 0.3
"""


@register("dedup_embedding_cosine", _EMB_DUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact brute force — the
    baseline the LSH variant is checked against). Cosines integerized at
    4dp for cross-engine hash stability."""
    from sketchlib.dedup import embedding_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dups(emb, threshold=0.3)


@register("dedup_minhash_lsh", None)  # approximate candidates, exact-verified; pytest checks recall
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sketchlib.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


@register(
    "hll_distinct_docs_per_lang",
    "SELECT lang, COUNT(DISTINCT doc_id) AS exact_distinct, TRUE AS within_bound "
    "FROM documents GROUP BY lang",
)
def hll_distinct_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sketches: one HLL per language (skew-safe two-phase build),
    each estimate checked against the exact per-group distinct count."""
    import numpy as np

    from sketchlib.spark.agg import SketchSpec, build_sketch_grouped, grouped_estimates

    docs = _docs(spark, sf_dir)
    spec = SketchSpec("g-hll-lang", "hll", (12,))
    grouped = build_sketch_grouped(docs, "lang", spec, "doc_id")
    est = {r["lang"]: r["estimate"] for r in grouped_estimates(grouped, spec, "lang").collect()}
    exact = {
        r["lang"]: r["d"]
        for r in docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("d")).collect()
    }
    bound = 3 * 1.04 / np.sqrt(1 << 12) + 0.02
    rows = [
        (lang, exact[lang], bool(abs(est[lang] - exact[lang]) / max(exact[lang], 1) <= bound))
        for lang in exact
    ]
    return spark.createDataFrame(rows, "lang string, exact_distinct long, within_bound boolean")


_PIPE_ORACLE = (
    "SELECT MIN(doc_id) AS doc_id FROM documents "
    f"WHERE {token_count_sql('duckdb')} BETWEEN 10 AND 100000 "
    f"GROUP BY {norm_text_sql('duckdb')}"
)


@register("training_pipeline_e2e", _PIPE_ORACLE)
def training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data flow: quality-filter → exact dedup →
    build an FP32 cuckoo membership filter over survivors → probe the full
    corpus. The members returned must be exactly the dedup survivors (no
    false negatives; FP32 false positives unobservable)."""
    from sketchlib.dedup import dedup_exact
    from sketchlib.kernels.cuckoo import size_for
    from sketchlib.spark.cuckoo import CuckooSpec, ShardedCuckoo, build_filter_direct, probe

    docs = _docs(spark, sf_dir)
    ok = docs.selectExpr("doc_id", "text", f"{token_count_sql('spark')} AS tc").filter(
        "tc BETWEEN 10 AND 100000"
    )
    kept = dedup_exact(ok).select(F.col("keep_doc_id").alias("doc_id"))
    spec = CuckooSpec("pipe-e2e", size_for(20_000, 4), fpsize=4, num_shards=2)
    merged = build_filter_direct(kept, spec, key=F.col("doc_id").cast("string"))
    sc = ShardedCuckoo.from_df(merged, spec)
    return (
        probe(docs.select("doc_id"), sc, key=F.col("doc_id").cast("string"))
        .filter(F.col("member"))
        .select("doc_id")
    )


# --------------------------------------------------------- similarity


@register(
    "ann_cosine_topk",
    "SELECT e.vec_id FROM embeddings e "
    "ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
    "  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 9) DESC, e.vec_id "
    "LIMIT 10",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the vec_id=0 query vector (exact ANN
    baseline; scores rounded to 9dp in both engines for stable ranking)."""
    from sketchlib.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    return cosine_topk(emb, qvec, k=10).select("vec_id")


@register("ann_lsh_topk", None)  # approximate; recall vs exact tested in pytest
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sketchlib.similarity import lsh_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    return lsh_cosine_topk(emb, qvec, k=10).select("vec_id")


# --------------------------------------------------------- multimodal


@register(
    "mm_decode_meta",
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    "CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width, "
    "CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INT) AS height, "
    "CAST(octet_length(encode(text)) % 3 + 1 AS INT) AS channels "
    "FROM documents",
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload column + Arrow-batched metadata
    extraction (deterministic fake decode → the arithmetic is the oracle;
    real codec stubbed, see sketchlib.multimodal.decode_real)."""
    from sketchlib.multimodal import attach_payload, decode_meta

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    with_payload = attach_payload(docs).select("doc_id", "payload")
    return decode_meta(with_payload).drop("checksum")
