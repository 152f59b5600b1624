"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline, pure Catalyst higher-order
  functions (zip_with + aggregate) — JVM-side, no UDF
- LSH-bucketed top-k: random-hyperplane signatures (Charikar 2002) with
  multi-probe; candidates get exact re-scoring, so precision is 1 and
  recall follows the probe budget (measured in tests vs brute force)

Scale: brute force is one scan (fine when the query side is small and the
corpus is the big side — score is a projection, top-k a TakeOrdered).
The LSH variant turns it into a bucket equi-join: at 10^12 rows the scan
touches only matching buckets after partition pruning on the bucket key.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def _qlit(query_vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(emb: DataFrame, query_vec, k: int = 10, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against one query vector. Rounded to 9 decimals so
    rankings are reproducible across engines/summation orders."""
    q = _qlit(query_vec)
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return (
        emb.select(F.col(id_col), F.round(cos, 9).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def _sig_expr(vec_col, planes: np.ndarray) -> F.Column:
    """Bit-packed sign signature: bit p = 1 iff dot(v, plane_p) > 0."""
    bits = None
    for p, plane in enumerate(planes):
        d = _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in plane]))
        term = F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bits = term if bits is None else bits + term
    return bits


def lsh_cosine_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    n_planes: int = 8,
    hamming_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict exact scoring to vectors whose sign-LSH
    signature is within ``hamming_probe`` bits of the query's (multi-probe
    LSH). Precision 1 (exact re-score); recall grows with the probe radius.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qsig = int(
        sum(
            (1 << p)
            for p, plane in enumerate(planes)
            if float(np.dot(np.asarray(query_vec, dtype=np.float64), plane)) > 0
        )
    )
    sig = _sig_expr(vec_col, planes)
    cand = emb.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= hamming_probe
    )
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)
