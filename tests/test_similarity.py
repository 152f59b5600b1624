"""ANN tests: brute-force cosine top-k vs numpy ground truth; LSH-bucketed
variant recall vs the exact baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.similarity import cosine_topk, hyperplanes, lsh_cosine_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _exact_topk(ids, mat, q, k):
    qn = np.asarray(q, dtype=np.float64)
    cos = mat @ qn / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qn))
    order = np.lexsort((ids, -np.round(cos, 9)))
    return set(ids[order[:k]].tolist())


def test_cosine_topk_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    q = mat[0].tolist()
    got = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    assert got == _exact_topk(ids, mat, q, 10)
    # the query's own vector is its best match
    assert ids[0] in got


def test_cosine_topk_scores_sane(spark, emb, emb_np):
    ids, mat = emb_np
    q = mat[7].tolist()
    rows = cosine_topk(emb, q, k=5).collect()
    scores = [r["cosine"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] == pytest.approx(1.0, abs=1e-6)


def test_lsh_topk_recall(spark, emb, emb_np):
    ids, mat = emb_np
    recalls = []
    for qi in (0, 11, 42):
        q = mat[qi].tolist()
        exact = _exact_topk(ids, mat, q, 10)
        got = {r["vec_id"] for r in lsh_cosine_topk(emb, q, k=10).collect()}
        assert got  # bucket always contains the query vector itself
        recalls.append(len(got & exact) / 10)
    assert np.mean(recalls) >= 0.5, recalls
    # candidates-only guarantee: every returned id is a true corpus id
    assert got <= set(ids.tolist())
