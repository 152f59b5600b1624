"""ANN tests: brute-force cosine top-k vs numpy ground truth; LSH-bucketed
variant recall vs the exact baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.similarity import (
    cosine_topk,
    hyperplanes,
    lsh_cosine_topk,
    lsh_cosine_topk_indexed,
    with_lsh_signature,
    write_signature_table,
)


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


def test_ivf_topk_recall_and_pruning(spark, emb, emb_np, tmp_path):
    """IVF probe: partition-pruned candidate read, precision 1, recall vs
    brute force grows to 1 as nprobe → n_centroids."""
    from sketchlib.similarity import ivf_topk, write_ivf_index

    ids, mat = emb_np
    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, idx, k=16)  # default: 2 Lloyd rounds
    idx0 = str(tmp_path / "ivf_raw")
    write_ivf_index(emb, idx0, k=16, lloyd_iters=0)  # raw hash-sample seeds
    stored = spark.read.parquet(idx)
    assert stored.count() == len(ids)
    assert stored.select("centroid").distinct().count() <= 16
    recalls, recalls0, recalls12 = [], [], []
    for qi in (0, 11, 42, 7, 23):
        q = mat[qi].tolist()
        exact = _exact_topk(ids, mat, q, 10)
        got = {r["vec_id"] for r in ivf_topk(spark, idx, q, k=10, nprobe=4).collect()}
        got0 = {r["vec_id"] for r in ivf_topk(spark, idx0, q, k=10, nprobe=4).collect()}
        got12 = {r["vec_id"] for r in ivf_topk(spark, idx, q, k=10, nprobe=12).collect()}
        assert got <= set(ids.tolist())
        recalls.append(len(got & exact) / 10)
        recalls0.append(len(got0 & exact) / 10)
        recalls12.append(len(got12 & exact) / 10)
    assert np.mean(recalls) >= 0.5, recalls
    # nprobe=12 is the documented ≥0.9-recall operating point (VERDICT r3
    # #4; measured 0.94 on this corpus, 0.975 at sf0.1) — the registry's
    # ann_ivf_topk probes at this setting
    assert np.mean(recalls12) >= 0.9, recalls12
    # probing more lists can only help (supersets of candidates)
    assert np.mean(recalls12) >= np.mean(recalls), (recalls12, recalls)
    # Lloyd refinement must not lose recall vs the raw sampled seeds
    # (VERDICT r2 #7: refined quantizer ≥ current at nprobe=4)
    assert np.mean(recalls) >= np.mean(recalls0), (recalls, recalls0)
    # probing ALL centroids must recover the exact top-k
    q = mat[0].tolist()
    full = {r["vec_id"] for r in ivf_topk(spark, idx, q, k=10, nprobe=16).collect()}
    assert full == _exact_topk(ids, mat, q, 10)


def test_ivf_topk_batch_equals_single(spark, emb, emb_np, tmp_path):
    """The batch probe (in-plan centroid ranking + one equi-join on the
    partition key) returns EXACTLY what the single-query driver-side
    variant returns per query, and its plan is one job with dynamic
    partition pruning on the index scan (VERDICT r5 #3: no per-query
    driver round-trips)."""
    from sketchlib.similarity import ivf_topk, ivf_topk_batch, write_ivf_index

    ids, mat = emb_np
    idx = str(tmp_path / "ivf_batch")
    write_ivf_index(emb, idx, k=16)
    panel = [0, 11, 42]
    qs = emb.filter(F.col("vec_id").isin(panel)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = ivf_topk_batch(spark, idx, qs, k=10, nprobe=4)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    qrows = {r["vec_id"]: list(r["embedding"]) for r in qs.withColumnRenamed(
        "query_id", "vec_id").collect()}
    for qi in panel:
        single = [
            (r["vec_id"], r["cosine"])
            for r in ivf_topk(spark, idx, qrows[qi], k=10, nprobe=4).collect()
        ]
        assert sorted(got[qi], key=lambda t: (-t[1], t[0])) == single, qi
    # plan evidence: the index scan carries a dynamic-pruning partition
    # filter (only probed centroid directories are read) and the probe
    # list joins the index exactly once
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan[:3000]
    # an invalid query vector (zero norm) contributes no rows
    bad = spark.createDataFrame(
        [(99, [0.0] * mat.shape[1])], "query_id long, embedding array<double>"
    )
    assert ivf_topk_batch(spark, idx, bad, k=5, nprobe=4).count() == 0


def test_lloyd_refine_deterministic_across_partitioning(spark, emb):
    """The fixed-point integer-mean arithmetic makes refined centroids
    BIT-identical under any input partitioning (a float64 mean would not
    be — summation order would differ)."""
    from sketchlib.similarity import ivf_centroids, lloyd_refine

    seeds = ivf_centroids(emb, k=8)
    a = lloyd_refine(emb, seeds, iters=2).orderBy("cid").collect()
    b = lloyd_refine(emb.repartition(13), seeds, iters=2).orderBy("cid").collect()
    assert [(r["cid"], r["cvn"]) for r in a] == [(r["cid"], r["cvn"]) for r in b]


def test_indexed_probe_equals_adhoc(spark, emb, emb_np, tmp_path):
    """The materialized-signature probe (partition-pruned scan of the stored
    sig column) returns exactly what the ad-hoc in-plan variant returns —
    and the precomputed signature column matches the in-plan expression."""
    ids, mat = emb_np
    sig_path = str(tmp_path / "sig")
    write_signature_table(emb, sig_path, n_planes=8, seed=42)
    stored = spark.read.parquet(sig_path)
    assert stored.count() == len(ids)
    recomputed = with_lsh_signature(emb, n_planes=8, seed=42)
    mismatch = (
        stored.select("vec_id", F.col("sig").alias("s1"))
        .join(recomputed.select("vec_id", F.col("sig").alias("s2")), "vec_id")
        .filter("s1 <> s2")
        .count()
    )
    assert mismatch == 0
    for qi in (0, 11):
        q = mat[qi].tolist()
        adhoc = [(r["vec_id"], r["cosine"]) for r in lsh_cosine_topk(emb, q, k=10).collect()]
        indexed = [
            (r["vec_id"], r["cosine"])
            for r in lsh_cosine_topk_indexed(spark, sig_path, q, k=10).collect()
        ]
        assert indexed == adhoc


def test_lloyd_improves_recall_on_skewed_corpus(spark, tmp_path):
    """Skewed fixture (VERDICT r2 stretch): one dominant cluster swallows
    most of a hash-ordered seed sample, so raw seeds under-cover the tail
    clusters; Lloyd refinement redistributes centroids. Refined recall at
    nprobe=4 must be at least the raw-seed recall (and a sane floor)."""
    from sketchlib.similarity import ivf_topk, write_ivf_index

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((8, 32)) * 4
    sizes = [600, 40, 40, 40, 40, 40, 40, 40]  # 68% of mass in cluster 0
    rows, vid = [], 0
    for c, n in zip(centers, sizes):
        for v in c + rng.standard_normal((n, 32)):
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    ids = np.array([r[0] for r in rows])
    idx2 = str(tmp_path / "skew_l2")
    idx0 = str(tmp_path / "skew_raw")
    write_ivf_index(emb, idx2, k=8, lloyd_iters=2)
    write_ivf_index(emb, idx0, k=8, lloyd_iters=0)
    qids = [600, 650, 700, 750, 800, 850, 0, 100]  # mostly tail-cluster queries
    rec2, rec0 = [], []
    for qi in qids:
        q = mat[qi]
        exact = _exact_topk(ids, mat, q.tolist(), 10)
        g2 = {r["vec_id"] for r in ivf_topk(spark, idx2, q.tolist(), k=10, nprobe=4).collect()}
        g0 = {r["vec_id"] for r in ivf_topk(spark, idx0, q.tolist(), k=10, nprobe=4).collect()}
        rec2.append(len(g2 & exact) / 10)
        rec0.append(len(g0 & exact) / 10)
    assert np.mean(rec2) >= np.mean(rec0), (rec2, rec0)
    assert np.mean(rec2) >= 0.7, rec2


def test_kmeans_parallel_seeds_deterministic_and_better_on_skew(spark, tmp_path):
    """k-means|| seeding: (a) bit-deterministic under repartitioning (the
    integerized costs + md5 thresholds make the sampling decisions exact),
    (b) with Lloyd refinement it matches or beats hash-sample seeding on a
    skewed corpus at larger k."""
    from sketchlib.similarity import ivf_topk, kmeans_parallel_seeds, write_ivf_index

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((12, 24)) * 5
    sizes = [500] + [25] * 11
    rows, vid = [], 0
    for c, n in zip(centers, sizes):
        for v in c + rng.standard_normal((n, 24)):
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    s1 = kmeans_parallel_seeds(emb, k=12).orderBy("cid").collect()
    s2 = kmeans_parallel_seeds(emb.repartition(11), k=12).orderBy("cid").collect()
    assert [(r["cid"], r["cvn"]) for r in s1] == [(r["cid"], r["cvn"]) for r in s2]

    mat = np.array([r[1] for r in rows], dtype=np.float64)
    ids = np.array([r[0] for r in rows])
    ikm = str(tmp_path / "km")
    ihs = str(tmp_path / "hs")
    write_ivf_index(emb, ikm, k=12, cents=kmeans_parallel_seeds(emb, k=12))
    write_ivf_index(emb, ihs, k=12)
    rkm, rhs = [], []
    for qi in (500, 540, 590, 640, 690, 740, 0, 250):
        q = mat[qi]
        exact = _exact_topk(ids, mat, q.tolist(), 10)
        gk = {r["vec_id"] for r in ivf_topk(spark, ikm, q.tolist(), k=10, nprobe=4).collect()}
        gh = {r["vec_id"] for r in ivf_topk(spark, ihs, q.tolist(), k=10, nprobe=4).collect()}
        rkm.append(len(gk & exact) / 10)
        rhs.append(len(gh & exact) / 10)
    assert np.mean(rkm) >= np.mean(rhs), (rkm, rhs)


def test_batch_topk_equals_per_query(spark, emb, emb_np):
    """The batch probe must return exactly the per-query variant's results
    for each query id (same planes, same radius, same re-score)."""
    from sketchlib.similarity import lsh_cosine_topk_batch

    ids, mat = emb_np
    qids = [0, 11, 42]
    qs = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = lsh_cosine_topk_batch(qs, emb, k=10, n_planes=8, hamming_probe=2)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["cosine"], r["vec_id"]))
    for qi in qids:
        single = lsh_cosine_topk(emb, mat[qi].tolist(), k=10, n_planes=8, hamming_probe=2)
        exp = [(r["cosine"], r["vec_id"]) for r in single.collect()]
        assert sorted(got[qi], key=lambda x: (-x[0], x[1])) == exp, qi


def test_batch_topk_empty_corpus(spark):
    from sketchlib.similarity import lsh_cosine_topk_batch

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    qs = spark.createDataFrame([], "query_id bigint, embedding array<float>")
    assert lsh_cosine_topk_batch(qs, empty).count() == 0


def test_batch_topk_bucket_cap_engages(spark, emb):
    """max_bucket_size drops oversized corpus signature buckets before the
    join: a zero cap removes every bucket (no candidates at all), and any
    cap can only shrink the result."""
    from sketchlib.similarity import lsh_cosine_topk_batch

    qs = emb.filter(F.col("vec_id").isin([0, 11])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert lsh_cosine_topk_batch(qs, emb, k=5, max_bucket_size=0).count() == 0
    full = lsh_cosine_topk_batch(qs, emb, k=5).count()
    capped = lsh_cosine_topk_batch(qs, emb, k=5, max_bucket_size=2).count()
    assert capped <= full


def test_ivf_clustered_fixture_recall_floor(spark, emb, tmp_path):
    """VERDICT r4 #4: on a corpus WITH cluster structure the IVF index
    must behave like an index — recall >= 0.9 while scanning <= 26% of
    the corpus (nprobe=2 of 16 lists; the raw hash-scattered fixture
    needed ~75% scanned for the same recall, which is a linear scan with
    extra steps). The clustered fixture is the deterministic 16-cluster
    mixture the ann_ivf_clustered_probe registry entry gates."""
    from sketchlib.similarity import clustered_embeddings, ivf_topk, write_ivf_index

    emb2 = clustered_embeddings(emb, n_clusters=16).cache()
    rows = emb2.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    total = len(ids)
    idx = str(tmp_path / "ivf_clustered")
    write_ivf_index(emb2, idx, k=16, lloyd_iters=2)
    list_sizes = {
        r["centroid"]: r["n"]
        for r in spark.read.parquet(idx).groupBy("centroid").agg(F.count("*").alias("n")).collect()
    }
    recalls, scan_fracs = [], []
    for qi in (0, 3, 11, 42, 101, 257):
        q = mat[list(ids).index(qi)].tolist()
        exact = _exact_topk(ids, mat, q, 10)
        got_df = ivf_topk(spark, idx, q, k=10, nprobe=2)
        got = {r["vec_id"] for r in got_df.collect()}
        recalls.append(len(got & exact) / 10)
        # actual probed rows: re-derive the 2 probed lists the way the
        # probe ranks them (top-2 centroid dot products)
        cents = spark.read.parquet(idx + "_centroids").collect()
        ranked = sorted(
            (-(sum(a * b for a, b in zip(q, r["cvn"]))), r["cid"]) for r in cents
        )
        probed = [cid for _, cid in ranked[:2]]
        scan_fracs.append(sum(list_sizes.get(c, 0) for c in probed) / total)
    assert np.mean(recalls) >= 0.9, recalls
    assert max(scan_fracs) <= 0.26, scan_fracs
    emb2.unpersist()


def test_ivf_pq_recall_floor_and_shortlist_contract(spark, emb, tmp_path):
    """IVFPQ (VERDICT r7 #6) on the amp=0.0625 clustered fixture — the
    center≈noise regime where within-list cosine gaps exceed PQ
    reconstruction error. The refined path (ADC shortlist=30 →
    exact re-score) must hit recall mean ≥ 0.9 / min ≥ 0.7 vs
    brute-force exact at nprobe=2 of 16 lists (measured 0.95/0.7 at
    sf0.001 — fully deterministic integer pipeline, so these are pins,
    not hopes). Contract checks: refined ids ⊆ adc shortlist ids, the
    shortlist is exactly `shortlist` rows, and adc_q is BIGINT-valued."""
    from sketchlib.similarity import clustered_embeddings, ivf_pq_topk, write_ivf_pq_index

    emb2 = clustered_embeddings(emb, n_clusters=16, amp=0.0625).cache()
    rows = emb2.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    idx = str(tmp_path / "ivfpq")
    write_ivf_pq_index(emb2, idx, k=16, n_sub=16, ksub=16, lloyd_iters=2)
    # the index stores ONLY (vec_id, codes) under the centroid partitioning
    stored = spark.read.parquet(idx)
    assert set(stored.columns) == {"vec_id", "codes", "centroid"}
    assert stored.count() == len(ids)
    recalls = []
    for qi in (0, 3, 11, 42, 101, 257):
        q = mat[list(ids).index(qi)].tolist()
        exact = _exact_topk(ids, mat, q, 10)
        out = ivf_pq_topk(
            spark, idx, q, k=10, nprobe=2, shortlist=30, rescore_src=emb2
        ).collect()
        adc = {r["vec_id"] for r in out if r["path"] == "adc"}
        refined = {r["vec_id"] for r in out if r["path"] == "refined"}
        assert len(adc) == 30
        assert refined <= adc
        assert all(isinstance(r["adc_q"], int) for r in out)
        recalls.append(len(refined & exact) / 10)
    assert np.mean(recalls) >= 0.9, recalls
    assert min(recalls) >= 0.7, recalls
    # without a rescore source only the adc shortlist comes back
    q = mat[0].tolist()
    only = ivf_pq_topk(spark, idx, q, k=10, nprobe=2, shortlist=30).collect()
    assert {r["path"] for r in only} == {"adc"}
    emb2.unpersist()


def test_pq_codebooks_deterministic_across_partitioning(spark, emb):
    """The all-integer PQ training (exact BIGINT sums, guarded floor
    division, argmin ties → smallest code) makes trained codebooks
    BIT-identical under any input partitioning — same property the
    coarse quantizer pins in test_lloyd_refine_deterministic."""
    from sketchlib.similarity import ivf_centroids, lloyd_refine, pq_residuals, pq_train_codebooks

    cents = lloyd_refine(emb, ivf_centroids(emb, k=8), iters=1).localCheckpoint()
    rq_a, cmq_a = pq_residuals(emb, cents)
    rq_b, cmq_b = pq_residuals(emb.repartition(13), cents)
    cb_a = pq_train_codebooks(rq_a, n_sub=8, ksub=8, iters=2)
    cb_b = pq_train_codebooks(rq_b.repartition(7), n_sub=8, ksub=8, iters=2)
    assert cb_a == cb_b
    # quantized per-list means are exact integers — identical too
    ma = {r["centroid"]: r["cmq"] for r in cmq_a.collect()}
    mb = {r["centroid"]: r["cmq"] for r in cmq_b.collect()}
    assert ma == mb


def test_pq_guards(spark, emb):
    """dim % n_sub != 0 and empty inputs raise instead of mis-slicing."""
    from sketchlib.similarity import ivf_centroids, pq_residuals, pq_train_codebooks

    cents = ivf_centroids(emb, k=4).localCheckpoint()
    rq, _ = pq_residuals(emb, cents)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train_codebooks(rq, n_sub=7, ksub=8, iters=1)
    with pytest.raises(ValueError, match="empty"):
        pq_train_codebooks(rq.filter("vec_id < 0"), n_sub=8, ksub=8, iters=1)


def test_pq_probe_handles_empty_probed_centroid(spark, tmp_path):
    """A probed coarse centroid with ZERO assigned vectors (no cmq row,
    no index directory — routine for hash-sampled seeds at scale) must
    probe as an empty directory, not KeyError in the LUT builder."""
    from sketchlib.similarity import pq_adc_shortlist

    idx = str(tmp_path / "pq_empty")
    # hand-written index: centroid 0 holds both vectors; centroid 1 is
    # EMPTY but its cvn points straight at the query, so it ranks first
    dim, n_sub = 4, 2
    spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cid int, cvn array<double>",
    ).write.parquet(idx + "_centroids")
    spark.createDataFrame(
        [(0, [1 << 20, 0, 0, 0])], "centroid int, cmq array<bigint>"
    ).write.parquet(idx + "_cmeans")
    spark.createDataFrame(
        [(s, c, d, 0) for s in range(n_sub) for c in range(2) for d in range(2)],
        "sub int, code int, pos int, q long",
    ).write.parquet(idx + "_codebooks")
    spark.createDataFrame(
        [(10, 0, [0, 0]), (11, 0, [1, 1])],
        "vec_id long, centroid int, codes array<int>",
    ).write.mode("overwrite").partitionBy("centroid").parquet(idx)
    out = pq_adc_shortlist(
        spark, idx, [0.0, 1.0, 0.0, 0.0], nprobe=1, shortlist=5
    ).collect()
    assert out == []  # the empty directory yields zero candidates
    both = pq_adc_shortlist(
        spark, idx, [0.0, 1.0, 0.0, 0.0], nprobe=2, shortlist=5
    ).collect()
    assert {r["vec_id"] for r in both} == {10, 11}


def test_pq_residuals_bounded_for_contract_valid_giant_components(spark):
    """norm² ≤ 1e12 admits a 1e5 component whose unclamped x0² ≈ 1.1e22
    overflows int64: the PQ_X0_CLAMP keeps the quantized domain exact and
    defined (r4 rule: bound the domain before integerizing)."""
    from sketchlib.similarity import PQ_X0_CLAMP, ivf_centroids, pq_residuals

    emb = spark.createDataFrame(
        [(i, [1e5 if i == 0 and j == 0 else float((i * 7 + j) % 5 - 2)
              for j in range(8)])
         for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_centroids(emb, k=2).localCheckpoint()
    rq, cmq = pq_residuals(emb, cents)
    rows = rq.collect()
    assert len(rows) == 6
    bound = 2 * PQ_X0_CLAMP * (1 << 20)  # |xq| ≤ clamp·2^20/r + mean slack
    for r in rows:
        assert all(abs(v) <= bound for v in r["rq"]), r


def test_vectorized_kernels_equal_inplan_exprs(spark, emb):
    """r9 parity pin: the vectorized Arrow kernels (_assign_batch,
    _pq_codes_batch) must reproduce the in-plan expressions bit-for-bit —
    the float dot accumulates sequentially across dims (the exact
    zip_with fold order) and the integer PQ distances/argmin are
    order-independent, so any divergence is a bug."""
    from sketchlib.similarity import (
        _assign_batch,
        _assign_expr,
        _centroid_rows,
        _pq_codes_batch,
        _pq_codes_expr,
        ivf_centroids,
        valid_embeddings,
    )

    ve = valid_embeddings(emb).select("vec_id", "embedding")
    cents = ivf_centroids(ve, k=8)
    rows = _centroid_rows(cents)
    # in-plan assignment (cid values)
    plan = {
        r["vec_id"]: r["cid"]
        for r in ve.select(
            "vec_id",
            _assign_expr("embedding", rows, cents.schema["cid"].dataType).alias("cid"),
        ).collect()
    }
    got = ve.orderBy("vec_id").collect()
    mat = np.array([r["embedding"] for r in got], dtype=np.float64)
    bi = _assign_batch(mat, np.array([c for _, c in rows], dtype=np.float64))
    for r, i in zip(got, bi):
        assert plan[r["vec_id"]] == rows[int(i)][0]

    # integer PQ codes: quantized-ish residual stand-in + toy codebooks
    rq_df = ve.selectExpr(
        "vec_id",
        "transform(CAST(embedding AS ARRAY<DOUBLE>),"
        " x -> CAST(floor(x * 1048576) AS BIGINT)) AS rq",
    )
    n_sub, ksub = 8, 4
    dim = len(got[0]["embedding"])
    dsub = dim // n_sub
    cb = [
        [[(s * 131 + c * 17 + d * 7) % 2000 - 1000 for d in range(dsub)]
         for c in range(ksub)]
        for s in range(n_sub)
    ]
    plan_codes = {
        r["vec_id"]: list(r["codes"])
        for r in rq_df.selectExpr(
            "vec_id", f"{_pq_codes_expr('rq', cb, dsub)} AS codes"
        ).collect()
    }
    rq_rows = rq_df.orderBy("vec_id").collect()
    rq_mat = np.array([r["rq"] for r in rq_rows], dtype=np.int64)
    np_codes = _pq_codes_batch(rq_mat, np.array(cb, dtype=np.int64))
    for r, cs in zip(rq_rows, np_codes):
        assert plan_codes[r["vec_id"]] == [int(x) for x in cs]
