"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline, pure Catalyst higher-order
  functions (zip_with + aggregate) — JVM-side, no UDF
- sign-LSH signatures (Charikar 2002): computed ONCE by
  :func:`with_lsh_signature` and materialized (written as a
  signature-partitioned parquet table by :func:`write_signature_table`);
  queries probe the stored column — no per-query signature recompute
- LSH-bucketed top-k: multi-probe over the persisted signature (Hamming
  ball filter → partition pruning on the ``sig`` directory key), exact
  re-scoring of candidates, so precision is 1 and recall follows the probe
  budget (measured in tests vs brute force)

All dot products / norms fold in float64: embeddings are cast
element-wise to double first, so results are bit-identical to any other
engine that folds doubles in order (the DuckDB oracles CAST to DOUBLE[]).

Scale: brute force is one scan (fine when the query side is small and the
corpus is the big side — score is a projection, top-k a TakeOrdered).
The signature table turns a probe into a pruned scan: at 10^12 rows only
the partitions inside the Hamming ball are read.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def as_double(col) -> F.Column:
    """Element-wise cast of an array<float> column to array<double> so every
    downstream product folds in float64 (cross-engine exactness)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def _seq_dot(a, b) -> float:
    """Sequential float64 dot fold — the SAME arithmetic (order and all)
    as the in-plan `aggregate(zip_with(...))` assignment, so driver-side
    centroid rankings (ivf_topk, pq_adc_shortlist) are bit-identical to
    the in-plan ones. ONE definition on purpose: the probes' parity with
    each other and with the oracle rests on every ranking using it."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


#: squared-norm ceiling for a valid embedding (norm ≤ 1e6): real encoder
#: outputs sit orders of magnitude below; beyond it the fixed-point Lloyd
#: quantization (floor(x·2^20), int64 sums) could overflow for large
#: clusters, so such vectors are encoder failures by contract
_N2_MAX = 1.0e12


def valid_embeddings(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Input contract for every embedding operator: vectors must have a
    FINITE, POSITIVE squared norm ≤ 1e12 — NULL/empty vectors, zero
    vectors (cosine undefined; the normalization divides by zero under
    ANSI), and vectors carrying NaN/Inf or absurd-magnitude components (a
    failed encoder row at web scale) are excluded, identically in the
    DuckDB oracles (fuzz-gate finding). The threshold tests are
    summation-order independent (squares cannot cancel), so both engines
    agree."""
    n2 = F.aggregate(
        F.transform(as_double(col), lambda x: x * x), F.lit(0.0), lambda s, x: s + x
    )
    return emb.filter(
        n2.isNotNull() & ~F.isnan(n2) & (n2 > 0) & (n2 <= F.lit(_N2_MAX))
    )


def valid_embedding_sql(col: str = "embedding") -> str:
    """The same validity predicate for the DuckDB oracles. The explicit
    no-NULL-element clause matters: DuckDB's list_sum SKIPS NULL elements
    where Spark's aggregate fold NULL-poisons, so without it a vector like
    [NULL, 3, 4] would pass the oracle and fail the operator."""
    v = f"CAST({col} AS DOUBLE[])"
    n2 = f"list_sum(list_transform({v}, x -> x * x))"
    return (
        f"(len(list_filter({v}, x -> x IS NULL)) = 0"
        f" AND isfinite({n2}) AND {n2} > 0 AND {n2} <= 1.0e12)"
    )


def clustered_embeddings(
    emb: DataFrame,
    n_clusters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    amp: float = 0.5,
) -> DataFrame:
    """Deterministic mixture-of-clusters derivation over a raw embedding
    table: vector ``i`` moves to cluster ``i % n_clusters``, whose center
    has integer-valued components ``((c*37 + j*11) % 13 - 6) * 0.5`` in
    [-3, 3], and keeps its ORIGINAL components (~±0.15) as the noise
    term. The result has real cluster structure a coarse quantizer can
    exploit — the raw testdata embeddings are hash-scattered, which made
    the r4 IVF operating point scan ~75% of the corpus for recall 0.975
    (an "index" in name only; VERDICT r4 #4 — the fixture was broken,
    not the operator).

    Cross-engine bit-exact by construction (the k-means parity
    requirement): integer modular arithmetic, a cast, one EXACT multiply
    by ``amp`` (must be a power of two — asserted), and ONE IEEE add of
    the float-exact original component — the same value bit-for-bit in
    Spark and DuckDB (queries_data._clustered_emb_sql mirrors this
    expression).

    ``amp`` sets the center-to-noise regime: the default 0.5 gives center
    norms ~12 vs noise ~0.5 — every cosine collapses into [0.995, 1] (a
    coarse quantizer separates LISTS perfectly, which is what the IVF
    gate needs, but no quantized code can rank WITHIN a list). amp =
    0.0625 gives center ~1.5 vs noise ~1 — within-cluster cosine gaps
    ≫ PQ reconstruction error, the regime an ADC shortlist is FOR."""
    m, e = math.frexp(amp)
    assert m == 0.5, "amp must be a power of two (exact multiply contract)"
    return valid_embeddings(emb, vec_col).select(
        id_col,
        F.expr(
            f"transform({vec_col}, (x, j) -> "
            f"CAST((({id_col} % {n_clusters}) * 37 + j * 11) % 13 - 6 AS DOUBLE)"
            f" * {amp!r}D + CAST(x AS DOUBLE))"
        ).alias(vec_col),
    )


def _require_valid_query(query_vec) -> None:
    import math

    n2 = sum(float(x) * float(x) for x in query_vec)
    if not (math.isfinite(n2) and 0 < n2 <= _N2_MAX):
        # same ceiling as valid_embeddings so every path (single-query,
        # batch, indexed) enforces ONE contract
        raise ValueError(
            "query vector must have a finite positive squared norm <= 1e12 "
            "(zero/NaN/Inf/absurd-magnitude vectors have no cosine neighbors)"
        )


def _qlit(query_vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(emb: DataFrame, query_vec, k: int = 10, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against one query vector. Rounded to 9 decimals so
    rankings are reproducible across engines/summation orders."""
    _require_valid_query(query_vec)
    emb = valid_embeddings(emb, vec_col)
    q = _qlit(query_vec)
    v = as_double(F.col(vec_col))
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return (
        emb.select(F.col(id_col), F.round(cos, 9).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def sig_expr(vec_col, planes: np.ndarray) -> F.Column:
    """Bit-packed sign signature: bit p = 1 iff dot(v, plane_p) > 0.
    Pure Catalyst expression (one pass over the array per plane)."""
    v = as_double(F.col(vec_col) if isinstance(vec_col, str) else vec_col)
    bits = None
    for p, plane in enumerate(planes):
        d = _dot(v, F.array(*[F.lit(float(x)) for x in plane]))
        term = F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bits = term if bits is None else bits + term
    return bits


def query_signature(query_vec, planes: np.ndarray) -> int:
    """The query vector's sign signature, computed driver-side with the SAME
    sequential float64 fold as :func:`sig_expr`'s Catalyst aggregate (and
    the DuckDB oracle) — numpy's pairwise/BLAS summation order can flip a
    near-zero dot's sign and probe different buckets (ADVICE r2)."""
    sig = 0
    for p, plane in enumerate(planes):
        s = 0.0
        for x, y in zip(query_vec, plane):
            s += float(x) * float(y)
        if s > 0:
            sig |= 1 << p
    return sig


def infer_dim(emb: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first row (arrays don't carry a
    length in the schema). Raises a clear error on an empty input instead
    of a TypeError deep in a subscript (ADVICE r2); callers that know the
    dimension should pass it explicitly and skip this extra job."""
    rows = emb.select(vec_col).head(1)
    if not rows:
        raise ValueError(
            f"cannot infer embedding dimension: input has no rows "
            f"(pass dim= explicitly for column {vec_col!r})"
        )
    return len(rows[0][0])


def with_lsh_signature(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    sig_col: str = "sig",
    dim: int | None = None,
) -> DataFrame:
    """Attach the bit-packed sign-LSH signature column (computed once;
    persist/write the result — do not recompute per query). Invalid
    vectors (zero norm / non-finite components) are excluded — a NaN
    component would otherwise give them an arbitrary sign signature."""
    emb = valid_embeddings(emb, vec_col)
    planes = hyperplanes(dim or infer_dim(emb, vec_col), n_planes, seed)
    return emb.withColumn(sig_col, sig_expr(vec_col, planes))


def write_signature_table(
    emb: DataFrame,
    path: str,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> None:
    """Materialize the signature table, PARTITIONED BY the signature value:
    a Hamming-ball probe filter (``sig IN (...)``) becomes directory-level
    partition pruning — only matching buckets are ever read. Written once,
    probed many times (the 100-TB ANN shape)."""
    with_lsh_signature(emb, n_planes, seed, vec_col).write.mode("overwrite").partitionBy(
        "sig"
    ).parquet(path)


def hamming_ball(center: int, n_bits: int, radius: int) -> list[int]:
    """All signatures within Hamming ``radius`` of ``center`` (multi-probe
    candidate buckets). Size = sum_{i<=r} C(n_bits, i) — tiny for the 8-16
    bit signatures used here."""
    from itertools import combinations

    out = []
    for r in range(radius + 1):
        for bits in combinations(range(n_bits), r):
            m = center
            for b in bits:
                m ^= 1 << b
            out.append(m)
    return out


def lsh_cosine_topk_indexed(
    spark: SparkSession,
    sig_path: str,
    query_vec,
    k: int = 10,
    n_planes: int = 8,
    hamming_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k against a materialized signature table: filter the
    stored ``sig`` partition column to the query's Hamming ball (partition
    pruning — candidate buckets only), then exact-re-score candidates.
    Precision 1; recall grows with the probe radius (tested vs brute
    force). No signature is recomputed at query time."""
    _require_valid_query(query_vec)
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qsig = query_signature(query_vec, planes)
    ball = hamming_ball(qsig, n_planes, hamming_probe)
    cand = spark.read.parquet(sig_path).filter(F.col("sig").isin(ball))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ivf_centroids(
    emb: DataFrame, k: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the ``k`` corpus vectors with
    the smallest md5(id) (an engine-portable hash-ordered sample — at real
    scale swap in k-means|| centroids; every downstream mechanic is
    identical), L2-normalized so assignment-by-dot equals
    assignment-by-cosine. Returns (cid, cvn)."""
    nrm = F.sqrt(F.aggregate(F.transform("cv", lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return (
        emb.orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(k)
        .select(F.col(id_col).alias("cid"), as_double(vec_col).alias("cv"))
        .select("cid", F.transform("cv", lambda x: x / nrm).alias("cvn"))
    )


def _centroid_rows(cents: DataFrame) -> list:
    """The bounded centroid relation, collected driver-side (k ≤ 64 rows —
    every probe `.collect()`s it anyway) and sorted ascending by cid so a
    keep-first argmax fold reproduces the (dot DESC, cid ASC) tie rule."""
    rows = [(r["cid"], list(r["cvn"])) for r in cents.collect()]
    rows.sort(key=lambda t: t[0])
    return rows


def _sql_flit(x) -> str:
    """Exact double literal: ``repr`` is the shortest round-trip form and
    Spark's literal parser is correctly-rounded, so the in-plan value is
    bit-identical to the collected python float (the hyperplane-literal
    precedent)."""
    return repr(float(x)) + "D"


def _sql_cid_lit(c, ct: str) -> str:
    if isinstance(c, bool) or not isinstance(c, (int, float)):
        s = "'" + str(c).replace("'", "''") + "'"
    elif isinstance(c, int):
        s = repr(c)
    else:
        s = repr(float(c)) + "D"
    return f"CAST({s} AS {ct})"


def _assign_expr(vec_col: str, rows: list, cid_type) -> F.Column:
    """Zero-exchange argmax assignment: k literal-centroid dot products per
    row + an in-plan keep-first fold. Over the cid-ASCENDING ``rows``, the
    strict ``d > best`` comparison keeps the smallest cid on ties — exactly
    the old row_number-over-(dot DESC, cid) pick, with no crossJoin row
    amplification and no window exchange carrying the embedding array
    (VERDICT r8 finding #1; the pq_adc_shortlist literal-LUT technique).

    Built as ONE SQL string parsed JVM-side (the _pq_dist_expr
    discipline): the equivalent Column-API construction issues a py4j
    round-trip per literal — measured 1.3s vs 0.82s PER PASS at k=16,
    dim=64 just to build and analyze the tree. The dot is the same
    sequential float64 zip_with fold as :func:`_dot`, over the same
    element-wise double cast as :func:`as_double` (identity bits on
    already-double inputs), so assignments are bit-identical to the old
    crossJoin shape. The single 2-D centroid literal is referenced once
    by one lambda — nothing is duplicated (the r3 CollapseProject rule)."""
    ct = cid_type.simpleString()
    cvs = ", ".join(
        "array(" + ", ".join(_sql_flit(x) for x in cvn) + ")" for _, cvn in rows
    )
    cids = ", ".join(_sql_cid_lit(c, ct) for c, _ in rows)
    v = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
    return F.expr(
        f"aggregate(zip_with(transform(array({cvs}), cv -> aggregate(zip_with({v},"
        f" cv, (x, y) -> x * y), 0.0D, (s, x) -> s + x)), array({cids}),"
        " (d, c) -> named_struct('d', d, 'cid', c)),"
        f" named_struct('d', CAST('-Infinity' AS DOUBLE), 'cid', CAST(NULL AS {ct})),"
        " (acc, e) -> IF(e.d > acc.d, e, acc)).cid"
    )


def ivf_assign(
    emb: DataFrame, cents: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Assign every vector to its max-dot (= max-cosine) centroid as ONE
    zero-exchange projection: the centroid table is a bounded driver
    artifact, so the k dot products and the argmax run as literal
    expressions over each row — the same arithmetic (sequential float64
    zip_with fold, identical (dot DESC, cid ASC) tie rule) as the old
    crossJoin + row_number shape, without shuffling k× corpus rows
    carrying the embedding column (VERDICT r8 finding #1)."""
    rows = _centroid_rows(cents)
    return emb.withColumn(
        "centroid", _assign_expr(vec_col, rows, cents.schema["cid"].dataType)
    )


_QSCALE = float(1 << 20)  # fixed-point scale for order-independent mean sums


def _emb_batch_matrix(col) -> "np.ndarray":
    """A pyarrow list<float|double> column as a dense (B, dim) float64
    matrix. float32 → float64 is the exact widening the in-plan
    ``as_double`` cast performs; fixed-dim non-null rows are the embedding
    contract (valid_embeddings upstream) — ragged/null rows fail fast."""
    if col.null_count:
        raise ValueError("embedding batch contains NULL rows")
    import pyarrow as pa
    import pyarrow.compute as pc

    lens = pc.list_value_length(col)
    flat = col.flatten()
    if flat.null_count:
        raise ValueError("embedding batch contains NULL elements")
    if len(col) == 0:
        return np.empty((0, 0), dtype=np.float64)
    dim = lens[0].as_py()
    if not pc.all(pc.equal(lens, pa.scalar(dim, type=lens.type))).as_py():
        raise ValueError("embedding rows must all share one dim")
    return flat.to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)


def _assign_batch(mat: "np.ndarray", cv_arr: "np.ndarray") -> "np.ndarray":
    """Vectorized argmax assignment of a (B, dim) float64 matrix against
    (k, dim) float64 centroids, returning centroid INDEXES (row order of
    ``cv_arr`` = cid-ascending). Bit-identical to :func:`_assign_expr`:
    the dot accumulates SEQUENTIALLY ACROSS DIMS (vectorized across rows),
    so every row executes the exact left-to-right IEEE add sequence of the
    in-plan zip_with fold, and the strict ``d > best`` update over
    ascending index reproduces the keep-first (dot DESC, cid ASC) tie
    rule. Pinned by test_assign_batch_equals_expr."""
    b, dim = mat.shape
    best = np.full(b, -np.inf)
    bi = np.zeros(b, dtype=np.int64)
    for i in range(cv_arr.shape[0]):
        acc = np.zeros(b)
        c = cv_arr[i]
        for j in range(dim):
            acc += mat[:, j] * c[j]
        upd = acc > best
        bi[upd] = i
        best[upd] = acc[upd]
    return bi


def _lloyd_comp(emb: DataFrame, rows: list, cid_type, vec_col: str) -> DataFrame:
    """Pre-collect builder for ONE Lloyd round's bounded component
    aggregate, keyed by centroid INDEX (``rows`` order = cid-ascending;
    the caller maps indexes back to cids): one vectorized Arrow pass
    (assign + exact power-of-two quantization + np.add.at scatter — the
    manual map-side combine, ≤ k·dim partial rows per batch) merged by one
    bounded exchange. Bit-exact vs the in-plan shape: the float dot is the
    sequential fold (see _assign_batch), floor(x·2^20) is an exact
    power-of-two scale, and the integer partial sums are order-independent.
    Factored out of :func:`lloyd_refine` so tools/explain_plans.py can
    assert the shape (the textops._pack_layout precedent)."""
    import pyarrow as pa

    cv_arr = np.array([cvn for _, cvn in rows], dtype=np.float64)
    k, dim = cv_arr.shape

    def gen(batches):
        for b in batches:
            mat = _emb_batch_matrix(b.column(0))
            if mat.shape[0] == 0:
                continue
            bi = _assign_batch(mat, cv_arr)
            q = np.floor(mat * _QSCALE).astype(np.int64)
            sums = np.zeros((k, dim), dtype=np.int64)
            cnts = np.zeros(k, dtype=np.int64)
            np.add.at(sums, bi, q)
            np.add.at(cnts, bi, 1)
            nz = np.nonzero(cnts)[0]  # only clusters with members
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(nz, dim).astype(np.int32)),
                    pa.array(np.tile(np.arange(dim, dtype=np.int32), len(nz))),
                    pa.array(sums[nz].reshape(-1)),
                    pa.array(np.repeat(cnts[nz], dim)),
                ],
                ["cidx", "pos", "s", "n"],
            )

    return (
        emb.select(vec_col)
        .mapInArrow(gen, "cidx int, pos int, s long, n long")
        .groupBy("cidx", "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )


def lloyd_refine(
    emb: DataFrame,
    cents: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Refine IVF centroids with ``iters`` Lloyd (k-means) rounds, entirely
    in-plan: broadcast-assign each vector to its max-dot centroid, average
    the members per centroid, renormalize. Returns (cid, cvn) like
    :func:`ivf_centroids`.

    Deterministic and ENGINE-PORTABLE arithmetic: each member component is
    quantized to fixed point (``floor(x * 2^20)`` — the scale is a power of
    two, so the multiply is exact) and the mean is an INTEGER sum divided
    back out. Integer sums are order-independent, so the refined centroids
    are bit-identical regardless of partitioning — and re-derivable in
    portable SQL (the ann_ivf_topk oracle replays the same rounds in
    DuckDB). A float64 mean would depend on summation order and could flip
    downstream argmax assignments between engines.

    Empty clusters keep their previous centroid (standard Lloyd fallback,
    mirrored in the oracle); a degenerate zero mean would too.

    Shape (r9): each round is ONE zero-exchange literal-argmax assignment
    projection (:func:`_assign_expr` — no crossJoin amplification, no
    window exchange carrying the embedding array) feeding ONE map-side-
    combined (cid, pos) aggregation whose output is bounded at k·dim rows
    and collected; the centroid update runs driver-side with the SAME
    IEEE arithmetic the old in-plan update used (double(s)/double(n)/2^20
    per component, sequential float64 norm² fold in pos order,
    x/sqrt(n²)) — results are bit-identical, and the per-round
    collect_list/array_sort shuffle is gone."""
    import math as _math

    spark = emb.sparkSession
    schema = cents.schema
    cid_type = schema["cid"].dataType
    cur = dict(_centroid_rows(cents))
    for _ in range(iters):
        rows = sorted(cur.items(), key=lambda t: t[0])
        comp = _lloyd_comp(emb, rows, cid_type, vec_col).collect()
        acc: dict = {}
        for r in comp:
            acc.setdefault(rows[r["cidx"]][0], {})[r["pos"]] = (int(r["s"]), int(r["n"]))
        for cid, comps in acc.items():
            # the old in-plan update, mirrored op for op: xc = (double)s /
            # (double)n / 2^20, n2 = sequential fold of xc², cvn = xc/√n2
            xs = [
                float(comps[p][0]) / float(comps[p][1]) / _QSCALE
                for p in range(len(comps))
            ]
            n2 = 0.0
            for x in xs:
                n2 += x * x
            if n2 > 0:
                rt = _math.sqrt(n2)
                cur[cid] = [x / rt for x in xs]
            # else: empty/degenerate cluster keeps its previous centroid
    import pandas as _pd

    # Arrow-backed local relation (float64 bits survive pandas untouched);
    # a python-list createDataFrame would pay one Python-worker task per
    # partition on every downstream action (the codebooks-write finding)
    ordered = sorted(cur.items(), key=lambda t: t[0])
    return spark.createDataFrame(
        _pd.DataFrame(
            {"cid": [c for c, _ in ordered], "cvn": [v for _, v in ordered]}
        ),
        schema,
    )


def kmeans_parallel_seeds(
    emb: DataFrame,
    k: int,
    rounds: int = 2,
    oversample: int | None = None,
    seed: int = 42,
    lloyd_rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-means|| seeding (Bahmani et al. 2012, spherical variant) — the
    quality upgrade over the hash-ordered sample for larger k / skewed
    corpora, fully DETERMINISTIC:

    - each round scores every vector's cost (1 − max dot against the
      current candidate set, candidates broadcast) and keeps vectors whose
      md5-derived 52-bit uniform u(id, round) falls below
      ``oversample · cost / total_cost`` — costs are integerized
      (floor(cost·2^20)) so the total is an exact integer sum and the
      sampling decision is identical under any partitioning or engine;
    - the ~``rounds · oversample`` candidates (small by construction) are
      weighted by their nearest-assignment counts and reduced driver-side
      in numpy: weighted farthest-point init + ``lloyd_rounds`` weighted
      Lloyd steps (all argmax/argmin ties broken by candidate order —
      deterministic).

    Returns (cid, cvn) like :func:`ivf_centroids` (cid = 0..k-1), ready
    for :func:`lloyd_refine` / :func:`write_ivf_index` via ``cents=``.
    Only the BOUNDED candidate set is ever collected.
    """
    import numpy as np

    emb = valid_embeddings(emb, vec_col)
    l = oversample or 2 * k
    v = as_double(vec_col)
    nrm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    norm = emb.select(
        F.col(id_col).alias("__id"), F.transform(v, lambda x: x / nrm).alias("__nv")
    ).cache()
    first = norm.orderBy(F.md5(F.col("__id").cast("string")), "__id").limit(1).collect()
    if not first:
        raise ValueError("cannot seed from an empty input")
    # keep the RAW id value (ADVICE r3): it is only used for set
    # membership and deterministic sorting, so string/any-type id_col works
    cands = [(first[0]["__id"], list(first[0]["__nv"]))]

    def _cost_q(cand_vecs):
        # integerized spherical cost: floor((1 - max dot) * 2^20) ≥ 0.
        # candidates are a bounded DRIVER list, so the per-round cost is a
        # zero-exchange literal projection (array_max over k literal dots
        # ≡ the old crossJoin + groupBy(max) — same doubles, same max),
        # never a k×-row shuffle of the normalized vectors (r9). SQL-string
        # built, not Column-API — see _assign_expr (py4j per-literal cost).
        cvs = ", ".join(
            "array(" + ", ".join(_sql_flit(x) for x in cv) + ")" for cv in cand_vecs
        )
        best = F.expr(
            f"array_max(transform(array({cvs}), cv -> aggregate(zip_with(__nv, cv,"
            " (x, y) -> x * y), 0.0D, (s, x) -> s + x)))"
        )
        return norm.select("__id", "__nv", best.alias("__best")).withColumn(
            "__cq", F.floor((F.lit(1.0) - F.col("__best")) * F.lit(float(1 << 20))).cast("long")
        )

    spark = emb.sparkSession
    for r in range(rounds):
        scored = _cost_q([c[1] for c in cands]).cache()
        total = scored.agg(F.sum("__cq")).first()[0] or 0
        if total == 0:  # every point coincides with a candidate
            break
        # u(id, round) as an exact 52-bit fraction from md5 — deterministic
        # under any partitioning; compare u < l·cost/total in double over
        # EXACT integer inputs (same result everywhere)
        u = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("__id"), F.lit(r), F.lit(seed))), 1, 13),
            16, 10,
        ).cast("long") / F.lit(float(1 << 52))
        picked = scored.filter(
            u < F.lit(float(l)) * F.col("__cq") / F.lit(float(total))
        ).select("__id", "__nv").collect()
        scored.unpersist()
        have = {c[0] for c in cands}
        for row in sorted(picked, key=lambda x: x["__id"]):
            if row["__id"] not in have:
                cands.append((row["__id"], list(row["__nv"])))
    # weights: how many corpus points are nearest to each candidate — the
    # same zero-exchange literal argmax as ivf_assign (keep-first fold over
    # ci-ascending candidates ≡ row_number over (dot DESC, ci)), then one
    # bounded map-side-combined count (r9: no k×-vector window shuffle)
    from pyspark.sql.types import LongType

    nearest = (
        norm.select(
            _assign_expr(
                "__nv", [(i, c[1]) for i, c in enumerate(cands)], LongType()
            ).alias("ci")
        )
        .groupBy("ci")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wmap = {r["ci"]: r["w"] for r in nearest.collect()}
    norm.unpersist()
    C = np.array([c[1] for c in cands], dtype=np.float64)
    wts = np.array([wmap.get(i, 0) for i in range(len(cands))], dtype=np.float64)
    # driver-side deterministic reduction of the small weighted candidate set
    chosen = [0]  # candidate 0 is the deterministic initial seed
    for _ in range(1, min(k, len(cands))):
        best = C[chosen] @ C.T  # (chosen, n)
        cost = (1.0 - best.max(axis=0)) * wts
        cost[chosen] = -1.0
        chosen.append(int(np.argmax(cost)))  # first max wins: deterministic
    seeds = C[chosen].copy()
    for _ in range(lloyd_rounds):
        a = np.argmax(seeds @ C.T, axis=0)  # assign candidates to seeds
        for j in range(len(seeds)):
            m = a == j
            if wts[m].sum() > 0:
                s = (C[m] * wts[m, None]).sum(axis=0)
                n2 = float(s @ s)
                if n2 > 0:
                    seeds[j] = s / np.sqrt(n2)
    import pandas as _pd

    return spark.createDataFrame(
        _pd.DataFrame(
            {
                "cid": [int(j) for j in range(len(seeds))],
                "cvn": [[float(x) for x in seeds[j]] for j in range(len(seeds))],
            }
        ),
        "cid long, cvn array<double>",
    )


def _write_salt_col(spark: SparkSession, id_col: str) -> F.Column:
    """Deterministic salt for clustering index rows before a
    ``partitionBy`` write: ``pmod(xxhash64(id), ceil(P / 16))`` adds
    enough distinct (centroid, salt) groups to keep writer parallelism
    near the shuffle partition count P (k alone would collapse the
    corpus onto k writer tasks at scale), while each group still lands
    whole in one task → one coherent output file per group. Deterministic
    (never rand() — the SPARK-38388 retry trap) and AQE-coalescible on
    small inputs."""
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(max(1, (p + 15) // 16)))


def write_ivf_index(
    emb: DataFrame,
    path: str,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
    cents: DataFrame | None = None,
    materialize_input: bool = True,
) -> None:
    """Materialize the IVF index: rows partitioned by assigned centroid
    (probes prune to ``nprobe`` directories) + the centroid table beside it.
    Written once, probed many times. Seeds are the deterministic hash-
    ordered sample (:func:`ivf_centroids`) — or pass ``cents=`` (e.g.
    :func:`kmeans_parallel_seeds` for larger k / skewed corpora) — refined
    by ``lloyd_iters`` in-plan k-means rounds (:func:`lloyd_refine`;
    0 = raw seeds).

    ``materialize_input`` (default True): the (id, vec) projection feeds
    seeds + every Lloyd round + the final assignment — 2+lloyd_iters full
    passes. When the input is a DERIVED relation (a fixture transform, a
    filtered join) each pass re-executes its subtree, so the projection is
    eagerly localCheckpointed once (CLAUDE.md materialize-before-fanout).
    Pass False when ``emb`` is a bare columnar scan at cluster scale —
    re-scanning pruned parquet is cheaper than writing a corpus
    checkpoint."""
    emb = valid_embeddings(emb, vec_col)
    if materialize_input:
        emb = emb.select(id_col, vec_col).localCheckpoint(eager=True)
    if cents is None:
        cents = ivf_centroids(emb, k, id_col, vec_col)
    if lloyd_iters:
        cents = lloyd_refine(emb, cents, lloyd_iters, id_col, vec_col)
    cents.write.mode("overwrite").parquet(path + "_centroids")
    # cluster rows by centroid before partitionBy (each (centroid, salt)
    # group lands whole in one task → one coherent file per group instead
    # of tasks×k slivers); the salt keeps writer parallelism ≈ the shuffle
    # partition count instead of collapsing the whole corpus onto k writer
    # tasks (guide §2.5/§6). This ONE vector shuffle replaces the old
    # window exchange that moved k× amplified vector rows.
    ivf_assign(emb, cents, id_col, vec_col).repartition(
        F.col("centroid"), _write_salt_col(emb.sparkSession, id_col)
    ).write.mode("overwrite").partitionBy("centroid").parquet(path)


def ivf_topk(
    spark: SparkSession,
    index_path: str,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: rank centroids against the query driver-side (k tiny dot
    products, sequential float64 fold — same arithmetic as the in-plan
    assignment), read ONLY the ``nprobe`` best centroid partitions
    (directory pruning), exact-re-score candidates. Precision 1; recall
    grows with nprobe (measured vs brute force in tests)."""
    _require_valid_query(query_vec)
    cents = spark.read.parquet(index_path + "_centroids").collect()
    q = [float(x) for x in query_vec]
    ranked = sorted(((-_seq_dot(q, r["cvn"]), r["cid"]) for r in cents))
    probe_cids = [cid for _, cid in ranked[:nprobe]]
    cand = spark.read.parquet(index_path).filter(F.col("centroid").isin(probe_cids))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ivf_topk_batch(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BATCH IVF probe: many query vectors against a materialized IVF index
    in ONE plan — no per-query driver round-trips (VERDICT r5 #3: the
    single-query :func:`ivf_topk` ranks centroids driver-side, which a
    million-query workload cannot afford).

    Shape (mirrors :func:`lsh_cosine_topk_batch`): the tiny centroid table
    is broadcast against the query set and a per-query window keeps the
    ``nprobe`` best centroids — the probe list is ``|queries| × nprobe``
    rows, built entirely in-plan. That list broadcast-joins the index on
    ``centroid`` (the partition key), so Catalyst's dynamic partition
    pruning reads ONLY the union of probed centroid directories
    (plan-asserted: ``dynamicpruningexpression`` in the scan's
    PartitionFilters). Candidates get exact double re-scoring; per-query
    top-k via row_number over (cosine DESC, id). Returns
    (query_id, vec_id, cosine) with cosine rounded to 9dp.

    Same contract as every embedding operator: invalid query vectors
    (NULL / zero norm / non-finite / absurd magnitude) drop out and return
    no rows. Recall per query is identical to :func:`ivf_topk` at the same
    ``nprobe`` (same centroid ranking, same candidate lists — tested equal
    on the clustered fixture).

    At 10^12 rows: the index scan is pruned to ``≤ |queries| × nprobe``
    directories, the probe side stays broadcast-sized (queries × nprobe ×
    dim doubles), and the only exchange over candidate rows is the
    per-query top-k window — candidates, never the corpus.
    """
    from pyspark.sql import Window as W

    cents = spark.read.parquet(index_path + "_centroids")  # (cid, cvn): k rows
    qv = as_double(vec_col)
    q = valid_embeddings(queries, vec_col).select(
        F.col(query_id_col), qv.alias("__qv"), _norm(qv).alias("__qn")
    )
    wq = W.partitionBy(query_id_col).orderBy(F.desc("__d"), "cid")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("__d", _dot(F.col("__qv"), F.col("cvn")))
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id_col, "__qv", "__qn", F.col("cid").alias("centroid"))
    )
    idx = spark.read.parquet(index_path)
    cv = as_double(vec_col)
    wk = W.partitionBy(query_id_col).orderBy(F.desc("cosine"), id_col)
    return (
        idx.join(F.broadcast(probes), "centroid")
        .withColumn(
            "cosine", F.round(_dot(cv, F.col("__qv")) / (_norm(cv) * F.col("__qn")), 9)
        )
        .withColumn("__kn", F.row_number().over(wk))
        .filter(F.col("__kn") <= k)
        .select(query_id_col, id_col, "cosine")
    )


def lsh_cosine_topk_batch(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    hamming_probe: int = 2,
    seed: int = 42,
    dim: int | None = None,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """BATCH approximate top-k: many query vectors at once — the realistic
    at-scale ANN shape (per-query driver round-trips don't survive a
    million queries).

    Both sides get in-plan sign-LSH signatures from the same hyperplanes;
    each query explodes to its Hamming ball (``sum_{i<=r} C(n_planes, i)``
    probe signatures — tiny for 8-16 bits) and equi-joins the corpus on
    the signature — a plain keyed join, never a cross join. Candidates get
    exact double re-scoring; per-query top-k via row_number over
    (score DESC, id). Returns (query_id, vec_id, cosine) with cosine
    rounded to 9dp (rank-stable across engines).

    Precision 1 per returned row; recall per query follows the probe
    radius exactly like :func:`lsh_cosine_topk` (same buckets — tested
    equal to the per-query variant).

    ``max_bucket_size``: a degenerate corpus signature bucket (near-zero
    vectors, dataset-wide modes) multiplies against EVERY query probing
    it. Setting a cap drops corpus buckets with more members before the
    join (graceful recall degradation, same trade as the LSH pair caps);
    ``None`` keeps exact multiprobe semantics.
    """
    from pyspark.sql import Window as W

    # invalid vectors (zero norm / NaN / Inf) drop out on BOTH sides: an
    # invalid query returns no rows, an invalid corpus row is never a
    # candidate — same contract as the single-query paths
    queries = valid_embeddings(queries, vec_col)
    corpus = valid_embeddings(corpus, vec_col)
    if dim is None:
        rows = corpus.select(vec_col).head(1)
        if not rows:
            return corpus.sparkSession.createDataFrame(
                [], f"{query_id_col} long, {id_col} long, cosine double"
            )
        dim = len(rows[0][0])
    planes = hyperplanes(dim, n_planes, seed)
    # Hamming-ball XOR masks are query-independent: ball(sig) = sig ^ mask
    masks = hamming_ball(0, n_planes, hamming_probe)
    qv = as_double(vec_col)
    q = queries.select(
        F.col(query_id_col),
        qv.alias("__qv"),
        _norm(qv).alias("__qn"),
        sig_expr(vec_col, planes).alias("__qsig"),
    )
    probes = q.select(
        query_id_col,
        "__qv",
        "__qn",
        F.explode(
            F.array(*[F.col("__qsig").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("__sig"),
    )
    cv = as_double(vec_col)
    c = corpus.select(
        F.col(id_col),
        cv.alias("__cv"),
        _norm(cv).alias("__cn"),
        sig_expr(vec_col, planes).alias("__sig"),
    )
    if max_bucket_size is not None:
        c = c.withColumn(
            "__bsz", F.count(F.lit(1)).over(W.partitionBy("__sig"))
        ).filter(F.col("__bsz") <= max_bucket_size).drop("__bsz")
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine"), id_col)
    return (
        probes.join(c, "__sig")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 9),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col, "cosine")
    )


def lsh_cosine_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    n_planes: int = 8,
    hamming_probe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sig_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: restrict exact scoring to vectors whose sign-LSH
    signature is within ``hamming_probe`` bits of the query's (multi-probe
    LSH). Precision 1 (exact re-score); recall grows with the probe radius.

    If ``sig_col`` names a precomputed signature column (see
    :func:`with_lsh_signature` / :func:`write_signature_table`), it is used
    directly; otherwise the signature is computed in-plan (ad-hoc mode —
    fine for one-off queries, but repeated probes should materialize the
    signature table and use :func:`lsh_cosine_topk_indexed`)."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qsig = query_signature(query_vec, planes)
    sig = F.col(sig_col) if sig_col else sig_expr(vec_col, planes)
    cand = emb.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= hamming_probe
    )
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------------------
# IVF + product quantization (IVFPQ — Jégou et al. 2011): the 100-TB
# embedding story. The index stores n_sub 4-bit-ish codes per vector
# (here 8×log2(16) = 4 bytes vs 512 bytes of raw float64), partitioned by
# the IVF coarse centroid; a probe reads ONLY the nprobe best centroid
# directories and ONLY the codes column, ranks candidates by asymmetric
# distance computed from a tiny per-query lookup table, then exact-rescores
# a bounded shortlist. PQ codes quantize the RESIDUAL (vector − its coarse
# centroid), the variant that keeps the codebooks sharp once IVF has
# removed the between-cluster variance.
#
# Everything downstream of the (already gate-proven) float centroid chain
# is INTEGER arithmetic, hence engine-exact and oracle-replayable with zero
# literals: residuals quantize to floor((x − c)·2^20) BIGINTs (exact
# power-of-two multiply, IEEE-identical subtraction), subspace Lloyd
# training assigns by exact integer squared-L2 argmin (ties → smallest
# code) and updates centroids by floor-divided exact integer sums, and the
# ADC score is a pure BIGINT dot-product sum. No float enters any ordering
# except the final exact re-score (ROUND(·, 9) — the repo's pinned cosine
# contract).
#
# Scale shape: training = iters × (one zero-join codes projection over
# literal codebooks + ONE (sub, pos, code) exchange, map-side combined,
# output bounded at n_sub·ksub·dsub rows); encoding = a zero-shuffle
# projection; probing = partition-pruned codes-only scan + literal-LUT
# projection + TakeOrderedAndProject. Only bounded artifacts (codebooks,
# per-query LUTs, the shortlist) ever reach the driver.

#: fixed-point scale for PQ residual quantization (2^20 — exact multiply).
PQ_QSCALE = 1 << 20

#: per-component clamp on the first-stage quantization floor(x·2^20): the
#: validity contract admits norm² ≤ 1e12 (a component up to 1e6, x0² ≈
#: 1.1e24 ≫ 2^63), so the exact-BIGINT norm² would overflow — wrapping in
#: Spark, raising in DuckDB (a cross-engine divergence on contract-valid
#: input). Clamping x0 to ±2^26 bounds Σx0² ≤ dim·2^52 — inside int64 for
#: any dim ≤ 2048 (the r4 rule: "finite" is not "quantizable" — bound the
#: domain before integerizing, relops._finite_val precedent). |x| ≤ 63 is
#: unaffected (any sane embedding); absurd-magnitude vectors get
#: deterministic garbage-but-defined codes, identically in both engines
#: (the clamp expression is mirrored verbatim in the oracle).
PQ_X0_CLAMP = 1 << 26


def _pq_chunk(col: str, s: int, dsub: int) -> str:
    """1-based slice of subspace ``s`` from a flat array column."""
    return f"slice({col}, {s * dsub + 1}, {dsub})"


def _pq_dist_expr(rq_col: str, cb_sub: list, s: int, dsub: int) -> str:
    """Integer squared-L2 distances of one vector's subspace chunk against
    every code of ``cb_sub`` (a python list of ksub dsub-length int lists),
    as an in-plan array expression over LITERAL codebooks (the hyperplane-
    literal pattern — codebooks are tiny constants at any corpus size).
    zip_with over a slice references the array once per row (CLAUDE.md r3:
    never transform(sequence) over an expensive alias)."""
    lits = ", ".join(
        "array(" + ", ".join(f"{int(x)}L" for x in code) + ")" for code in cb_sub
    )
    return (
        f"transform(array({lits}), cb -> aggregate(zip_with("
        f"{_pq_chunk(rq_col, s, dsub)}, cb, (x, y) -> (x - y) * (x - y)),"
        " 0L, (a, t) -> a + t))"
    )


def _pq_codes_expr(rq_col: str, codebooks: list, dsub: int) -> str:
    """codes array (one int per subspace): argmin of the integer distance
    array via ONE keep-first fold — ``acc.ix = -1`` admits the first
    element, strict ``<`` keeps the first minimum thereafter, so the
    result equals the old ``array_position(d, array_min(d)) - 1``
    (first-minimum tie-break == smallest code) while referencing the
    ksub-distance array ONCE instead of twice (r9: the duplicated
    ``{d}`` alias used to double both the codegen size and the per-row
    distance work of every training/encode pass)."""
    parts = []
    for s, cb_sub in enumerate(codebooks):
        d = _pq_dist_expr(rq_col, cb_sub, s, dsub)
        parts.append(
            f"aggregate(zip_with({d}, sequence(0, {len(cb_sub) - 1}),"
            " (x, i) -> named_struct('dv', x, 'ix', i)),"
            " named_struct('dv', CAST(NULL AS BIGINT), 'ix', -1),"
            " (acc, e) -> IF(acc.ix = -1 OR e.dv < acc.dv, e, acc)).ix"
        )
    return "array(" + ", ".join(parts) + ")"


def _rq_batch_matrix(col, dim: int) -> "np.ndarray":
    """A pyarrow list<int64> column as a dense (B, dim) int64 matrix.
    The quantized-residual contract is fixed-dim, non-null rows; anything
    else fails fast (the in-plan slice path would emit undefined garbage
    codes for ragged rows — a crash beats silent corruption here)."""
    if col.null_count:
        raise ValueError("rq batch contains NULL rows/elements")
    import pyarrow.compute as pc

    lens = pc.list_value_length(col)
    import pyarrow as pa

    if len(col) and not pc.all(
        pc.equal(lens, pa.scalar(dim, type=lens.type))
    ).as_py():
        raise ValueError(f"rq rows must all have dim {dim}")
    flat = col.flatten()
    if flat.null_count:
        raise ValueError("rq batch contains NULL elements")
    return flat.to_numpy(zero_copy_only=False).reshape(-1, dim)


def _pq_codes_batch(mat: "np.ndarray", cb_arr: "np.ndarray") -> "np.ndarray":
    """Vectorized integer PQ encoding of a (B, dim) residual matrix against
    (n_sub, ksub, dsub) int64 codebooks: exact int64 squared-L2 per code,
    ``np.argmin`` first-minimum tie-break == smallest code — value-for-value
    the :func:`_pq_codes_expr` in-plan argmin (pinned by
    test_pq_codes_batch_equals_expr). Integer arithmetic is
    order-independent, so this is bit-exact under any batching."""
    n_sub, ksub, dsub = cb_arr.shape
    b = mat.shape[0]
    codes = np.empty((b, n_sub), dtype=np.int64)
    for s in range(n_sub):
        x = mat[:, s * dsub:(s + 1) * dsub]
        diff = x[:, None, :] - cb_arr[s][None, :, :]
        codes[:, s] = (diff * diff).sum(axis=2).argmin(axis=1)
    return codes


def pq_encode_codes(
    rq_df: DataFrame, codebooks: list, id_col: str = "vec_id"
) -> DataFrame:
    """(id, centroid, codes) via ONE vectorized Arrow pass: the encode is
    pure-integer work (guide §4.2 — batches to numpy beat interpreted
    per-element HOF lambdas; measured 6.9 s → sub-second for the 100k-row
    encode pass), bit-identical to the in-plan expression by the integer
    argument above. Narrow map, zero shuffle."""
    import pyarrow as pa

    cb_arr = np.array(codebooks, dtype=np.int64)
    n_sub, _, dsub = cb_arr.shape
    dim = n_sub * dsub
    src = rq_df.select(id_col, "centroid", "rq")
    id_f, cent_f = src.schema[id_col], src.schema["centroid"]
    out_schema = (
        f"{id_f.name} {id_f.dataType.simpleString()}, "
        f"centroid {cent_f.dataType.simpleString()}, codes array<int>"
    )

    def gen(batches):
        for b in batches:
            mat = _rq_batch_matrix(b.column(2), dim)
            codes = _pq_codes_batch(mat, cb_arr).astype(np.int32)
            nrows = codes.shape[0]
            offsets = pa.array(
                np.arange(0, (nrows + 1) * n_sub, n_sub, dtype=np.int32)
            )
            codes_arr = pa.ListArray.from_arrays(
                offsets, pa.array(codes.reshape(-1), type=pa.int32())
            )
            yield pa.RecordBatch.from_arrays(
                [b.column(0), b.column(1), codes_arr],
                [id_f.name, "centroid", "codes"],
            )

    return src.mapInArrow(gen, out_schema)


def _pq_component_partials(
    rq_df: DataFrame, codebooks: list
) -> DataFrame:
    """Per-batch (sub, code, pos, s, n) component partials for one PQ Lloyd
    update round, computed vectorized (np.add.at scatter) — the manual
    map-side combine: each Arrow batch ships at most n_sub·ksub·dsub
    bounded partial rows instead of posexploding dim× corpus rows through
    the aggregation (r9; exact-integer sums are order-independent, so the
    merged totals are bit-identical to the exploded groupBy)."""
    import pyarrow as pa

    cb_arr = np.array(codebooks, dtype=np.int64)
    n_sub, ksub, dsub = cb_arr.shape
    dim = n_sub * dsub

    def gen(batches):
        for b in batches:
            mat = _rq_batch_matrix(b.column(0), dim)
            codes = _pq_codes_batch(mat, cb_arr)
            sums = np.zeros((n_sub, ksub, dsub), dtype=np.int64)
            cnts = np.zeros((n_sub, ksub), dtype=np.int64)
            for s in range(n_sub):
                np.add.at(sums[s], codes[:, s], mat[:, s * dsub:(s + 1) * dsub])
                np.add.at(cnts[s], codes[:, s], 1)
            nz = np.nonzero(cnts)  # only groups with members, like the groupBy
            subs, cods = nz
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(subs, dsub).astype(np.int32)),
                    pa.array(np.repeat(cods, dsub).astype(np.int32)),
                    pa.array(np.tile(np.arange(dsub, dtype=np.int32), len(subs))),
                    pa.array(sums[subs, cods].reshape(-1)),
                    pa.array(np.repeat(cnts[subs, cods], dsub)),
                ],
                ["sub", "code", "pos", "s", "n"],
            )

    return rq_df.select("rq").mapInArrow(
        gen, "sub int, code int, pos int, s long, n long"
    )


def _xq_arrow(
    emb: DataFrame, rows: list, id_col: str, vec_col: str
) -> DataFrame:
    """(id, cidx, __xq): assignment + the engine-exact normalized-quantized
    domain in ONE vectorized Arrow pass — every step has an exact numpy
    counterpart of the in-plan expression chain (pinned transitively by the
    bit-dump equivalence): the float64 dot is the sequential fold
    (:func:`_assign_batch`), floor(x·2^20) is an exact power-of-two scale,
    the clamp bounds the exact int64 norm², int64→double rounds to nearest
    in both engines, np.sqrt/np.floor are IEEE, and np.floor_divide FLOORS
    exactly like the guarded in-plan division. Returns the centroid as its
    INDEX into the cid-ascending ``rows`` (the caller re-attaches the cid
    value as a literal lookup — type-agnostic)."""
    import pyarrow as pa

    cv_arr = np.array([cvn for _, cvn in rows], dtype=np.float64)
    S = float(PQ_QSCALE)
    B = PQ_X0_CLAMP
    id_f = emb.schema[id_col]

    def gen(batches):
        for b in batches:
            mat = _emb_batch_matrix(b.column(1))
            if mat.shape[0] == 0:
                continue
            bi = _assign_batch(mat, cv_arr)
            x0 = np.clip(np.floor(mat * S), -float(B), float(B)).astype(np.int64)
            n2 = (x0 * x0).sum(axis=1)
            r = np.maximum(
                np.int64(1), np.floor(np.sqrt(n2.astype(np.float64))).astype(np.int64)
            )
            xq = np.floor_divide(x0 * PQ_QSCALE, r[:, None])
            nrows, dim = xq.shape
            offsets = pa.array(np.arange(0, (nrows + 1) * dim, dim, dtype=np.int32))
            xq_arr = pa.ListArray.from_arrays(offsets, pa.array(xq.reshape(-1)))
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pa.array(bi.astype(np.int32)), xq_arr],
                [id_f.name, "cidx", "__xq"],
            )

    return emb.select(id_col, vec_col).mapInArrow(
        gen, f"{id_f.name} {id_f.dataType.simpleString()}, cidx int, __xq array<bigint>"
    )


def pq_residuals(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """((id, centroid, rq), (centroid, cmq)): IVF-assign each vector (the
    gate-proven float max-dot argmax on the NORMALIZED cvn), then move to
    the quantized-integer domain and never leave it: xq =
    floor(x·2^20) per component (exact multiply), cmq[centroid] = the
    per-list component-wise floor-divided EXACT integer mean of its
    members' xq (one map-side-combined (centroid, pos) exchange, output
    bounded at k·dim rows), residual rq = xq − cmq — pure BIGINT
    subtraction, no float arithmetic anywhere downstream.

    Residuals against the MEAN (not the unit-normalized cvn) is the
    actual IVFPQ construction: subtracting cvn leaves nearly the whole
    cluster offset in the residual, every list member then quantizes to
    the same codes, and ADC cannot rank within a list (the bug this
    docstring's shape fixed).

    The quantized domain holds NORMALIZED vectors, so the ADC inner
    product approximates COSINE (the metric every ranking in this module
    uses — raw-IP ADC ranks within a list by noise·center, nearly
    orthogonal to cosine). Normalization is engine-exact end to end:
    x0 = floor(x·2^20) (exact multiply) clamped to ±PQ_X0_CLAMP (else a
    contract-valid giant component overflows the exact norm² — see the
    constant's comment), n2 = Σ x0² (exact BIGINT),
    r = floor(sqrt(n2)) — sqrt of an int-valued double ≤ 2^53 is
    IEEE-correctly-rounded, identical everywhere — and
    xq = floordiv(x0·2^20, r), so xq ≈ unit-norm at scale 2^20 with zero
    float comparisons. r is clamped to ≥ 1: a valid-contract vector with
    norm < ~2^-10 quantizes to near-zero x0 and earns deterministic
    (garbage-but-defined) codes rather than a divide-by-zero."""
    # ONE vectorized Arrow pass computes assignment + the whole quantized
    # domain (r9 — the interpreted per-element chain dominated this pass;
    # exact-semantics argument in _xq_arrow); the centroid VALUE re-attaches
    # as a literal index lookup (type-agnostic, zero shuffle)
    rows = _centroid_rows(cents)
    ct = cents.schema["cid"].dataType.simpleString()
    cid_arr = "array(" + ", ".join(_sql_cid_lit(c, ct) for c, _ in rows) + ")"
    xq = (
        _xq_arrow(emb, rows, id_col, vec_col)
        .selectExpr(
            id_col, f"element_at({cid_arr}, cidx + 1) AS centroid", "__xq"
        )
        .localCheckpoint(eager=True)
    )
    cmq = (
        xq.select("centroid", F.posexplode("__xq").alias("pos", "q"))
        .groupBy("centroid", "pos")
        .agg(F.expr("CAST(sum(q) AS BIGINT) AS s"), F.count(F.lit(1)).alias("n"))
        .groupBy("centroid")
        .agg(
            # exact BIGINT floor division (Spark div truncates toward zero
            # where python/DuckDB floor — the CLAUDE.md div-vs-floor trap,
            # here on genuinely-negative component sums)
            F.expr(
                "transform(array_sort(collect_list(struct(pos, s, n))),"
                " p -> CAST(p.s div p.n - (CASE WHEN p.s % p.n != 0"
                " AND p.s < 0 THEN 1 ELSE 0 END) AS BIGINT))"
            ).alias("cmq")
        )
        # bounded k-row relation feeding ≥2 consumers (the rq broadcast
        # join and the _cmeans write): without the eager checkpoint each
        # consumer re-runs the full corpus-sized xq aggregation (r9 —
        # materialize-before-fanout, CLAUDE.md r6 rule)
        .localCheckpoint(eager=True)
    )
    rq = (
        xq.join(F.broadcast(cmq), "centroid")
        .select(
            id_col,
            "centroid",
            F.expr("zip_with(__xq, cmq, (a, b) -> a - b)").alias("rq"),
        )
    )
    return rq, cmq


def pq_train_codebooks(
    rq_df: DataFrame,
    n_sub: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
) -> list:
    """Train per-subspace codebooks over quantized residuals with pure
    INTEGER Lloyd rounds — deterministic under any partitioning/engine:

    - seeds: subspace chunks of the ``ksub`` hash-ordered (md5(id), id)
      sample rows (the ivf_centroids discipline);
    - assign: exact integer squared-L2 argmin, ties → smallest code;
    - update: per-(sub, code, pos) EXACT BIGINT component sums (one
      map-side-combined exchange, output bounded at n_sub·ksub·dsub rows),
      floor-divided driver-side with python ``//`` (which FLOORS —
      DuckDB ``//`` and Spark ``div`` truncate toward zero, so the SQL
      oracle carries the guarded ``- (CASE WHEN rem != 0 AND neg)``
      correction to match); empty codes keep their previous centroid.

    Returns python lists: codebooks[s][c] = dsub ints (bounded driver
    artifact, n_sub·ksub·dsub values)."""
    seeds = (
        rq_df.orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(ksub)
        .select("rq")
        .collect()
    )
    # dim comes from the seed rows themselves — the old separate
    # `.first()` probe was one more full job over the (checkpointed)
    # residuals for a value the seeds already carry (r9)
    if not seeds:
        raise ValueError("cannot train PQ codebooks on an empty input")
    dim = len(seeds[0]["rq"])
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    dsub = dim // n_sub
    if len(seeds) < ksub:
        raise ValueError(f"need >= {ksub} rows to seed {ksub} codes")
    codebooks = [
        [[int(x) for x in r["rq"][s * dsub:(s + 1) * dsub]] for r in seeds]
        for s in range(n_sub)
    ]
    for _ in range(iters):
        # vectorized assign + per-batch scatter partials (exact integer
        # sums under any batching), merged by one bounded aggregation —
        # replaces the dim×-corpus posexplode + the interpreted
        # per-element distance lambdas (r9; guide §4.2)
        sums = (
            _pq_component_partials(rq_df, codebooks)
            .groupBy("sub", "code", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        acc = {}
        for r in sums:
            acc[(r["sub"], r["code"], r["pos"])] = (int(r["s"]), int(r["n"]))
        for s in range(n_sub):
            for c in range(ksub):
                if (s, c, 0) in acc:
                    codebooks[s][c] = [
                        acc[(s, c, d)][0] // acc[(s, c, d)][1] for d in range(dsub)
                    ]
    return codebooks


def write_ivf_pq_index(
    emb: DataFrame,
    path: str,
    k: int = 16,
    n_sub: int = 8,
    ksub: int = 16,
    lloyd_iters: int = 2,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
    materialize_input: bool = True,
) -> None:
    """Materialize the IVFPQ index: codes-only rows partitioned by coarse
    centroid (``(id, codes)`` — the embedding column never enters the
    index), plus the centroid table and the trained codebooks
    (``(sub, code, pos, q)`` long form) beside it.

    ``materialize_input``: same contract and rationale as
    :func:`write_ivf_index` (the input feeds seeds + lloyd_iters rounds +
    the residual-quantization pass)."""
    emb = valid_embeddings(emb, vec_col)
    if materialize_input:
        emb = emb.select(id_col, vec_col).localCheckpoint(eager=True)
    if cents is None:
        cents = ivf_centroids(emb, k, id_col, vec_col)
    if lloyd_iters:
        cents = lloyd_refine(emb, cents, lloyd_iters, id_col, vec_col)
    cents = cents.localCheckpoint(eager=True)
    rq, cmq = pq_residuals(emb, cents, id_col, vec_col)
    rq = rq.localCheckpoint(eager=True)
    try:
        codebooks = pq_train_codebooks(rq, n_sub, ksub, pq_iters, id_col)
    except ValueError as e:
        if "empty" in str(e):
            raise ValueError("cannot build an IVFPQ index over an empty input") from e
        raise
    spark = emb.sparkSession
    cents.write.mode("overwrite").parquet(path + "_centroids")
    cmq.write.mode("overwrite").parquet(path + "_cmeans")
    cb_rows = [
        (s, c, d, int(q))
        for s, cb_sub in enumerate(codebooks)
        for c, code in enumerate(cb_sub)
        for d, q in enumerate(code)
    ]
    # Arrow-backed local relation (pandas source): a plain python-list
    # createDataFrame parallelizes into defaultParallelism pickled
    # partitions and the write then runs one Python-worker task per
    # partition — measured 4.4s vs 0.4s for this 4096-row constant (r9).
    # Values are exact ints either way.
    import pandas as _pd

    spark.createDataFrame(
        _pd.DataFrame(cb_rows, columns=["sub", "code", "pos", "q"]),
        "sub int, code int, pos int, q long",
    ).coalesce(1).write.mode("overwrite").parquet(path + "_codebooks")
    # repartition on (centroid, salt) before partitionBy: without it
    # every task writes a sliver into every centroid directory (tasks ×
    # lists tiny files — the classic small-files write); with it each
    # (centroid, salt) group is one coherent file, and the salt keeps
    # writer parallelism near the shuffle partition count instead of
    # collapsing onto k tasks (r9; guide §2.5). The shuffle moves 8-byte
    # code rows, not embeddings, so it is cheap at any corpus size.
    # Encoding itself is the vectorized Arrow pass (pq_encode_codes).
    pq_encode_codes(rq, codebooks, id_col).repartition(
        F.col("centroid"), _write_salt_col(spark, id_col)
    ).write.mode("overwrite").partitionBy("centroid").parquet(path)


def pq_adc_shortlist(
    spark: SparkSession,
    index_path: str,
    query_vec,
    nprobe: int = 2,
    shortlist: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """The UN-checkpointed ADC shortlist frame (the pre-materialization
    builder, factored out so tools/explain_plans.py can assert the probe
    shape — the textops._pack_layout precedent): rank centroids
    driver-side (the ivf_topk discipline), scan ONLY the nprobe best
    centroid directories and ONLY the codes column, score each candidate
    by the integer asymmetric distance IP(q, c) + IP(q, r̃) — both terms
    BIGINT sums over the per-query lookup table (n_sub·ksub entries,
    computed driver-side and inlined as literals) — and keep the
    ``shortlist`` best (TakeOrderedAndProject)."""
    _require_valid_query(query_vec)
    q = [float(x) for x in query_vec]
    cents = spark.read.parquet(index_path + "_centroids").collect()
    ranked = sorted(((-_seq_dot(q, r["cvn"]), r["cid"]) for r in cents))
    probe = ranked[:nprobe]
    # the query enters the SAME engine-exact normalized-quantized domain
    # as pq_residuals: clamped floor products, exact integer norm², IEEE
    # isqrt, python // (floors — matches the in-plan guarded floordiv)
    x0 = [
        min(PQ_X0_CLAMP, max(-PQ_X0_CLAMP, math.floor(x * float(PQ_QSCALE))))
        for x in q
    ]
    r0 = max(1, math.floor(math.sqrt(float(sum(a * a for a in x0)))))
    qq = [(a * PQ_QSCALE) // r0 for a in x0]
    # IP(q, list MEAN) per probed list — exact ints at scale 2^40 (cmq is
    # the quantized mean the residuals were taken against). A probed
    # centroid with ZERO members has no cmq row AND no index directory:
    # its IP defaults to 0 and the partition filter reads nothing.
    means = {
        r["centroid"]: r["cmq"]
        for r in spark.read.parquet(index_path + "_cmeans").collect()
    }
    ip_cent = {
        cid: sum(a * b for a, b in zip(qq, means[cid])) if cid in means else 0
        for _, cid in probe
    }
    cb = spark.read.parquet(index_path + "_codebooks").collect()
    n_sub = max(r["sub"] for r in cb) + 1
    ksub = max(r["code"] for r in cb) + 1
    dsub = max(r["pos"] for r in cb) + 1
    lut = [[0] * ksub for _ in range(n_sub)]
    comp = {}
    for r in cb:
        comp[(r["sub"], r["code"], r["pos"])] = r["q"]
    for s in range(n_sub):
        for c in range(ksub):
            lut[s][c] = sum(
                qq[s * dsub + d] * comp[(s, c, d)] for d in range(dsub)
            )
    cand = spark.read.parquet(index_path).filter(
        F.col("centroid").isin([cid for _, cid in probe])
    )
    cent_term = "CASE " + " ".join(
        f"WHEN centroid = {cid} THEN {v}L" for cid, v in ip_cent.items()
    ) + " END"
    lut_terms = " + ".join(
        "element_at(array("
        + ", ".join(f"{v}L" for v in lut[s])
        + f"), element_at(codes, {s + 1}) + 1)"
        for s in range(n_sub)
    )
    return (
        cand.selectExpr(id_col, f"CAST({cent_term} + {lut_terms} AS BIGINT) AS adc_q")
        .orderBy(F.desc("adc_q"), id_col)
        .limit(shortlist)
    )


def ivf_pq_topk(
    spark: SparkSession,
    index_path: str,
    query_vec,
    k: int = 10,
    nprobe: int = 2,
    shortlist: int = 20,
    rescore_src: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFPQ probe: the pq_adc_shortlist frame, materialized (eager
    localCheckpoint — the bounded shortlist feeds two consumers), and,
    when ``rescore_src`` is given, exact-rescored against the full
    vectors (a bounded id-keyed broadcast lookup join) for the final
    top-k.

    Returns (path, id, adc_q): path='adc' = the integer-scored shortlist,
    path='refined' = the exact-rescored top-k (subset of the shortlist,
    carrying its adc_q). With ``rescore_src=None`` only the 'adc' rows."""
    q = [float(x) for x in query_vec]
    adc = pq_adc_shortlist(
        spark, index_path, query_vec, nprobe, shortlist, id_col
    ).localCheckpoint(eager=True)
    out = adc.select(F.lit("adc").alias("path"), id_col, "adc_q")
    if rescore_src is None:
        return out
    v = as_double(F.col(vec_col))
    ql = _qlit(q)
    # push the (bounded, already-materialized) shortlist ids into the
    # rescore scan as an isin filter: a bare broadcast join would still
    # SCAN the whole embeddings table to find ≤`shortlist` rows — the
    # isin predicate reaches the parquet reader (PushedFilters: In) and
    # row-group min/max statistics skip everything else. The join then
    # only reattaches adc_q.
    short_ids = [r[id_col] for r in adc.select(id_col).collect()]
    refined = (
        valid_embeddings(rescore_src.where(F.col(id_col).isin(short_ids)), vec_col)
        .join(F.broadcast(adc), id_col)
        # exactly cosine_topk's scoring expression (the proven ROUND(·, 9)
        # cross-engine parity contract)
        .withColumn("__cos", F.round(_dot(v, ql) / (_norm(v) * _norm(ql)), 9))
        .orderBy(F.desc("__cos"), id_col)
        .limit(k)
        .select(F.lit("refined").alias("path"), id_col, "adc_q")
    )
    return out.unionByName(refined)
