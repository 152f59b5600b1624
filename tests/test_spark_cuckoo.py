"""Distributed-semantics tests (SURVEY.md §5 item 3): build/merge/probe/
remove over real Spark DataFrames; merge-order and partition-count
invariance; no-false-negatives; exact deletion; sharding; exact-SQL oracle
equivalence (probe ≡ left-semi join)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.kernels.cuckoo import CuckooFilter, size_for
from sketchlib.spark.cuckoo import (
    CuckooSpec,
    ShardedCuckoo,
    build_filter,
    build_partials,
    merge_partials,
    probe,
    remove_keys,
    with_hash_fp,
)
from sketchlib.util import i64_to_u64, shard_of


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_shard_col_matches_kernel(spark):
    """The in-plan shard expression and the kernel shard fn must agree."""
    from sketchlib.spark.cuckoo import _shard_col

    df = spark.range(0, 1000).select(F.xxhash64("id").alias("h"))
    rows = df.withColumn("s", _shard_col("h", 7)).collect()
    h = i64_to_u64(np.array([r["h"] for r in rows], dtype=np.int64))
    expect = shard_of(h, 7)
    assert (expect == np.array([r["s"] for r in rows])).all()


@pytest.mark.parametrize("num_shards", [1, 4])
def test_build_probe_remove_end_to_end(spark, docs, num_shards):
    spec = CuckooSpec(
        name=f"docs16-{num_shards}", size=size_for(2000, 2), fpsize=2, num_shards=num_shards
    )
    merged = build_filter(docs, spec, key=F.col("doc_id").cast("string")).cache()
    sc = ShardedCuckoo.from_df(merged, spec)
    n_docs = docs.count()
    assert sc.count() == n_docs
    assert sc.rows == n_docs
    assert sc.dropped == 0
    assert not sc.is_broken() and not sc.is_toofull()

    # CF.CHECK: no false negatives on every inserted key
    probed = probe(docs, sc, key=F.col("doc_id").cast("string"))
    assert probed.filter(~F.col("member")).count() == 0
    # probe ≡ left-semi join oracle: held-out keys (disjoint id space)
    held = docs.select((F.col("doc_id") + 10_000_000).cast("string").alias("k"))
    fp_hits = probe(held, sc, key="k").filter(F.col("member")).count()
    assert fp_hits / n_docs <= 0.01  # FP16 bound with sample slack

    # CF.REM: delete the 'en' docs, then re-probe
    en = docs.filter(F.col("lang") == "en")
    n_en = en.count()
    removed = remove_keys(merged, en, spec, key=F.col("doc_id").cast("string"))
    sc2 = ShardedCuckoo.from_df(removed, spec)
    assert not sc2.is_broken()
    assert sc2.count() == n_docs - n_en
    rest = probe(docs.filter(F.col("lang") != "en"), sc2, key=F.col("doc_id").cast("string"))
    assert rest.filter(~F.col("member")).count() == 0


def test_merged_blob_partition_invariant(spark, docs):
    """Same input at different partition counts and merge fan-ins must give
    a byte-identical merged filter (SURVEY.md §2.3)."""
    spec = CuckooSpec(name="inv", size=size_for(2000, 2), fpsize=2, num_shards=2)

    def blob_set(df, fanin):
        merged = merge_partials(
            build_partials(df, spec, key=F.col("doc_id").cast("string")), fanin=fanin
        )
        return {(r["shard"]): bytes(r["sketch"]) for r in merged.collect()}

    a = blob_set(docs.repartition(2), fanin=64)
    b = blob_set(docs.repartition(7), fanin=64)
    c = blob_set(docs.repartition(13), fanin=2)  # forces multi-stage tree
    assert a == b == c
    # and equals a single-process kernel build over the same keys
    rows = with_hash_fp(docs, F.col("doc_id").cast("string")).select(
        "__cf_hash", "__cf_fp"
    ).collect()
    h = i64_to_u64(np.array([r["__cf_hash"] for r in rows], dtype=np.int64))
    f = i64_to_u64(np.array([r["__cf_fp"] for r in rows], dtype=np.int64))
    from sketchlib.util import stable_seed

    for shard, blob in a.items():
        m = shard_of(h, 2) == shard
        local = CuckooFilter.create(spec.size, spec.fpsize, seed=stable_seed("merge", "inv", shard))
        order = np.lexsort((f[m], h[m]))
        # local canonical build: insert sorted canonical pairs like merge does
        pidx = local._primary_idx(h[m][order])
        fps = local._prep_fps(f[m][order])
        alt = local._alt_idx_vec(pidx, fps)
        bidx = np.minimum(pidx, alt)
        o2 = np.lexsort((fps, bidx))
        local.add_batch(bidx[o2].astype(np.uint64), fps[o2])
        assert local.to_bytes() == blob


def test_pairs_and_dense_partials_merge_identically(spark, docs):
    """The sparse (canonical-pair) and dense partial formats must produce
    byte-identical merged filters — they feed the same canonical multiset."""
    spec = CuckooSpec(name="fmt", size=size_for(2000, 2), fpsize=2, num_shards=2)
    key = F.col("doc_id").cast("string")

    def blobs(fmt, fanin=64):
        m = merge_partials(
            build_partials(docs.repartition(5), spec, key=key, partial_format=fmt), fanin=fanin
        )
        return {r["shard"]: bytes(r["sketch"]) for r in m.collect()}

    assert blobs("pairs") == blobs("dense") == blobs("pairs", fanin=2)
    # pairs partials are small: ~12B/row, not the filter size
    p = build_partials(docs.repartition(5), spec, key=key, partial_format="pairs")
    sizes = [(r["rows"], len(bytes(r["sketch"]))) for r in p.collect()]
    for rows, nbytes in sizes:
        assert nbytes <= 12 * rows + 64


def test_direct_build_matches_tree_merge(spark, docs):
    """One-shuffle direct build must be byte-identical to the partials+tree
    path: same sorted canonical pairs, same merge seed."""
    from sketchlib.spark.cuckoo import build_filter_direct

    spec = CuckooSpec(name="direct", size=size_for(2000, 2), fpsize=2, num_shards=4)
    key = F.col("doc_id").cast("string")
    tree = {r["shard"]: bytes(r["sketch"]) for r in build_filter(docs, spec, key=key).collect()}
    direct = {
        r["shard"]: bytes(r["sketch"])
        for r in build_filter_direct(docs.repartition(7), spec, key=key).collect()
    }
    assert direct == tree
    sc = ShardedCuckoo.from_df(build_filter_direct(docs, spec, key=key), spec)
    assert sc.count() == docs.count()


def test_remove_nonmember_poisons_shard(spark, docs):
    spec = CuckooSpec(name="poison", size=size_for(2000, 2), fpsize=2)
    merged = build_filter(docs, spec, key=F.col("doc_id").cast("string"))
    ghosts = spark.range(5).select((F.col("id") + 99_000_000).cast("string").alias("k"))
    removed = remove_keys(merged, ghosts, spec, key="k")
    sc = ShardedCuckoo.from_df(removed, spec)
    assert sc.is_broken()


def test_probe_carries_columns(spark, docs):
    spec = CuckooSpec(name="cols", size=size_for(2000, 2), fpsize=2)
    merged = build_filter(docs, spec, key=F.col("doc_id").cast("string"))
    sc = ShardedCuckoo.from_df(merged, spec)
    out = probe(docs.select("doc_id", "lang"), sc, key=F.col("doc_id").cast("string"))
    assert set(out.columns) == {"doc_id", "lang", "member"}
    assert out.count() == docs.count()


def test_probe_cogrouped_equals_broadcast(spark, docs):
    from sketchlib.spark.cuckoo import probe_cogrouped

    spec = CuckooSpec(name="cog", size=size_for(2000, 2), fpsize=2, num_shards=4)
    key = F.col("doc_id").cast("string")
    merged = build_filter(docs, spec, key=key).cache()
    sc = ShardedCuckoo.from_df(merged, spec)
    # probes: all inserted + disjoint held-out ids
    probes = docs.select("doc_id").union(
        docs.select((F.col("doc_id") + 5_000_000).alias("doc_id"))
    )
    bkey = F.col("doc_id").cast("string")
    a = {r["doc_id"]: r["member"] for r in probe(probes, sc, key=bkey).collect()}
    b = {r["doc_id"]: r["member"] for r in probe_cogrouped(merged, probes, spec, key=bkey).collect()}
    assert a == b
    assert all(a[r["doc_id"]] for r in docs.select("doc_id").collect())


def test_probe_auto_picks_equivalent_paths(spark, docs):
    """probe_auto dispatches on total blob size: a huge limit takes the
    broadcast path, a zero limit the cogrouped path — identical answers."""
    from sketchlib.spark.cuckoo import probe_auto

    spec = CuckooSpec(name="auto", size=size_for(2000, 2), fpsize=2, num_shards=4)
    key = F.col("doc_id").cast("string")
    merged = build_filter(docs, spec, key=key).cache()
    probes = docs.select("doc_id").union(
        docs.select((F.col("doc_id") + 5_000_000).alias("doc_id"))
    )
    bkey = F.col("doc_id").cast("string")
    via_bc = {
        r["doc_id"]: r["member"]
        for r in probe_auto(merged, probes, spec, key=bkey, broadcast_limit_bytes=1 << 40).collect()
    }
    via_cg = {
        r["doc_id"]: r["member"]
        for r in probe_auto(merged, probes, spec, key=bkey, broadcast_limit_bytes=0).collect()
    }
    assert via_bc == via_cg
    assert all(via_bc[r["doc_id"]] for r in docs.select("doc_id").collect())


def test_fix_toofull_shards(spark):
    from sketchlib.spark.cuckoo import fix_toofull_shards, remove_keys, probe

    tiny = CuckooSpec(name="fixme", size=64, fpsize=2)  # 32 slots
    keys = spark.range(40).select(F.col("id").cast("string").alias("k"))
    m = build_filter(keys, tiny, key="k").cache()
    sc = ShardedCuckoo.from_df(m, tiny)
    assert sc.is_toofull()
    # fixing while full fails (flag stays); after freeing slots it succeeds
    still = ShardedCuckoo.from_df(fix_toofull_shards(m), tiny)
    assert still.is_toofull()
    present = probe(keys, sc, key="k").filter(F.col("member")).select("k").limit(10)
    freed = remove_keys(m, present, tiny, key="k")
    fixed = ShardedCuckoo.from_df(fix_toofull_shards(freed), tiny)
    assert not fixed.is_toofull()
    assert not fixed.is_broken()


def test_build_counts_toofull_drops(spark):
    """Oversubscribed filter: drops are counted per partial and surface in
    the merged row (reference per-op error becomes an accounted drop)."""
    spec = CuckooSpec(name="tiny", size=64, fpsize=2)  # 32 slots
    df = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    merged = build_filter(df, spec, key="k")
    sc = ShardedCuckoo.from_df(merged, spec)
    assert sc.dropped > 0
    assert sc.count() + sc.dropped <= 500 + len(sc.filters)  # homeless per partial
    assert sc.rows == 500


def test_semi_join_via_filter_exact_at_fp8(spark):
    """The runtime-filter semi join must be EXACT even at FP8 (~3% FP rate
    pre-filter): no false negatives from the filter, false positives removed
    by the exact join on survivors."""
    from sketchlib.spark.cuckoo import semi_join_via_filter

    big = spark.range(0, 5000).selectExpr("id AS k", "id % 7 AS payload")
    small = spark.range(0, 150).selectExpr("id * 3 AS sk")  # 0,3,...,447
    out = semi_join_via_filter(big, small, "k", "sk", fpsize=1)
    got = sorted(r["k"] for r in out.collect())
    want = [k for k in range(5000) if k % 3 == 0 and k <= 447]
    assert got == want
    assert [f.name for f in out.schema.fields] == ["k", "payload"]


def test_semi_join_via_filter_duplicate_keyed_small_side(spark):
    """A small side with a key repeated far beyond bucket capacity must not
    produce false negatives (the filter is built from the DISTINCT keys)."""
    from sketchlib.spark.cuckoo import semi_join_via_filter

    big = spark.range(0, 2000).selectExpr("id AS k")
    # key 7 repeated 64x would overflow both buckets if inserted per-row
    small = spark.createDataFrame(
        [(7,)] * 64 + [(13,), (999,)], "sk long"
    )
    out = sorted(r["k"] for r in semi_join_via_filter(big, small, "k", "sk", fpsize=1).collect())
    assert out == [7, 13, 999]


def test_semi_join_via_filter_cogrouped_branch(spark):
    """With a 1-byte broadcast budget probe_auto must take the co-partitioned
    probe path; the semi join result is identical to the broadcast path."""
    from sketchlib.spark.cuckoo import semi_join_via_filter

    big = spark.range(0, 3000).selectExpr("id AS k")
    small = spark.range(0, 100).selectExpr("id * 7 AS sk")
    want = sorted(
        r["k"] for r in semi_join_via_filter(big, small, "k", "sk").collect()
    )
    got = sorted(
        r["k"]
        for r in semi_join_via_filter(
            big, small, "k", "sk", broadcast_limit_bytes=1
        ).collect()
    )
    assert got == want == [k for k in range(3000) if k % 7 == 0 and k <= 693]
