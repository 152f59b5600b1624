"""Generic mergeable-sketch aggregation over DataFrames.

One shape for every sibling sketch (SURVEY.md §2.6 "aggregations"): build
one partial per input partition with ``mapInPandas`` (zero shuffle, Arrow
batches → vectorized kernel updates), then tree-merge the partial blobs with
fan-in-bounded ``applyInPandas`` stages. Bloom/HLL/CMS merges (OR/max/add)
are byte-deterministic under any order or partitioning; KLL/t-digest are
estimate-stable within their published error.

Built-in cross-checks at query level: ``approx_count_distinct`` (Spark's
HLL++) and ``percentile_approx`` — our sketches must agree with the exact
oracle within bound wherever those do.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.kernels.bloom import BloomFilter
from sketchlib.kernels.cms import CountMinSketch
from sketchlib.kernels.hll import HyperLogLog
from sketchlib.kernels.kll import KLLSketch
from sketchlib.kernels.kmv import KMVSketch
from sketchlib.kernels.tdigest import TDigest
from sketchlib.util import i64_to_u64, stable_seed

SKETCH_SCHEMA = "name string, kind string, sketch binary, rows long"

_HASH_COL = "__sk_hash"
_VAL_COL = "__sk_val"

#: largest finite double — used to exclude ±Inf portably (NaN fails any
#: range check in both Spark and DuckDB, where NaN sorts greatest)
DBL_MAX = 1.7976931348623157e308


def finite_values(col):
    """SQL-aggregate-style input contract for value-fed sketches: NULLs are
    ignored (like SUM/AVG/percentile) and non-finite doubles (NaN/±Inf)
    are excluded — at web scale dirty doubles otherwise poison a quantile
    sketch's ordering/means (fuzz-gate finding). Returns a boolean Column."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    return c.isNotNull() & ~F.isnan(c) & (c >= -DBL_MAX) & (c <= DBL_MAX)

#: kind -> (factory(params, seed), merge_from_blobs, input mode)
_KINDS = {
    "bloom": (lambda p, s: BloomFilter(*p), BloomFilter.merge, "hash"),
    "hll": (lambda p, s: HyperLogLog(*p), HyperLogLog.merge, "hash"),
    "cms": (lambda p, s: CountMinSketch(*p), CountMinSketch.merge, "hash"),
    "kll": (lambda p, s: KLLSketch(*p, seed=s), KLLSketch.merge, "value"),
    "kmv": (lambda p, s: KMVSketch(*p), KMVSketch.merge, "hash"),
    "tdigest": (lambda p, s: TDigest(*p), TDigest.merge, "value"),
}


@dataclass(frozen=True)
class SketchSpec:
    """Declares one sketch aggregation: kind + constructor params.

    params: bloom=(m_bits, k) · hll=(p,) · cms=(w, d) · kll=(k,) ·
    tdigest=(delta,) · kmv=(k,)
    """

    name: str
    kind: str
    params: tuple = ()
    seed: int = 42

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown sketch kind {self.kind!r}")
        self.make(0)  # validate params eagerly

    def make(self, partition_id: int):
        factory, _, _ = _KINDS[self.kind]
        return factory(self.params, stable_seed(self.name, self.kind, partition_id, self.seed))

    @property
    def mode(self) -> str:
        return _KINDS[self.kind][2]

    def merge_blobs(self, blobs: list):
        return _KINDS[self.kind][1](blobs)


def build_sketch_partials(df: DataFrame, spec: SketchSpec, col, col_is_hash: bool = False) -> DataFrame:
    """One partial sketch per input partition, shuffle-free.

    ``col`` is hashed in-plan with xxhash64 for hash-fed sketches
    (bloom/hll/cms) unless ``col_is_hash``; value-fed sketches (kll/tdigest)
    cast it to double. Only that single column is scanned.
    """
    col = F.col(col) if isinstance(col, str) else col
    if spec.mode == "hash":
        # NULL keys are ignored, matching COUNT(DISTINCT ...) semantics —
        # xxhash64(NULL) would otherwise count as one phantom distinct value
        expr = col.cast("long") if col_is_hash else F.xxhash64(col)
        sel = df.where(col.isNotNull()).select(expr.alias(_HASH_COL))
    else:
        sel = df.where(finite_values(col)).select(col.cast("double").alias(_VAL_COL))
    name, kind = spec.name, spec.kind

    def build(batches):
        pid = TaskContext.get().partitionId()
        sk = None
        rows = 0
        for pdf in batches:
            if pdf.empty:
                continue
            if sk is None:
                sk = spec.make(pid)
            if spec.mode == "hash":
                sk.add_hashes(i64_to_u64(pdf[_HASH_COL].to_numpy()))
            else:
                sk.add_values(pdf[_VAL_COL].to_numpy(dtype=np.float64))
            rows += len(pdf)
        if sk is not None:
            yield pd.DataFrame(
                {"name": [name], "kind": [kind], "sketch": [sk.to_bytes()], "rows": [rows]}
            )

    return sel.mapInPandas(build, SKETCH_SCHEMA)


def merge_sketch_partials(partials: DataFrame, spec: SketchSpec, fanin: int = 64) -> DataFrame:
    """Tree-reduce to one row per (name, kind); only blobs shuffle."""

    def mrg(key, pdf):
        m = spec.merge_blobs([bytes(b) for b in pdf["sketch"]])
        return pd.DataFrame(
            {
                "name": [str(key[0])],
                "kind": [str(key[1])],
                "sketch": [m.to_bytes()],
                "rows": [int(pdf["rows"].sum())],
            }
        )

    # eager materialization: the sizing count must not re-run the build
    df = partials.localCheckpoint(eager=True)
    while True:
        mx = (
            df.groupBy("name", "kind")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("m"))
            .first()["m"]
        )
        if mx is None or mx <= fanin:
            break
        groups = math.ceil(mx / fanin)
        df = (
            df.withColumn("_g", F.pmod(F.xxhash64("sketch"), F.lit(groups)))
            .groupBy("name", "kind", "_g")
            .applyInPandas(lambda key, pdf: mrg(key[:2], pdf), SKETCH_SCHEMA)
        ).localCheckpoint(eager=True)
    return df.groupBy("name", "kind").applyInPandas(mrg, SKETCH_SCHEMA)


def build_sketch(df: DataFrame, spec: SketchSpec, col, col_is_hash: bool = False, fanin: int = 64):
    """build + merge + collect: returns the kernel object on the driver."""
    merged = merge_sketch_partials(
        build_sketch_partials(df, spec, col, col_is_hash=col_is_hash), spec, fanin=fanin
    )
    rows = merged.collect()
    if not rows:
        return spec.make(0)
    assert len(rows) == 1
    blob = bytes(rows[0]["sketch"])
    return spec.merge_blobs([blob])


def build_sketch_grouped(
    df: DataFrame,
    group_col: str,
    spec: SketchSpec,
    col,
    col_is_hash: bool = False,
    salt_buckets: int = 8,
) -> DataFrame:
    """One merged sketch PER GROUP (e.g. an HLL per language, a t-digest per
    host) — the grouped form of the mergeable-aggregator pattern.

    Skew-safe two-phase: partials build per (group, salt) — a hot group
    splits across ``salt_buckets`` tasks — then merge per group. Both
    stages are ``applyInPandas`` over short keys; sketch blobs are the only
    wide values that shuffle."""
    col = F.col(col) if isinstance(col, str) else col
    # NULL group keys are dropped: the sketch table is keyed by the group
    # value, and a NULL key breaks downstream estimate maps — callers
    # wanting a NULL bucket should coalesce to a sentinel first
    df = df.where(F.col(group_col).isNotNull())
    if spec.mode == "hash":
        expr = col.cast("long") if col_is_hash else F.xxhash64(col)
        sel = df.where(col.isNotNull()).select(F.col(group_col), expr.alias(_HASH_COL))
        salt = F.pmod(F.col(_HASH_COL), F.lit(salt_buckets))
    else:
        sel = df.where(finite_values(col)).select(
            F.col(group_col), col.cast("double").alias(_VAL_COL)
        )
        salt = F.pmod(F.xxhash64(F.col(_VAL_COL)), F.lit(salt_buckets))
    sel = sel.withColumn("_salt", salt)
    partial_schema = f"{group_col} string, sketch binary, rows long"

    def build(key, pdf):
        sk = spec.make(stable_seed("grouped", *key))  # hash() is per-process-salted
        if spec.mode == "hash":
            sk.add_hashes(i64_to_u64(pdf[_HASH_COL].to_numpy()))
        else:
            sk.add_values(pdf[_VAL_COL].to_numpy(dtype=np.float64))
        return pd.DataFrame({group_col: [key[0]], "sketch": [sk.to_bytes()], "rows": [len(pdf)]})

    partials = sel.groupBy(group_col, "_salt").applyInPandas(build, partial_schema)

    def mrg(key, pdf):
        m = spec.merge_blobs([bytes(b) for b in pdf["sketch"]])
        return pd.DataFrame(
            {group_col: [key[0]], "sketch": [m.to_bytes()], "rows": [int(pdf["rows"].sum())]}
        )

    return partials.groupBy(group_col).applyInPandas(mrg, partial_schema)


def grouped_estimates(grouped: DataFrame, spec: SketchSpec, group_col: str) -> DataFrame:
    """Materialize per-group estimates from grouped sketches (HLL/KMV →
    cardinality; CMS/bloom → count; KLL/t-digest → median)."""
    kind = spec.kind

    def est(key, pdf):
        m = spec.merge_blobs([bytes(b) for b in pdf["sketch"]])
        if kind in ("hll", "kmv"):
            v = m.estimate()
        elif kind in ("cms",):
            v = float(m.total)
        elif kind == "bloom":
            v = float(m.approx_count_distinct())
        else:
            v = m.quantile(0.5)
        return pd.DataFrame(
            {group_col: [key[0]], "estimate": [float(v)], "rows": [int(pdf["rows"].sum())]}
        )

    return grouped.groupBy(group_col).applyInPandas(
        est, f"{group_col} string, estimate double, rows long"
    )


def bloom_probe(df: DataFrame, bloom: BloomFilter, key, result_col: str = "member") -> DataFrame:
    """Distributed Bloom membership: broadcast the bit array, vectorized
    mapInPandas probe (no false negatives; FP within (1-e^{-kn/m})^k).

    CAUTION: ``key`` must be the SAME expression (including type!) used at
    build time — ``xxhash64(long)`` ≠ ``xxhash64(string)``, so probing a
    cast column against a filter built on the raw column silently misses
    everything. This mirrors the reference's client-hashes contract
    (README.md:40-53): hashing consistency is the caller's responsibility.
    """
    from pyspark.sql import types as T

    key = F.col(key) if isinstance(key, str) else key
    df = df.withColumn(_HASH_COL, F.xxhash64(key))
    bc = df.sparkSession.sparkContext.broadcast(bloom.to_bytes())
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != _HASH_COL]
        + [T.StructField(result_col, T.BooleanType())]
    )

    def run(batches):
        flt = BloomFilter.from_bytes(bc.value)
        for pdf in batches:
            h = i64_to_u64(pdf[_HASH_COL].to_numpy()) if len(pdf) else np.empty(0, np.uint64)
            hit = flt.contains_hashes(h) if len(pdf) else np.empty(0, bool)
            yield pdf.drop(columns=[_HASH_COL]).assign(**{result_col: hit})

    return df.mapInPandas(run, out_schema)
