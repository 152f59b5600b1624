"""Distributed cuckoo filters over Spark DataFrames.

The Spark-native re-expression of the reference's command surface
(``/root/reference/src/redis-cuckoofilter.zig:157-183``; SURVEY.md §2.1):

- ``CF.INIT``   → :class:`CuckooSpec` (declares name/size/fpsize/shards)
- ``CF.ADD``    → :func:`build_partials` — per-input-partition partial
  filters via Arrow-batched ``mapInPandas`` (NO shuffle for the build; no
  per-row Python: each Arrow batch is one vectorized kernel call)
- merge (distributed-only need) → :func:`merge_partials` — fan-in-bounded
  tree of ``applyInPandas`` stages shuffling only the small partial blobs;
  canonical merge makes the result byte-identical for ANY tree shape or
  input partitioning (SURVEY.md §2.3)
- ``CF.CHECK``  → :func:`probe` — merged blobs broadcast once per executor,
  probes answered by a vectorized ``mapInPandas`` (semantically a broadcast
  left-semi join with bounded one-sided false positives)
- ``CF.REM``    → :func:`remove_keys` — co-grouped ``applyInPandas`` per
  shard; exact-deletion semantics incl. poison-on-miss
- ``CF.COUNT`` / ``CF.ISBROKEN`` / ``CF.ISTOOFULL`` → additive/OR-ed header
  fields on the partial rows (plain aggregations)

Scale design (10^12 docs, SURVEY.md §4): the input scan only ever reads the
key column (Catalyst prunes the rest); the only shuffle moves partial blobs
(KBs–MBs each), never rows; ``num_shards`` splits the key space by the HIGH
hash bits so each shard is an independently mergeable/probeable filter —
total filter memory can exceed a single executor by sharding, and the probe
broadcast ships each executor only the blob dictionary once.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sketchlib.kernels.cuckoo import BrokenError, CuckooFilter
from sketchlib.util import i64_to_u64, shard_of, stable_seed

#: one row per (sketch name, shard[, build partition]) — the Spark analogue
#: of the reference's keyed filter wrapper (t_cuckoofilter.zig:9-25)
PARTIAL_SCHEMA = (
    "name string, shard int, sketch binary, fpcount long, "
    "toofull boolean, broken boolean, rows long, dropped long"
)

HASH_COL = "__cf_hash"
FP_COL = "__cf_fp"
_FP_SALT = "sketchlib::fp::v1"


@dataclass(frozen=True)
class CuckooSpec:
    """CF.INIT equivalent: declares one distributed filter.

    ``size`` is bytes PER SHARD (power of two, ≥ 2 buckets). The filter is
    hashing-agnostic like the reference (README.md:40-76): pass prepared
    ``hash``/``fp`` columns to the builders, or let :func:`with_hash_fp`
    derive them in-plan with xxhash64.
    """

    name: str
    size: int
    fpsize: int = 2
    num_shards: int = 1
    seed: int = 42

    def __post_init__(self):
        CuckooFilter.create(self.size, self.fpsize)  # validate eagerly
        if self.num_shards < 1 or self.num_shards > 1 << 16:
            raise ValueError("num_shards must be in [1, 65536]")


def with_hash_fp(df: DataFrame, key, hash_col: str = HASH_COL, fp_col: str = FP_COL) -> DataFrame:
    """Derive (hash, fp) from a key column with two independent in-plan
    xxhash64 expressions — pure Catalyst projections, JVM-side, codegen'd.

    The reference leaves hashing to the client (README.md:40-53); here the
    "client" is the query plan and any expression can be substituted.
    """
    key = F.col(key) if isinstance(key, str) else key
    return df.withColumn(hash_col, F.xxhash64(key)).withColumn(
        fp_col, F.xxhash64(key, F.lit(_FP_SALT))
    )


def _shard_col(hash_col: str, num_shards: int) -> Column:
    """In-plan twin of util.shard_of (cross-checked in tests)."""
    return F.pmod(F.shiftrightunsigned(F.col(hash_col), 48), F.lit(num_shards)).cast("int")


# ----------------------------------------------------------------- build


def build_partials(
    df: DataFrame,
    spec: CuckooSpec,
    key=None,
    hash_col: str = HASH_COL,
    fp_col: str = FP_COL,
    deterministic_partials: bool = False,
) -> DataFrame:
    """CF.ADD, distributed: one partial filter per (input partition × shard),
    built shuffle-free with ``mapInPandas`` (Arrow batches → one vectorized
    ``add_batch`` call each).

    Partial bytes depend on within-partition row order; the canonical merge
    erases that, so the MERGED filter is invariant. For byte-stable partials
    under task retry (the reference's replicate-verbatim determinism,
    redis-cuckoofilter.zig:233), pass ``deterministic_partials=True`` to sort
    within partitions first.
    """
    if key is not None:
        df = with_hash_fp(df, key, hash_col, fp_col)
    sel = df.select(
        F.col(hash_col).cast("long").alias(hash_col), F.col(fp_col).cast("long").alias(fp_col)
    )
    if deterministic_partials:
        sel = sel.sortWithinPartitions(hash_col, fp_col)
    name, size, fpsize, num_shards, seed = (
        spec.name,
        spec.size,
        spec.fpsize,
        spec.num_shards,
        spec.seed,
    )

    def build(batches):
        pid = TaskContext.get().partitionId()
        filters: dict[int, CuckooFilter] = {}
        rows: dict[int, int] = {}
        dropped: dict[int, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            h = i64_to_u64(pdf[hash_col].to_numpy())
            f = i64_to_u64(pdf[fp_col].to_numpy())
            sh = shard_of(h, num_shards)
            for s in np.unique(sh):
                m = sh == s
                flt = filters.get(int(s))
                if flt is None:
                    flt = CuckooFilter.create(size, fpsize, seed=stable_seed(name, int(s), pid, seed))
                    filters[int(s)] = flt
                    dropped[int(s)] = 0
                    rows[int(s)] = 0
                rows[int(s)] += int(m.sum())
                dropped[int(s)] += flt.add_batch(h[m], f[m], on_toofull="count")
        if filters:
            yield pd.DataFrame(
                {
                    "name": name,
                    "shard": list(filters),
                    "sketch": [flt.to_bytes() for flt in filters.values()],
                    "fpcount": [flt.fpcount for flt in filters.values()],
                    "toofull": [flt.is_toofull() for flt in filters.values()],
                    "broken": [flt.is_broken() for flt in filters.values()],
                    "rows": [rows[s] for s in filters],
                    "dropped": [dropped[s] for s in filters],
                }
            )

    return sel.mapInPandas(build, PARTIAL_SCHEMA)


# ----------------------------------------------------------------- merge


def _merge_group(key, pdf):
    name, shard = str(key[0]), int(key[1])
    m = CuckooFilter.merge(
        [bytes(b) for b in pdf["sketch"]],
        seed=stable_seed("merge", name, shard),
        on_toofull="count",
    )
    in_fp = int(pdf["fpcount"].sum())
    return pd.DataFrame(
        {
            "name": [name],
            "shard": [shard],
            "sketch": [m.to_bytes()],
            "fpcount": [m.fpcount],
            "toofull": [m.is_toofull()],
            "broken": [m.is_broken()],
            "rows": [int(pdf["rows"].sum())],
            "dropped": [int(pdf["dropped"].sum()) + (in_fp - m.fpcount)],
        }
    )


def merge_partials(partials: DataFrame, fanin: int = 64) -> DataFrame:
    """Tree-reduce the partials to one row per (name, shard).

    Stages with more than ``fanin`` partials per shard are pre-merged in
    groups (group assignment hashes the blob — arbitrary but deterministic;
    the canonical merge makes any grouping byte-equivalent), so no single
    task ever merges more than ``fanin`` blobs. Only partial blobs shuffle.
    """
    df = partials
    while True:
        mx = (
            df.groupBy("name", "shard")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("m"))
            .first()["m"]
        )
        if mx is None or mx <= fanin:
            break
        groups = math.ceil(mx / fanin)
        df = (
            df.withColumn("_g", F.pmod(F.xxhash64("sketch"), F.lit(groups)))
            .groupBy("name", "shard", "_g")
            .applyInPandas(lambda key, pdf: _merge_group(key[:2], pdf), PARTIAL_SCHEMA)
        )
    return df.groupBy("name", "shard").applyInPandas(_merge_group, PARTIAL_SCHEMA)


def build_filter(df: DataFrame, spec: CuckooSpec, key=None, **kw) -> DataFrame:
    """build_partials + merge_partials in one call."""
    fanin = kw.pop("fanin", 64)
    return merge_partials(build_partials(df, spec, key=key, **kw), fanin=fanin)


# ------------------------------------------------------------ driver view


@dataclass
class ShardedCuckoo:
    """Driver-side handle on a merged filter (all shards).

    Exposes the reference's read commands (CF.COUNT/ISBROKEN/ISTOOFULL,
    SURVEY.md §2.1 #5-7) plus vectorized probing for local use; distributed
    probing goes through :func:`probe`.
    """

    spec: CuckooSpec
    filters: dict[int, CuckooFilter] = field(default_factory=dict)
    rows: int = 0
    dropped: int = 0

    @classmethod
    def from_df(cls, merged: DataFrame, spec: CuckooSpec) -> "ShardedCuckoo":
        out = cls(spec)
        for r in merged.collect():
            if r["name"] != spec.name:
                continue
            out.filters[r["shard"]] = CuckooFilter.from_bytes(bytes(r["sketch"]))
            out.rows += r["rows"]
            out.dropped += r["dropped"]
        return out

    def count(self) -> int:
        if self.is_broken():
            raise BrokenError("filter is broken")
        return sum(f.fpcount for f in self.filters.values())

    def is_broken(self) -> bool:
        return any(f.broken for f in self.filters.values())

    def is_toofull(self) -> bool:
        return any(f.is_toofull() for f in self.filters.values())

    def memory_usage(self) -> int:
        return sum(f.memory_usage() for f in self.filters.values())

    def digest(self) -> str:
        import hashlib

        h = hashlib.sha256()
        for s in sorted(self.filters):
            h.update(s.to_bytes(4, "little"))
            h.update(self.filters[s].to_bytes())
        return h.hexdigest()

    def blobs(self) -> dict[int, bytes]:
        return {s: f.to_bytes() for s, f in self.filters.items()}

    def contains_arrays(self, h_u64: np.ndarray, f_u64: np.ndarray) -> np.ndarray:
        hit = np.zeros(len(h_u64), dtype=bool)
        sh = shard_of(h_u64, self.spec.num_shards)
        for s in np.unique(sh):
            flt = self.filters.get(int(s))
            if flt is None:
                continue  # empty shard: definitely absent
            m = sh == s
            hit[m] = flt.contains_batch(h_u64[m], f_u64[m], raise_broken_on_miss=False)
        return hit


# ----------------------------------------------------------------- probe


def probe(
    df: DataFrame,
    sharded: ShardedCuckoo,
    key=None,
    hash_col: str = HASH_COL,
    fp_col: str = FP_COL,
    result_col: str = "member",
    keep_hash_cols: bool = False,
) -> DataFrame:
    """CF.CHECK, distributed: broadcast the shard blobs once, answer probes
    with a vectorized ``mapInPandas`` (one kernel call per Arrow batch).

    No false negatives; false positives within the width's published bound.
    The exact-SQL oracle of this operator is a left-semi join on the key.

    CAUTION: ``key`` must be the SAME expression (including type!) used at
    build time — ``xxhash64(long)`` ≠ ``xxhash64(string)``. Hashing
    consistency is the caller's responsibility, mirroring the reference's
    client-hashes contract (README.md:40-53).
    """
    had_key = key is not None
    if had_key:
        df = with_hash_fp(df, key, hash_col, fp_col)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(sharded.blobs())
    num_shards = sharded.spec.num_shards
    out_schema = T.StructType(df.schema.fields + [T.StructField(result_col, T.BooleanType())])

    def run(batches):
        flts = {s: CuckooFilter.from_bytes(b) for s, b in bc.value.items()}
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(**{result_col: np.empty(0, dtype=bool)})
                continue
            h = i64_to_u64(pdf[hash_col].to_numpy())
            f = i64_to_u64(pdf[fp_col].to_numpy())
            hit = np.zeros(len(h), dtype=bool)
            sh = shard_of(h, num_shards)
            for s in np.unique(sh):
                flt = flts.get(int(s))
                if flt is None:
                    continue
                m = sh == s
                hit[m] = flt.contains_batch(h[m], f[m], raise_broken_on_miss=False)
            yield pdf.assign(**{result_col: hit})

    out = df.mapInPandas(run, out_schema)
    if had_key and not keep_hash_cols:
        out = out.drop(hash_col, fp_col)
    return out


# ---------------------------------------------------------------- remove


def remove_keys(
    merged: DataFrame,
    keys_df: DataFrame,
    spec: CuckooSpec,
    key=None,
    hash_col: str = HASH_COL,
    fp_col: str = FP_COL,
) -> DataFrame:
    """CF.REM, distributed: co-group the merged shard rows with the
    to-remove keys per shard and run one vectorized ``remove_batch`` per
    shard. Exact-deletion semantics are the reference's: removing a
    never-inserted key permanently poisons that shard (``broken``).

    Keys are sorted canonically inside each shard so the resulting blob is
    independent of ``keys_df``'s partitioning and row order.
    """
    if key is not None:
        keys_df = with_hash_fp(keys_df, key, hash_col, fp_col)
    keys = keys_df.select(
        F.lit(spec.name).alias("name"),
        _shard_col(hash_col, spec.num_shards).alias("shard"),
        F.col(hash_col).cast("long").alias("h"),
        F.col(fp_col).cast("long").alias("f"),
    )

    def rem(key_tuple, left, right):
        name, shard = str(key_tuple[0]), int(key_tuple[1])
        if left.empty:
            # removing from a shard that was never built = removing
            # non-members: poisoned empty filter (reference semantics)
            flt = CuckooFilter.create(spec.size, spec.fpsize, seed=stable_seed(name, shard, spec.seed))
            rows = drop = 0
        else:
            flt = CuckooFilter.from_bytes(bytes(left["sketch"].iloc[0]))
            rows = int(left["rows"].iloc[0])
            drop = int(left["dropped"].iloc[0])
        if not right.empty:
            h = i64_to_u64(right["h"].to_numpy())
            f = i64_to_u64(right["f"].to_numpy())
            order = np.lexsort((f, h))
            try:
                flt.remove_batch(h[order], f[order])
            except BrokenError:
                pass  # shard poisoned; flag carried in the row
        return pd.DataFrame(
            {
                "name": [name],
                "shard": [shard],
                "sketch": [flt.to_bytes()],
                "fpcount": [flt.fpcount],
                "toofull": [flt.is_toofull()],
                "broken": [flt.is_broken()],
                "rows": [rows],
                "dropped": [drop],
            }
        )

    return (
        merged.groupby("name", "shard")
        .cogroup(keys.groupby("name", "shard"))
        .applyInPandas(rem, PARTIAL_SCHEMA)
    )
