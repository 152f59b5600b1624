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

from sketchlib.kernels.cuckoo import (
    BrokenError,
    CuckooFilter,
    canonical_pairs,
    pack_pairs,
)
from sketchlib.util import i64_to_u64, shard_of, stable_seed

#: one row per (sketch name, shard[, build partition]) — the Spark analogue
#: of the reference's keyed filter wrapper (t_cuckoofilter.zig:9-25)
PARTIAL_SCHEMA = (
    "name string, shard int, part_id int, sketch binary, fpcount long, "
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
    skip_pids: set | None = None,
    partial_format: str = "pairs",
) -> DataFrame:
    """CF.ADD, distributed: one partial filter per (input partition × shard),
    built shuffle-free with ``mapInPandas`` (Arrow batches → one vectorized
    ``add_batch`` call each).

    Partial bytes depend on within-partition row order; the canonical merge
    erases that, so the MERGED filter is invariant. For byte-stable partials
    under task retry (the reference's replicate-verbatim determinism,
    redis-cuckoofilter.zig:233), pass ``deterministic_partials=True`` to sort
    within partitions first.

    ``skip_pids`` (checkpoint resume): partitions whose partials already
    exist emit nothing. The skip happens INSIDE this operator so the resumed
    plan is identical to the original — inserting a filter between an
    upstream repartition and this build would change projection pushdown and
    thereby the row→partition assignment of round-robin exchanges.

    ``partial_format``: "pairs" (default) emits packed canonical-pair blobs
    — ~12 bytes/row, NO kicking, no PRNG; shuffle volume scales with data,
    never with partitions × filter size (the dense format costs the full
    filter size per partition × shard, which inverts scaling on large
    clusters). "dense" emits real per-partition filters (the
    reference-shaped aggregator, kept for parity tests and for workloads
    that probe partials directly). Both merge to byte-identical results.
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

    use_pairs = partial_format == "pairs"

    def build(batches):
        pid = TaskContext.get().partitionId()
        if skip_pids and pid in skip_pids:
            return
        filters: dict[int, CuckooFilter] = {}
        pairs_b: dict[int, list] = {}
        pairs_f: dict[int, list] = {}
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
                s = int(s)
                rows[s] = rows.get(s, 0) + int(m.sum())
                if use_pairs:
                    b, fp = canonical_pairs(h[m], f[m], size, fpsize)
                    pairs_b.setdefault(s, []).append(b)
                    pairs_f.setdefault(s, []).append(fp.astype(np.uint32))
                else:
                    flt = filters.get(s)
                    if flt is None:
                        flt = CuckooFilter.create(size, fpsize, seed=stable_seed(name, s, pid, seed))
                        filters[s] = flt
                        dropped[s] = 0
                    dropped[s] += flt.add_batch(h[m], f[m], on_toofull="count")
        if use_pairs and pairs_b:
            shards = sorted(pairs_b)
            yield pd.DataFrame(
                {
                    "name": name,
                    "shard": shards,
                    "part_id": pid,
                    "sketch": [
                        pack_pairs(
                            np.concatenate(pairs_b[s]), np.concatenate(pairs_f[s]), size, fpsize
                        )
                        for s in shards
                    ],
                    "fpcount": [rows[s] for s in shards],
                    "toofull": False,
                    "broken": False,
                    "rows": [rows[s] for s in shards],
                    "dropped": 0,
                }
            )
        elif filters:
            yield pd.DataFrame(
                {
                    "name": name,
                    "shard": list(filters),
                    "part_id": pid,
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


def _merge_group(key, pdf, final=True):
    name, shard = str(key[0]), int(key[1])
    blobs = [bytes(b) for b in pdf["sketch"]]
    in_fp = int(pdf["fpcount"].sum())
    any_broken = bool(pdf["broken"].any())
    if final:
        m = CuckooFilter.merge(blobs, seed=stable_seed("merge", name, shard), on_toofull="count")
        sketch = m.to_bytes()
        fpcount = m.fpcount
        toofull, broken = m.is_toofull(), m.is_broken() or any_broken
        dropped = int(pdf["dropped"].sum()) + (in_fp - m.fpcount)
    else:
        # intermediate tree stage: cheap pair concatenation, no filter build
        sketch = CuckooFilter.concat_pair_blobs(blobs)
        fpcount = in_fp
        toofull, broken = bool(pdf["toofull"].any()), any_broken
        dropped = int(pdf["dropped"].sum())
    return pd.DataFrame(
        {
            "name": [name],
            "shard": [shard],
            "part_id": [-1],  # merged rows span partitions
            "sketch": [sketch],
            "fpcount": [fpcount],
            "toofull": [toofull],
            "broken": [broken],
            "rows": [int(pdf["rows"].sum())],
            "dropped": [dropped],
        }
    )


def merge_partials(partials: DataFrame, fanin: int = 64) -> DataFrame:
    """Tree-reduce the partials to one row per (name, shard).

    Stages with more than ``fanin`` partials per shard are pre-merged in
    groups (group assignment hashes the blob — arbitrary but deterministic;
    the canonical merge makes any grouping byte-equivalent), so no single
    task ever merges more than ``fanin`` blobs. Only partial blobs shuffle.

    Partials are materialized eagerly (localCheckpoint) before the sizing
    count so the expensive build stage runs exactly once — without this the
    count action would re-execute the whole upstream build.
    """
    df = partials.localCheckpoint(eager=True)
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
            .applyInPandas(lambda key, pdf: _merge_group(key[:2], pdf, final=False), PARTIAL_SCHEMA)
        ).localCheckpoint(eager=True)
    return df.groupBy("name", "shard").applyInPandas(
        lambda key, pdf: _merge_group(key, pdf, final=True), PARTIAL_SCHEMA
    )


def build_filter(df: DataFrame, spec: CuckooSpec, key=None, **kw) -> DataFrame:
    """build_partials + merge_partials in one call."""
    fanin = kw.pop("fanin", 64)
    return merge_partials(build_partials(df, spec, key=key, **kw), fanin=fanin)


def fold_partials_into(prior: DataFrame, partials: DataFrame, spec: CuckooSpec) -> DataFrame:
    """NON-canonical incremental fold: merge this batch's partials into an
    existing merged state in O(new items) — the existing dense blobs are
    NOT re-built (unlike :func:`merge_partials`, whose canonical re-insert
    costs O(total filter content) per call).

    Same fp multiset → identical membership/count/remove semantics; byte
    layout depends on fold order, so blobs are not comparable to the
    canonical path (see ``CuckooFilter.merge_into``). ``prior`` may be
    empty (first batch folds into a fresh filter seeded exactly like the
    canonical merge)."""
    import pandas as pd

    def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
        name, shard = key[0], int(key[1])
        pr = pdf[pdf["_prior"]]
        rest = pdf[~pdf["_prior"]].sort_values("part_id")
        if len(pr):
            flt = CuckooFilter.from_bytes(bytes(pr["sketch"].iloc[0]))
        else:
            flt = CuckooFilter.create(
                spec.size, spec.fpsize, seed=stable_seed("merge", name, shard)
            )
        expected = flt.fpcount + int(rest["fpcount"].sum())
        flt.merge_into([bytes(b) for b in rest["sketch"]], on_toofull="count")
        return pd.DataFrame(
            {
                "name": [name],
                "shard": [shard],
                "part_id": [-1],
                "sketch": [flt.to_bytes()],
                "fpcount": [flt.fpcount],
                "toofull": [flt.is_toofull()],
                "broken": [flt.is_broken()],
                "rows": [int(pdf["rows"].sum())],
                "dropped": [int(pdf["dropped"].sum()) + (expected - flt.fpcount)],
            }
        )

    tagged = prior.withColumn("_prior", F.lit(True)).unionByName(
        partials.withColumn("_prior", F.lit(False))
    )
    return tagged.groupBy("name", "shard").applyInPandas(fold, PARTIAL_SCHEMA)


def build_filter_direct(
    df: DataFrame,
    spec: CuckooSpec,
    key=None,
    hash_col: str = HASH_COL,
    fp_col: str = FP_COL,
    reduce_partitions: int | None = None,
) -> DataFrame:
    """One-shuffle build: repartition the (hash, fp) pairs by shard and build
    each shard's FINAL filter in a single reduce pass — no partial blobs, no
    merge stage, no extra jobs.

    Byte-identical to ``build_filter``: the reducer inserts the same sorted
    canonical-pair multiset with the same name-derived seed the tree merge
    uses, so both paths produce the same blob (tested). Shuffle volume is
    16 B/row — same order as the pairs-partials path — but in ONE stage.

    Trade-off vs the partials path: fastest wall-clock and fewest stages,
    but no per-input-partition partials for checkpoint/resume; use
    ``checkpointed_build`` when resumability matters.
    """
    if key is not None:
        df = with_hash_fp(df, key, hash_col, fp_col)
    name, size, fpsize, num_shards = spec.name, spec.size, spec.fpsize, spec.num_shards
    sel = df.select(
        F.col(hash_col).cast("long").alias(hash_col), F.col(fp_col).cast("long").alias(fp_col)
    ).repartition(reduce_partitions or num_shards, _shard_col(hash_col, num_shards))

    def reduce_shards(batches):
        hs: dict[int, list] = {}
        fs: dict[int, list] = {}
        rows: dict[int, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            h = i64_to_u64(pdf[hash_col].to_numpy())
            f = i64_to_u64(pdf[fp_col].to_numpy())
            sh = shard_of(h, num_shards)
            for s in np.unique(sh):
                m = sh == s
                s = int(s)
                hs.setdefault(s, []).append(h[m])
                fs.setdefault(s, []).append(f[m])
                rows[s] = rows.get(s, 0) + int(m.sum())
        out = []
        for s in sorted(hs):
            bidx, fp = canonical_pairs(np.concatenate(hs[s]), np.concatenate(fs[s]), size, fpsize)
            order = np.lexsort((fp, bidx))
            flt = CuckooFilter.create(size, fpsize, seed=stable_seed("merge", name, s))
            dropped = flt.add_batch(bidx[order], fp[order], on_toofull="count")
            out.append(
                {
                    "name": name,
                    "shard": s,
                    "part_id": -1,
                    "sketch": flt.to_bytes(),
                    "fpcount": flt.fpcount,
                    "toofull": flt.is_toofull(),
                    "broken": flt.is_broken(),
                    "rows": rows[s],
                    "dropped": dropped,
                }
            )
        if out:
            yield pd.DataFrame(out)

    return sel.mapInPandas(reduce_shards, PARTIAL_SCHEMA)


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

    Performance: every column of ``df`` rides through Arrow to the Python
    worker and back — select only the columns you need before probing
    (probing a key-only projection is several times faster than a wide row).

    CAUTION: ``key`` must be the SAME expression (including type!) used at
    build time — ``xxhash64(long)`` ≠ ``xxhash64(string)``. Hashing
    consistency is the caller's responsibility, mirroring the reference's
    client-hashes contract (README.md:40-53).

    DEVIATION from the reference (SURVEY.md §4.1): operating on a
    nonexistent Redis key errors in the reference
    (src/redis-cuckoofilter.zig:243-247, WRONGTYPE/no-such-key); here a
    shard with no blob (never built / empty shard id) answers "definitely
    absent" instead of raising. In a filter library over immutable builds
    the empty filter IS the correct value of an absent shard; callers who
    need strict existence semantics should validate
    ``ShardedCuckoo.filters`` coverage up front.
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


def probe_cogrouped(
    merged: DataFrame,
    probes: DataFrame,
    spec: CuckooSpec,
    key=None,
    hash_col: str = HASH_COL,
    fp_col: str = FP_COL,
    result_col: str = "member",
) -> DataFrame:
    """CF.CHECK without broadcasting: co-partition probes with their shard's
    blob and answer each shard's probes in one vectorized kernel call.

    The scale path when the total filter exceeds what every executor should
    hold: each task receives exactly ONE shard blob plus that shard's
    probes (both sides shuffle on the 4-byte shard id). Equivalent results
    to :func:`probe` (tested), including the missing-shard DEVIATION
    documented there: probes co-grouped with no blob return
    "definitely absent" rather than erroring like the reference's
    missing-key check (src/redis-cuckoofilter.zig:243-247)."""
    had_key = key is not None
    if had_key:
        probes = with_hash_fp(probes, key, hash_col, fp_col)
    keep = [c for c in probes.columns if c not in (hash_col, fp_col)] if had_key else list(probes.columns)
    p = probes.withColumn("shard", _shard_col(hash_col, spec.num_shards)).withColumn(
        "name", F.lit(spec.name)
    )
    out_schema = T.StructType(
        [probes.schema[c] for c in keep] + [T.StructField(result_col, T.BooleanType())]
    )
    num_shards = spec.num_shards

    def run(key_tuple, left, right):
        if right.empty:
            return right.reindex(columns=keep).assign(**{result_col: []})
        if left.empty:
            return right[keep].assign(**{result_col: False})
        flt = CuckooFilter.from_bytes(bytes(left["sketch"].iloc[0]))
        h = i64_to_u64(right[hash_col].to_numpy())
        f = i64_to_u64(right[fp_col].to_numpy())
        hit = flt.contains_batch(h, f, raise_broken_on_miss=False)
        return right[keep].assign(**{result_col: hit})

    return (
        merged.groupby("name", "shard")
        .cogroup(p.groupby("name", "shard"))
        .applyInPandas(run, out_schema)
    )


def probe_auto(
    merged: DataFrame,
    probes: DataFrame,
    spec: CuckooSpec,
    key=None,
    broadcast_limit_bytes: int = 256 << 20,
    **kw,
) -> DataFrame:
    """CF.CHECK with automatic physical strategy: broadcast the shard blobs
    when the TOTAL filter size fits comfortably on every executor
    (default 256 MiB — tune to executor memory), else co-partition probes
    with their shard (:func:`probe_cogrouped`). The decision reads only
    the per-shard blob SIZES (one tiny aggregation over the merged table),
    never ships the blobs to the driver unless broadcasting anyway. Both
    paths return identical results (tested)."""
    total = merged.select(F.sum(F.octet_length("sketch")).alias("b")).first()["b"] or 0
    if total <= broadcast_limit_bytes:
        return probe(probes, ShardedCuckoo.from_df(merged, spec), key=key, **kw)
    return probe_cogrouped(merged, probes, spec, key=key, **kw)


def semi_join_via_filter(
    big: DataFrame,
    small: DataFrame,
    big_key,
    small_key,
    fpsize: int = 2,
    num_shards: int = 8,
    name: str = "semijoin",
    broadcast_limit_bytes: int = 256 << 20,
) -> DataFrame:
    """Sketch-accelerated semi join (a distributed runtime filter — the
    classic use of these sketches in a query engine): build a cuckoo filter
    on ``small``'s keys, probe ``big`` through it BEFORE any join shuffle,
    then remove the filter's false positives with an exact left-semi join
    over the (now tiny) survivors. Output is exact — no false negatives
    means the pre-filter never drops a true match, and the exact join
    drops the ≤bound false positives.

    Why it scales: the filter blob is ~``fpsize`` bytes/key — bounded by
    the SMALL side, like a broadcast join's hash table but ~50× smaller,
    so it fits where a broadcast join wouldn't; the big side is filtered
    map-side (no shuffle), and only ``selectivity + fp_rate`` of it ever
    reaches the exchange. probe_auto escalates to the co-partitioned probe
    when even the blobs outgrow ``broadcast_limit_bytes``.

    ``big_key``/``small_key`` must be the same TYPE (the probe hashing
    contract, see :func:`probe`).

    Exactness guard: the filter is built from the DISTINCT key set (a
    duplicate-keyed small side would overflow a bucket with identical
    fingerprints and silently drop items), and the build's drop/too-full
    counters are checked — a dropped fingerprint would be a silent false
    negative, so it raises instead. The merged filter is localCheckpointed
    before probing (the sizing aggregate and blob collect would otherwise
    re-execute the build shuffle — the merge_partials precedent).
    """
    from sketchlib.kernels.cuckoo import TooFullError, size_for

    big_key = F.col(big_key) if isinstance(big_key, str) else big_key
    small_key = F.col(small_key) if isinstance(small_key, str) else small_key
    # the cached key table is referenced by the returned plan, so it can't
    # be unpersisted here; Spark's ContextCleaner releases it once the
    # result plan is garbage-collected. Callers issuing MANY semi joins in
    # one long session should pre-distinct/cache keys themselves and pass
    # them as `small` to control the lifetime.
    keys = small.select(small_key.alias("__k")).distinct().cache()
    n = keys.count()  # sizing job (CF.SIZEFOR) — also materializes the cache
    spec = CuckooSpec(
        name, max(size_for(max(n, 1), fpsize), 1024), fpsize, num_shards=num_shards
    )
    merged = build_filter_direct(keys, spec, key=F.col("__k")).localCheckpoint(
        eager=True
    )
    guard = merged.agg(
        F.sum("dropped").alias("d"), F.max("toofull").alias("t")
    ).first()
    if (guard["d"] or 0) > 0 or guard["t"]:
        raise TooFullError(
            f"semi_join_via_filter('{name}'): build dropped {guard['d']} "
            "fingerprint(s) — the pre-filter would silently drop matching rows; "
            "increase the filter size or fpsize"
        )
    pre = probe_auto(
        merged, big, spec, key=big_key, broadcast_limit_bytes=broadcast_limit_bytes
    ).filter(F.col("member")).drop("member")
    return (
        pre.withColumn("__bk", big_key)
        .join(keys, F.col("__bk") == F.col("__k"), "left_semi")
        .drop("__bk")
    )


def fix_toofull_shards(merged: DataFrame) -> DataFrame:
    """CF.FIXTOOFULL, distributed (reference redis-cuckoofilter.zig:325-353):
    try to re-home each shard's homeless fingerprint. Shards that stay too
    full keep the flag (the reference errors; the flag carries it here)."""
    from sketchlib.kernels.cuckoo import TooFullError

    def fix(key, pdf):
        out = pdf.copy()
        sketches, toofull = [], []
        for b in pdf["sketch"]:
            flt = CuckooFilter.from_bytes(bytes(b))
            try:
                flt.fix_toofull()
            except TooFullError:
                pass
            sketches.append(flt.to_bytes())
            toofull.append(flt.is_toofull())
        out["sketch"] = sketches
        out["toofull"] = toofull
        return out

    return merged.groupby("name", "shard").applyInPandas(fix, PARTIAL_SCHEMA)


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
                "part_id": [-1],
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
