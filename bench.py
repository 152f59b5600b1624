#!/usr/bin/env python
"""sketchlib benchmark — prints ONE JSON line for the driver.

Headline: distributed cuckoo build+merge throughput (docs/sec) over a
deterministic synthetic Common-Crawl-style ``pages`` table (BASELINE.json
metric), plus probe/remove, sibling sketches, a relational query, and
observed FP rates per fingerprint width.

Scaling evidence (north_rule; no real cluster in this sandbox): the same
build job runs at local[8] and local[32] on the same materialized input via
subprocesses; efficiency = throughput(32) / (4 × throughput(8)).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), SKETCHLIB_BENCH_PAGES (default 600000),
SKETCHLIB_BENCH_SCALING=0 to skip the scaling subprocesses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PAGES_N = int(os.environ.get("SKETCHLIB_BENCH_PAGES", "600000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_PATH = f"/tmp/sketchlib_bench/pages_{PAGES_N}.parquet"
HELDOUT_PATH = f"/tmp/sketchlib_bench/heldout_{PAGES_N}.parquet"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def materialize_pages(spark):
    from sketchlib.pipeline import generate_pages

    if not os.path.exists(PAGES_PATH):
        log(f"materializing {PAGES_N} pages → {PAGES_PATH}")
        generate_pages(spark, PAGES_N, n_hosts=10_000, seed=42, partitions=CPUS * 2).write.mode(
            "overwrite"
        ).parquet(PAGES_PATH)
    if not os.path.exists(HELDOUT_PATH):
        # disjoint url space: indices beyond the inserted range
        spark.range(PAGES_N, PAGES_N + PAGES_N // 6).selectExpr(
            "concat('https://heldout.example.com/p/', id) AS url"
        ).write.mode("overwrite").parquet(HELDOUT_PATH)


def build_pages_filter(spark, fpsize: int, num_shards: int = 8):
    from pyspark.sql import functions as F

    from sketchlib.kernels.cuckoo import size_for
    from sketchlib.spark.cuckoo import CuckooSpec, ShardedCuckoo, build_filter_direct

    pages = spark.read.parquet(PAGES_PATH)
    per_shard = size_for(int(PAGES_N * 1.3) // num_shards, fpsize)
    spec = CuckooSpec(f"bench-fp{fpsize * 8}", per_shard, fpsize, num_shards=num_shards)
    merged = build_filter_direct(pages, spec, key=F.col("url")).localCheckpoint(eager=True)
    sc = ShardedCuckoo.from_df(merged, spec)
    return pages, spec, merged, sc


SCALE_N = int(os.environ.get("SKETCHLIB_BENCH_SCALE_ROWS", "40000000"))


def scaling_run(cores: int) -> dict:
    """Subprocess entry: time the end-to-end one-shuffle build+merge at a
    given parallelism. The input is generated in-plan (pure JVM exprs) so
    every phase — generate, hash, shuffle, reduce-insert — is parallel work,
    exactly like scanning a distributed store. num_shards = 32 at both
    levels so the reduce parallelism is part of the fixed job definition."""
    from pyspark.sql import functions as F

    from sketchlib.kernels.cuckoo import size_for
    from sketchlib.spark.cuckoo import CuckooSpec, ShardedCuckoo, build_filter_direct
    from sketchlib.spark.session import get_spark

    n = SCALE_N
    spark = get_spark(
        app=f"bench-scale-{cores}",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"},
    )
    urls = spark.range(0, n, numPartitions=cores * 3).selectExpr(
        "concat('https://host', id % 10000, '.example.com/p/', id) AS url"
    )
    num_shards = 32
    spec = CuckooSpec("scale", size_for(int(n * 1.3) // num_shards, 2), 2, num_shards=num_shards)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        merged = build_filter_direct(urls, spec, key=F.col("url"), reduce_partitions=num_shards)
        sc = ShardedCuckoo.from_df(merged, spec)
        dt = time.perf_counter() - t0
        assert sc.count() == n, f"build lost rows: {sc.count()}"
        best = min(best, dt)

    # compute-dense control: MinHash signatures (64 hashes/bigram, ~40
    # bigrams/doc) — high CPU per byte, shows where the single-box memory
    # bus (not the architecture) caps the bandwidth-light build job
    from sketchlib.dedup import minhash_signatures

    nd = int(os.environ.get("SKETCHLIB_BENCH_DENSE_ROWS", "600000"))
    docs = spark.range(0, nd, numPartitions=cores * 3).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(0, 39), "
        "i -> concat('w', pmod(xxhash64(id, i), 500)))) AS text",
    )
    dense_best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        assert minhash_signatures(docs, num_hashes=64).count() == nd
        dense_best = min(dense_best, time.perf_counter() - t0)
    spark.stop()
    return {
        "cores": cores,
        "seconds": best,
        "rows": n,
        "docs_per_sec": n / best,
        "dense_rows": nd,
        "dense_docs_per_sec": nd / dense_best,
    }


def _burn(k: int) -> int:
    x = 0
    for i in range(k):
        x += i * i
    return x


def cpu_control() -> dict:
    """Raw-CPU ceiling of THIS box right now: multiprocessing throughput at
    8 vs 32 processes. On this sandbox the deliverable CPU varies over time
    (observed 0.65-0.93 efficiency for pure CPU work) — this control
    contextualizes the Spark numbers measured seconds later."""
    import multiprocessing as mp

    time.sleep(5)  # let the previous Spark JVM finish shutting down
    out = {}
    for procs in (8, 32):
        with mp.Pool(procs) as p:
            p.map(_burn, [3_000_000] * procs)  # warm
            t0 = time.perf_counter()
            p.map(_burn, [20_000_000] * procs)
            out[procs] = procs * 20_000_000 / (time.perf_counter() - t0)
    out["efficiency_8_to_32"] = round(out[32] / (4 * out[8]), 3)
    return out


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling-run":
        print(json.dumps(scaling_run(int(sys.argv[2]))))
        return

    from pyspark.sql import functions as F

    from sketchlib.spark.session import get_spark

    spark = get_spark(app="sketchlib-bench", cores=CPUS, shuffle_partitions=CPUS)
    materialize_pages(spark)

    queries: dict[str, float] = {}
    extra: dict = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        queries[name] = round(time.perf_counter() - t0, 3)
        log(f"  {name}: {queries[name]}s")
        return out

    # headline: build+merge at FP16 over the pages table
    pages, spec16, merged16, sc16 = timed(
        "cuckoo_build_fp16", lambda: build_pages_filter(spark, fpsize=2)
    )
    extra["cuckoo_build_docs_per_sec"] = round(PAGES_N / queries["cuckoo_build_fp16"], 1)
    assert sc16.count() == PAGES_N

    from sketchlib.spark.cuckoo import ShardedCuckoo, build_filter, probe, remove_keys

    def _partials_path():
        sc2 = ShardedCuckoo.from_df(
            build_filter(pages, spec16, key=F.col("url"), fanin=256), spec16
        )
        assert sc2.count() == PAGES_N
        return sc2
    timed("cuckoo_build_partials_fp16", _partials_path)

    urls_only = pages.select("url")  # probe ships df columns through Arrow: select the key
    misses = timed(
        "cuckoo_probe_all",
        lambda: probe(urls_only, sc16, key=F.col("url")).filter(~F.col("member")).count(),
    )
    assert misses == 0, "false negatives!"
    extra["probe_docs_per_sec"] = round(PAGES_N / queries["cuckoo_probe_all"], 1)

    def _remove():
        tenth = pages.filter(F.crc32(F.col("url")) % 10 == 0)
        removed = remove_keys(merged16, tenth, spec16, key=F.col("url"))
        return ShardedCuckoo.from_df(removed, spec16), tenth.count()

    sc_removed, n_removed = timed("cuckoo_remove_10pct", _remove)
    assert sc_removed.count() == PAGES_N - n_removed
    assert not sc_removed.is_broken()

    # observed FP rates per width on held-out urls
    held = spark.read.parquet(HELDOUT_PATH)
    n_held = held.count()
    fp_rates = {}
    for fpsize in (1, 4):
        _, _, _, sc = timed(f"cuckoo_build_fp{fpsize * 8}", lambda f=fpsize: build_pages_filter(spark, f))
        hits = probe(held, sc, key=F.col("url")).filter(F.col("member")).count()
        fp_rates[f"fp{fpsize * 8}"] = hits / n_held
    hits16 = probe(held, sc16, key=F.col("url")).filter(F.col("member")).count()
    fp_rates["fp16"] = hits16 / n_held
    extra["observed_fp_rates"] = fp_rates
    extra["fp_bounds"] = {"fp8": 3.125e-2, "fp16": 1.22070312e-4, "fp32": 9.31322574e-10}

    # sibling sketches over the driver tables
    from sketchlib.spark.agg import SketchSpec, build_sketch

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    timed("hll_distinct_users", lambda: build_sketch(ev, SketchSpec("b-hll", "hll", (14,)), "user_id").estimate())
    timed("cms_event_types", lambda: build_sketch(ev, SketchSpec("b-cms", "cms", (2048, 5)), "event_type").total)
    timed("kll_value_quantiles", lambda: build_sketch(ev, SketchSpec("b-kll", "kll", (256,)), "value").quantile(0.5))

    import sketchlib.queries as q

    timed("lineitem_pricing_summary", lambda: q.lineitem_pricing_summary(spark, SF_DIR).collect())

    # scaling: same job, two parallelism levels, separate JVMs; plus a
    # compute-dense job and a raw-CPU control (this sandbox's deliverable
    # CPU and memory bandwidth fluctuate — see BENCH/BASELINE.md)
    if os.environ.get("SKETCHLIB_BENCH_SCALING", "1") != "0":
        spark.stop()
        scale = {}
        for cores in (8, 32):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scaling-run", str(cores)],
                capture_output=True, text=True, timeout=1200,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = out.stdout.strip().splitlines()[-1]
            scale[cores] = json.loads(line)
            log(f"  scaling local[{cores}]: {scale[cores]['seconds']:.2f}s")
        ctl = cpu_control()
        eff = scale[32]["docs_per_sec"] / (4 * scale[8]["docs_per_sec"])
        eff_dense = scale[32]["dense_docs_per_sec"] / (4 * scale[8]["dense_docs_per_sec"])
        extra["scaling"] = {
            "build_rows": scale[8]["rows"],
            "cores_8_docs_per_sec": round(scale[8]["docs_per_sec"], 1),
            "cores_32_docs_per_sec": round(scale[32]["docs_per_sec"], 1),
            "efficiency_8_to_32": round(eff, 3),
            "dense_minhash_cores_8_docs_per_sec": round(scale[8]["dense_docs_per_sec"], 1),
            "dense_minhash_cores_32_docs_per_sec": round(scale[32]["dense_docs_per_sec"], 1),
            "dense_efficiency_8_to_32": round(eff_dense, 3),
            "machine_cpu_control_efficiency_8_to_32": ctl["efficiency_8_to_32"],
        }

    result = {
        "metric": "headline_suite_seconds",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(SF_DIR.rstrip("/")),
        "pages_rows": PAGES_N,
        **extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
