"""Interleaved A/B harness (VERDICT r5 #1c): run the four headline kernels
(build fp16 / probe / minhash dedup / sessionize) from ONE repo tree and
print one JSON line of wall times. The outer loop alternates trees within
the same minute so the VM's >2x CPU drift hits both sides equally.
"""
import json
import os
import sys
import time

REPO = sys.argv[1]
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402  (the tree's own bench helpers)
from sketchlib.spark.session import get_spark  # noqa: E402

t_start = time.perf_counter()
spark = get_spark(app="ab-kernels", cores=32, shuffle_partitions=32)
bench.materialize_pages(spark)

out = {"repo": REPO}

# warm-ups exactly as bench.py does (codegen + python-worker startup)
bench.build_pages_filter(spark, fpsize=2)

def med(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]

# 1. build+merge fp16
t0 = time.perf_counter()
pages, spec16, merged16, sc16 = bench.build_pages_filter(spark, fpsize=2)
out["build_s"] = time.perf_counter() - t0
assert sc16.count() == bench.PAGES_N

# 2. probe all (median of 3)
from sketchlib.spark.cuckoo import probe  # noqa: E402

urls_only = pages.select("url")
out["probe_s"] = med(
    lambda: probe(urls_only, sc16, key=F.col("url")).filter(~F.col("member")).count(),
    3,
)

# 3. minhash dedup over sf0.1 documents (with the same warm-up + fan-out)
from sketchlib.dedup import minhash_lsh_pairs  # noqa: E402

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(32)
n_docs = docs.count()
minhash_lsh_pairs(docs.limit(200), threshold=0.5).count()
t0 = time.perf_counter()
minhash_lsh_pairs(docs, threshold=0.5).localCheckpoint(eager=True)
out["dedup_s"] = time.perf_counter() - t0

# 4. sessionize events (median of 3)
from sketchlib.relops import sessionize  # noqa: E402

ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
n_ev = ev.count()
out["sessionize_s"] = med(lambda: sessionize(ev, "user_id", "ts").count(), 3)

out["build_docs_per_sec"] = round(bench.PAGES_N / out["build_s"], 1)
out["probe_docs_per_sec"] = round(bench.PAGES_N / out["probe_s"], 1)
out["dedup_docs_per_sec"] = round(n_docs / out["dedup_s"], 1)
out["sessionize_events_per_sec"] = round(n_ev / out["sessionize_s"], 1)
out["total_s"] = time.perf_counter() - t_start
print("ABRESULT " + json.dumps(out))
