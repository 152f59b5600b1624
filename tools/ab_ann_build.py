"""Interleaved A/B harness for the ANN index-build path (VERDICT r8
findings #1/#2 → r9 rework): run the bench-shaped IVFPQ build, the
gate-shaped IVF build, and both probes from ONE repo tree and print one
JSON line of wall times. The outer loop alternates trees within the same
minute so the VM's >2x CPU drift hits both sides equally (the r6
ab_kernels precedent).

Usage: python tools/ab_ann_build.py <repo_dir>
"""
import json
import os
import sys
import tempfile
import time

REPO = sys.argv[1]
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import functions as F  # noqa: E402

from sketchlib.similarity import (  # noqa: E402
    clustered_embeddings,
    ivf_pq_topk,
    ivf_topk,
    write_ivf_index,
    write_ivf_pq_index,
)
from sketchlib.spark.session import get_spark  # noqa: E402

t_start = time.perf_counter()
spark = get_spark(app="ab-ann-build", cores=CPUS, shuffle_partitions=CPUS)
out = {"repo": REPO}

emb_raw = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(CPUS)
emb_pq = clustered_embeddings(emb_raw, n_clusters=16, amp=0.0625)

# warm-up: a small build primes codegen + python workers (bench.py rationale)
with tempfile.TemporaryDirectory(prefix="ab-ann-warm-") as td:
    write_ivf_pq_index(
        emb_pq.limit(300), os.path.join(td, "w"), k=4, n_sub=16, ksub=4, lloyd_iters=1,
        pq_iters=1,
    )

# 1. bench-shaped IVFPQ build (the ann_ivf_pq_build query) + probe
with tempfile.TemporaryDirectory(prefix="ab-ann-pq-") as td:
    idx = os.path.join(td, "index")
    t0 = time.perf_counter()
    write_ivf_pq_index(emb_pq, idx, k=16, n_sub=16, ksub=16, lloyd_iters=2)
    out["ivf_pq_build_s"] = round(time.perf_counter() - t0, 3)
    q = emb_pq.filter(F.col("vec_id") == 0).first()["embedding"]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        ivf_pq_topk(spark, idx, q, k=10, nprobe=2, shortlist=30,
                    rescore_src=emb_pq).count()
        ts.append(time.perf_counter() - t0)
    out["ivf_pq_probe_s"] = round(sorted(ts)[1], 3)

# 2. gate-shaped raw-IVF build (the ann_ivf_topk cache build) + probe
with tempfile.TemporaryDirectory(prefix="ab-ann-ivf-") as td:
    idx = os.path.join(td, "index")
    t0 = time.perf_counter()
    write_ivf_index(emb_raw, idx, k=16, lloyd_iters=2)
    out["ivf_build_s"] = round(time.perf_counter() - t0, 3)
    q = emb_raw.filter(F.col("vec_id") == 0).first()["embedding"]
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        ivf_topk(spark, idx, q, k=10, nprobe=12).count()
        ts.append(time.perf_counter() - t0)
    out["ivf_probe_s"] = round(sorted(ts)[1], 3)

out["total_s"] = round(time.perf_counter() - t_start, 3)
print("ABRESULT " + json.dumps(out))
