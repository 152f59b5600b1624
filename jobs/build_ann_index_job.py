#!/usr/bin/env python
"""spark-submit entry point: build an ANN index (IVF, or IVF+PQ) over an
embeddings table and write the index + a metrics report.

The production execution mode::

    zip -r sketchlib.zip sketchlib
    spark-submit --py-files sketchlib.zip jobs/build_ann_index_job.py \
        --input /data/embeddings.parquet --output /data/ann/ivfpq \
        --kind ivfpq --k 4096 --n-sub 16 --ksub 16 \
        --id-col vec_id --vec-col embedding

Sizing on a cluster: --k (coarse lists) to roughly sqrt(n_vectors) so a
probe at nprobe≈k/64 touches ~1.5% of the corpus; the PQ codes table is
n_sub·log2(ksub)/8 bytes per vector (16×4 bit = 8 B — a 100 TB float32
corpus of 512-dim vectors compresses to ~0.4 TB of codes), partitioned
on the coarse centroid so probes read only the probed directories. The
written layout is exactly what sketchlib.similarity.ivf_pq_topk /
ivf_topk probe.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path of the embeddings table")
    ap.add_argument("--output", required=True, help="output dir for the index")
    ap.add_argument("--kind", choices=["ivf", "ivfpq"], default="ivfpq")
    ap.add_argument("--k", type=int, default=16, help="coarse centroids (IVF lists)")
    ap.add_argument("--lloyd-iters", type=int, default=2)
    ap.add_argument("--n-sub", type=int, default=16, help="PQ subspaces")
    ap.add_argument("--ksub", type=int, default=16, help="codes per subspace")
    ap.add_argument("--pq-iters", type=int, default=2)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--report", default=None, help="metrics JSON path (default: <output>_report.json)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from sketchlib.similarity import write_ivf_index, write_ivf_pq_index

    spark = SparkSession.builder.appName(f"sketchlib-ann-{args.kind}").getOrCreate()
    emb = spark.read.parquet(args.input)

    t0 = time.time()
    if args.kind == "ivfpq":
        write_ivf_pq_index(
            emb,
            args.output,
            k=args.k,
            n_sub=args.n_sub,
            ksub=args.ksub,
            lloyd_iters=args.lloyd_iters,
            pq_iters=args.pq_iters,
            id_col=args.id_col,
            vec_col=args.vec_col,
        )
    else:
        write_ivf_index(
            emb,
            args.output,
            k=args.k,
            lloyd_iters=args.lloyd_iters,
            id_col=args.id_col,
            vec_col=args.vec_col,
        )
    elapsed = time.time() - t0

    stored = spark.read.parquet(args.output)
    lists = stored.groupBy("centroid").count().collect()
    report = {
        "kind": args.kind,
        "k": args.k,
        "n_vectors": int(sum(r["count"] for r in lists)),
        "n_lists_nonempty": len(lists),
        "largest_list": int(max((r["count"] for r in lists), default=0)),
        "build_seconds": round(elapsed, 3),
        "columns": sorted(stored.columns),
    }
    path = args.report or args.output + "_report.json"
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
