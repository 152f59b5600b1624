#!/usr/bin/env python
"""spark-submit entry point: the composed training-data pipeline over a
documents table — quality filter → deterministic held-out split → exact
dedup → near-dup pair generation (MinHash-LSH, candidate-only exact
verify) → connected-component survivor selection → FP32 membership filter
over the survivors → sequence packing (concat-then-chunk at a fixed token
budget) → metrics report.

The north-rule execution mode::

    zip -r sketchlib.zip sketchlib
    spark-submit --py-files sketchlib.zip jobs/training_pipeline_job.py \
        --input /data/documents.parquet --output /data/clean \
        --holdout-threshold 28 --jaccard 0.5 --num-shards 4096 \
        --gopher --pii-scrub --mix-targets src0=0.5,src1=0.3,src2=0.2

Optional curation stages (off by default): ``--gopher`` adds the Gopher
repetition quality gate after the length filter, ``--mix-targets``
resamples survivors to target source fractions, ``--pii-scrub`` redacts
emails/IPs/phones before packing (placeholder tokens count toward the
budget).

Every stage is a registry-oracled operator (see sketchlib/queries_data.py);
this job only composes them. Output: ``<output>/survivors`` (doc_id +
canonical cluster), ``<output>/filter`` (sharded cuckoo membership filter
over survivor doc_ids), ``<output>/packed`` (doc_id → sequence bin +
token offset at --seq-budget), ``<output>/metrics.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--holdout-threshold", default="28", help="md5 hex threshold for the held-out split")
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--fpsize", type=int, default=4, choices=[1, 2, 4])
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--seq-budget", type=int, default=2048,
                    help="token budget per packed training sequence")
    ap.add_argument("--gopher", action="store_true",
                    help="also apply the Gopher repetition quality gate")
    ap.add_argument("--pii-scrub", action="store_true",
                    help="redact emails/IPs/phones before packing")
    ap.add_argument("--mix-targets", default=None,
                    help="domain mixing, e.g. 'src0=0.5,src1=0.3,src2=0.2'")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sketchlib.dedup import dedup_exact, minhash_lsh_pairs, near_dup_clusters
    from sketchlib.kernels.cuckoo import size_for
    from sketchlib.relops import sample_by_hash
    from sketchlib.spark.cuckoo import CuckooSpec, ShardedCuckoo, build_filter_direct, probe
    from sketchlib.textops import pack_sequences, token_count_sql

    spark = SparkSession.builder.appName("sketchlib-training-pipeline").getOrCreate()
    os.makedirs(args.output, exist_ok=True)
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    ok = docs.selectExpr("*", f"{token_count_sql('spark')} AS __tc").filter(
        f"__tc BETWEEN {args.min_tokens} AND {args.max_tokens}"
    ).drop("__tc")
    gopher_kept = None
    if args.gopher:
        from sketchlib.textops import gopher_quality_filter

        gf = gopher_quality_filter(ok).filter("keep").select("doc_id")
        ok = ok.join(gf, "doc_id", "left_semi")
        gopher_kept = ok.count()
    # held-out split (reproducible across engines/runs) excluded from training
    held = sample_by_hash(ok, "CAST(doc_id AS STRING)", args.holdout_threshold).select("doc_id")
    train = ok.join(held, "doc_id", "left_anti")

    exact_kept = dedup_exact(train).select(F.col("keep_doc_id").alias("doc_id"))
    kept_docs = train.join(exact_kept, "doc_id", "left_semi")
    pairs = minhash_lsh_pairs(kept_docs, threshold=args.jaccard)
    clusters = near_dup_clusters(pairs)
    # survivors: cluster canonicals + docs in no near-dup pair at all
    survivors = (
        kept_docs.select("doc_id")
        .join(clusters.filter("doc_id <> cluster_id"), "doc_id", "left_anti")
    )
    # write FIRST, count from the parquet — counting the lineage would
    # execute the LSH/clustering pipeline once more before the write does
    survivors.write.mode("overwrite").parquet(os.path.join(args.output, "survivors"))
    n_surv = spark.read.parquet(os.path.join(args.output, "survivors")).count()

    spec = CuckooSpec(
        "train-members",
        size_for(max(n_surv // args.num_shards, 1) * 2, args.fpsize),
        args.fpsize,
        num_shards=args.num_shards,
    )
    merged = build_filter_direct(
        spark.read.parquet(os.path.join(args.output, "survivors")),
        spec,
        key=F.col("doc_id").cast("string"),
    )
    merged.write.mode("overwrite").parquet(os.path.join(args.output, "filter"))
    sc = ShardedCuckoo.from_df(spark.read.parquet(os.path.join(args.output, "filter")), spec)
    # probe the written survivors parquet, not the in-memory lineage — the
    # count would otherwise re-execute the LSH/clustering pipeline
    fn = (
        probe(
            spark.read.parquet(os.path.join(args.output, "survivors")).select("doc_id"),
            sc,
            key=F.col("doc_id").cast("string"),
        )
        .filter("NOT member")
        .count()
    )
    # optional curation stages between survivor selection and packing.
    # survivors is re-read from the parquet just written so the metric
    # actions below don't re-execute the LSH/clustering lineage (the same
    # reuse the filter build at the 'filter' step already does)
    train_set = kept_docs.join(
        spark.read.parquet(os.path.join(args.output, "survivors")),
        "doc_id",
        "left_semi",
    )
    mixed_rows = None
    if args.mix_targets:
        from sketchlib.relops import mix_sources

        targets = {
            k.strip(): float(v)
            for k, v in (kv.split("=") for kv in args.mix_targets.split(","))
        }
        train_set = mix_sources(train_set, targets, "CAST(doc_id AS STRING)")
        mixed_rows = train_set.count()
    pii_redactions = None
    if args.pii_scrub:
        from sketchlib.textops import pii_scrub_sql

        scrub, counts = pii_scrub_sql("spark")
        scrubbed = train_set.selectExpr("doc_id", f"{scrub} AS text", *counts)
        pii_redactions = int(
            scrubbed.agg(
                F.sum(F.expr("n_email + n_ipv4 + n_phone")).alias("r")
            ).first()["r"]
            or 0
        )
        train_set = scrubbed.select("doc_id", "text")
    # pack the training set into fixed-budget training sequences
    packed = pack_sequences(train_set, budget=args.seq_budget)
    packed.write.mode("overwrite").parquet(os.path.join(args.output, "packed"))
    pk = spark.read.parquet(os.path.join(args.output, "packed")).agg(
        F.max("bin_id").alias("mb"), F.sum("n_tokens").alias("tt")
    ).first()
    n_bins = int(pk["mb"]) + 1 if pk["mb"] is not None else 0
    metrics = {
        "input_rows": n_in,
        "survivors": n_surv,
        "filter_count": sc.count(),
        "false_negatives": fn,
        "broken": sc.is_broken(),
        "packed_bins": n_bins,
        "packed_tokens": int(pk["tt"] or 0),
        "bin_fill": round((pk["tt"] or 0) / max(n_bins * args.seq_budget, 1), 4),
        "seconds": round(time.time() - t0, 2),
    }
    if gopher_kept is not None:
        metrics["gopher_kept"] = gopher_kept
    if mixed_rows is not None:
        metrics["mixed_rows"] = mixed_rows
    if pii_redactions is not None:
        metrics["pii_redactions"] = pii_redactions
    assert fn == 0, "membership filter lost survivors"
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
