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
        --checkpoint /data/ckpt/clean \
        --holdout-threshold 28 --jaccard 0.5 --num-shards 4096 \
        --gopher --pii-scrub --mix-targets src0=0.5,src1=0.3,src2=0.2

Optional curation stages (off by default): ``--gopher`` adds the Gopher
repetition quality gate after the length filter, ``--decontaminate-n N``
drops training docs sharing any word N-gram span with the held-out split
(benchmark decontamination, GPT-3 appendix-C style), ``--mix-targets``
resamples survivors to target source fractions, ``--pii-scrub`` redacts
emails/IPs/phones before packing (placeholder tokens count toward the
budget).

Resume (VERDICT r3 #6 — the 100-TB operational story): with
``--checkpoint DIR`` the job is stage-level resumable. Each stage
(``survivors`` → ``filter`` → ``packed``) commits by writing its parquet
output (the ``_SUCCESS`` marker is the commit record — a kill mid-write
leaves no marker and the stage re-runs) and then appending its metrics to
``DIR/stage_metrics.json`` via atomic rename. A re-run skips committed
stages, so outputs are byte-identical to an uninterrupted run: survivors
and packing are deterministic operators, and the filter build goes
through :func:`sketchlib.pipeline.checkpointed_build` (per-partition
partial resume INSIDE the stage; canonical merge makes
direct-vs-partials-vs-resumed builds byte-identical — the CLAUDE.md
invariant). ``DIR/pipeline_meta.json`` pins the args + input fingerprint;
any mismatch wipes the stage state and rebuilds cleanly instead of
resuming against the wrong input (same contract as checkpointed_build).
Only the row-level length gate is re-derived on resume (one
pushed-down filter); every id-level removal (gopher, holdout,
decontamination, exact dedup, clustering) is pinned by the survivors
parquet, so resumed filter/packed stages re-execute none of the wide
work.

``SKETCHLIB_PIPELINE_FAIL_AFTER=<stage>`` hard-exits (os._exit) right
after the named stage commits — deterministic crash injection for the
kill/resume test (tests/test_training_job_resume.py).

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
import shutil
import sys
import time


def _write_json_atomic(path: str, obj) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="enable stage-level resume (skip committed stages; "
                         "per-partition resume inside the filter build)")
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
    ap.add_argument("--decontaminate-n", type=int, default=0,
                    help="drop training docs sharing any word n-gram span "
                         "with the held-out split (0 = off)")
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

    surv_path = os.path.join(args.output, "survivors")
    filt_path = os.path.join(args.output, "filter")
    pack_path = os.path.join(args.output, "packed")

    # ------------------------------------------------ resume bookkeeping
    ck = args.checkpoint
    stage_metrics: dict = {"stages_done": []}
    resumed_stages: list[str] = []
    if ck:
        from sketchlib.pipeline import _input_fingerprint

        os.makedirs(ck, exist_ok=True)
        meta = {
            "args": {
                k: getattr(args, k)
                for k in (
                    "input", "output", "holdout_threshold", "jaccard",
                    "min_tokens", "max_tokens", "fpsize", "num_shards",
                    "seq_budget", "gopher", "pii_scrub", "mix_targets",
                    "decontaminate_n",
                )
            },
            "input_fp": _input_fingerprint(docs, None),
        }
        meta_path = os.path.join(ck, "pipeline_meta.json")
        sm_path = os.path.join(ck, "stage_metrics.json")
        prev = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                prev = json.load(f)
        if prev != meta:
            # different input or args: a resume would be silently wrong —
            # wipe the stage state and rebuild from scratch (the
            # checkpointed_build input-change contract, job-level)
            for p in (surv_path, filt_path, pack_path):
                shutil.rmtree(p, ignore_errors=True)
            shutil.rmtree(os.path.join(ck, "filter_ckpt"), ignore_errors=True)
            if os.path.exists(sm_path):
                os.remove(sm_path)
        _write_json_atomic(meta_path, meta)
        if os.path.exists(sm_path):
            with open(sm_path) as f:
                stage_metrics = json.load(f)

    def stage_done(name: str, out_path: str) -> bool:
        """A stage is committed iff its parquet _SUCCESS marker exists AND
        its metrics were recorded (both written before the commit point, so
        a kill between them re-runs the stage — idempotent overwrite)."""
        return bool(
            ck
            and name in stage_metrics.get("stages_done", [])
            and os.path.exists(os.path.join(out_path, "_SUCCESS"))
        )

    def commit_stage(name: str, metrics: dict) -> None:
        stage_metrics.update(metrics)
        stage_metrics.setdefault("stages_done", [])
        if name not in stage_metrics["stages_done"]:
            stage_metrics["stages_done"].append(name)
        if ck:
            _write_json_atomic(os.path.join(ck, "stage_metrics.json"), stage_metrics)
        if os.environ.get("SKETCHLIB_PIPELINE_FAIL_AFTER") == name:
            # deterministic crash injection: behave like a kill -9 right
            # after this stage committed (no cleanup, no metrics.json)
            print(f"FAIL_AFTER={name}: simulating crash", flush=True)
            os._exit(17)

    # ------------------------------------------- shared narrow prefix
    # ONLY the row-level length gate stays outside the stages (re-derived
    # on every run — one pushed-down filter): every other removal (gopher,
    # holdout, decontamination, dedup, clustering) is id-level and pinned
    # by the survivors parquet, so a resumed run re-executes none of it
    # (review finding r4: kept_docs' lineage used to drag gopher + the
    # span-overlap join into the packed stage)
    ok = docs.selectExpr("*", f"{token_count_sql('spark')} AS __tc").filter(
        f"__tc BETWEEN {args.min_tokens} AND {args.max_tokens}"
    ).drop("__tc")

    # ------------------------------------------------ stage: survivors
    if stage_done("survivors", surv_path):
        resumed_stages.append("survivors")
    else:
        n_in = docs.count()
        sm: dict = {"input_rows": n_in}
        work = ok
        if args.gopher:
            from sketchlib.textops import gopher_quality_filter

            gf = gopher_quality_filter(work).filter("keep").select("doc_id")
            work = work.join(gf, "doc_id", "left_semi")
            sm["gopher_kept"] = work.count()
        held = sample_by_hash(
            work, "CAST(doc_id AS STRING)", args.holdout_threshold
        ).select("doc_id")
        train = work.join(held, "doc_id", "left_anti")
        if args.decontaminate_n:
            # decontamination vs the held-out split (GPT-3 appendix-C
            # stage): a training doc sharing ANY word n-gram span with
            # evaluation data is dropped before dedup. localCheckpoint the
            # (small) contaminated-id set so the expensive span-overlap
            # join executes ONCE — the metric count and the anti-join
            # below both read the checkpoint (review finding r4)
            from sketchlib.dedup import benchmark_span_overlap

            held_docs = work.join(held, "doc_id", "left_semi").select("doc_id", "text")
            contaminated = benchmark_span_overlap(
                train, held_docs, n=args.decontaminate_n
            ).select("doc_id").localCheckpoint(eager=True)
            sm["decontaminated"] = contaminated.count()
            train = train.join(contaminated, "doc_id", "left_anti")
        exact_kept = dedup_exact(train).select(F.col("keep_doc_id").alias("doc_id"))
        kept_docs = train.join(exact_kept, "doc_id", "left_semi")
        pairs = minhash_lsh_pairs(kept_docs, threshold=args.jaccard)
        clusters = near_dup_clusters(pairs)
        # survivors: cluster canonicals + docs in no near-dup pair at all.
        # write FIRST, count from the parquet — counting the lineage would
        # execute the LSH/clustering pipeline once more before the write
        survivors = (
            kept_docs.select("doc_id")
            .join(clusters.filter("doc_id <> cluster_id"), "doc_id", "left_anti")
        )
        survivors.write.mode("overwrite").parquet(surv_path)
        sm["survivors"] = spark.read.parquet(surv_path).count()
        commit_stage("survivors", sm)
    n_surv = stage_metrics.get("survivors")
    if n_surv is None:
        n_surv = spark.read.parquet(surv_path).count()
        stage_metrics["survivors"] = n_surv

    # --------------------------------------------------- stage: filter
    spec = CuckooSpec(
        "train-members",
        size_for(max(n_surv // args.num_shards, 1) * 2, args.fpsize),
        args.fpsize,
        num_shards=args.num_shards,
    )
    if stage_done("filter", filt_path):
        resumed_stages.append("filter")
    else:
        surv_df = spark.read.parquet(surv_path)
        if ck:
            from sketchlib.pipeline import checkpointed_build

            # per-partition partial resume inside the expensive build; the
            # canonical merge makes this byte-identical to the direct path
            merged = checkpointed_build(
                surv_df, spec, F.col("doc_id").cast("string"),
                os.path.join(ck, "filter_ckpt"),
            )
        else:
            merged = build_filter_direct(surv_df, spec, key=F.col("doc_id").cast("string"))
        merged.write.mode("overwrite").parquet(filt_path)
        sc = ShardedCuckoo.from_df(spark.read.parquet(filt_path), spec)
        # probe the written survivors parquet, not the in-memory lineage —
        # the count would otherwise re-execute the LSH/clustering pipeline
        fn = (
            probe(
                spark.read.parquet(surv_path).select("doc_id"),
                sc,
                key=F.col("doc_id").cast("string"),
            )
            .filter("NOT member")
            .count()
        )
        commit_stage(
            "filter",
            {"filter_count": sc.count(), "false_negatives": fn, "broken": sc.is_broken()},
        )

    # --------------------------------------------------- stage: packed
    if stage_done("packed", pack_path):
        resumed_stages.append("packed")
    else:
        sm = {}
        # optional curation stages between survivor selection and packing.
        # the training set is the length-gated rows of the SURVIVOR ids —
        # every other removal was id-level, so the semi-join against the
        # survivors parquet reproduces it exactly without re-executing
        # gopher / decontamination / LSH lineage (review finding r4)
        train_set = ok.join(spark.read.parquet(surv_path), "doc_id", "left_semi")
        if args.mix_targets:
            from sketchlib.relops import mix_sources

            targets = {
                k.strip(): float(v)
                for k, v in (kv.split("=") for kv in args.mix_targets.split(","))
            }
            train_set = mix_sources(train_set, targets, "CAST(doc_id AS STRING)")
            sm["mixed_rows"] = train_set.count()
        if args.pii_scrub:
            from sketchlib.textops import pii_scrub_sql

            scrub, counts = pii_scrub_sql("spark")
            scrubbed = train_set.selectExpr("doc_id", f"{scrub} AS text", *counts)
            sm["pii_redactions"] = int(
                scrubbed.agg(F.sum(F.expr("n_email + n_ipv4 + n_phone")).alias("r")).first()["r"]
                or 0
            )
            train_set = scrubbed.select("doc_id", "text")
        packed = pack_sequences(train_set, budget=args.seq_budget)
        packed.write.mode("overwrite").parquet(pack_path)
        pk = spark.read.parquet(pack_path).agg(
            F.max("bin_id").alias("mb"), F.sum("n_tokens").alias("tt")
        ).first()
        n_bins = int(pk["mb"]) + 1 if pk["mb"] is not None else 0
        sm.update(
            {
                "packed_bins": n_bins,
                "packed_tokens": int(pk["tt"] or 0),
                "bin_fill": round((pk["tt"] or 0) / max(n_bins * args.seq_budget, 1), 4),
            }
        )
        commit_stage("packed", sm)

    metrics = {k: v for k, v in stage_metrics.items() if k != "stages_done"}
    metrics["seconds"] = round(time.time() - t0, 2)
    if resumed_stages:
        metrics["resumed_stages"] = resumed_stages
    assert metrics.get("false_negatives", 0) == 0, "membership filter lost survivors"
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
