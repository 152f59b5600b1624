"""Kill/resume for the composed training-pipeline job (VERDICT r3 #6 — the
100-TB operational story, job-level): a run killed right after a stage
commits must resume, skip the committed stages, and produce outputs
byte-identical to an uninterrupted run. Runs the real spark-submit entry
point (``python jobs/training_pipeline_job.py`` — spark-submit's python
path) as subprocesses with deterministic crash injection
(SKETCHLIB_PIPELINE_FAIL_AFTER)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "training_pipeline_job.py")
INPUT = "/root/testdata/sf0.001/documents.parquet"


def run_job(out, ck=None, fail_after=None, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # small-session knobs so three subprocess JVMs stay fast
    env["PYSPARK_SUBMIT_ARGS"] = (
        "--master local[4] --conf spark.sql.shuffle.partitions=8 "
        "--conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC "
        "pyspark-shell"
    )
    if fail_after:
        env["SKETCHLIB_PIPELINE_FAIL_AFTER"] = fail_after
    else:
        env.pop("SKETCHLIB_PIPELINE_FAIL_AFTER", None)
    cmd = [
        sys.executable, JOB,
        "--input", INPUT, "--output", out,
        "--num-shards", "2", "--seq-budget", "512", *extra,
    ]
    if ck:
        cmd += ["--checkpoint", ck]
    return subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=420)


def read_sorted(spark, path, cols):
    df = spark.read.parquet(path)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_kill_after_each_stage_then_resume_byte_identical(spark, tmp_path):
    ref_out = str(tmp_path / "ref")
    r = run_job(ref_out)  # uninterrupted, no checkpointing at all
    assert r.returncode == 0, r.stderr[-4000:]
    ref_metrics = json.loads(r.stdout.strip().splitlines()[-1])

    out = str(tmp_path / "resumed")
    ck = str(tmp_path / "ck")
    # crash right after the survivors stage commits...
    r1 = run_job(out, ck=ck, fail_after="survivors")
    assert r1.returncode == 17, (r1.returncode, r1.stderr[-2000:])
    assert os.path.exists(os.path.join(out, "survivors", "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "metrics.json"))
    # ...then again right after the filter stage commits...
    r2 = run_job(out, ck=ck, fail_after="filter")
    assert r2.returncode == 17, (r2.returncode, r2.stderr[-2000:])
    assert os.path.exists(os.path.join(out, "filter", "_SUCCESS"))
    # ...then resume to completion
    r3 = run_job(out, ck=ck)
    assert r3.returncode == 0, r3.stderr[-4000:]
    metrics = json.loads(r3.stdout.strip().splitlines()[-1])
    # the final run skipped the two committed stages
    assert metrics["resumed_stages"] == ["survivors", "filter"]

    # metrics identical bar timing/resume bookkeeping
    drop = {"seconds", "resumed_stages"}
    assert {k: v for k, v in metrics.items() if k not in drop} == {
        k: v for k, v in ref_metrics.items() if k not in drop
    }

    # outputs identical to the uninterrupted run: survivors row set,
    # packed assignment, and the filter blobs BYTE-identical (canonical
    # merge: direct build vs checkpointed partial build)
    assert read_sorted(spark, os.path.join(out, "survivors"), ["doc_id"]) == read_sorted(
        spark, os.path.join(ref_out, "survivors"), ["doc_id"]
    )
    pcols = ["doc_id", "n_tokens", "bin_id", "start_off"]
    assert read_sorted(spark, os.path.join(out, "packed"), pcols) == read_sorted(
        spark, os.path.join(ref_out, "packed"), pcols
    )
    ref_blobs = {
        r["shard"]: bytes(r["sketch"])
        for r in spark.read.parquet(os.path.join(ref_out, "filter")).collect()
    }
    got_blobs = {
        r["shard"]: bytes(r["sketch"])
        for r in spark.read.parquet(os.path.join(out, "filter")).collect()
    }
    assert got_blobs == ref_blobs

    # idempotent re-run of a COMPLETE pipeline: everything skips
    r4 = run_job(out, ck=ck)
    assert r4.returncode == 0, r4.stderr[-4000:]
    m4 = json.loads(r4.stdout.strip().splitlines()[-1])
    assert m4["resumed_stages"] == ["survivors", "filter", "packed"]


def test_resume_with_different_input_rebuilds(spark, tmp_path):
    """Changing --input under the same checkpoint must trigger a clean full
    rebuild (job-level mirror of checkpointed_build's input-change
    contract) — never serve stale survivors from the old input."""
    out = str(tmp_path / "o")
    ck = str(tmp_path / "c")
    r1 = run_job(out, ck=ck, fail_after="survivors")
    assert r1.returncode == 17
    surv0 = read_sorted(spark, os.path.join(out, "survivors"), ["doc_id"])

    # same checkpoint, different input: a full re-run, not a resume
    env_input = "/root/testdata/sf0.001/documents.parquet"
    other = str(tmp_path / "in2")
    spark.read.parquet(env_input).limit(20).write.parquet(other)
    cmd_extra = ()
    r2 = subprocess.run(
        [
            sys.executable, JOB, "--input", other, "--output", out,
            "--checkpoint", ck, "--num-shards", "2", "--seq-budget", "512",
            *cmd_extra,
        ],
        env={
            **os.environ,
            "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            "PYSPARK_SUBMIT_ARGS": (
                "--master local[4] --conf spark.sql.shuffle.partitions=8 "
                "--conf spark.ui.enabled=false pyspark-shell"
            ),
        },
        capture_output=True, text=True, timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-4000:]
    m2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert "resumed_stages" not in m2  # nothing was resumable
    surv2 = read_sorted(spark, os.path.join(out, "survivors"), ["doc_id"])
    assert len(surv2) <= 20 and surv2 != surv0


def test_decontaminate_stage_removes_all_holdout_overlap(spark, tmp_path):
    """--decontaminate-n: after the run, NO surviving doc may share a word
    n-gram span with the held-out split (the stage's whole contract),
    and the dropped count is reported."""
    from pyspark.sql import functions as F

    from sketchlib.dedup import benchmark_span_overlap
    from sketchlib.relops import sample_by_hash

    out = str(tmp_path / "dc")
    r = run_job(out, extra=("--decontaminate-n", "3"))
    assert r.returncode == 0, r.stderr[-4000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics.get("decontaminated", 0) >= 0
    from sketchlib.textops import token_count_sql

    docs = spark.read.parquet(INPUT)
    # the job samples the held-out split from the LENGTH-GATED population
    # (job defaults 10..100000 tokens) — derive it identically here, or a
    # corpus with out-of-band docs would make this assertion check spans
    # the job never decontaminated against (review finding r4)
    ok = docs.selectExpr("*", f"{token_count_sql('spark')} AS __tc").filter(
        "__tc BETWEEN 10 AND 100000"
    ).drop("__tc")
    surv = spark.read.parquet(os.path.join(out, "survivors"))
    surv_docs = ok.join(surv.select("doc_id"), "doc_id", "left_semi")
    held = ok.join(
        sample_by_hash(ok, "CAST(doc_id AS STRING)", "28").select("doc_id"),
        "doc_id",
        "left_semi",
    ).select("doc_id", "text")
    leftover = benchmark_span_overlap(surv_docs, held, n=3).count()
    assert leftover == 0


def test_build_ann_index_job_ivfpq(tmp_path):
    """jobs/build_ann_index_job.py end to end as a subprocess (the
    spark-submit python path): builds an IVFPQ index over the sf0.001
    embeddings, writes the codes-only layout + a metrics report, and the
    written index probes correctly via ivf_pq_topk."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["PYSPARK_SUBMIT_ARGS"] = (
        "--master local[4] --conf spark.sql.shuffle.partitions=8 "
        "--conf spark.ui.enabled=false pyspark-shell"
    )
    out = str(tmp_path / "ivfpq")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "build_ann_index_job.py"),
         "--input", "/root/testdata/sf0.001/embeddings.parquet",
         "--output", out, "--kind", "ivfpq", "--k", "8",
         "--n-sub", "8", "--ksub", "16", "--lloyd-iters", "1"],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.load(open(out + "_report.json"))
    assert report["kind"] == "ivfpq" and report["n_vectors"] > 0
    assert report["columns"] == ["centroid", "codes", "vec_id"]
    assert report["n_lists_nonempty"] <= 8
    # the written index is probeable by the library in-process
    from pyspark.sql import functions as F

    from sketchlib.spark.session import get_spark
    from sketchlib.similarity import ivf_pq_topk, valid_embeddings

    spark = get_spark()
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = valid_embeddings(emb).where(F.col("vec_id") == 0).first()["embedding"]
    got = ivf_pq_topk(spark, out, q, k=5, nprobe=2, shortlist=10,
                      rescore_src=emb).collect()
    assert {r2["path"] for r2 in got} == {"adc", "refined"}
    assert len([r2 for r2 in got if r2["path"] == "refined"]) == 5
