"""Structured Streaming tests: incremental cuckoo maintenance equals the
batch build byte-for-byte; windowed aggregation with watermark."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sketchlib.kernels.cuckoo import size_for
from sketchlib.spark.cuckoo import CuckooSpec, ShardedCuckoo, build_filter, probe
from sketchlib.streaming import incremental_cuckoo_sink, read_state, windowed_event_counts


def test_incremental_stream_equals_batch(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spec = CuckooSpec(name="stream", size=size_for(2000, 2), fpsize=2, num_shards=2)
    key = F.col("doc_id").cast("string")
    batch_blobs = {
        r["shard"]: bytes(r["sketch"]) for r in build_filter(docs, spec, key=key).collect()
    }

    work = tempfile.mkdtemp(prefix="sketchlib-stream-")
    src = os.path.join(work, "src")
    state_dir = os.path.join(work, "state")
    ckpt = os.path.join(work, "ckpt")
    try:
        # stream the same rows as 4 separate files (4+ micro-batches)
        docs.withColumn("g", F.pmod("doc_id", F.lit(4))).write.partitionBy("g").parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src + "/g=*")
        )
        q = (
            stream.writeStream.foreachBatch(incremental_cuckoo_sink(spec, key, state_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        merged = read_state(spark, state_dir)
        stream_blobs = {r["shard"]: bytes(r["sketch"]) for r in merged.collect()}
        assert stream_blobs == batch_blobs  # canonical merge: stream ≡ batch
        sc = ShardedCuckoo.from_df(merged, spec)
        assert sc.count() == docs.count()
        assert probe(docs, sc, key=key).filter(~F.col("member")).count() == 0

        # epoch guard: re-folding the last epoch is a no-op
        sink = incremental_cuckoo_sink(spec, key, state_dir)
        sink(docs, 0)  # stale epoch id — must be skipped
        again = {
            r["shard"]: bytes(r["sketch"]) for r in read_state(spark, state_dir).collect()
        }
        assert again == batch_blobs

        # crash-atomicity: a crash after the state write but BEFORE the
        # pointer flip leaves the committed pointer on the previous epoch —
        # recovery re-reads consistent state and replays the batch once
        import json as _json

        with open(os.path.join(state_dir, "epoch.json")) as f:
            commit = _json.load(f)
        orphan = os.path.join(state_dir, "state_epoch999")
        spark.read.parquet(commit["state"]).write.mode("overwrite").parquet(orphan)
        # pointer still names the old epoch → replaying the next epoch folds in
        sink(docs.limit(0), commit["epoch"] + 1)  # empty replay: state unchanged
        final = {
            r["shard"]: bytes(r["sketch"]) for r in read_state(spark, state_dir).collect()
        }
        assert final == batch_blobs
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_fast_sink_semantics_equal_canonical(spark, sf_dir):
    """mode='fast' folds each batch in O(batch) — the fp multiset (and so
    membership, count, removability) must stay EXACTLY equal to the
    canonical path; only byte layout may differ."""
    from sketchlib.kernels.cuckoo import CuckooFilter
    from sketchlib.streaming import read_state

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spec = CuckooSpec(name="faststream", size=size_for(2000, 2), fpsize=2, num_shards=2)
    key = F.col("doc_id").cast("string")
    work = tempfile.mkdtemp(prefix="sketchlib-fast-")
    try:
        sink_c = incremental_cuckoo_sink(spec, key, os.path.join(work, "c"))
        sink_f = incremental_cuckoo_sink(spec, key, os.path.join(work, "f"), mode="fast")
        for e in range(4):
            batch = docs.filter(F.pmod("doc_id", F.lit(4)) == e)
            sink_c(batch, e)
            sink_f(batch, e)
        canon = {r["shard"]: r for r in read_state(spark, os.path.join(work, "c")).collect()}
        fast = {r["shard"]: r for r in read_state(spark, os.path.join(work, "f")).collect()}
        assert set(canon) == set(fast)
        for s in canon:
            assert fast[s]["fpcount"] == canon[s]["fpcount"]
            # identical stored fp multiset ⇒ identical canonical pairs
            fc = CuckooFilter.from_bytes(bytes(canon[s]["sketch"]))
            ff = CuckooFilter.from_bytes(bytes(fast[s]["sketch"]))
            pc = sorted(zip(*[a.tolist() for a in fc.extract_pairs(canonical=True)]))
            pf = sorted(zip(*[a.tolist() for a in ff.extract_pairs(canonical=True)]))
            assert pc == pf
        sc = ShardedCuckoo.from_df(read_state(spark, os.path.join(work, "f")), spec)
        assert sc.count() == docs.count()
        assert probe(docs.select("doc_id"), sc, key=key).filter(~F.col("member")).count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_exact_dedup_matches_batch(spark, sf_dir):
    """Streaming exact dedup: dropDuplicates on the md5 fingerprint over a
    micro-batched stream keeps exactly one doc per normalized text — the
    same groups the batch dedup_exact produces."""
    from sketchlib.dedup import dedup_exact
    from sketchlib.textops import fingerprint_sql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    batch_groups = dedup_exact(docs).count()
    work = tempfile.mkdtemp(prefix="sketchlib-sdedup-")
    try:
        src = os.path.join(work, "src")
        docs.withColumn("g", F.pmod("doc_id", F.lit(4))).write.partitionBy("g").parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src + "/g=*")
            .selectExpr("doc_id", f"{fingerprint_sql('spark')} AS fp")
            .dropDuplicates(["fp"])
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("sdedup_out")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("SELECT * FROM sdedup_out").collect()
        assert len(out) == batch_groups  # one survivor per distinct text
        assert len({r["fp"] for r in out}) == len(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_sessions_match_batch(spark, sf_dir):
    """Sessionization uses the SAME session_window operator in batch and
    streaming: every session the watermarked stream emits (append mode →
    closed sessions only) must be exactly a session of the batch run."""
    from sketchlib.relops import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts")
    batch = {
        (r["user_id"], r["session_start_us"], r["last_ts_us"], r["n_events"])
        for r in sessionize(ev, "user_id", "ts", "30 minutes").collect()
    }
    work = tempfile.mkdtemp(prefix="sketchlib-sess-")
    try:
        src = os.path.join(work, "src")
        ev.withColumn("g", F.pmod(F.xxhash64("ts"), F.lit(4))).write.partitionBy("g").parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src + "/g=*")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 minute")
        )
        agg = (
            stream.groupBy("user_id", F.session_window("ts", "30 minutes").alias("__w"))
            .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("__last"))
            .select(
                "user_id",
                F.unix_micros(F.col("__w.start")).alias("session_start_us"),
                F.unix_micros(F.col("__last")).alias("last_ts_us"),
                "n_events",
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = {
            (r["user_id"], r["session_start_us"], r["last_ts_us"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
        # append mode emits only watermark-closed sessions; files arrive
        # out of event-time order, so some sessions stay open at stream end
        assert emitted, "no sessions emitted"
        assert emitted <= batch, f"streaming emitted a session batch never produced: {sorted(emitted - batch)[:3]}"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_distinct_per_key_stateful(spark, sf_dir):
    """applyInPandasWithState: running per-key HLL across micro-batches;
    the final update-mode estimate must match the exact batch distinct
    count within the HLL bound."""
    from sketchlib.streaming import streaming_distinct_per_key

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="sketchlib-state-")
    try:
        events.withColumn("g", F.pmod("event_id", F.lit(4))).write.partitionBy("g").parquet(
            os.path.join(work, "src")
        )
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(work, "src") + "/g=*")
        )
        out = streaming_distinct_per_key(stream, "event_type", "user_id", p=12)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("state_out")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # update mode emits one row per key per batch: take the LAST emission
        import pandas as pd

        emitted = spark.sql("SELECT * FROM state_out").toPandas()
        final = emitted.groupby("event_type").last()["distinct_estimate"]
        exact = {
            r["event_type"]: r["d"]
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d"))
            .collect()
        }
        import numpy as np

        for t, d in exact.items():
            assert abs(final[t] - d) / max(d, 1) <= 3 * 1.04 / np.sqrt(1 << 12) + 0.02, t
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_windowed_event_counts(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="sketchlib-winstream-")
    try:
        events.write.parquet(os.path.join(work, "src"))
        stream = spark.readStream.schema(events.schema).parquet(os.path.join(work, "src"))
        agg = windowed_event_counts(stream, window="60 minutes", watermark="2 hours")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_counts")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT SUM(n) AS total FROM win_counts").first()["total"]
        assert got == events.count()
        # spot-check one window against a batch computation
        batch = (
            events.groupBy(F.window("ts", "60 minutes"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert spark.sql("SELECT COUNT(*) c FROM win_counts").first()["c"] == batch.count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_sink_retains_previous_epoch_for_lazy_readers(spark, sf_dir):
    """The sink keeps the immediately-previous epoch directory (ADVICE r2):
    a lazy read_state resolved before a commit must still be collectable
    after that commit; directories older than one epoch are GC'd."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    spec = CuckooSpec(name="retain", size=size_for(1000, 2), fpsize=2, num_shards=2)
    key = F.col("doc_id").cast("string")
    work = tempfile.mkdtemp(prefix="sketchlib-retain-")
    state_dir = os.path.join(work, "state")
    try:
        sink = incremental_cuckoo_sink(spec, key, state_dir)
        parts = [docs.filter(F.pmod("doc_id", F.lit(3)) == i) for i in range(3)]
        sink(parts[0], 0)
        lazy = read_state(spark, state_dir)  # resolves epoch 0's directory
        sink(parts[1], 1)  # commit epoch 1 — epoch 0 dir must survive
        assert os.path.isdir(os.path.join(state_dir, "state_epoch0"))
        n0 = ShardedCuckoo.from_df(lazy, spec).count()  # acts AFTER the commit
        assert n0 == parts[0].count()
        sink(parts[2], 2)  # commit epoch 2 — epoch 0 GC'd, epoch 1 retained
        assert not os.path.isdir(os.path.join(state_dir, "state_epoch0"))
        assert os.path.isdir(os.path.join(state_dir, "state_epoch1"))
        assert ShardedCuckoo.from_df(read_state(spark, state_dir), spec).count() == docs.count()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_distinct_per_key_kmv_exact_below_k(spark, sf_dir):
    """The KMV kind of the stateful streaming distinct: with k larger than
    any group's true distinct count, the running estimate is EXACT per key
    after all micro-batches (KMV below-k exactness carried through the
    binary streaming state)."""
    from sketchlib.streaming import streaming_distinct_per_key

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="sketchlib-state-kmv-")
    try:
        events.withColumn("g", F.pmod("event_id", F.lit(3))).write.partitionBy("g").parquet(
            os.path.join(work, "src")
        )
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(work, "src") + "/g=*")
        )
        out = streaming_distinct_per_key(stream, "event_type", "user_id", kind="kmv", k=100_000)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("state_out_kmv")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = spark.sql("SELECT * FROM state_out_kmv").toPandas()
        final = emitted.groupby("event_type").last()["distinct_estimate"].to_dict()
        exact = {
            r["event_type"]: r["d"]
            for r in events.filter(F.col("user_id").isNotNull())
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d"))
            .collect()
        }
        for t, d in exact.items():
            assert final[t] == float(d), (t, final[t], d)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_distinct_ignores_null_values(spark, tmp_path):
    """NULL counted-values must not register as a phantom distinct
    (xxhash64(NULL) evaluates to the seed — the batch aggregator's
    hash-mode trap, now guarded on the streaming path too)."""
    from sketchlib.streaming import streaming_distinct_per_key

    src = str(tmp_path / "src")
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", None), ("b", None)],
        "k string, v bigint",
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_distinct_per_key(stream, "k", "v", kind="kmv", k=64)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("null_guard_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["k"]: r["distinct_estimate"]
        for r in spark.sql("SELECT * FROM null_guard_out").collect()
    }
    assert got.get("a") == 2.0          # NULL row ignored
    assert "b" not in got               # all-NULL key never emits


def test_streaming_distinct_validates_params_on_driver(spark, sf_dir):
    """ADVICE r4: a too-small KMV size (or an out-of-range HLL precision)
    must fail at CALL time on the driver, not later inside the stateful
    executor update where the error surfaces as an opaque task failure."""
    import pytest

    from sketchlib.streaming import streaming_distinct_per_key

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(events.schema).parquet(f"{sf_dir}/")
    with pytest.raises(ValueError, match="kmv size k"):
        streaming_distinct_per_key(stream, "event_type", "user_id", kind="kmv", k=4)
    with pytest.raises(ValueError, match="hll precision"):
        streaming_distinct_per_key(stream, "event_type", "user_id", p=25)
    with pytest.raises(ValueError, match="hll precision"):
        streaming_distinct_per_key(stream, "event_type", "user_id", p=2)


def test_streaming_paragraph_dedup_matches_batch(spark):
    """Doc_id-ordered micro-batches through the paragraph sink emit
    exactly the batch paragraph_dedup corpus (fp32 state → FP ~0), a
    duplicate paragraph never appears twice across batches, and a
    replayed epoch is a no-op for both output and state."""
    from sketchlib.dedup import paragraph_dedup
    from sketchlib.streaming import incremental_paragraph_dedup_sink

    rows = []
    for i in range(90):
        rows.append((i, f"unique para {i}\nshared boilerplate line\ncommon {i % 5}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        r["doc_id"]: (r["kept_text"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(docs).collect()
    }

    spec = CuckooSpec(name="parastream", size=size_for(4000, 4), fpsize=4, num_shards=2)
    work = tempfile.mkdtemp(prefix="sketchlib-parastream-")
    state_dir, out_dir = os.path.join(work, "state"), os.path.join(work, "out")
    try:
        sink = incremental_paragraph_dedup_sink(spec, state_dir, out_dir)
        for e, lo in enumerate(range(0, 90, 30)):
            sink(docs.where(F.col("doc_id").between(lo, lo + 29)), e)
        got = {
            r["doc_id"]: (r["kept_text"], r["n_paras"], r["n_kept"])
            for r in spark.read.parquet(os.path.join(out_dir, "batch_epoch*")).collect()
        }
        assert got == want
        # replayed epoch: no-op (same output dirs, same state pointer)
        import json as _json

        with open(os.path.join(state_dir, "epoch.json")) as f:
            before = _json.load(f)
        sink(docs.limit(5), 1)
        with open(os.path.join(state_dir, "epoch.json")) as f:
            assert _json.load(f) == before
        # cross-batch guarantee: each normalized paragraph at most once
        kept_paras = []
        for (text, _, _) in got.values():
            kept_paras += [p.strip() for p in text.split("\n") if p.strip()]
        assert len(kept_paras) == len(set(kept_paras))
        assert "shared boilerplate line" in set(kept_paras)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_paragraph_retraction_exact_deletion(spark):
    """Cuckoo-backed retraction: after retracting a doc's emitted
    paragraphs, re-ingesting the same text keeps them again (exact
    deletion — the bloom-state design cannot do this); untouched
    paragraph classes still dedup."""
    from sketchlib.streaming import (
        incremental_paragraph_dedup_sink,
        retract_paragraphs_from_state,
    )

    docs = spark.createDataFrame(
        [(1, "secret para one\nsecret para two\ncommon line"),
         (2, "other text\ncommon line")],
        "doc_id long, text string",
    )
    spec = CuckooSpec(name="retract", size=size_for(1000, 4), fpsize=4, num_shards=2)
    work = tempfile.mkdtemp(prefix="sketchlib-retract-")
    state_dir, out_dir = os.path.join(work, "state"), os.path.join(work, "out")
    try:
        sink = incremental_paragraph_dedup_sink(spec, state_dir, out_dir)
        sink(docs, 0)
        emitted = spark.read.parquet(os.path.join(out_dir, "batch_epoch0"))
        n = retract_paragraphs_from_state(
            spec, state_dir, emitted.where("doc_id = 1").select("doc_id", "kept_text")
        )
        assert n == 3  # doc 1 owned all three of its classes (incl. common line)
        # re-ingestion: doc 1's paragraphs are novel again; doc 2's
        # surviving class ('other text') still dedups
        sink(spark.createDataFrame(
            [(10, "secret para one\nother text")], "doc_id long, text string"), 1)
        out1 = spark.read.parquet(os.path.join(out_dir, "batch_epoch1")).first()
        assert out1["kept_text"] == "secret para one" and out1["n_kept"] == 1
    finally:
        shutil.rmtree(work, ignore_errors=True)
