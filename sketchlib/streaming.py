"""Structured Streaming integration: incremental sketch maintenance.

The reference planned client-side sync via Redis Streams but never shipped
it (``/root/reference/README.md:276-285``, ``RELEASENOTES:71-77``). Here the
mergeable-aggregator design pays off directly: a streaming ``foreachBatch``
builds partials over each micro-batch and canonically merges them into a
persisted filter state — and because the canonical merge is a pure function
of the accumulated item multiset, the streamed filter is BYTE-IDENTICAL to
a batch build over the same rows (tested).

Exactly-once: the state write is guarded by the epoch id (a replayed
micro-batch is skipped, not double-counted — multiset adds are not
idempotent, so the guard is load-bearing). The guard is CRASH-ATOMIC:
each epoch's merged state is written to its own directory, then
``epoch.json`` — recording both the epoch AND the state directory to
read — is atomically replaced (write-tmp + os.replace). A crash at any
point leaves the previous epoch.json (and the directory it points to)
intact, so recovery resumes from consistent state and the interrupted
micro-batch folds in exactly once on replay.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.spark.cuckoo import (
    CuckooSpec,
    build_partials,
    fold_partials_into,
    merge_partials,
)


def incremental_cuckoo_sink(
    spec: CuckooSpec, key, state_dir: str, fanin: int = 64, mode: str = "canonical"
):
    """Returns a ``foreachBatch`` function maintaining a merged cuckoo
    filter under ``state_dir`` (one parquet row per shard, current epoch
    resolved via ``epoch.json``; read it back with :func:`read_state`).

    Cost trade-off, selected by ``mode``:

    - ``"canonical"`` (default): re-fold the full accumulated pair multiset
      each micro-batch — per-batch cost grows with TOTAL filter content,
      but the state is BYTE-IDENTICAL to a batch build over the same rows
      (replay/repair and cross-path verification by blob comparison).
    - ``"fast"``: fold only the new batch's pairs into the existing dense
      blobs (``fold_partials_into``) — per-batch cost is O(batch). Same fp
      multiset, so membership/count/remove semantics stay EXACTLY equal to
      the canonical path (tested); only the byte layout diverges.
      Re-canonicalize offline (``merge_partials`` over the state) when a
      byte-comparable blob is needed.

    Usage::

        q = (stream.writeStream
             .foreachBatch(incremental_cuckoo_sink(spec, F.col("url"), dir))
             .start())
    """
    epoch_path = os.path.join(state_dir, "epoch.json")

    def _commit() -> dict | None:
        if os.path.exists(epoch_path):
            with open(epoch_path) as f:
                return json.load(f)
        return None

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        import shutil

        os.makedirs(state_dir, exist_ok=True)
        commit = _commit()
        if commit is not None and epoch_id <= commit["epoch"]:
            return  # replayed micro-batch: already folded in
        spark = batch_df.sparkSession
        partials = build_partials(batch_df, spec, key=key)
        if mode == "fast":
            if commit is not None:
                prior = spark.read.parquet(commit["state"])
            else:
                prior = spark.createDataFrame([], partials.schema)
            merged = fold_partials_into(prior, partials, spec)
        else:
            if commit is not None:
                prior = spark.read.parquet(commit["state"])
                partials = prior.unionByName(partials)
            merged = merge_partials(partials, fanin=fanin)
        # crash-atomic commit: new state lands in its own directory; the
        # pointer file flips via os.replace only after the write succeeded
        new_state = os.path.join(state_dir, f"state_epoch{epoch_id}")
        merged.write.mode("overwrite").parquet(new_state)
        tmp = epoch_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch_id, "state": new_state}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, epoch_path)
        # GC: keep the current AND the immediately-previous epoch directory.
        # read_state returns a LAZY DataFrame over the resolved directory —
        # deleting the previous epoch at commit time would FileNotFound any
        # reader that resolved before this commit and acts after it (ADVICE
        # r2). One-epoch retention gives such readers a full micro-batch
        # interval to act; readers held across MULTIPLE commits must
        # materialize (collect/localCheckpoint) — see read_state.
        keep = {os.path.basename(new_state)}
        if commit is not None:
            keep.add(os.path.basename(commit["state"]))
        for d in os.listdir(state_dir):
            if d.startswith("state_epoch") and d not in keep:
                shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)

    return sink


def read_state(spark, state_dir: str) -> DataFrame:
    """Read the current committed filter state of an
    :func:`incremental_cuckoo_sink` (resolves the state directory through
    the atomic epoch.json pointer).

    The returned DataFrame is LAZY over the resolved epoch directory. The
    sink retains the previous epoch alongside the current one, so a reader
    stays valid across ONE subsequent commit; to hold results across more
    than one micro-batch, materialize them (``.collect()`` /
    ``.localCheckpoint(eager=True)``) before the stream advances twice."""
    with open(os.path.join(state_dir, "epoch.json")) as f:
        return spark.read.parquet(json.load(f)["state"])


def incremental_paragraph_dedup_sink(
    spec: CuckooSpec, state_dir: str, out_dir: str, fanin: int = 64
):
    """``foreachBatch`` sink: Dolma-style corpus-wide paragraph dedup
    over a CONTINUOUS document stream — the crawl-ingestion shape, where
    "the corpus" is every batch seen so far. The accumulated dedup state
    is this repo's sharded cuckoo filter (the kernel's streaming
    use-case): membership answers "seen in any prior batch", deletions
    stay available for retraction workflows.

    Per micro-batch (exactly-once via the crash-atomic epoch pointer):
      1. explode to normalized paragraphs (``dedup.paragraph_table`` —
         the SAME identity as the batch operator);
      2. PROBE the committed filter — no false negatives, so a duplicate
         paragraph is NEVER emitted twice across the stream; a false
         positive (bounded by ``spec.fpsize``) drops a novel paragraph,
         the same trade Dolma's bloom-filter dedup makes;
      3. within-batch first occurrence by (doc_id, pos) over the 8-byte
         paragraph hash (the batch operator's window, scoped to the
         batch);
      4. keep = unseen ∧ first; reassemble docs in paragraph order and
         append (doc_id, kept_text, n_paras, n_kept, epoch) under
         ``out_dir/batch_epoch{N}``;
      5. fold the kept paragraphs into the filter (O(batch) fast fold)
         and flip ``epoch.json``.

    With micro-batches arriving in doc_id order the emitted corpus equals
    the batch :func:`sketchlib.dedup.paragraph_dedup` over the
    concatenated input (parity-tested); under arbitrary arrival order the
    first ARRIVAL wins instead of the smallest (doc_id, pos) — the
    streaming-semantics difference, documented not hidden.

    The replay guard is tied to the STREAM's epoch counter: resuming must
    reuse the original checkpointLocation. Restarting with a fresh
    checkpoint against an old ``state_dir`` restarts epochs at 0, so
    every batch would skip as a "replay" — the sink emits a loud
    RuntimeWarning for that signature (epoch strictly below the
    committed one) instead of dropping data silently."""
    import shutil

    from pyspark.sql import Window

    from sketchlib.dedup import paragraph_table
    from sketchlib.spark.cuckoo import ShardedCuckoo, probe

    epoch_path = os.path.join(state_dir, "epoch.json")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        os.makedirs(state_dir, exist_ok=True)
        os.makedirs(out_dir, exist_ok=True)
        commit = None
        if os.path.exists(epoch_path):
            with open(epoch_path) as f:
                commit = json.load(f)
        if commit is not None and epoch_id <= commit["epoch"]:
            if epoch_id < commit["epoch"]:
                # a genuine same-checkpoint replay only re-delivers the
                # LAST epoch (epoch_id == commit.epoch). A strictly older
                # epoch is the restart-with-a-FRESH-checkpoint signature:
                # foreachBatch epochs restart at 0 against the old
                # state_dir and every batch would be silently dropped —
                # make the skip loud instead of silent
                import warnings

                warnings.warn(
                    f"paragraph-dedup sink skipping epoch {epoch_id} < "
                    f"committed {commit['epoch']}: if this stream was "
                    "restarted with a fresh checkpointLocation against an "
                    "existing state_dir, its epoch ids restart at 0 and "
                    "EVERY batch will be skipped as a replay. Keep the "
                    "original checkpoint, or point the sink at a fresh "
                    "state_dir.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            return  # replayed micro-batch: output + state already committed
        spark = batch_df.sparkSession
        paras = paragraph_table(batch_df)
        if commit is not None:
            prior = spark.read.parquet(commit["state"])
            sc = ShardedCuckoo.from_df(prior, spec)
            paras = probe(paras, sc, key=F.col("__norm"), result_col="__seen")
        else:
            prior = None
            paras = paras.withColumn("__seen", F.lit(False))
        w = Window.partitionBy(F.xxhash64("__norm")).orderBy("doc_id", "pos")
        marked = paras.withColumn(
            "keep", (F.row_number().over(w) == 1) & ~F.col("__seen")
        ).localCheckpoint(eager=True)  # fans out into output + state fold
        out = marked.groupBy("doc_id").agg(
            F.expr(
                "concat_ws('\\n', transform(array_sort("
                "collect_list(CASE WHEN keep THEN struct(pos, para) END)), s -> s.para))"
            ).alias("kept_text"),
            F.count(F.lit(1)).alias("n_paras"),
            F.expr("CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)").alias(
                "n_kept"
            ),
            F.lit(int(epoch_id)).alias("epoch"),
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_epoch{epoch_id}")
        )
        kept = marked.where("keep").select("doc_id", "__norm")
        partials = build_partials(kept, spec, key=F.col("__norm"))
        if prior is None:
            prior = spark.createDataFrame([], partials.schema)
        merged = fold_partials_into(prior, partials, spec)
        new_state = os.path.join(state_dir, f"state_epoch{epoch_id}")
        merged.write.mode("overwrite").parquet(new_state)
        tmp = epoch_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch_id, "state": new_state}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, epoch_path)
        keep_dirs = {os.path.basename(new_state)}
        if commit is not None:
            keep_dirs.add(os.path.basename(commit["state"]))
        for d in os.listdir(state_dir):
            if d.startswith("state_epoch") and d not in keep_dirs:
                shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)

    return sink


def retract_paragraphs_from_state(
    spec: CuckooSpec, state_dir: str, kept_docs: DataFrame
) -> int:
    """Retract previously-emitted documents from the paragraph-dedup
    stream state — the takedown/GDPR workflow, and the reason the state
    is a CUCKOO filter rather than a bloom filter: CF.REM gives EXACT
    deletion (the reference's core differentiator), so after retraction
    a future re-ingestion of the same paragraphs keeps them again.

    ``kept_docs``: the (doc_id, kept_text) rows the sink EMITTED for the
    docs being retracted (take them from the sink's output — they are,
    by construction, exactly the paragraph classes whose filter entry
    those docs own). Retracting paragraphs that were never kept removes
    non-members and permanently poisons the touched shard (reference
    poison-on-miss semantics — loud, not silent). Returns the number of
    distinct paragraph classes removed. Commits crash-atomically under a
    retract-suffixed state directory; the epoch counter is untouched, so
    the stream's replay guard is unaffected."""
    import shutil

    from sketchlib.dedup import paragraph_table
    from sketchlib.spark.cuckoo import remove_keys

    epoch_path = os.path.join(state_dir, "epoch.json")
    with open(epoch_path) as f:
        commit = json.load(f)
    spark = kept_docs.sparkSession
    prior = spark.read.parquet(commit["state"])
    norms = (
        paragraph_table(kept_docs.select("doc_id", F.col("kept_text").alias("text")))
        .select("__norm")
        .distinct()
        .localCheckpoint(eager=True)  # count + remove both consume it
    )
    n = norms.count()
    merged = remove_keys(prior, norms, spec, key=F.col("__norm"))
    k = int(commit.get("retracts", 0)) + 1
    new_state = os.path.join(state_dir, f"state_epoch{commit['epoch']}r{k}")
    merged.write.mode("overwrite").parquet(new_state)
    tmp = epoch_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"epoch": commit["epoch"], "retracts": k, "state": new_state}, f
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, epoch_path)
    keep_dirs = {os.path.basename(new_state), os.path.basename(commit["state"])}
    for d in os.listdir(state_dir):
        if d.startswith("state_epoch") and d not in keep_dirs:
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)
    return n


def streaming_distinct_per_key(
    stream: DataFrame,
    key_col: str,
    count_col: str,
    p: int | None = None,
    kind: str = "hll",
    k: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a running cardinality sketch per key, updated each micro-batch,
    emitting the current distinct-count estimate. The sketch blob IS the
    state — mergeable aggregators make exactly-once streaming state one
    binary column. ``kind``: "hll" (precision ``p``, default) or "kmv"
    (size ``k``, default 256 — exact below k distinct, ~1/sqrt(k-2)
    relative error above; handy for long-tail keys where most groups stay
    small). ``k`` is a separate kwarg so HLL's precision is never
    silently reused as a tiny KMV size (ADVICE r4: p=12 as k meant ~32%
    error); both params are validated HERE on the driver — an executor-
    time failure inside the stateful update is far harder to read."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sketchlib.kernels.hll import HyperLogLog
    from sketchlib.kernels.kmv import KMVSketch
    from sketchlib.util import i64_to_u64

    if kind not in ("hll", "kmv"):
        raise ValueError("kind must be 'hll' or 'kmv'")
    if kind == "hll":
        p = 12 if p is None else p
        if not 4 <= p <= 18:
            raise ValueError(f"hll precision p must be in [4, 18], got {p}")
    else:
        if p is not None:
            # p is HLL precision only; a caller passing p=100_000 with
            # kind='kmv' would otherwise silently get k=256 (~6% error)
            # instead of exact counts (ADVICE r5)
            raise ValueError(
                "p is the HLL precision and does not apply to kind='kmv'; "
                "use k to set the KMV size"
            )
        k = 256 if k is None else k
        if k < 8:
            raise ValueError(f"kmv size k must be >= 8, got {k} (rel-err ~1/sqrt(k-2))")
    cls = HyperLogLog if kind == "hll" else KMVSketch
    param = p if kind == "hll" else k
    # NULL counted-values are ignored, matching COUNT(DISTINCT) and the
    # batch aggregator's hash-mode contract — xxhash64(NULL) evaluates to
    # the seed, which would otherwise count as one phantom distinct per
    # key (the agg.py trap, previously unguarded on the streaming path)
    hashed = stream.where(F.col(count_col).isNotNull()).withColumn(
        "__h", F.xxhash64(count_col)
    )

    def update(key, pdfs, state):
        if state.exists:
            (blob,) = state.get
            sk = cls.from_bytes(bytes(blob))
        else:
            sk = cls(param)
        for pdf in pdfs:
            if len(pdf):
                sk.add_hashes(i64_to_u64(pdf["__h"].to_numpy()))
        state.update((sk.to_bytes(),))
        yield pd.DataFrame(
            {key_col: [key[0]], "distinct_estimate": [float(sk.estimate())]}
        )

    return hashed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, distinct_estimate double",
        stateStructType="sketch binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(stream: DataFrame, window: str = "5 minutes",
                          watermark: str = "10 minutes") -> DataFrame:
    """Built-in streaming windowed aggregation with late-data watermark
    (SURVEY.md §2.10 streaming row): counts + value sums per
    (event window, event_type)."""
    # parquet TIMESTAMP_NTZ is not a valid event-time column; cast to
    # session-TZ timestamp (UTC is pinned in the session factory)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
