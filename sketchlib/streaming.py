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
idempotent, so the guard is load-bearing).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.spark.cuckoo import CuckooSpec, build_partials, merge_partials


def incremental_cuckoo_sink(spec: CuckooSpec, key, state_dir: str, fanin: int = 64):
    """Returns a ``foreachBatch`` function maintaining a merged cuckoo
    filter under ``state_dir/state`` (one parquet row per shard).

    Usage::

        q = (stream.writeStream
             .foreachBatch(incremental_cuckoo_sink(spec, F.col("url"), dir))
             .start())
    """
    state_path = os.path.join(state_dir, "state")
    epoch_path = os.path.join(state_dir, "epoch.json")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        os.makedirs(state_dir, exist_ok=True)
        last = -1
        if os.path.exists(epoch_path):
            with open(epoch_path) as f:
                last = json.load(f)["epoch"]
        if epoch_id <= last:
            return  # replayed micro-batch: already folded in
        spark = batch_df.sparkSession
        partials = build_partials(batch_df, spec, key=key)
        try:
            prior = spark.read.parquet(state_path)
            partials = prior.unionByName(partials)
        except Exception:
            pass  # first batch: no prior state
        merged = merge_partials(partials, fanin=fanin)
        tmp = state_path + f".epoch{epoch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(state_path)
        with open(epoch_path, "w") as f:
            json.dump({"epoch": epoch_id}, f)

    return sink


def streaming_distinct_per_key(
    stream: DataFrame, key_col: str, count_col: str, p: int = 12
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a running HLL per key, updated each micro-batch, emitting the current
    distinct-count estimate. The sketch blob IS the state — mergeable
    aggregators make exactly-once streaming state one binary column."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sketchlib.kernels.hll import HyperLogLog
    from sketchlib.util import i64_to_u64

    hashed = stream.withColumn("__h", F.xxhash64(count_col))

    def update(key, pdfs, state):
        if state.exists:
            (blob,) = state.get
            hll = HyperLogLog.from_bytes(bytes(blob))
        else:
            hll = HyperLogLog(p)
        for pdf in pdfs:
            if len(pdf):
                hll.add_hashes(i64_to_u64(pdf["__h"].to_numpy()))
        state.update((hll.to_bytes(),))
        yield pd.DataFrame(
            {key_col: [key[0]], "distinct_estimate": [float(hll.estimate())]}
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
