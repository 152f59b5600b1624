"""Relational extensions the reference ecosystem lacks but a training-data
pipeline needs: as-of (most-recent-prior) joins, gap-based sessionization,
and deterministic hash sampling. All pure Catalyst built-ins — no UDFs, no
driver-side loops — each with an independent DuckDB-SQL oracle in
queries_data.py (ASOF JOIN / window-lag sessions / md5-threshold sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """Backward as-of join: attach to every left row the right row with the
    greatest ``right_ts`` < ``left_ts`` (``<=`` when ``strict=False``) for
    the same key. Rows with no prior match are dropped (inner semantics,
    matching DuckDB's ASOF JOIN).

    Distributed shape: union both inputs, ONE shuffle on (key), and a
    running ``last(..., ignorenulls)`` window carries the latest right
    values forward in time — never a per-row range probe, never a
    broadcast of the right side. At 10^12 rows both sides shuffle once on
    the key, exactly like a co-partitioned merge join; skewed keys take
    the same salting treatment as any keyed aggregation.

    Rows with a NULL timestamp are dropped on both sides (a NULL left ts
    has no "prior", a NULL right ts can never be one; engines also order
    NULLs differently). ``right`` must be unique per (key, right_ts) —
    pre-aggregate if not
    (ambiguous ties have no canonical winner in any engine). Right columns
    MAY be NULL: the matched row's values are carried as one struct, so a
    NULL field never stitches values from different right rows, and match
    existence is the struct's (row-level) non-nullness.
    """
    # NULL keys have no join partner (SQL join semantics — DuckDB's ASOF
    # equality never matches NULL, while a window partition WOULD group
    # NULL keys together); NULL timestamps have no ordering position
    left = left.where(F.col(key).isNotNull() & F.col(left_ts).isNotNull())
    right = right.where(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
    lcols = left.columns
    # the matched right row travels as ONE struct column: last(ignorenulls)
    # over the struct skips left rows (struct NULL) but carries a matched
    # right row atomically even when some of its FIELDS are NULL
    rstruct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    rstruct_type = right.select(rstruct.alias("__r")).schema["__r"].dataType
    # src orders right rows AFTER a left row at equal timestamps when
    # strict (so an exact-tie right row is outside the left row's frame)
    # and BEFORE it otherwise
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(0 if strict else 1).alias("__src"),
        *[F.col(c) for c in lcols if c != key],
        F.lit(None).cast(rstruct_type).alias("__r"),
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(1 if strict else 0).alias("__src"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        rstruct.alias("__r"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        key,
        "__ts",
        "__src",
        *[c for c in lcols if c != key],
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    is_left = F.col("__src") == (0 if strict else 1)
    out = carried.filter(is_left & F.col("__r").isNotNull())
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__r.{c}").alias(c) for c in right_cols],
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions via the built-in ``session_window`` aggregation
    (the same operator Structured Streaming uses, so batch and streaming
    sessions share one definition): events of a key belong to one session
    while consecutive gaps stay below ``gap``.

    Returns (key, session_start, last_ts, n_events) with timestamps as
    epoch microseconds (cross-engine hash-stable). One shuffle on the key.
    NULL-timestamp events belong to no session and are dropped (the SQL
    aggregate contract; engines also order NULLs differently in windows).
    """
    ev = events.withColumn("__ts", F.col(ts_col).cast("timestamp")).where(
        F.col("__ts").isNotNull()
    )
    return (
        ev.groupBy(key, F.session_window("__ts", gap).alias("__w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("__ts").alias("__last"))
        .select(
            F.col(key),
            F.unix_micros(F.col("__w.start")).alias("session_start_us"),
            F.unix_micros(F.col("__last")).alias("last_ts_us"),
            "n_events",
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    max_span_buckets: int | None = None,
) -> DataFrame:
    """Interval (range) join: all (left, right) pairs with matching ``key``
    and ``right_start <= left_ts <= right_end`` (inclusive ends; the three
    columns must be integral — epoch micros for timestamps).

    Distributed shape: a naive key-equi-join + range filter is quadratic
    within hot keys (and OSS Spark has no range-join optimization), so the
    time axis is BUCKETIZED: each interval explodes to the coarse buckets
    it covers (``sequence(start div w, end div w)``), each left row lands
    in exactly ONE bucket, and the join is a plain equi-join on
    (key, bucket) followed by the exact BETWEEN filter. No pair can be
    emitted twice (the left row's bucket is unique), so no dedup pass.
    Cost: interval replication ∝ span / bucket_width — pick the width near
    the TYPICAL interval span so most intervals land in 1-2 buckets.

    Intervals with ``right_end < right_start`` match nothing and are
    dropped before the explode.

    ``max_span_buckets``: at web scale one adversarial interval spanning
    the whole timeline would explode to millions of bucket rows. Setting a
    cap DROPS intervals wider than ``cap × bucket_width`` before the
    explode (the same bounded-cost trade as the LSH ``max_bucket_size``
    caps — the dropped intervals are the pathological ones, and the drop
    is explicit, never silent truncation of matches within kept
    intervals). ``None`` (default) keeps exact semantics.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    bw = int(bucket_width)

    # exact integer FLOOR division (div truncates toward zero; correct the
    # negative-remainder case) — float division would lose ulps at
    # epoch-microsecond magnitudes (> 2^53) and misplace boundary rows
    def _bkt(colname: str) -> F.Column:
        return F.expr(
            f"(CAST({colname} AS BIGINT) div {bw}) - "
            f"(CASE WHEN CAST({colname} AS BIGINT) % {bw} < 0 THEN 1 ELSE 0 END)"
        )

    lb = left.withColumn("__bkt", _bkt(left_ts))
    rvalid = right.filter(F.col(right_end) >= F.col(right_start))
    if max_span_buckets is not None:
        rvalid = rvalid.filter(
            _bkt(right_end) - _bkt(right_start) < int(max_span_buckets)
        )
    rb = rvalid.withColumn(
        "__bkt", F.explode(F.sequence(_bkt(right_start), _bkt(right_end)))
    )
    return (
        lb.join(rb, [key, "__bkt"])
        .filter(F.col(left_ts).between(F.col(right_start), F.col(right_end)))
        .drop("__bkt")
    )


def zorder_by(
    df: DataFrame, cols: list[str], bits: int = 16, num_files: int | None = None
) -> DataFrame:
    """Cluster rows along a Z-order (Morton) curve over ``cols`` — the
    data-layout lever for multi-column scan pruning at rest: after
    ``zorder_by(df, [a, b]).write.parquet(...)``, each output file /
    row group covers a small hyper-rectangle of (a, b), so parquet
    min/max statistics prune reads for predicates on EITHER column
    (a plain sort only prunes its leading column).

    Each column is normalized to ``bits`` equal-width buckets between its
    global min and max (ONE tiny aggregation — never a global rank
    window, which would single-partition the data), then the bucket bits
    are interleaved into the Morton key the rows are range-partitioned
    and sorted by. Skewed distributions give uneven bucket occupancy —
    the layout still prunes, just less evenly. Rows are unchanged — only
    their order/placement moves; ``repartitionByRange`` keeps output
    files non-overlapping in key space.

    Cost: one global range shuffle — paid ONCE at write time, like
    bucketing; every later scan with selective predicates wins.
    """
    if not cols or bits < 1 or bits > 20:
        raise ValueError("need ≥1 column and 1 ≤ bits ≤ 20")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"mx_{c}")]
    stats = df.agg(*aggs).first()
    nb = 1 << bits
    bcols = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            bcols.append(F.lit(0).cast("long"))
            continue
        frac = (F.col(c).cast("double") - F.lit(float(mn))) / F.lit(float(mx - mn))
        bcols.append(
            F.least(F.floor(frac * F.lit(float(nb))).cast("long"), F.lit(nb - 1))
        )
    # interleave: bit j of column i lands at position j*len(cols)+i
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, b in enumerate(bcols):
            z = z + F.shiftleft(
                F.shiftrightunsigned(b, j).bitwiseAND(F.lit(1)), j * len(cols) + i
            )
    zed = df.withColumn("__z", z)
    parts = [num_files] if num_files else []  # else spark.sql.shuffle.partitions
    return (
        zed.repartitionByRange(*parts, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )


#: rollup value domain: floor(v*1000) must fit a BIGINT (|v*1000| < 2^63);
#: DuckDB's cast errors on overflow where Spark saturates, so values
#: outside the domain are excluded identically in both engines
_ROLLUP_VMAX = 9.0e15


def _finite_val(col: str):
    """Values excluded from the integerized rollup sums: NULL, NaN, ±Inf,
    AND magnitudes whose x1000 quantization would overflow a BIGINT
    (floor(NaN/Inf) is NULL in Spark but the out-of-range BIGINT cast
    ERRORS in DuckDB, so the exclusion must be explicit and identical in
    the operator and the oracle — fuzz-gate finding). Counts still include
    the rows; only the value partial skips them."""
    c = F.col(col).cast("double")
    return c.isNotNull() & ~F.isnan(c) & (c >= -_ROLLUP_VMAX) & (c <= _ROLLUP_VMAX)


def write_time_rollup(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    val_col: str = "value",
    bucket: str = "hour",
) -> None:
    """Materialize a time-bucketed rollup (the hypertable
    continuous-aggregate pattern): per (bucket, key) COUNT and an
    integerized SUM (``floor(value·1000)`` summed as longs — exact and
    summation-order-independent, so rollup+tail merges reproduce the
    direct aggregate bit-for-bit). Pass the events VISIBLE AT REFRESH
    TIME (i.e. ts < the refresh cutoff): a bucket straddling the cutoff
    then holds only its pre-cutoff partial and merges exactly with the
    tail. Written once per refresh; queries over history read THIS table
    instead of rescanning raw events."""
    ev = events.withColumn("__b", F.date_trunc(bucket, F.col(ts_col).cast("timestamp")))
    (
        ev.groupBy("__b", key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(_finite_val(val_col), F.floor(F.col(val_col) * 1000).cast("long"))
            ).alias("val_e3"),
        )
        .select(F.unix_micros("__b").alias("bucket_us"), key_col, "n", "val_e3")
        .write.mode("overwrite")
        .parquet(path)
    )


def continuous_agg(
    spark,
    rollup_path: str,
    events: DataFrame,
    cutoff_us: int,
    ts_col: str = "ts",
    key_col: str = "event_type",
    val_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Continuous aggregate read: pre-aggregated rollup buckets BEFORE
    ``cutoff_us`` union an on-the-fly aggregate of the raw tail AT/after
    it, merged by summing the mergeable partials (counts + integer sums).
    History costs a scan of the tiny rollup table — never a rescan of raw
    events; only the tail (one refresh interval) aggregates at query
    time. Equals the direct full GROUP BY exactly (integer partials)."""
    pre = spark.read.parquet(rollup_path).filter(F.col("bucket_us") < cutoff_us)
    tail = (
        events.filter(F.unix_micros(F.col(ts_col).cast("timestamp")) >= cutoff_us)
        .withColumn("__b", F.date_trunc(bucket, F.col(ts_col).cast("timestamp")))
        .groupBy("__b", key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(_finite_val(val_col), F.floor(F.col(val_col) * 1000).cast("long"))
            ).alias("val_e3"),
        )
        .select(F.unix_micros("__b").alias("bucket_us"), key_col, "n", "val_e3")
    )
    # a bucket straddling the cutoff contributes a rollup partial (the
    # refresh saw only < cutoff events) AND tail rows — merging integer
    # partials by key makes the straddle exact
    return (
        pre.unionByName(tail)
        .groupBy("bucket_us", key_col)
        .agg(F.sum("n").alias("n"), F.sum("val_e3").alias("val_e3"))
    )


def mix_sources(
    df: DataFrame,
    targets: dict[str, float],
    key_sql: str,
    source_col: str = "source",
    validate: bool = True,
) -> DataFrame:
    """Domain-mixing resampler (the data-mixing stage of a pretraining
    pipeline): downsample each source so the output hits the ``targets``
    fractions, maximizing total output size — the bottleneck source (the
    one with the least data relative to its target) is kept whole and every
    other source is hash-thinned to match.

    rate_s = t_s · N_out / n_s with N_out = min_s(n_s / t_s); a row is kept
    when its md5-hash uniform falls below rate_s (quantized to 60 bits).
    Fully deterministic: reruns, repartitionings, and engines agree row for
    row (the DuckDB oracle re-derives the identical rates and thresholds).

    Distributed shape: everything stays in-plan — the per-source counts are
    one map-side-combined aggregate, the k-row rates relation joins back by
    broadcast, and the keep predicate is a pure projection; the driver never
    sees a row. Sources absent from ``targets`` are dropped (inner join).

    Float notes pinned for cross-engine parity: rate arithmetic is IEEE
    ops in a fixed order (÷, min, ×, ÷); the threshold is
    floor(rate·16^15) rendered as a 15-hex-char string (floor before the
    BIGINT cast — DuckDB's bare cast ROUNDS where Spark truncates).
    """
    import math

    if not targets:
        raise ValueError("targets must name at least one source")
    if any(
        not (math.isfinite(float(f)) and float(f) > 0.0) for f in targets.values()
    ):
        # 0 / negative / NaN / Inf fractions all corrupt the rate
        # arithmetic into NaN (Spark's floor(NaN) is NULL — the predicate
        # silently drops every row — while DuckDB's cast errors); fail
        # loudly instead
        raise ValueError("target fractions must be positive finite numbers")
    spark = df.sparkSession
    t = spark.createDataFrame(
        [(s, float(f)) for s, f in targets.items()], f"{source_col} string, __tf double"
    )
    n = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__cnt"))
    if validate:
        # a target naming a source with zero rows (typo, ' src1' from
        # unstripped CLI input) would otherwise silently re-allocate its
        # mass across the others — wrong corpus, no error. Costs one
        # extra counts aggregate; pass validate=False on hot paths.
        missing = sorted(
            row[0]
            for row in t.join(n, source_col, "left_anti").select(source_col).collect()
        )  # anti-join: the collect is bounded by |targets|, never the corpus
        if missing:
            raise ValueError(f"target sources have no rows: {missing}")
    r = n.join(t, source_col)
    nout = r.agg(F.min(F.col("__cnt") / F.col("__tf")).alias("__nout"))
    rates = r.crossJoin(nout).select(
        source_col, (F.col("__tf") * F.col("__nout") / F.col("__cnt")).alias("__rate")
    )
    thr = "lpad(lower(hex(CAST(floor(__rate * 1152921504606846976) AS BIGINT))), 15, '0')"
    return (
        df.join(F.broadcast(rates), source_col)  # k rows — bounded by |targets|
        .filter(F.expr(f"__rate >= 1.0 OR substr(md5({key_sql}), 1, 15) < {thr}"))
        .drop("__rate")
    )


def sample_by_hash(df: DataFrame, key_sql: str, threshold_hex: str) -> DataFrame:
    """Deterministic, engine-portable sample: keep rows whose ``md5(key)``
    hex digest sorts below ``threshold_hex`` (e.g. '28' keeps ≈ 0x28/0x100
    ≈ 15.6%). The SAME predicate evaluates in any engine with md5 — the
    sample is reproducible across runs, partitionings, and engines, which
    is what a training-data pipeline needs for held-out splits. Pushed to
    the scan as a plain filter; no shuffle."""
    return df.filter(F.expr(f"md5({key_sql}) < '{threshold_hex}'"))


#: 2^52 — denominator of the exact dyadic uniform used by priority_sample
_U52 = 4503599627370496.0


def priority_sample(
    df: DataFrame, weight_sql: str, k: int, key_sql: str, seed: int = 42
) -> DataFrame:
    """Exact-k weighted sample via PRIORITY SAMPLING (Duffield, Lund &
    Thorup, JACM 2007): every row gets priority ``w / u`` with ``u``
    uniform in (0, 1], and the ``k`` highest-priority rows are the sample
    — the scheme behind weighted training-data selection with provably
    near-optimal subset-sum variance.

    Deterministic and BIT-portable across engines (the mix_sources /
    k-means|| discipline): ``u`` is an exact dyadic rational
    ``(h + 1) / 2^52`` from the first 13 hex chars of ``md5(key:seed)``
    (the +1 keeps u > 0), so the only inexact operation is the single
    IEEE-754 division ``w / u`` — correctly rounded identically
    everywhere, hence the DuckDB oracle reproduces priorities BITWISE and
    the sample is stable under reruns, repartitionings, and engines.

    Weight contract (finite_values philosophy): rows with NULL, NaN, ±Inf
    or non-positive weights are excluded — weight 0 means "never sample".
    A finite w over a tiny u may overflow to +Inf; both engines produce
    +Inf identically and ties break on the key, so the result stays
    deterministic. ``key_sql`` must be unique per row (it is the identity
    AND the tiebreak).

    Distributed shape: pure projection + TakeOrdered top-k (plan-asserted)
    — no shuffle beyond the k-row reduce; at 10^12 rows this is the
    optimal single-pass weighted sampler. Returns the sampled rows plus
    ``priority`` (callers doing subset-sum estimation take tau = the
    (k+1)-th priority — pass k+1 and drop the last row).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = F.expr(weight_sql).cast("double")
    u = (
        F.expr(f"CAST(conv(substr(md5(concat({key_sql}, ':', '{int(seed)}')), 1, 13), 16, 10) AS DOUBLE)")
        + F.lit(1.0)
    ) / F.lit(_U52)
    # NULL keys are excluded like every hash-fed operator (CLAUDE.md
    # contract) — also sidesteps the engines' differing NULL sort order
    ok = (
        F.expr(key_sql).isNotNull()
        & w.isNotNull()
        & ~F.isnan(w)
        & (w > 0)
        & (w <= F.lit(1.7976931348623157e308))
    )
    return (
        df.filter(ok)
        .withColumn("priority", w / u)
        .orderBy(F.desc("priority"), F.expr(key_sql))
        .limit(int(k))
    )


def priority_sample_stratified(
    df: DataFrame,
    weight_sql: str,
    k: int,
    key_sql: str,
    stratum_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exact-k-PER-STRATUM weighted sampling (the per-domain / per-language
    quota stage of a data-selection pipeline): priority sampling
    (:func:`priority_sample` — same bit-portable ``w / u`` priorities)
    with the top ``k`` taken independently inside every ``stratum_col``
    group. NULL strata form their own group (both engines partition NULLs
    together); NULL/invalid keys and weights are excluded exactly as in
    the global sampler.

    Distributed shape: a naive per-group window would shuffle the ENTIRE
    corpus on the stratum key (and hot strata skew it). Instead phase 1
    reduces each scan partition to its local top-k per stratum inside
    ``mapInPandas`` (Arrow-batched, vectorized sort+groupby-head, bounded
    buffer of ~strata*k + one batch, NO shuffle), so only
    ``partitions * strata * k`` survivor rows reach the one stratum-keyed
    exchange where a window row_number takes the global per-stratum top-k.
    Local-then-global top-k is exact (any global top-k row is a local
    top-k row of its partition). At 10^12 rows the exchange carries the
    survivors, never the corpus.

    Returns the sampled rows (all input columns) plus ``priority``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    import pandas as pd
    from pyspark.sql import Window

    w = F.expr(weight_sql).cast("double")
    u = (
        F.expr(f"CAST(conv(substr(md5(concat({key_sql}, ':', '{int(seed)}')), 1, 13), 16, 10) AS DOUBLE)")
        + F.lit(1.0)
    ) / F.lit(_U52)
    ok = (
        F.expr(key_sql).isNotNull()
        & w.isNotNull()
        & ~F.isnan(w)
        & (w > 0)
        & (w <= F.lit(1.7976931348623157e308))
    )
    scored = (
        df.filter(ok)
        .withColumn("priority", w / u)
        .withColumn("__k", F.expr(key_sql).cast("string"))
    )
    schema = scored.schema

    def local_topk(batches):
        # AMORTIZED compaction (VERDICT r5 #7): a per-batch sort makes the
        # loop O(batches × buffer·log) on wide strata. Instead raw batches
        # accumulate until the pending rows exceed the kept survivor set
        # (or a floor), then ONE sort+groupby-head compacts kept+pending —
        # compaction cost doubles with the data it absorbs, so total sort
        # work is O(total·log) amortized while the buffer stays bounded by
        # ~2×max(strata·k, floor) + one batch. The kept frame is the same
        # function of the rows seen either way (local top-k is associative
        # and idempotent), so the output is IDENTICAL to the per-batch
        # variant — property-tested in test_relops.
        kept, pending, pending_rows = None, [], 0

        def compact():
            nonlocal kept, pending, pending_rows
            frames = ([kept] if kept is not None else []) + pending
            allf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
            # vectorized reduction: sort once, keep k rows per stratum
            # (dropna=False: a NULL stratum is a real group)
            kept = (
                allf.sort_values(["priority", "__k"], ascending=[False, True])
                .groupby(stratum_col, dropna=False, sort=False)
                .head(k)
                .reset_index(drop=True)
            )
            pending, pending_rows = [], 0

        for pdf in batches:
            pending.append(pdf)
            pending_rows += len(pdf)
            if pending_rows >= max(len(kept) if kept is not None else 0, 4096):
                compact()
        if pending:
            compact()
        if kept is not None and len(kept):
            yield kept

    survivors = scored.mapInPandas(local_topk, schema=schema)
    rn = F.row_number().over(
        Window.partitionBy(stratum_col).orderBy(F.desc("priority"), F.col("__k"))
    )
    return survivors.withColumn("__rn", rn).filter(F.col("__rn") <= k).drop("__rn", "__k")


def train_val_split(docs: DataFrame, val_pct: int = 5) -> DataFrame:
    """(doc_id, split, split_bucket): leakage-safe deterministic
    train/validation assignment. The split key is the EXACT-DEDUP
    IDENTITY (md5 of whitespace-normalized lowered text — the same
    fingerprint the exact-dedup stage groups on), NOT the doc id: every
    surviving duplicate of a document lands in the same split by
    construction, so the train/test-contamination class GPT-3's split
    famously hit (duplicated docs straddling the split) cannot occur
    across exact duplicates. ``split_bucket`` = bit-portable
    md5('split:'||fingerprint) % 100; bucket < val_pct → 'val'.

    Scale shape: a ZERO-SHUFFLE whole-stage-codegen projection — the
    leakage guarantee comes from determinism (same text → same bucket),
    not from grouping, so no exchange is needed at any corpus size.
    NULL-text docs have no identity and drop (the text-operator
    contract). Near-duplicate-safe splitting additionally routes via
    near_dup_clusters' cluster id as the key — same projection shape
    over the cluster table."""
    from sketchlib.textops import fingerprint_sql
    from sketchlib.urlops import _md5i

    fp = fingerprint_sql("spark")
    bucket = _md5i("spark", f"'split:' || {fp}") + " % 100"
    return docs.where(F.col("text").isNotNull()).selectExpr(
        "doc_id",
        f"CASE WHEN ({bucket}) < {int(val_pct)} THEN 'val' ELSE 'train' END AS split",
        f"CAST(({bucket}) AS BIGINT) AS split_bucket",
    )


def shard_manifest(docs: DataFrame, n_shards: int = 16) -> DataFrame:
    """(shard, n_docs, n_tokens, content_xor): the verification manifest
    of a sharded corpus release (Dolma-style data publishing: every shard
    ships with counts + a content checksum so consumers can verify the
    download). Shard assignment is the bit-portable md5 of doc_id;
    content_xor is the BIT_XOR of per-doc md5-derived BIGINTs —
    order-insensitive and overflow-free at any corpus size (a SUM of
    2^52-bounded values overflows BIGINT past ~2k docs/shard at scale;
    XOR never does). One n_shards-group aggregation, map-side combined.
    NULL-text docs drop (the text-operator contract)."""
    from sketchlib.textops import token_count_sql
    from sketchlib.urlops import _md5i

    shard = _md5i("spark", "'shard:' || CAST(doc_id AS STRING)") + f" % {int(n_shards)}"
    h = _md5i("spark", "'c:' || text")
    return (
        docs.where(F.col("text").isNotNull())
        .selectExpr(
            f"CAST(({shard}) AS BIGINT) AS shard",
            f"{token_count_sql('spark')} AS __t",
            f"({h}) AS __h",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("CAST(sum(__t) AS BIGINT)").alias("n_tokens"),
            F.expr("bit_xor(__h)").alias("content_xor"),
        )
    )


def export_sharded(docs: DataFrame, out_dir: str, n_shards: int = 16) -> DataFrame:
    """Publish the corpus as ``n_shards`` parquet directories
    (``shard=N/``) plus a ``_manifest`` parquet beside them, and return
    the manifest. The manifest is computed from the SAME relation that
    was written, so a reader can recompute :func:`shard_manifest` over
    the published files and compare — the release is self-verifying
    (pytest proves write → read-back → recompute == manifest)."""
    from sketchlib.urlops import _md5i

    shard = _md5i("spark", "'shard:' || CAST(doc_id AS STRING)") + f" % {int(n_shards)}"
    out = docs.where(F.col("text").isNotNull()).withColumn(
        "shard", F.expr(f"CAST(({shard}) AS BIGINT)")
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(f"{out_dir}/data")
    manifest = shard_manifest(docs, n_shards)
    manifest.write.mode("overwrite").parquet(f"{out_dir}/_manifest")
    return manifest
