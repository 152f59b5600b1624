"""Relational-extension tests: as-of join vs brute force, sessionization
vs a hand-rolled gap scan, deterministic-sample properties."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sketchlib.relops import asof_join, sample_by_hash, sessionize


def _t(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture(scope="module")
def clicks_purchases(spark):
    clicks = spark.createDataFrame(
        [(1, 7, _t(5)), (2, 7, _t(20)), (3, 8, _t(10)), (4, 9, _t(1))],
        "event_id long, user_id long, ts timestamp",
    )
    purch = spark.createDataFrame(
        [(100, 7, _t(4)), (101, 7, _t(5)), (102, 7, _t(15)), (103, 8, _t(10))],
        "purchase_event_id long, user_id long, pts timestamp",
    )
    return clicks, purch


def test_asof_join_strict(spark, clicks_purchases):
    clicks, purch = clicks_purchases
    out = {
        r["event_id"]: r["purchase_event_id"]
        for r in asof_join(
            clicks, purch, "user_id", "ts", "pts", ["purchase_event_id", "pts"], strict=True
        ).collect()
    }
    # click 1 (t=5): purchases at t=4 and t=5 — strict > picks t=4
    # click 2 (t=20): latest prior is t=15
    # click 3 (t=10 user 8): purchase at t=10 is NOT strictly prior → no match
    # click 4 (user 9): no purchases → dropped (inner)
    assert out == {1: 100, 2: 102}


def test_asof_join_inclusive(spark, clicks_purchases):
    clicks, purch = clicks_purchases
    out = {
        r["event_id"]: r["purchase_event_id"]
        for r in asof_join(
            clicks, purch, "user_id", "ts", "pts", ["purchase_event_id"], strict=False
        ).collect()
    }
    # <= : click 1 now matches the equal-time purchase 101; click 3 matches 103
    assert out == {1: 101, 2: 102, 3: 103}


def test_asof_join_null_right_columns(spark):
    """A matched right row must be carried ATOMICALLY even when some of its
    columns are NULL: no stitching fields from different right rows, and a
    NULL first right column must not drop the match (ADVICE r2)."""
    clicks = spark.createDataFrame(
        [(1, 7, _t(5)), (2, 7, _t(20)), (3, 8, _t(10))],
        "event_id long, user_id long, ts timestamp",
    )
    purch = spark.createDataFrame(
        [
            (100, None, 7, _t(4)),   # note NULL
            (None, "x", 7, _t(15)),  # pid NULL — must not borrow pid=100 from t=4
            (None, "y", 8, _t(3)),   # first right col NULL — match must survive
        ],
        "pid long, note string, user_id long, pts timestamp",
    )
    rows = {
        r["event_id"]: (r["pid"], r["note"])
        for r in asof_join(
            clicks, purch, "user_id", "ts", "pts", ["pid", "note"], strict=True
        ).collect()
    }
    assert rows == {1: (100, None), 2: (None, "x"), 3: (None, "y")}


def test_sessionize_gap_semantics(spark):
    rows = [
        (7, _t(0)),
        (7, _t(10)),  # same session (10min gap)
        (7, _t(40)),  # EXACTLY 30min after t=10 → still merges (inclusive)
        (7, _t(40, 1)),
        (8, _t(0)),
        (8, _t(30, 1)),  # 30min 1s → strictly beyond the gap → new session
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sorted(
        (r["user_id"], r["session_start_us"], r["last_ts_us"], r["n_events"])
        for r in sessionize(ev, "user_id", "ts", "30 minutes").collect()
    )
    us = lambda m, s=0: int(_t(m, s).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)  # noqa: E731
    assert out == [
        (7, us(0), us(40, 1), 4),
        (8, us(0), us(0), 1),
        (8, us(30, 1), us(30, 1), 1),
    ]


def test_asof_join_differential_vs_pandas(spark):
    """Randomized differential: our distributed union-window as-of must
    equal pandas.merge_asof (an independent reference implementation) on
    both strict and inclusive semantics."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    base = dt.datetime(2024, 1, 1)
    lpdf = pd.DataFrame(
        {
            "event_id": np.arange(300),
            "user_id": rng.integers(0, 12, 300),
            "ts": [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 5000, 300)],
        }
    )
    rpdf = pd.DataFrame(
        {
            "purchase_event_id": np.arange(1000, 1120),
            "user_id": rng.integers(0, 12, 120),
            "pts": [base + dt.timedelta(seconds=int(s)) for s in rng.integers(0, 5000, 120)],
        }
    ).drop_duplicates(["user_id", "pts"])
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    for strict in (True, False):
        got = {
            r["event_id"]: r["purchase_event_id"]
            for r in asof_join(
                left, right, "user_id", "ts", "pts", ["purchase_event_id"], strict=strict
            ).collect()
        }
        ref_df = pd.merge_asof(
            lpdf.sort_values("ts"),
            rpdf.sort_values("pts"),
            left_on="ts",
            right_on="pts",
            by="user_id",
            allow_exact_matches=not strict,
        )
        ref = {
            int(r.event_id): int(r.purchase_event_id)
            for r in ref_df.itertuples()
            if pd.notna(r.purchase_event_id)
        }
        assert got == ref, f"strict={strict}"


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Co-located joins (the 100-TB fact-to-fact pattern): two tables
    bucketed on the join key join WITHOUT any Exchange in the physical
    plan — the shuffle was paid once at write time."""
    import shutil

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)  # stale location from a prior session
    docs.select("doc_id", "source").write.bucketBy(8, "doc_id").sortBy("doc_id").mode(
        "overwrite"
    ).saveAsTable("bkt_a")
    docs.select("doc_id", "lang").write.bucketBy(8, "doc_id").sortBy("doc_id").mode(
        "overwrite"
    ).saveAsTable("bkt_b")
    # hint("merge") pins SortMergeJoin (the fact-to-fact shape — at test
    # size the planner would otherwise broadcast); bucketing then removes
    # the shuffle entirely
    j = spark.table("bkt_a").hint("merge").join(spark.table("bkt_b"), "doc_id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:1500]
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert "Bucketed: true" in plan, plan[:1500]
    assert j.count() == docs.count()
    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_sample_by_hash_deterministic_and_nested(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = {r["doc_id"] for r in sample_by_hash(docs, "CAST(doc_id AS STRING)", "28").collect()}
    b = {r["doc_id"] for r in sample_by_hash(docs.repartition(7), "CAST(doc_id AS STRING)", "28").collect()}
    assert a == b  # partitioning-independent
    half = {r["doc_id"] for r in sample_by_hash(docs, "CAST(doc_id AS STRING)", "14").collect()}
    assert half <= a  # smaller threshold nests inside the larger split
    n = docs.count()
    assert 0.10 * n <= len(a) <= 0.22 * n  # ≈15.6%


def test_range_join_differential_vs_naive(spark):
    """Randomized differential: the bucketized range join must equal the
    naive equi-join + BETWEEN filter — including negative timestamps,
    inclusive boundaries, multi-bucket spans, and empty intervals."""
    import numpy as np

    from sketchlib.relops import range_join

    rng = np.random.default_rng(3)
    lrows = [
        (int(i), int(k), int(t))
        for i, (k, t) in enumerate(
            zip(rng.integers(0, 9, 400), rng.integers(-5000, 5000, 400))
        )
    ]
    rrows = []
    for j in range(150):
        k = int(rng.integers(0, 9))
        s = int(rng.integers(-5200, 5200))
        # mix of narrow, wide, degenerate (point) and INVALID (e < s) spans
        e = s + int(rng.integers(-50, 900))
        rrows.append((1000 + j, k, s, e))
    left = spark.createDataFrame(lrows, "lid long, k long, t long")
    right = spark.createDataFrame(rrows, "rid long, k long, s long, e long")
    for width in (64, 1000, 7):
        got = {
            (r["lid"], r["rid"])
            for r in range_join(left, right, "k", "t", "s", "e", width).collect()
        }
        ref = {
            (l[0], r[0])
            for l in lrows
            for r in rrows
            if l[1] == r[1] and r[2] <= l[2] <= r[3]
        }
        assert got == ref, f"width={width}: {len(got)} vs {len(ref)}"


def test_range_join_rejects_bad_width(spark):
    from sketchlib.relops import range_join

    df = spark.createDataFrame([(1, 1)], "k long, t long")
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(df, df, "k", "t", "t", "t", 0)


def test_zorder_layout_prunes_both_columns(spark, sf_dir, tmp_path):
    """Z-ordered parquet: per-file min/max ranges must be narrow on BOTH
    curve columns (a plain sort narrows only its leading column), so
    row-group statistics prune scans for predicates on either. Content is
    unchanged — only placement."""
    import glob

    import pyarrow.parquet as pq

    from sketchlib.relops import zorder_by

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "zorder")
    upath = str(tmp_path / "plain")
    zorder_by(ev, ["user_id", "value"], bits=8, num_files=8).write.mode("overwrite").parquet(zpath)
    ev.repartition(8).write.mode("overwrite").parquet(upath)

    def avg_rel_range(path, col):
        lo = ev.agg(F.min(col)).first()[0]
        hi = ev.agg(F.max(col)).first()[0]
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            fl, fh = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fl = s.min if fl is None else min(fl, s.min)
                        fh = s.max if fh is None else max(fh, s.max)
            if fl is not None:
                spans.append((fh - fl) / max(hi - lo, 1e-12))
        assert spans, f"no stats found under {path}"
        return sum(spans) / len(spans)

    # round-robin files span ~the full domain on both columns; z-order
    # shrinks both dramatically
    for col in ("user_id", "value"):
        z = avg_rel_range(zpath, col)
        u = avg_rel_range(upath, col)
        assert z < 0.6 * u, f"{col}: zorder {z:.3f} vs plain {u:.3f}"
    # content preserved exactly (same multiset of rows)
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0


def test_zorder_rejects_bad_args(spark, sf_dir):
    from sketchlib.relops import zorder_by

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError):
        zorder_by(ev, [], bits=8)
    with pytest.raises(ValueError):
        zorder_by(ev, ["value"], bits=0)


def test_continuous_agg_exact_even_with_midbucket_cutoff(spark, sf_dir, tmp_path):
    """The rollup+tail merge must equal the direct GROUP BY even when the
    refresh cutoff falls MID-bucket: the straddling bucket's rollup
    partial (pre-cutoff events only) merges with its tail rows exactly
    because the partials are integers."""
    from sketchlib.relops import continuous_agg, write_time_rollup

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = ev.select(F.min(ts_us), F.max(ts_us)).first()
    cutoff = (lo + hi) // 2 + 17_123_456  # deliberately NOT bucket-aligned
    path = str(tmp_path / "rollup")
    write_time_rollup(ev.filter(ts_us < cutoff), path)
    got = {
        (r["bucket_us"], r["event_type"]): (r["n"], r["val_e3"])
        for r in continuous_agg(spark, path, ev, cutoff).collect()
    }
    direct = {
        (r["bucket_us"], r["event_type"]): (r["n"], r["val_e3"])
        for r in ev.withColumn("__b", F.date_trunc("hour", F.col("ts").cast("timestamp")))
        .groupBy("__b", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("val_e3"),
        )
        .select(F.unix_micros("__b").alias("bucket_us"), "event_type", "n", "val_e3")
        .collect()
    }
    assert got == direct
    # and the tail the query aggregates is a small fraction of raw events
    tail_n = ev.filter(ts_us >= cutoff).count()
    assert tail_n < ev.count()


def test_range_join_span_cap(spark):
    """max_span_buckets drops pathologically wide intervals (bounded
    explode); narrow intervals and their matches are untouched."""
    from sketchlib.relops import range_join

    left = spark.createDataFrame([(1, 0, 50), (2, 0, 5000)], "lid long, k long, t long")
    right = spark.createDataFrame(
        [(10, 0, 40, 60), (11, 0, -100000, 100000)], "rid long, k long, s long, e long"
    )
    full = {
        (r["lid"], r["rid"]) for r in range_join(left, right, "k", "t", "s", "e", 100).collect()
    }
    assert full == {(1, 10), (1, 11), (2, 11)}
    capped = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, "k", "t", "s", "e", 100, max_span_buckets=10).collect()
    }
    assert capped == {(1, 10)}  # the 2000-bucket interval is dropped whole


def test_mix_sources_fractions_and_determinism(spark):
    from sketchlib.relops import mix_sources

    df = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "concat('s', CAST(id % 4 AS STRING)) AS source"
    )
    targets = {"s0": 0.5, "s1": 0.25, "s2": 0.25}
    # 250 rows/source; caps = 250/0.5=500, 1000, 1000 -> N_out=500
    # rates: s0=1.0 (bottleneck, kept whole), s1=s2=0.5, s3 dropped
    out = mix_sources(df, targets, "CAST(doc_id AS STRING)")
    by_src = {r["source"]: r["n"] for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert by_src["s0"] == 250
    assert "s3" not in by_src
    for s in ("s1", "s2"):  # hash-thinned to ~125 (binomial, wide margin)
        assert 90 <= by_src[s] <= 160, by_src
    rows = sorted(r["doc_id"] for r in out.collect())
    rows_rep = sorted(
        r["doc_id"]
        for r in mix_sources(df.repartition(13), targets, "CAST(doc_id AS STRING)").collect()
    )
    assert rows == rows_rep  # partitioning-independent row set


def test_mix_sources_rejects_empty_targets(spark):
    from sketchlib.relops import mix_sources

    df = spark.range(3).selectExpr("id AS doc_id", "'a' AS source")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mix_sources(df, {}, "CAST(doc_id AS STRING)")


def test_mix_sources_rejects_nonpositive_fraction(spark):
    from sketchlib.relops import mix_sources
    import pytest as _pytest

    df = spark.range(3).selectExpr("id AS doc_id", "'a' AS source")
    for bad in ({"a": 0.0}, {"a": -0.5}, {"a": float("nan")}):
        with _pytest.raises(ValueError):
            mix_sources(df, bad, "CAST(doc_id AS STRING)")


def test_mix_sources_validates_unknown_source(spark):
    from sketchlib.relops import mix_sources
    import pytest as _pytest

    df = spark.range(10).selectExpr("id AS doc_id", "'a' AS source")
    with _pytest.raises(ValueError, match="no rows"):
        mix_sources(df, {"a": 0.5, " typo": 0.5}, "CAST(doc_id AS STRING)")
    # validate=False: the absent source's mass re-allocates (documented)
    out = mix_sources(
        df, {"a": 0.5, "gone": 0.5}, "CAST(doc_id AS STRING)", validate=False
    )
    assert out.count() == 10  # 'a' is the bottleneck, kept whole


def test_mix_sources_rejects_inf_fraction(spark):
    from sketchlib.relops import mix_sources
    import pytest as _pytest

    df = spark.range(3).selectExpr("id AS doc_id", "'a' AS source")
    with _pytest.raises(ValueError):
        mix_sources(df, {"a": float("inf")}, "CAST(doc_id AS STRING)")


def test_mix_sources_differential_pure_python(spark):
    """The rate arithmetic and 60-bit md5 thresholds are replicated in pure
    Python float ops (same IEEE operation order) — the kept row set must
    match exactly for several random target configurations."""
    import hashlib
    import random

    from sketchlib.relops import mix_sources

    rng = random.Random(31337)
    rows = [(i, f"s{rng.randint(0, 5)}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    counts = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    for trial in range(3):
        srcs = rng.sample(sorted(counts), 3)
        targets = {s: rng.choice([0.2, 0.25, 0.4, 0.5]) for s in srcs}
        nout = min(counts[s] / targets[s] for s in srcs)
        expected = set()
        for doc_id, s in rows:
            if s not in targets:
                continue
            rate = targets[s] * nout / counts[s]
            thr = format(int(rate * 1152921504606846976), "x").rjust(15, "0")
            h = hashlib.md5(str(doc_id).encode()).hexdigest()[:15]
            if rate >= 1.0 or h < thr:
                expected.add(doc_id)
        got = {
            r["doc_id"]
            for r in mix_sources(df, targets, "CAST(doc_id AS STRING)").collect()
        }
        assert got == expected, (trial, targets)


def test_priority_sample_deterministic_and_matches_numpy(spark):
    """Priority sampling: (a) bit-identical under repartitioning, (b) the
    exact top-k of the w/u priorities recomputed independently in Python
    (same md5-derived dyadic uniform — the bit-portability contract),
    (c) dirty weights/keys excluded per the finite_values philosophy."""
    import hashlib

    from sketchlib.relops import priority_sample

    rows = [(i, float(10 + (i * 7) % 90)) for i in range(200)]
    rows += [(900, 0.0), (901, -3.0), (902, float("nan")), (903, float("inf")),
             (904, None), (None, 5.0)]
    df = spark.createDataFrame(rows, "id bigint, w double")

    got = [
        (r["id"], r["priority"])
        for r in priority_sample(df, "w", 25, "CAST(id AS STRING)").collect()
    ]
    got_rep = [
        (r["id"], r["priority"])
        for r in priority_sample(df.repartition(13), "w", 25, "CAST(id AS STRING)").collect()
    ]
    assert got == got_rep  # bit-identical under any partitioning

    def prio(i, w):
        h = int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:13], 16)
        return w / ((h + 1) / 4503599627370496.0)

    exp = sorted(
        ((i, prio(i, w)) for i, w in rows[:200]), key=lambda x: (-x[1], str(x[0]))
    )[:25]
    assert got == exp  # same bits, same order
    ids = {i for i, _ in got}
    assert not ids & {900, 901, 902, 903, 904, None}  # dirty rows excluded


def test_priority_sample_weighting_is_effective(spark):
    """A row with overwhelming weight must always be sampled, and k bounds
    the output even when fewer valid rows exist."""
    from sketchlib.relops import priority_sample

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(100)] + [(777, 1e15)], "id bigint, w double"
    )
    top = {r["id"] for r in priority_sample(df, "w", 10, "CAST(id AS STRING)").collect()}
    assert 777 in top
    tiny = spark.createDataFrame([(1, 2.0), (2, 0.0)], "id bigint, w double")
    assert priority_sample(tiny, "w", 5, "CAST(id AS STRING)").count() == 1


def test_priority_sample_string_ids(spark):
    """String id columns work end-to-end (the key is identity + tiebreak;
    no numeric coercion anywhere — mirrors the kmeans id fix)."""
    from sketchlib.relops import priority_sample

    df = spark.createDataFrame(
        [(f"url-{i}", float(1 + i % 7)) for i in range(50)], "url string, w double"
    )
    got = priority_sample(df, "w", 10, "url").collect()
    assert len(got) == 10 and all(r["url"].startswith("url-") for r in got)
    rep = priority_sample(df.repartition(7), "w", 10, "url").collect()
    assert [(r["url"], r["priority"]) for r in got] == [
        (r["url"], r["priority"]) for r in rep
    ]


def test_priority_sample_stratified_exact_per_group(spark):
    """The two-phase (local Arrow top-k → one stratum shuffle) sampler
    must equal the straightforward per-group top-k, including across a
    pathological partitioning and with a NULL stratum group."""
    import pandas as pd

    from sketchlib.relops import priority_sample_stratified

    rows = [(i, ["a", "b", None][i % 3], float(1 + (i * 7919) % 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, grp string, w double").repartition(13)
    out = priority_sample_stratified(
        df, "w", k=5, key_sql="CAST(id AS STRING)", stratum_col="grp"
    ).toPandas()
    # reference: compute all priorities in one partition, cut per group
    ref = priority_sample_stratified(
        df.coalesce(1), "w", k=5, key_sql="CAST(id AS STRING)", stratum_col="grp"
    ).toPandas()
    key = lambda p: sorted(map(tuple, p[["id", "grp", "priority"]].fillna("∅").values.tolist()))
    assert key(out) == key(ref)
    counts = out.groupby("grp", dropna=False).size()
    assert set(counts) == {5} and len(counts) == 3  # a, b, NULL strata


def test_priority_sample_stratified_many_small_batches(spark):
    """The amortized-compaction buffer (VERDICT r5 #7) must be invisible:
    forcing many tiny Arrow batches through the local top-k (so several
    mid-stream compactions actually fire — pending crosses the 4096 floor)
    yields exactly the single-batch result."""
    from sketchlib.relops import priority_sample_stratified

    rows = [
        (i, ["a", "b", "c", None][i % 4], float(1 + (i * 104729) % 997))
        for i in range(10_000)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        out = priority_sample_stratified(
            df.repartition(2), "w", k=7, key_sql="CAST(id AS STRING)", stratum_col="grp"
        ).toPandas()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    ref = priority_sample_stratified(
        df.coalesce(1), "w", k=7, key_sql="CAST(id AS STRING)", stratum_col="grp"
    ).toPandas()
    key = lambda p: sorted(
        map(tuple, p[["id", "grp", "priority"]].fillna("∅").values.tolist())
    )
    assert key(out) == key(ref)
    counts = out.groupby("grp", dropna=False).size()
    assert set(counts) == {7} and len(counts) == 4


def test_priority_sample_stratified_rejects_bad_k(spark):
    import pytest

    from sketchlib.relops import priority_sample_stratified

    df = spark.createDataFrame([(1, "a", 1.0)], "id long, grp string, w double")
    with pytest.raises(ValueError):
        priority_sample_stratified(df, "w", 0, "CAST(id AS STRING)", "grp")


def test_train_val_split_leakage_safe(spark):
    """Exact duplicates (incl. whitespace/case variants) always land in
    the same split; NULL text drops; both splits are populated at a
    plausible rate on a 400-doc corpus."""
    from sketchlib.relops import train_val_split

    rows = []
    for i in range(400):
        rows.append((3 * i, f"document body number {i}"))
        rows.append((3 * i + 1, f"  Document   BODY number {i} "))  # norm-dup
    rows.append((9999, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["split"], r["split_bucket"])
           for r in train_val_split(df, val_pct=10).collect()}
    assert 9999 not in out and len(out) == 800
    for i in range(400):
        assert out[3 * i] == out[3 * i + 1], i
    n_val = sum(1 for s, _ in out.values() if s == "val")
    assert 20 <= n_val <= 140  # ~10% of 800, wide tolerance
    for s, b in out.values():
        assert (b < 10) == (s == "val") and 0 <= b < 100


def test_export_sharded_self_verifying(spark, tmp_path):
    """Publish → read back published files → recompute the manifest →
    equal to the written manifest; shard column matches the assignment;
    content_xor actually detects a flipped doc."""
    from pyspark.sql import functions as F

    from sketchlib.relops import export_sharded, shard_manifest

    docs = spark.createDataFrame(
        [(i, f"doc body {i} with words") for i in range(200)] + [(999, None)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "release")
    written = {r["shard"]: (r["n_docs"], r["n_tokens"], r["content_xor"])
               for r in export_sharded(docs, out, n_shards=8).collect()}
    back = spark.read.parquet(f"{out}/data")
    assert back.count() == 200  # NULL-text doc excluded from the release
    recomputed = {r["shard"]: (r["n_docs"], r["n_tokens"], r["content_xor"])
                  for r in shard_manifest(back, n_shards=8).collect()}
    assert recomputed == written
    stored = {r["shard"]: (r["n_docs"], r["n_tokens"], r["content_xor"])
              for r in spark.read.parquet(f"{out}/_manifest").collect()}
    assert stored == written
    # tamper detection: change one doc's text -> that shard's xor moves
    tampered = back.withColumn(
        "text", F.when(F.col("doc_id") == 0, F.lit("evil")).otherwise(F.col("text"))
    )
    diff = {r["shard"]: r["content_xor"]
            for r in shard_manifest(tampered, n_shards=8).collect()}
    changed = [s for s in written if diff[s] != written[s][2]]
    assert len(changed) == 1
