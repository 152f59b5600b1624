"""Measure the decontaminate_sketched regime (VERDICT r5 #5): at what
probe/build span ratio does the cuckoo runtime-filter path beat the plain
hash-keyed equi-join for benchmark_span_overlap?

Shape: corpus of D docs x ~S spans each (unique word streams), benchmark
that shares spans with 1% of corpus docs plus unique filler — so the
filter drops ~99% of corpus (doc, span) pairs before any shuffle. Auto-
broadcast disabled: models the at-scale regime where the benchmark span
relation exceeds the broadcast threshold. Interleaved E/F reps.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from sketchlib.dedup import benchmark_span_overlap  # noqa: E402
from sketchlib.spark.session import get_spark  # noqa: E402

spark = get_spark(app="sketched-regime", cores=32, shuffle_partitions=32)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

N = 5  # span length (words)


def corpus(n_docs: int, words_per_doc: int):
    """Each doc: words 'w<doc>_<i>' — spans globally unique per doc."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                lambda i: F.concat(F.lit("w"), F.col("id"), F.lit("_"), i),
            ),
            " ",
        ).alias("text"),
    )


def bench_set(corp, n_shared_docs: int, n_filler: int, words_per_doc: int):
    shared = corp.filter(F.col("doc_id") < n_shared_docs)
    filler = spark.range(n_filler).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                lambda i: F.concat(F.lit("b"), F.col("id"), F.lit("_"), i),
            ),
            " ",
        ).alias("text"),
    )
    return shared.unionByName(filler)


def timed(fn):
    t0 = time.perf_counter()
    r = fn()
    return time.perf_counter() - t0, r


results = []

CONFIGS = {
    "small": [(20_000, 40, 200, 1_000), (100_000, 40, 1_000, 1_000),
              (300_000, 40, 3_000, 1_000)],
    "large": [(600_000, 40, 6_000, 1_000)],
}
for D, W, BSHARE, BFILL in CONFIGS[os.environ.get("REGIME_SET", "small")]:
    corp = corpus(D, W).localCheckpoint(eager=True)
    bm = bench_set(corp, BSHARE, BFILL, W).localCheckpoint(eager=True)
    # warm both code paths (codegen)
    benchmark_span_overlap(corp.limit(500), bm.limit(200), n=N).count()
    benchmark_span_overlap(corp.limit(500), bm.limit(200), n=N, via_filter=True).count()
    reps = {"equi": [], "filt": []}
    expect = None
    for order in ("ef", "fe", "ef", "fe"):
        for c in order:
            via = c == "f"
            t, cnt = timed(
                lambda v=via: benchmark_span_overlap(corp, bm, n=N, via_filter=v).count()
            )
            reps["filt" if via else "equi"].append(round(t, 3))
            if expect is None:
                expect = cnt
            assert cnt == expect, (cnt, expect)  # exactness: both paths agree
    med = lambda xs: sorted(xs)[len(xs) // 2]
    row = {
        "corpus_docs": D,
        "probe_spans": D * (W - N + 1),
        "build_spans": (BSHARE + BFILL) * (W - N + 1),
        "overlap_docs": expect,
        "equi_reps": reps["equi"],
        "filt_reps": reps["filt"],
        "equi_med_s": med(reps["equi"]),
        "filt_med_s": med(reps["filt"]),
        "speedup_filter_over_equi": round(med(reps["equi"]) / med(reps["filt"]), 3),
    }
    results.append(row)
    print("ROW " + json.dumps(row), flush=True)

print("REGIME " + json.dumps(results))
