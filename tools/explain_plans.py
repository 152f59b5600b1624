"""Physical-plan evidence: prints `.explain("formatted")` for the core
operators and checks the scale-critical properties (column pruning to the
key, broadcast where expected, no stray shuffles). Output is reviewed into
PLANS.md per round.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from sketchlib.kernels.cuckoo import size_for
    from sketchlib.spark.cuckoo import CuckooSpec, build_filter_direct, build_partials
    from sketchlib.spark.session import get_spark

    spark = get_spark(app="plans", cores=4, shuffle_partitions=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spec = CuckooSpec("plans", size_for(2000, 2), 2, num_shards=4)
    key = F.col("doc_id").cast("string")

    def show(title, df, checks=()):
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"\n{'=' * 70}\n## {title}\n{'=' * 70}")
        print(plan[:4000])
        for name, pred in checks:
            ok = pred(plan)
            print(f"  CHECK {name}: {'PASS' if ok else 'FAIL'}")
            assert ok, f"plan check failed: {title} / {name}"

    show(
        "cuckoo build partials (shuffle-free, key-pruned scan)",
        build_partials(docs, spec, key=key),
        checks=[
            ("scan reads only doc_id", lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
            ("no exchange in build", lambda p: "Exchange" not in p),
        ],
    )
    show(
        "cuckoo direct build (single shuffle on shard)",
        build_filter_direct(docs, spec, key=key),
        checks=[
            ("scan reads only doc_id", lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
            ("exactly one exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ],
    )

    import sketchlib.queries as q

    show(
        "top_customers_by_revenue (broadcast join + window)",
        q.top_customers_by_revenue(spark, sf_dir),
        checks=[("broadcast join", lambda p: "BroadcastHashJoin" in p)],
    )
    show(
        "lineitem_pricing_summary (pushed filter, pruned columns)",
        q.lineitem_pricing_summary(spark, sf_dir),
        checks=[
            ("filter pushed to scan", lambda p: "PushedFilters: [IsNotNull(l_shipdate)" in p
             or "PushedFilters: [" in p),
            ("html/text never read", lambda p: "text" not in p.split("ReadSchema")[-1][:200]),
        ],
    )
    from sketchlib.textops import with_simhash

    show(
        "simhash (pure built-ins, one shuffle)",
        with_simhash(docs),
        checks=[
            ("map-side combine (partial_sum)", lambda p: "partial_sum" in p),
            ("single exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
        ],
    )

    import re

    from sketchlib.dedup import embedding_lsh_pairs, minhash_lsh_pairs

    # with auto-broadcast disabled, any BroadcastExchange still in the plan
    # can only come from a FORCED hint — exactly what must not exist on a
    # corpus-scale relation (VERDICT r2 #1/#2)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    show(
        "minhash_lsh_pairs (candidate-only verification)",
        minhash_lsh_pairs(docs, threshold=0.5),
        checks=[
            # the verify step must join through the candidate pairs, never
            # re-run the all-pairs bigram self-join (VERDICT r1 #1): no
            # exchange keyed on the bigram ALONE may appear anywhere
            (
                "no bigram-only shuffle (no all-pairs verifier)",
                lambda p: not re.search(r"hashpartitioning\(bigram#\d+, \d+\)", p),
            ),
            # no per-document relation (sizes, signatures, bigram sets) may
            # carry a broadcast hint (VERDICT r2 #1)
            ("no forced broadcast anywhere", lambda p: "BroadcastExchange" not in p),
        ],
    )
    from sketchlib.dedup import ngram_jaccard_pairs

    show(
        "ngram_jaccard_pairs (exact verifier, no forced broadcast)",
        ngram_jaccard_pairs(docs, threshold=0.5),
        checks=[("no forced broadcast anywhere", lambda p: "BroadcastExchange" not in p)],
    )
    show(
        "segment_shipping_revenue (fact joins shuffle; only the dim is hinted)",
        q.segment_shipping_revenue(spark, sf_dir),
        checks=[
            # exactly ONE forced broadcast: the customer dim. orders joins
            # lineitem by shuffle (VERDICT r2 #2)
            ("exactly one forced broadcast (customer)",
             lambda p: p.count("BroadcastExchange") == 1),
            ("customer is the broadcast side",
             lambda p: "customer.parquet" in p.split("BroadcastExchange")[1][:3000]),
            ("lineitem-orders is a shuffle join", lambda p: "SortMergeJoin" in p),
        ],
    )
    show(
        "regional_supplier_volume (Q5: fact chain shuffles, only true dims hinted)",
        q.regional_supplier_volume(spark, sf_dir),
        checks=[
            # exactly the 3 bounded dims (supplier/nation/region) are hinted
            ("exactly three forced broadcasts",
             lambda p: p.count("BroadcastExchange") == 3),
            ("customer/orders/lineitem never broadcast",
             lambda p: not any(t in seg for t in ("customer.parquet", "orders.parquet", "lineitem.parquet")
                               for seg in p.split("BroadcastExchange")[1:])),
        ],
    )
    show(
        "promo_revenue_share (Q14: part un-hinted — AQE decides)",
        q.promo_revenue_share(spark, sf_dir),
        checks=[("no forced broadcast anywhere", lambda p: "BroadcastExchange" not in p)],
    )
    show(
        "daily_event_trend (window over one keyed shuffle)",
        q.daily_event_trend(spark, sf_dir),
        checks=[("no cartesian/nested loop",
                 lambda p: "CartesianProduct" not in p and "NestedLoop" not in p)],
    )
    show(
        "lang_by_source_pivot (map-side partial agg)",
        q.lang_by_source_pivot(spark, sf_dir),
        checks=[("map-side combine before the shuffle",
                 lambda p: "partial_" in p)],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    show(
        "embedding_lsh_pairs (banded sign-LSH, no cross join)",
        embedding_lsh_pairs(emb, threshold=0.9),
        checks=[
            ("no cartesian/cross product", lambda p: "CartesianProduct" not in p),
            ("no broadcast nested loop", lambda p: "BroadcastNestedLoopJoin" not in p),
        ],
    )

    import tempfile

    from sketchlib.similarity import lsh_cosine_topk_indexed, write_signature_table

    with tempfile.TemporaryDirectory(prefix="sketchlib-sig-") as td:
        sig_path = f"{td}/emb_sig"
        write_signature_table(emb, sig_path, n_planes=8, seed=42)
        qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        show(
            "ann probe on materialized signature table (partition pruning)",
            lsh_cosine_topk_indexed(spark, sig_path, qvec, k=10),
            checks=[
                # the probe must prune on the stored sig partition column —
                # no signature recompute at query time (VERDICT r1 #3)
                ("partition filter on sig", lambda p: re.search(r"PartitionFilters: \[.*sig", p) is not None),
            ],
        )

    from sketchlib.similarity import lsh_cosine_topk_batch

    qs_batch = emb.filter(F.col("vec_id").isin([0, 11])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    show(
        "batch ANN probe (signature equi-join, never a cross join)",
        lsh_cosine_topk_batch(qs_batch, emb, k=5, n_planes=8, hamming_probe=2),
        checks=[
            ("candidates come from an equi-join on the signature",
             lambda p: "SortMergeJoin" in p or "HashJoin" in p),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p),
        ],
    )

    from sketchlib.similarity import ivf_topk_batch, write_ivf_index

    with tempfile.TemporaryDirectory(prefix="sketchlib-ivf-") as td:
        ivf_path = f"{td}/ivf"
        write_ivf_index(emb, ivf_path, k=16)
        show(
            "batch IVF probe (in-plan centroid ranking, dynamic partition pruning)",
            ivf_topk_batch(spark, ivf_path, qs_batch, k=5, nprobe=4),
            checks=[
                # VERDICT r5 #3: centroids rank in-plan per query; the probe
                # list prunes the index scan to the probed centroid
                # directories via dynamic partition pruning — never a
                # per-query driver round-trip or a full-index scan
                ("index scan carries a dynamic-pruning partition filter",
                 lambda p: "dynamicpruningexpression" in p),
                ("probe list joins the index exactly once (broadcast)",
                 lambda p: p.count("BroadcastHashJoin") >= 1),
                # the ONLY nested-loop join is the query × k-row-centroid
                # cross (centroid side broadcast by construction — bounded);
                # it prints twice because the dynamic-pruning subquery
                # re-evaluates the probe subtree to compute the filter
                ("no nested loop beyond the tiny centroid cross",
                 lambda p: "CartesianProduct" not in p
                 and p.count("BroadcastNestedLoopJoin") <= 2),
            ],
        )

    from sketchlib.similarity import pq_adc_shortlist, write_ivf_pq_index

    with tempfile.TemporaryDirectory(prefix="sketchlib-ivfpq-") as td:
        pq_path = f"{td}/ivfpq"
        write_ivf_pq_index(emb, pq_path, k=8, n_sub=8, ksub=8,
                           lloyd_iters=1, pq_iters=1)
        q0 = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        show(
            "IVFPQ ADC probe (codes-only partition-pruned scan, literal LUT, top-k)",
            pq_adc_shortlist(spark, pq_path, q0, nprobe=2, shortlist=30),
            checks=[
                # the index scan must touch ONLY the probed centroid
                # directories (static partition pruning on the isin filter)
                ("probe scan carries a centroid partition filter",
                 lambda p: re.search(r"PartitionFilters: \[centroid#\d+ IN", p)
                 is not None),
                # codes-only probe: the embedding column never appears
                # anywhere below the shortlist (the 100-TB contract — the
                # index holds 8-B codes, not 512-B vectors)
                ("no embedding column anywhere in the probe plan",
                 lambda p: "embedding#" not in p),
                ("scan reads only vec_id+codes",
                 lambda p: "ReadSchema: struct<vec_id:bigint,codes:array<int>>" in p),
                # ADC ranking is a TakeOrderedAndProject over the literal-LUT
                # projection — per-partition top-k, driver merge, NO exchange
                ("shortlist via TakeOrderedAndProject, zero exchanges",
                 lambda p: "TakeOrderedAndProject" in p and "Exchange" not in p),
            ],
        )
        from sketchlib.similarity import ivf_pq_topk

        show(
            "IVFPQ exact re-score (shortlist ids pushed into the scan, broadcast join)",
            ivf_pq_topk(spark, pq_path, q0, nprobe=2, shortlist=20,
                        rescore_src=emb),
            checks=[
                # the rescore must NOT scan the corpus for ≤20 rows: the
                # shortlist ids reach the parquet reader as an In filter
                # (row-group min/max skipping at 100 TB)
                ("shortlist ids pushed to the rescore scan",
                 lambda p: re.search(r"PushedFilters: \[In\(vec_id", p)
                 is not None),
                ("shortlist reattached via broadcast join",
                 lambda p: "BroadcastHashJoin" in p),
                ("no shuffle exchange anywhere",
                 lambda p: "Exchange hashpartitioning" not in p),
            ],
        )

    from sketchlib.similarity import (
        _lloyd_comp,
        ivf_assign,
        ivf_centroids,
    )

    _cents = ivf_centroids(emb, k=8)
    show(
        # VERDICT r8 finding #1 / r9 fix: assignment is a literal-argmax
        # projection — the embedding column never crosses an exchange
        # (there IS no exchange), no crossJoin row amplification, no window
        "IVF assignment (zero-exchange literal argmax over driver centroids)",
        ivf_assign(emb, _cents).select("vec_id", "centroid"),
        checks=[
            ("no exchange at all (nothing shuffles the embedding)",
             lambda p: "Exchange" not in p),
            ("no window operator", lambda p: "Window" not in p),
            ("no join of any kind", lambda p: "Join" not in p
             and "CartesianProduct" not in p),
            ("scan prunes to vec_id+embedding",
             lambda p: "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in p),
        ],
    )
    from sketchlib.similarity import _centroid_rows

    _crows = _centroid_rows(_cents)
    show(
        # one Lloyd round's corpus work (pre-collect builder): ONE
        # vectorized Arrow pass (assign + quantize + per-batch scatter
        # partials — the manual map-side combine, ≤ k·dim rows per batch)
        # merged by ONE bounded (cidx, pos) exchange — the old per-round
        # vec_id window + collect_list shuffles are gone (r9), and the
        # embedding column never reaches any exchange
        "Lloyd round component aggregate (Arrow pass + one bounded exchange)",
        _lloyd_comp(emb, _crows, _cents.schema["cid"].dataType, "embedding"),
        checks=[
            ("exactly one exchange, keyed on (cidx, pos)",
             lambda p: p.count("Exchange hashpartitioning") == 1
             and re.search(r"hashpartitioning\(cidx#\d+, pos#\d+", p) is not None),
            ("map-side partial sum over the bounded partials",
             lambda p: "partial_sum" in p),
            ("no window operator", lambda p: "Window" not in p),
            ("assign+scatter is one vectorized Arrow map",
             lambda p: p.count("MapInArrow") == 1),
            ("no embedding column below the exchange",
             lambda p: not re.search(r"hashpartitioning\([^)\n]*embedding#", p)),
            ("scan prunes to the embedding column",
             lambda p: "ReadSchema: struct<embedding:array<float>>" in p),
        ],
    )
    from sketchlib.similarity import _pq_component_partials, pq_encode_codes

    _rq_like = emb.selectExpr(
        "vec_id",
        "CAST(0 AS BIGINT) AS centroid",
        "transform(CAST(embedding AS ARRAY<DOUBLE>),"
        " x -> CAST(floor(x * 1048576) AS BIGINT)) AS rq",
    )
    _toy_cb = [
        [[999983 + s * 1000 + c * 10 + d for d in range(8)] for c in range(4)]
        for s in range(2)
    ]
    show(
        # the PQ encode pass: one vectorized Arrow map (exact int64
        # distances, np.argmin first-min == the _pq_codes_expr tie rule —
        # parity pinned in tests), zero shuffle, codes-only output
        "PQ encode (one vectorized Arrow map, zero exchange)",
        pq_encode_codes(_rq_like, _toy_cb),
        checks=[
            ("no exchange at all", lambda p: "Exchange" not in p),
            ("exactly one Arrow map", lambda p: p.count("MapInArrow") == 1),
        ],
    )
    show(
        # one PQ training round's corpus work: vectorized assign +
        # per-batch scatter partials (≤ n_sub·ksub·dsub rows per batch),
        # merged by one bounded exchange — replaces the dim×-corpus
        # posexplode through the aggregation (r9)
        "PQ training partials (Arrow pass, bounded rows per batch)",
        _pq_component_partials(_rq_like, _toy_cb)
        .groupBy("sub", "code", "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n")),
        checks=[
            ("exactly one exchange, keyed on (sub, code, pos)",
             lambda p: p.count("Exchange hashpartitioning") == 1
             and re.search(r"hashpartitioning\(sub#\d+, code#\d+, pos#\d+", p)
             is not None),
            ("map-side partial sum", lambda p: "partial_sum" in p),
            ("exactly one Arrow map", lambda p: p.count("MapInArrow") == 1),
            ("no posexplode of the residual array", lambda p: "Generate" not in p),
        ],
    )

    from sketchlib.relops import asof_join, sample_by_hash

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("timestamp").alias("pts"), F.col("event_id").alias("pid")
    )
    show(
        "asof_join (union + ONE key shuffle + running window)",
        asof_join(clicks, purch, "user_id", "ts", "pts", ["pid"]),
        checks=[
            # both union branches shuffle once on the key for the window —
            # no extra exchange, no range probe, no nested loop
            ("≤2 exchanges (one per union branch)",
             lambda p: p.count("Exchange hashpartitioning") <= 2),
            ("all exchanges keyed on user_id",
             lambda p: all("user_id" in seg[:40] for seg in p.split("Exchange hashpartitioning(")[1:])),
            ("no cartesian/nested loop", lambda p: "CartesianProduct" not in p and "NestedLoop" not in p),
        ],
    )
    from sketchlib.relops import range_join

    wins = purch.select(
        F.col("pid"), "user_id",
        (F.unix_micros("pts") - 600_000_000).alias("s"),
        (F.unix_micros("pts") + 600_000_000).alias("e"),
    )
    show(
        "range_join (bucketized equi-join, never a theta/nested-loop join)",
        range_join(
            clicks.select("event_id", "user_id", F.unix_micros("ts").alias("t")),
            wins, "user_id", "t", "s", "e", 600_000_000,
        ),
        checks=[
            ("equi-join on (key, bucket) — a hash/merge join exists",
             lambda p: "SortMergeJoin" in p or "HashJoin" in p),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "NestedLoop" not in p),
        ],
    )
    show(
        "deterministic sample (predicate pushed into the scan stage)",
        sample_by_hash(docs.select("doc_id"), "CAST(doc_id AS STRING)", "28"),
        checks=[
            ("no exchange (pure filter)", lambda p: "Exchange" not in p),
            ("scan prunes to doc_id", lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
        ],
    )
    from sketchlib.textops import _pack_layout, pack_sequences, token_count_sql

    show(
        "pack_sequences (two-phase prefix sum; no global-window collapse)",
        pack_sequences(docs, budget=512),
        checks=[
            # the cumsum window partitions by spark_partition_id — a global
            # (unpartitioned) window would appear as Exchange SinglePartition
            ("no single-partition exchange",
             lambda p: "Exchange SinglePartition" not in p),
        ],
    )
    show(
        # the eager localCheckpoint inside pack_sequences truncates the
        # visible plan, so the one-range-shuffle layout is asserted on the
        # pre-checkpoint builder it calls
        "pack_sequences layout (one range shuffle feeds the checkpoint)",
        _pack_layout(
            docs.selectExpr("doc_id", f"{token_count_sql('spark')} AS n_tokens")
            .withColumn("__k", F.md5(F.col("doc_id").cast("string"))),
            "doc_id",
        ),
        checks=[
            ("range-partitioned global order",
             lambda p: "rangepartitioning" in p),
            ("no single-partition exchange",
             lambda p: "Exchange SinglePartition" not in p),
        ],
    )
    from sketchlib.htmlops import html_extract_text

    show(
        "html_extract_text (WET extraction: zero-shuffle codegen projection)",
        html_extract_text(docs),
        checks=[
            ("no exchange (pure projection)", lambda p: "Exchange" not in p),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
            # the `*(1)` prefix marks WholeStageCodegen stage 1 in this
            # output mode — one fused stage from scan to projection
            ("whole-stage codegen covers the strip chain",
             lambda p: "*(1) Project" in p and "*(2)" not in p),
        ],
    )
    from sketchlib.textops import pack_batches

    show(
        # both inputs are eager localCheckpoints (ids once, layout inside
        # pack_sequences), so the visible plan is exactly the fill: the
        # doc_id equi-join, the bin explode, and the bin_id groupBy
        "pack_batches (bin fill: one id-join + one bin_id groupBy)",
        pack_batches(
            docs.selectExpr(
                "doc_id", "sequence(1, length(text) % 7) AS token_ids"
            ),
            budget=512,
        ),
        checks=[
            ("fill join is hash/merge on doc_id",
             lambda p: "SortMergeJoin" in p or "HashJoin" in p),
            ("final agg exchanges on 8-byte bin_id",
             lambda p: "hashpartitioning(bin_id" in p),
            ("no single-partition exchange",
             lambda p: "Exchange SinglePartition" not in p),
            ("map-side partial agg before the bin exchange",
             lambda p: "partial_count" in p or "HashAggregate" in p),
        ],
    )
    from sketchlib.relops import priority_sample

    show(
        "priority_sample (single-pass weighted top-k, no full sort)",
        # projected like the registry query: pruning must reach the scan
        priority_sample(
            docs, "CAST(length(text) AS DOUBLE)", 50, "CAST(doc_id AS STRING)"
        ).select("doc_id", "priority"),
        checks=[
            # top-k must compile to TakeOrdered, never a global Sort +
            # single-partition exchange over the corpus
            ("top-k is TakeOrdered, not global sort",
             lambda p: "TakeOrderedAndProject" in p),
            ("no single-partition exchange",
             lambda p: "Exchange SinglePartition" not in p),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
        ],
    )
    from sketchlib.dedup import benchmark_span_overlap
    from sketchlib.relops import sample_by_hash

    bench_docs = sample_by_hash(docs, "CAST(doc_id AS STRING)", "28")
    train_docs = docs.filter(F.expr("md5(CAST(doc_id AS STRING)) >= '28'"))
    show(
        "decontamination via cuckoo runtime filter (probe BELOW the shuffle)",
        benchmark_span_overlap(train_docs, bench_docs, n=5, via_filter=True),
        checks=[
            # the map-side probe must be a CHILD of the survivors' distinct
            # exchange — parents print first, so the (doc_id, span_h)
            # exchange must appear BEFORE the probe MapInPandas in the
            # plan string (review finding r4: it used to probe after the
            # distinct, shuffling the full span set)
            ("probe runs before any (doc_id, span_h) shuffle",
             lambda p: (lambda m, i: m is not None and i != -1 and m.start() < i)(
                 re.search(r"Exchange hashpartitioning\(doc_id#\d+L, span_h#\d+", p),
                 p.find("MapInPandas run"),
             )),
            # VERDICT r4 #3: span STRINGS must never shuffle — every
            # exchange is keyed on the 8-byte xxhash64 (span_h), and no
            # raw span column may appear in any partitioning expression
            ("no string span column below any Exchange",
             lambda p: not re.search(r"hashpartitioning\([^)\n]*\bspan#", p)),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "NestedLoop" not in p),
        ],
    )
    from sketchlib.relops import priority_sample_stratified

    show(
        "priority_sample_stratified (local Arrow top-k, ONE stratum shuffle)",
        priority_sample_stratified(
            docs.select("doc_id", "lang", "text"),
            "CAST(length(text) AS DOUBLE)", 10, "CAST(doc_id AS STRING)", "lang",
        ).select("doc_id", "lang", "priority"),
        checks=[
            # the corpus reduces to per-partition survivors INSIDE the
            # MapInPandas; only those reach the one lang-keyed exchange
            ("exactly one exchange (on the stratum)",
             lambda p: p.count("Exchange hashpartitioning") == 1),
            ("exchange keyed on lang",
             lambda p: (lambda parts: len(parts) > 1 and "lang" in parts[1][:40])(
                 p.split("Exchange hashpartitioning("))),
            ("local reduction is Arrow-batched (MapInPandas)",
             lambda p: "MapInPandas" in p),
            ("no single-partition exchange",
             lambda p: "Exchange SinglePartition" not in p),
        ],
    )
    from sketchlib.relops import zorder_by

    show(
        "zorder_by (range shuffle only; no single-partition stage)",
        zorder_by(ev.select("event_id", "user_id", "value"), ["user_id", "value"], bits=8),
        checks=[
            ("no single-partition exchange",
             lambda p: "Exchange SinglePartition" not in p),
            ("range-partitioned on the morton key",
             lambda p: "rangepartitioning" in p),
        ],
    )
    from sketchlib.textops import vocab_topk

    show(
        "vocab top-k (map-side combine + TakeOrdered)",
        vocab_topk(docs, k=100),
        checks=[
            ("map-side partial count", lambda p: "partial_count" in p),
            ("top-k is TakeOrdered, not global sort", lambda p: "TakeOrderedAndProject" in p),
        ],
    )

    from sketchlib.dedup import cross_doc_span_stats
    from sketchlib.textops import with_repetition_stats

    # broadcast disabled again: any surviving BroadcastExchange would be a
    # forced hint on a per-document relation — the r2 scale-killer class
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    show(
        "doc repetition stats (two-level grouped counts, no distinct-expand)",
        with_repetition_stats(docs),
        checks=[
            ("map-side partial counts", lambda p: "partial_count" in p or "partial_sum" in p),
            # distinct arrives as count(*) over the grouped table — the
            # count_distinct Expand rewrite must NOT appear (CLAUDE.md rule)
            ("no count-distinct Expand", lambda p: "Expand" not in p),
            ("no forced broadcast anywhere", lambda p: "BroadcastExchange" not in p),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
            # the fused tagged-explode means the normalize+split subtree
            # appears ONCE in the whole plan (it used to feed two branches)
            ("text normalization evaluated once",
             lambda p: p.count("regexp_replace") == 1),
        ],
    )
    show(
        "cross-doc span dedup (span-keyed equi-joins, corpus text never shuffles)",
        # materialize=False: this session only inspects plans — the default
        # persist would register a never-executed cache entry; the
        # materialized path's behavior is covered by the bench + A/B
        cross_doc_span_stats(docs, n=5, materialize=False),
        checks=[
            ("map-side partial counts", lambda p: "partial_count" in p),
            ("no count-distinct Expand", lambda p: "Expand" not in p),
            ("no forced broadcast anywhere", lambda p: "BroadcastExchange" not in p),
            # VERDICT r4 #3: exchanges carry the 8-byte span_h key, never
            # the raw span string
            ("exchanges keyed on span_h, never the span string",
             lambda p: re.search(r"hashpartitioning\([^)\n]*span_h#", p) is not None
             and not re.search(r"hashpartitioning\([^)\n]*\bspan#", p)),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "NestedLoop" not in p),
        ],
    )
    from sketchlib.dedup import paragraph_dedup

    show(
        "paragraph dedup (hash-keyed first-occurrence window + one reassembly shuffle)",
        paragraph_dedup(docs),
        checks=[
            # the first-occurrence window exchanges on xxhash64(norm) — the
            # 8-byte key is a Project below the exchange; the raw paragraph
            # is payload of exactly two shuffles (window + reassembly), and
            # no exchange is KEYED on it
            ("window exchange keyed on the xxhash64 projection",
             lambda p: "xxhash64" in p
             and not re.search(r"hashpartitioning\([^)\n]*\bpara#", p)),
            ("exactly two exchanges (window + doc_id reassembly)",
             lambda p: p.count("Exchange hashpartitioning") == 2),
            ("map-side partial reassembly agg",
             lambda p: "partial_collect_list" in p),
            ("no forced broadcast anywhere", lambda p: "BroadcastExchange" not in p),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
            # doc_id joined the pushdown in r7 (paragraph_table's NULL-id
            # keeper contract) — assert both predicates reach the scan
            ("null text+doc_id filters pushed to scan",
             lambda p: "PushedFilters: [IsNotNull(text), IsNotNull(doc_id)]" in p),
        ],
    )
    from sketchlib.urlops import domain_blocklist_stats

    show(
        "domain blocklist filter (broadcast anti-join + one domain groupBy)",
        domain_blocklist_stats(spark, docs),
        checks=[
            # the explicit broadcast hint must survive auto-broadcast
            # being disabled — the blocklist is a dim relation by design
            ("blocklist anti-join is broadcast, build right",
             lambda p: "BroadcastHashJoin" in p and "LeftAnti, BuildRight" in p),
            ("exactly one shuffle (the domain groupBy)",
             lambda p: p.count("Exchange hashpartitioning") == 1),
            ("map-side partial min/count",
             lambda p: "partial_count" in p and "partial_min" in p),
            ("scan prunes to doc_id only",
             lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
        ],
    )
    from sketchlib.textops import _ccnet_assign

    show(
        # the real entry eagerly localCheckpoints the scored-docs relation
        # before this fan-out (it feeds both sides); the shuffle shape is
        # asserted on the factored-out builder over a stand-in relation
        "ccnet bucket assignment (bounded histogram, shared lang window exchange)",
        _ccnet_assign(
            docs.select("doc_id", "lang", (F.col("n_chars") % 100).alias("lm_avg_q"))
        ),
        checks=[
            ("two window ops share one lang exchange",
             lambda p: p.count("Window [sum") == 2
             and len(re.findall(r"Exchange hashpartitioning\(lang#\d+, \d+\)", p)) == 1),
            ("histogram has map-side partial count", lambda p: "partial_count" in p),
            ("join-back is null-safe on lang (coalesce+isnull key)",
             lambda p: "coalesce(lang#" in p and "isnull(lang#" in p),
            ("no single-partition exchange",
             lambda p: "Exchange SinglePartition" not in p),
            ("no forced broadcast anywhere", lambda p: "BroadcastExchange" not in p),
        ],
    )
    from sketchlib.relops import shard_manifest
    from sketchlib.textops import with_charset_profile, with_compression_ratio

    show(
        "charset profile (six regex classes, zero shuffle)",
        with_charset_profile(docs),
        checks=[
            ("no exchange at all", lambda p: "Exchange" not in p),
            ("whole-stage codegen", lambda p: "*(1)" in p),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
        ],
    )
    show(
        "compression ratio (one Arrow-batched python pass, zero shuffle)",
        with_compression_ratio(docs),
        checks=[
            ("no exchange at all", lambda p: "Exchange" not in p),
            ("exactly one MapInPandas", lambda p: p.count("MapInPandas") == 1),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
        ],
    )
    from sketchlib.multimodal import (
        attach_bmp_payload,
        attach_wav_payload,
        decode_bmp_df,
        decode_wav_df,
    )

    docs_idtext = docs.where(F.col("doc_id").isNotNull()).select("doc_id", "text")
    show(
        "real BMP decode (build + decode, two chained Arrow passes, zero shuffle)",
        decode_bmp_df(attach_bmp_payload(docs_idtext, corrupt_every=97), "bmp"),
        checks=[
            ("no exchange at all", lambda p: "Exchange" not in p),
            ("builder and decoder are narrow Arrow maps",
             lambda p: p.count("MapInPandas") == 2),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
        ],
    )
    show(
        "real WAV decode (build + decode, two chained Arrow passes, zero shuffle)",
        decode_wav_df(attach_wav_payload(docs_idtext, corrupt_every=97), "wav"),
        checks=[
            ("no exchange at all", lambda p: "Exchange" not in p),
            ("builder and decoder are narrow Arrow maps",
             lambda p: p.count("MapInPandas") == 2),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
        ],
    )
    show(
        "shard manifest (one small-group agg, map-side combined)",
        shard_manifest(docs),
        checks=[
            ("map-side partials",
             lambda p: "partial_count" in p and "partial_sum" in p),
            ("one exchange keyed on shard",
             lambda p: p.count("Exchange hashpartitioning") == 1
             and re.search(r"hashpartitioning\(shard#\d+", p) is not None),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
        ],
    )
    from sketchlib.webpipe import web_curation_pipeline

    show(
        "web curation pipeline e2e (5 composed stages, one corpus-text shuffle added)",
        web_curation_pipeline(spark, docs),
        checks=[
            ("blocklist stays a broadcast anti-join inside the composition",
             lambda p: "BroadcastHashJoin" in p and "LeftAnti, BuildRight" in p),
            ("keep/survivor filtering is semi-join shaped",
             lambda p: "LeftSemi" in p),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "NestedLoop" not in p),
            ("no single-partition exchange",
             lambda p: "Exchange SinglePartition" not in p),
            ("corpus scans prune to doc_id(+text)",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p
             and "ReadSchema: struct<doc_id:bigint>" in p),
        ],
    )
    from sketchlib.graphops import host_graph, host_pagerank

    show(
        "host graph build (the ONLY corpus-sized pagerank stage)",
        host_graph(docs),
        checks=[
            ("map-side partial count (exchange carries host pairs, not pages)",
             lambda p: "partial_count" in p),
            ("one exchange keyed on (src, dst)",
             lambda p: p.count("Exchange hashpartitioning") == 1
             and re.search(r"hashpartitioning\(src#\d+, dst#\d+", p) is not None),
            ("scan prunes to doc_id only",
             lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
        ],
    )
    show(
        # the iterations run over eagerly-checkpointed HOST relations —
        # the corpus parquet must be absent from the visible plan
        "pagerank iterations (host-graph joins only, corpus never re-read)",
        host_pagerank(docs, iterations=2),
        checks=[
            ("no corpus scan inside the iteration plan",
             lambda p: "FileScan parquet" not in p),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "NestedLoop" not in p),
        ],
    )
    from sketchlib.graphops import link_host_edges

    show(
        # VERDICT r6 #5: the links→edges path is one zero-join projection
        # chain (canonical url + synth html are columns of the same row);
        # corpus work = the href explode + ONE (src, dst) exchange
        "link-graph edge build (extracted hrefs → resolved hosts → edge agg)",
        link_host_edges(docs),
        checks=[
            ("exactly one corpus scan",
             lambda p: p.count("FileScan parquet") == 1),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
            ("no join anywhere (url+html are same-row columns)",
             lambda p: "Join" not in p and "CartesianProduct" not in p),
            ("href explode present (a real extraction, not the md5 shortcut)",
             lambda p: "Generate explode" in p),
            ("one exchange keyed on (src, dst), map-side combined",
             lambda p: p.count("Exchange hashpartitioning") == 1
             and re.search(r"hashpartitioning\(src#\d+, dst#\d+", p) is not None
             and "partial_count" in p),
        ],
    )
    from sketchlib.graphops import _crawl_stats_build

    show(
        # VERDICT r6 #4: edge weights AND quality stats come from ONE
        # documents scan — the pre-checkpoint builder (the checkpoint in
        # host_crawl_priority hides this shape, _pack_layout precedent)
        "crawl-priority stats build (one corpus scan feeds edges + quality)",
        _crawl_stats_build(docs),
        checks=[
            ("exactly one corpus scan",
             lambda p: p.count("FileScan parquet") == 1),
            ("scan prunes to doc_id+text (classifier needs text)",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
            ("map-side partial agg (exchange carries host pairs, not pages)",
             lambda p: "partial_count" in p),
            ("one exchange keyed on (src, dst)",
             lambda p: p.count("Exchange hashpartitioning") == 1
             and re.search(r"hashpartitioning\(src#\d+, dst#\d+", p) is not None),
        ],
    )
    from sketchlib.graphops import host_harmonic, hyperball

    show(
        # VERDICT r7 #4: HyperBall — the iterations run over checkpointed
        # HOST-cardinality register relations; the corpus enters only the
        # host_graph build (asserted above). The visible plan is the final
        # summary + window — corpus parquet must be absent.
        "hyperball harmonic (register merges on checkpointed host relations)",
        host_harmonic(docs, radius=2),
        checks=[
            ("no corpus scan inside the iteration plan",
             lambda p: "FileScan parquet" not in p),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "NestedLoop" not in p),
            ("harmonic accumulation is one per-host window",
             lambda p: "Window" in p),
        ],
    )
    from pyspark.sql import functions as _F2

    _hb_edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 3) % 11}") for i in range(40)],
        "src string, dst string",
    ).localCheckpoint(eager=True)
    _hb_regs = _hb_edges.selectExpr("src AS host", "CAST(1 AS BIGINT) AS j",
                                    "CAST(3 AS BIGINT) AS reg").distinct() \
        .localCheckpoint(eager=True)
    show(
        # one HyperBall round in isolation (the checkpoints inside
        # hyperball() hide the per-round shape): regs⋈edges on src +
        # (host, j) max-merge with a map-side partial max
        "hyperball single round (edge join + map-side-combined max-merge)",
        _hb_regs.unionByName(
            _hb_edges.join(_hb_regs.withColumnRenamed("host", "src"), "src")
            .select(_F2.col("dst").alias("host"), "j", "reg")
        ).groupBy("host", "j").agg(_F2.max("reg").alias("reg")),
        checks=[
            ("map-side partial max (registers combine before the exchange)",
             lambda p: "partial_max" in p),
            ("merge exchange keyed on (host, j)",
             lambda p: re.search(r"hashpartitioning\(host#\d+, j#\d+", p)
             is not None),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "NestedLoop" not in p),
        ],
    )
    from sketchlib.textops import top_terms, with_pii_scrub

    show(
        "pii scrub (pure codegen projection, zero shuffle)",
        with_pii_scrub(docs),
        checks=[
            ("no exchange at all", lambda p: "Exchange" not in p),
            ("whole-stage codegen", lambda p: "*(1)" in p),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
        ],
    )
    from sketchlib.textops import with_classifier_score

    show(
        "quality classifier (hashed linear model, zero-shuffle projection)",
        with_classifier_score(docs).select("doc_id", "quality_score", "quality_keep"),
        checks=[
            ("no exchange at all", lambda p: "Exchange" not in p),
            ("whole-stage codegen", lambda p: "*(1)" in p),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
            # the token array is referenced once per row (transform-over-
            # array, not index arithmetic): the normalize+split subtree
            # must appear exactly once (r3 CollapseProject rule)
            ("text normalization evaluated once",
             lambda p: p.count("regexp_replace") == 1),
        ],
    )
    from sketchlib.textops import bigram_lm_scores
    from sketchlib.urlops import url_dedup_canonical, with_canonical_url, with_synth_url

    show(
        "url canonicalize (zero-shuffle codegen projection over synth fixture)",
        with_canonical_url(with_synth_url(docs)),
        checks=[
            ("no exchange at all", lambda p: "Exchange" not in p),
            ("whole-stage codegen", lambda p: "*(1)" in p),
            ("scan prunes to doc_id only",
             lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
        ],
    )
    show(
        "url dedup (one hash shuffle on canonical, map-side partial min/count)",
        url_dedup_canonical(docs),
        checks=[
            ("exactly one exchange", lambda p: p.count("Exchange hashpartitioning") == 1),
            ("map-side partial min+count",
             lambda p: "partial_min" in p or "partial min" in p.lower() or "min#" in p),
            ("scan prunes to doc_id only",
             lambda p: "ReadSchema: struct<doc_id:bigint>" in p),
        ],
    )
    show(
        "bigram LM scores (one bigram shuffle, broadcast total, doc_id agg)",
        bigram_lm_scores(docs),
        checks=[
            # bigram model fit + final doc_id agg; the model-score join is
            # broadcast (1-row total via BroadcastNestedLoop on a single
            # row is the intended shape, pq side broadcast by AQE)
            ("bigram exchange is map-side combined",
             lambda p: "partial_count" in p or "count#" in p),
            ("final agg keyed on doc_id",
             lambda p: any("doc_id" in seg[:40]
                           for seg in p.split("Exchange hashpartitioning(")[1:])),
            ("scan prunes to doc_id+text",
             lambda p: "ReadSchema: struct<doc_id:bigint,text:string>" in p),
        ],
    )
    show(
        "top terms (tf/df join on term, per-doc bounded window)",
        top_terms(docs, k=3),
        checks=[
            ("map-side partial counts", lambda p: "partial_count" in p),
            ("no count-distinct Expand", lambda p: "Expand" not in p),
            ("no forced broadcast anywhere", lambda p: "BroadcastExchange" not in p),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "NestedLoop" not in p),
        ],
    )
    from sketchlib.spark.cuckoo import semi_join_via_filter

    ev_k = ev.select("event_id", "user_id", "event_type")
    cust_k = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    show(
        "sketch semi join (runtime filter: probe big map-side, then exact join)",
        semi_join_via_filter(ev_k, cust_k, "user_id", "c_custkey"),
        checks=[
            # the big side is filtered through the broadcast filter blobs in
            # a MapInPandas under the join (plan prints root-first, so the
            # probe appears below it) — survivors only reach the exchange
            ("big side probed via MapInPandas under the join",
             lambda p: "MapInPandas" in p.split("LeftSemi")[-1]),
            ("semi join is an equi-join",
             lambda p: "LeftSemi" in p),
            ("no cartesian/nested loop",
             lambda p: "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p),
        ],
    )
    from sketchlib.relops import mix_sources

    show(
        "mix_sources (k-row rates broadcast back; keep predicate is a projection)",
        mix_sources(
            docs.select("doc_id", "source"),
            {"src0": 0.5, "src1": 0.3, "src2": 0.2},
            "CAST(doc_id AS STRING)",
        ),
        checks=[
            # the only forced broadcast is the |targets|-row rates relation
            # (bounded by construction — the legitimate broadcast shape)
            ("rates joined by broadcast", lambda p: "BroadcastHashJoin" in p),
            ("corpus never in a nested-loop side",
             # the sole nested-loop join is the 1-row N_out scalar attach
             lambda p: p.count("BroadcastNestedLoopJoin") <= 1),
        ],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    print("\nALL PLAN CHECKS PASSED")


if __name__ == "__main__":
    main()
