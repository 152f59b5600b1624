"""Host-graph PageRank: hand-computed recurrence on a tiny graph,
partitioning invariance, and fixture determinism across engines."""

import duckdb


def _hand_pagerank(edges, iterations=3, scale=1_000_000, dangling=False):
    """Pure-Python replay of the documented recurrence (optionally the
    redistributed-dangling-mass variant: D div N added to every inflow)."""
    ow = {}
    for s, d, w in edges:
        ow[s] = ow.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        s_in = {n: 0 for n in nodes}
        for s, d, w in edges:
            s_in[d] += r[s] * w // ow[s]
        share = (
            sum(r[n] for n in nodes if ow.get(n, 0) == 0) // len(nodes)
            if dangling
            else 0
        )
        r = {n: 150000 + (85 * (s_in[n] + share)) // 100 for n in nodes}
    return r, {n: ow.get(n, 0) for n in nodes}


def test_pagerank_hand_computed_tiny_graph(spark):
    """3-node graph with a dangling node (c has no outlinks) and a
    weighted 2-edge fan: Spark matches the pure-Python recurrence
    exactly at every value."""
    from sketchlib.graphops import pagerank

    edges = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["host"]: (r["pagerank_q"], r["out_weight"])
           for r in pagerank(df, iterations=3).collect()}
    want_r, want_ow = _hand_pagerank(edges)
    assert got == {n: (want_r[n], want_ow[n]) for n in want_r}
    # dangling node keeps receiving but contributes nothing
    assert got["c"][1] == 0 and got["c"][0] > 150000


def test_pagerank_partitioning_invariant(spark):
    """Same graph through 1 and 13 shuffle partitions → identical ranks
    (integer arithmetic has no summation-order sensitivity)."""
    from sketchlib.graphops import pagerank

    edges = [(f"n{i}", f"n{(i * 7 + 3) % 11}", 1 + i % 4) for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string, w long") \
        .groupBy("src", "dst").agg({"w": "sum"}).withColumnRenamed("sum(w)", "w")
    a = {r["host"]: r["pagerank_q"] for r in pagerank(df.repartition(1), 2).collect()}
    b = {r["host"]: r["pagerank_q"] for r in pagerank(df.repartition(13), 2).collect()}
    assert a == b and len(a) == 40


def test_host_edges_fixture_cross_engine(spark):
    """The md5-derived (src, dst) page edges are bit-identical across
    engines for negative / huge / NULL doc_ids."""
    from sketchlib.graphops import host_edges_sql

    ids = [-9, -1, 0, 1, 5, 2**40, None]
    df = spark.createDataFrame([(i, "t") for i in ids], "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    got = sorted(map(tuple, spark.sql(host_edges_sql("spark")).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", [(i, "t") for i in ids])
    want = sorted(con.sql(host_edges_sql("duckdb")).fetchall())
    assert got == want and len(got) == len(ids) - 1
    spark.catalog.dropTempView("documents")


def test_link_host_edges_resolution(spark, sf_dir):
    """The extracted-link edge build resolves hrefs the way the fixture
    dictates: every page contributes exactly one absolute edge (to its
    md5 outlink host) and one relative link resolving to the page's own
    canonical host (a self-edge). So, vs the md5-shortcut host_graph
    over the same pages: off-diagonal weights are identical, and each
    diagonal weight exceeds the shortcut's by the host's page count
    (= the shortcut's out-weight, one absolute link per page)."""
    from pyspark.sql import functions as F

    from sketchlib.graphops import host_graph, link_host_edges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    derived = {
        (r["src"], r["dst"]): r["w"] for r in link_host_edges(docs).collect()
    }
    shortcut = {
        (r["src"], r["dst"]): r["w"] for r in host_graph(pages).collect()
    }
    assert sum(derived.values()) == 2 * pages.count()
    pages_on_host = {}
    for (s, _), w in shortcut.items():
        pages_on_host[s] = pages_on_host.get(s, 0) + w
    expected = dict(shortcut)
    for s, n in pages_on_host.items():
        expected[(s, s)] = expected.get((s, s), 0) + n
    assert derived == expected


def test_pagerank_randomized_differential(spark):
    """Five seeded random weighted digraphs (self-loops, dangling nodes,
    multi-edges pre-folded, isolated receivers): Spark equals the
    pure-Python recurrence exactly on every node, at two iteration
    depths."""
    import numpy as np

    from sketchlib.graphops import pagerank

    rng = np.random.default_rng(2026)
    for trial in range(5):
        n = int(rng.integers(5, 30))
        m = int(rng.integers(n, 4 * n))
        raw = {}
        for _ in range(m):
            s, d = int(rng.integers(0, n)), int(rng.integers(0, n))
            w = int(rng.integers(1, 9))
            raw[(f"v{s}", f"v{d}")] = raw.get((f"v{s}", f"v{d}"), 0) + w
        edges = [(s, d, w) for (s, d), w in sorted(raw.items())]
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        for iters in (1, 3):
            for dangling in (False, True):
                got = {
                    r["host"]: (r["pagerank_q"], r["out_weight"])
                    for r in pagerank(
                        df, iterations=iters, redistribute_dangling=dangling
                    ).collect()
                }
                want_r, want_ow = _hand_pagerank(
                    edges, iterations=iters, dangling=dangling
                )
                assert got == {
                    k: (want_r[k], want_ow[k]) for k in want_r
                }, (trial, iters, dangling)


def test_pagerank_dangling_redistribution_carries_mass(spark):
    """On a graph with a dangling sink, the variant must differ from the
    base recurrence (the share is real mass) and match the hand model."""
    from sketchlib.graphops import pagerank

    edges = [("a", "b", 1), ("b", "c", 1), ("a", "c", 2)]  # c dangles
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    base = {r["host"]: r["pagerank_q"] for r in pagerank(df, 3).collect()}
    redist = {
        r["host"]: r["pagerank_q"]
        for r in pagerank(df, 3, redistribute_dangling=True).collect()
    }
    want_r, _ = _hand_pagerank(edges, iterations=3, dangling=True)
    assert redist == want_r
    assert redist != base
    assert all(redist[n] >= base[n] for n in base)  # share only adds mass


def _hand_hyperball(edges, radius, p):
    """Pure-Python HyperBall ground truth: exact BFS balls + md5 registers
    (the same mod-split/rho layout as graphops.hb_register_sql)."""
    import hashlib

    m = 1 << p
    nodes = sorted({s for s, d in edges} | {d for s, d in edges})
    succ = {}
    for s, d in edges:
        succ.setdefault(s, set()).add(d)
    # exact distance d(u→v) ≤ radius via BFS from each u
    dist = {}
    for u in nodes:
        frontier, seen, d = {u}, {u: 0}, 0
        while frontier and d < radius:
            d += 1
            frontier = {w for v in frontier for w in succ.get(v, ())} - set(seen)
            for w in frontier:
                seen[w] = d
        for v, dd in seen.items():
            dist[(u, v)] = dd
    regs_of = {}
    for n in nodes:
        h = int(hashlib.md5(f"hb-node:{n}".encode()).hexdigest()[:13], 16)
        w = (h // m) % (1 << 32)
        regs_of[n] = (h % m, 33 - w.bit_length() if w else 33)
    out = {}
    for v in nodes:
        for r in range(radius + 1):
            ball = [u for u in nodes if dist.get((u, v), 99) <= r]
            regs = {}
            for u in ball:
                j, rho = regs_of[u]
                regs[j] = max(regs.get(j, 0), rho)
            zq = (m - len(regs)) * (1 << 40) + sum((1 << 40) >> x for x in regs.values())
            out[(v, r)] = (zq, m - len(regs), sum(regs.values()), len(ball))
    return out


def test_hyperball_matches_exact_balls(spark):
    """The iterated max-merge reproduces the register state of the TRUE
    in-neighborhood ball at every (node, radius) — exact BFS ground truth
    on a 25-node random digraph, radius 4."""
    from sketchlib.graphops import hyperball

    edges = sorted({(f"n{(i * 13 + 5) % 25}", f"n{(i * 7 + 2) % 25}") for i in range(60)})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["host"], r["radius"]): (r["zq"], r["zeros"], r["reg_sum"])
        for r in hyperball(df, radius=4, p=6).collect()
    }
    want = _hand_hyperball(edges, 4, 6)
    assert got == {k: v[:3] for k, v in want.items()}


def test_hyperball_partitioning_invariant(spark):
    """Identical rows through 1 and 13 input partitions — the max-merge
    is order/partitioning-free (the kernel's byte-identity contract)."""
    from sketchlib.graphops import hyperball

    edges = [(f"n{(i * 13 + 5) % 20}", f"n{(i * 7 + 2) % 20}") for i in range(50)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, hyperball(df.repartition(1), 3, p=6).collect()))
    b = sorted(map(tuple, hyperball(df.repartition(13), 3, p=6).collect()))
    assert a == b and len(a) == 20 * 4


def test_hyperball_harmonic_accuracy_vs_exact(spark, sf_dir):
    """Float harmonic centrality from the sketch (p=12 → 1.6% register
    error) vs EXACT harmonic centrality from BFS distances on the real
    40-host fixture graph: every host within 3σ-ish relative tolerance,
    and the top-5 ranking overlaps ≥ 4/5."""
    from sketchlib.graphops import hb_harmonic_float, host_graph, hyperball

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = host_graph(docs)
    edges = [(r["src"], r["dst"]) for r in g.select("src", "dst").collect()]
    rows = hyperball(g, radius=6, p=12).collect()
    per_host = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append((r["radius"], r["zq"], r["zeros"]))
    est = {h: hb_harmonic_float(v, 1 << 12) for h, v in per_host.items()}
    exact = {}
    want = _hand_hyperball(edges, 6, 12)
    for (v, r), (_, _, _, ball) in want.items():
        exact.setdefault(v, {})[r] = ball
    truth = {
        v: sum((b[r] - b[r - 1]) / r for r in range(1, 7))
        for v, b in exact.items()
    }
    assert set(est) == set(truth)
    tol = 3 * 1.04 / (1 << 6) + 0.03  # 3·(1.04/√4096) + slack, relative
    for h in truth:
        if truth[h] > 0:
            assert abs(est[h] - truth[h]) / truth[h] <= tol, (h, est[h], truth[h])
    top_est = sorted(est, key=est.get, reverse=True)[:5]
    top_tru = sorted(truth, key=truth.get, reverse=True)[:5]
    assert len(set(top_est) & set(top_tru)) >= 4
