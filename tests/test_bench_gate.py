"""The scaling-rep acceptance gate is pure arithmetic — pin its behavior
so the self-evidencing BENCH artifact can be trusted without rereading
bench.py each round. (No Spark session needed.)"""

from __future__ import annotations

import bench


def rep(s8, m8, s32, m32):
    return bench.scaling_rep(s8, m8, s32, m32)


def test_rep_record_arithmetic():
    r = rep(1000.0, 2000.0, 4000.0, 4000.0)
    assert r["spark_eff"] == 1.0      # 4000 / (4*1000)
    assert r["mp_eff"] == 0.5         # 4000 / (4*2000)
    assert r["normalized_eff"] == 2.0


def test_accepts_sane_windows():
    # spark and control both ~0.5 weak-scaling efficiency → normalized 1.0
    assert bench.scaling_rep_ok(rep(1000, 1500, 2000, 3000))


def test_rejects_collapsed_control():
    # mp_eff = 0.15 < floor: normalizing by it would inflate the ratio
    assert not bench.scaling_rep_ok(rep(1000, 5000, 2000, 3000))


def test_rejects_superlinear_control():
    # mp_eff = 1.05 > ceiling: physically impossible weak scaling
    assert not bench.scaling_rep_ok(rep(1000, 1000, 2000, 4200))


def test_rejects_out_of_band_normalized_both_sides():
    # control fine (0.5) but spark "scaled" 1.6x better → window mismatch
    assert not bench.scaling_rep_ok(rep(1000, 1500, 3200, 3000))
    # and 2.5x worse → same
    assert not bench.scaling_rep_ok(rep(1000, 1500, 800, 3000))


def test_band_edges_inclusive():
    # normalized exactly 1.5 with a sane control is accepted
    r = rep(1000, 2000, 3000, 4000)  # spark_eff .75, mp_eff .5, norm 1.5
    assert bench.scaling_rep_ok(r)
    # normalized exactly 0.5 with a sane control is accepted
    r = rep(1000, 1500, 1000, 3000)  # spark_eff .25, mp_eff .5, norm 0.5
    assert bench.scaling_rep_ok(r)
    # control exactly at the floor is accepted (normalized in band)
    assert bench.scaling_rep_ok(rep(1000, 2000, 1200, 2000))   # mp .25, norm 1.2


def test_compact_line_fits_driver_tail_window():
    """VERDICT r7 #5: the driver parses the bench line only when it sits
    entirely inside its ~2000-char output tail (r1/r2 parsed at 948/1602
    chars; the r3-r7 >2000-char lines recorded parsed:null). The compact
    line must stay under budget even with a suite notably larger than
    today's, and must keep the keys the round comparison reads."""
    import json

    # 50 queries at the suite's realistic name length (current suite: 37
    # queries, ~20-char names) — room for several rounds of growth
    queries = {f"query_name_shaped_{i:02d}": 12.345 for i in range(50)}
    result = {
        "metric": "headline_suite_seconds",
        "value": 123.456,
        "unit": "sec",
        "sf": "sf0.1",
        "pages_rows": 600000,
        "cuckoo_build_docs_per_sec": 123456.7,
        "probe_docs_per_sec": 765432.1,
        "observed_fp_rates": {"fp8": 0.0179, "fp16": 9e-05, "fp32": 0.0},
        "scaling": {
            "efficiency": 0.85,
            "efficiency_control_normalized": 1.056,
            "mp_control_efficiency": 0.62,
            "control_sane": True,
            "reps": [{"huge": "detail"}] * 6,       # must NOT leak into the line
            "rejected_reps": [{"huge": "detail"}] * 4,
        },
        "queries": queries,
        "core14_seconds": 17.172,
    }
    line = json.dumps(bench.compact_line(result))
    assert len(line) <= bench.LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert parsed["core14_seconds"] == 17.172
    assert len(parsed["queries"]) == 50
    assert parsed["scaling"]["normalized"] == 1.056
    assert parsed["scaling"]["control_sane"] is True
    assert "reps" not in json.dumps(parsed)


def test_driver_gate_order_covers_rotated_entries():
    """VERDICT r3 #1: the driver checks only the first 50 queries() entries;
    the rotation must land every previously-ungated entry inside that
    window, keep name->fn/oracle pairing intact, and cover each registered
    name exactly once."""
    import sketchlib.queries as q

    order = q.gate_order()
    assert sorted(order) == sorted(q.REGISTRY)          # a permutation
    gated = set(order[:50])
    for name in q._GATE_FRONT:
        assert name in gated, name
    # deferred entries sit past the cutoff but are still registered
    for name in q._GATE_DEFERRED:
        assert name in order[50:], name
    qs, osql = q.queries(), q.oracle_sql()
    assert list(qs) == order
    for name in osql:
        assert osql[name] == q.REGISTRY[name][1]
        assert qs[name] is q.REGISTRY[name][0]


def test_gate_rotation_tool_reads_history(tmp_path):
    """tools/gate_rotation.py's history parser: hash greens and rows-only
    greens (hash_match None — the driver never records False for those)
    count; err rows and hash-MISMATCH rows (hash_match False, the r4
    SUM-rendering red shape) don't; the latest round is detected."""
    import json
    import sys

    sys.path.insert(0, "tools")
    from gate_rotation import last_green_by_entry

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"hash_match": True, "rows_match": True, "err": None},
        "b": {"hash_match": None, "rows_match": True, "err": None},  # rows-only
        "c": {"hash_match": None, "rows_match": None, "err": "boom"},
        "d": {"hash_match": False, "rows_match": True, "err": None},  # real red
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "a": {"hash_match": True, "rows_match": True, "err": None},
    }))
    last, latest = last_green_by_entry(str(tmp_path))
    assert latest == 2
    assert last == {"a": 2, "b": 1}  # c and d never green


def test_core14_is_the_frozen_r2_r3_shared_subset():
    """VERDICT r3 #8: round-over-round bench comparison uses a frozen
    subtotal; CORE14 must stay exactly the query set shared by the r2 and
    r3 artifacts (growth lands in the headline suite, never here)."""
    import json

    r2 = json.load(open("BENCH/r2_local_sf01.json"))
    r3 = json.load(open("BENCH/r3_local_sf01.json"))
    assert sorted(bench.CORE14) == sorted(set(r2["queries"]) & set(r3["queries"]))


def test_gate_manifest_detects_changed_entries(tmp_path, monkeypatch):
    """tools/gate_manifest.py (VERDICT r7 #8): the committed per-entry
    provenance hash makes the rotation's changed-set mechanical. A
    tampered hash reports as changed; an absent entry reports as missing;
    an up-to-date manifest reports neither."""
    import json
    import sys

    sys.path.insert(0, "tools")
    import gate_manifest as gm

    cur = gm.compute_hashes()
    import sketchlib.queries as q

    assert sorted(cur) == sorted(q.REGISTRY)
    assert all(len(v["hash"]) == 64 for v in cur.values())
    # every ann_* entry's hash covers the similarity module (the operator
    # library edit class the manifest exists to catch)
    assert "sketchlib.similarity" in cur["ann_ivf_pq_topk"]["modules"]
    # cf_* entries import via queries.py's TOP-of-module imports — the
    # module-level scan must cover them (zero-coverage entries would make
    # a spark/cuckoo.py edit invisible to the rotation)
    assert "sketchlib.spark.cuckoo" in cur["cf_membership_inserted"]["modules"]
    assert all(v["modules"] for v in cur.values())
    # ...but never the registry modules themselves (a _GATE_FRONT reorder
    # must not flag all 95 entries as changed)
    assert all(
        m not in ("sketchlib.queries", "sketchlib.queries_data")
        for v in cur.values() for m in v["modules"]
    )

    man = {k: dict(v) for k, v in cur.items()}
    victim = "ann_ivf_pq_topk"
    man[victim] = {**man[victim], "hash": "0" * 64}
    dropped = "ann_cosine_topk"
    del man[dropped]
    p = tmp_path / "GATE_MANIFEST.json"
    p.write_text(json.dumps(man))
    monkeypatch.setattr(gm, "MANIFEST_PATH", str(p))
    changed, missing = gm.changed_entries()
    assert changed == [victim]
    assert missing == [dropped]

    p.write_text(json.dumps(cur))
    changed, missing = gm.changed_entries()
    assert changed == [] and missing == []
