"""Composed web-curation pipeline: stage-interaction invariants — url
keep-first, blocklist removal, corpus-wide boilerplate stripping, and
the paragraph contract on the final text."""

from pyspark.sql import functions as F


def test_web_pipeline_stage_interactions(spark):
    from sketchlib.urlops import (
        HOST_RX,
        blocklist_sql,
        with_canonical_url,
        with_synth_url,
    )
    from sketchlib.webpipe import web_curation_pipeline

    rows = [(i, f"body {i} unique words\nshared corpus line") for i in range(150)]
    rows.append((900, None))  # NULL text: dropped before extraction
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = web_curation_pipeline(spark, docs).collect()
    got_ids = {r["doc_id"] for r in out}

    # 1. survivors ⊆ canonical-url keepers, and no blocked host
    u = {r["doc_id"]: r["canonical_url"]
         for r in with_canonical_url(with_synth_url(docs)).collect()}
    keepers = {}
    for d, c in u.items():
        keepers[c] = min(keepers.get(c, d), d)
    blocked = {r["host"] for r in spark.sql(blocklist_sql("spark")).collect()}
    import re
    for d in got_ids:
        assert keepers[u[d]] == d, "non-keeper survived url dedup"
        host = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]*)", u[d]).group(1)
        assert host not in blocked, "blocked host survived"
    assert 900 not in got_ids

    # 2. the nav boilerplate and the shared payload line each survive in
    # exactly ONE output doc (corpus-wide paragraph dedup across stages)
    n_home = sum(1 for r in out if "Home" in r["final_text"])
    n_shared = sum(1 for r in out if "shared corpus line" in r["final_text"])
    assert n_home == 1 and n_shared == 1
    assert len(out) > 10  # the gauntlet keeps a real population

    # 3. paragraph contract: n_kept <= n_paras; every doc's own title
    # line ("Doc {i} & friends") is unique so it always survives
    for r in out:
        assert 0 < r["n_kept"] <= r["n_paras"]
        assert f"Doc {r['doc_id']} & friends" in r["final_text"]
