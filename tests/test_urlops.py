"""URL canonicalization + canonical-url dedup: rule-level unit checks on
hand-written urls, cross-engine parity of the synthetic fixture, and the
dedup keeper contract."""

import duckdb
import pytest

from sketchlib.urlops import (
    canonical_url_cte_sql,
    synth_url_sql,
    url_dedup_canonical,
    with_canonical_url,
    with_synth_url,
)

# (raw url, expected canonical) — one case per rule plus interactions
CASES = [
    # fragment dropped, scheme+host lowercased, :80 stripped for http,
    # trailing slash stripped, params sorted, utm_* dropped (path case kept)
    ("HTTP://Ex.COM:80/Path/?b=2&a=1&utm_source=x#f", "http://ex.com/Path?a=1&b=2"),
    # empty path -> /
    ("https://a.com", "https://a.com/"),
    # query that is ALL tracking params disappears entirely
    ("https://a.com/?utm_source=1&fbclid=z", "https://a.com/"),
    # non-default port survives
    ("https://a.com:8080/x", "https://a.com:8080/x"),
    # :443 only stripped for https
    ("http://a.com:443/x", "http://a.com:443/x"),
    ("HTTPS://A.com:443/x", "https://a.com/x"),
    # ref= and gclid= dropped, rest sorted bytewise
    ("https://a.com/x?z=9&ref=1&gclid=2&y=8", "https://a.com/x?y=8&z=9"),
    # a port whose digits merely END in 80 is not the default port
    ("http://a.com:8080/", "http://a.com:8080/"),
    # utm_ needs the literal underscore (LIKE-escape check): 'utmx' kept
    ("https://a.com/x?utmx=1", "https://a.com/x?utmx=1"),
    # root path with trailing slash stays a single /
    ("https://a.com/#frag", "https://a.com/"),
]


def test_canonical_rules_spark(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "doc_id long, url string")
    got = {r["doc_id"]: r["canonical_url"] for r in with_canonical_url(df).collect()}
    want = {i: c for i, (_, c) in enumerate(CASES)}
    assert got == want


def test_canonical_rules_duckdb_parity():
    con = duckdb.connect()
    con.execute("CREATE TABLE raw (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO raw VALUES (?, ?)", list(enumerate(u for u, _ in CASES)))
    withs, last = canonical_url_cte_sql("duckdb", "SELECT doc_id, url FROM raw")
    got = dict(con.sql(f"{withs} SELECT doc_id, canonical_url FROM {last}").fetchall())
    assert got == {i: c for i, (_, c) in enumerate(CASES)}


def test_synth_fixture_parity_and_null_handling(spark):
    """Synthetic urls + canonicalization are bit-identical across engines
    for negative / duplicate / NULL doc_ids (the fuzz-corpus id shapes)."""
    ids = [-5, -1, 0, 1, 1, 7, 123456789, None]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    srows = sorted(
        (r["doc_id"], r["url"], r["canonical_url"])
        for r in with_canonical_url(with_synth_url(df)).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?)", [(i,) for i in ids])
    src = (
        f"SELECT doc_id, {synth_url_sql('duckdb')} AS url "
        "FROM documents WHERE doc_id IS NOT NULL"
    )
    withs, last = canonical_url_cte_sql("duckdb", src)
    orows = sorted(
        tuple(r)
        for r in con.sql(
            f"{withs} SELECT doc_id, url, canonical_url FROM {last}"
        ).fetchall()
    )
    assert srows == orows
    assert all(d is not None for d, _, _ in srows)  # NULL id dropped
    # every synthetic url actually changes under canonicalization is NOT
    # guaranteed (variant junk differs), but every canonical form must be
    # lowercase-host, fragment-free, tracking-free
    for _, _, c in srows:
        assert "#" not in c and "utm" not in c and ":443" not in c
        assert c == c.replace("HTTPS", "https")


def test_dedup_keeper_contract(spark):
    """All junk variants of one base collapse to one canonical url; the
    keeper is the smallest doc_id and n_dups counts the group."""
    df = spark.createDataFrame([(i,) for i in range(600)], "doc_id long")
    out = url_dedup_canonical(df)
    rows = out.collect()
    assert sum(r["n_dups"] for r in rows) == 600
    canon = {
        r["doc_id"]: r["canonical_url"]
        for r in with_canonical_url(with_synth_url(df)).collect()
    }
    groups = {}
    for d, c in canon.items():
        groups.setdefault(c, []).append(d)
    want = {c: (min(ds), len(ds)) for c, ds in groups.items()}
    got = {r["canonical_url"]: (r["keeper_doc_id"], r["n_dups"]) for r in rows}
    assert got == want
    # base%200 over 600 ids must actually produce multi-doc groups
    assert max(n for _, n in want.values()) >= 2


def test_domain_blocklist_filter_contract(spark):
    """Blocked hosts are absent, survivors carry exact count + min-doc_id
    keeper, and the blocklist itself is deterministic across engines."""
    import duckdb

    from sketchlib.urlops import (
        HOST_RX,
        blocklist_sql,
        domain_blocklist_stats,
        with_canonical_url,
        with_synth_url,
    )

    spark_block = {r["host"] for r in spark.sql(blocklist_sql("spark")).collect()}
    duck_block = {h for (h,) in duckdb.sql(blocklist_sql("duckdb")).fetchall()}
    assert spark_block == duck_block and 0 < len(spark_block) < 40

    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    import re as _re

    hosts = {
        r["doc_id"]: _re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]*)",
                               r["canonical_url"]).group(1)
        for r in with_canonical_url(with_synth_url(df)).collect()
    }
    want = {}
    for d, h in hosts.items():
        if h not in spark_block:
            n, m = want.get(h, (0, d))
            want[h] = (n + 1, min(m, d))
    got = {r["domain"]: (r["n_docs"], r["keeper_doc_id"])
           for r in domain_blocklist_stats(spark, df).collect()}
    assert got == want
    assert not (set(got) & spark_block)
