"""URL operations for Common-Crawl-style web pages: canonicalization and
canonical-URL dedup (BASELINE.json north_star: the pipeline keys "on url";
URL-level dedup is stage one of every webtext curation run — Common Crawl
itself dedups by exact URL before any content pass).

The documents testdata carries no url column, so the gate entries derive a
deterministic synthetic url per document from ``md5(doc_id)`` with the
repo's bit-portable md5→int fragment (same discipline as the
clustered-embeddings ANN fixture: the fixture is data derived identically
in BOTH engines, the operator under test is the canonicalizer/dedup on
top). Every arithmetic step is on non-negative md5-derived BIGINTs, so
negative / huge / duplicate doc_ids (fuzz corpora) cannot hit the
``div``-vs-``//`` negative-truncation divergence.

Scale shape: canonicalization is a ZERO-SHUFFLE whole-stage-codegen
projection (regexp_extract + string ops, no UDF); dedup is ONE hash
shuffle on the canonical string with map-side partial aggregation, so the
exchange carries ~one row per distinct canonical url per map partition,
not one per input row. At 10^12 docs the same plan holds — the canonical
url is the natural join/group key downstream (it IS the identity), so
shuffling the string here is the useful shuffle, not an avoidable one.

Canonicalization rules (the common subset of Chromium/requests/w3lib
normalizers — each rule stated in the fragment so oracles stay in exact
parity):
  1. drop the fragment (``#...``)
  2. lowercase scheme and host
  3. strip the scheme's default port (``:443`` for https, ``:80`` for http)
  4. empty path → ``/``; strip one trailing ``/`` from non-root paths
  5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
     sort the survivors bytewise, re-join with ``&``; empty query → none

Assumes the query string holds no literal ``?``/``#`` (true of the
synthetic urls; real pipelines percent-encode those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tracking-param prefixes dropped by rule 5 — LIKE patterns with ``!`` as
#: the escape char (``_`` is a LIKE wildcard; a backslash escape would be
#: eaten by Spark's string-literal processing, the CLAUDE.md ``\s`` trap)
TRACKING_PARAM_PATTERNS = ["utm!_%", "fbclid=%", "gclid=%", "ref=%"]


def _md5i(dialect: str, expr: str) -> str:
    """Bit-portable md5 → non-negative BIGINT in [0, 2^52) — the repo's
    shared cross-engine hash fragment (relops priority sampling / textops
    classifier use the same shape)."""
    if dialect == "spark":
        return f"CAST(conv(substr(md5({expr}), 1, 13), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({expr}), 1, 13)) AS BIGINT)"


def _s(dialect: str) -> str:
    return "STRING" if dialect == "spark" else "VARCHAR"


def synth_url_sql(dialect: str) -> str:
    """Deterministic synthetic url for a document row (expression over
    ``doc_id``). Three junk variants per base key — mixed-case host +
    default port + tracking params + fragment + trailing slash — such
    that all variants of one base canonicalize to the SAME url:
    ``https://h{H}.example.com/p/{B}/item?a=1&b={B%5}``."""
    s = _s(dialect)
    base = _md5i(dialect, f"'url-base:' || CAST(doc_id AS {s})") + " % 200"
    var = _md5i(dialect, f"'url-var:' || CAST(doc_id AS {s})") + " % 3"
    b = f"CAST(({base}) AS {s})"
    b5 = f"CAST(({base}) % 5 AS {s})"
    host = f"'h' || CAST(({base}) % 40 AS {s}) || '.example.com'"
    scheme = f"CASE WHEN ({var}) = 1 THEN 'HTTPS' ELSE 'https' END"
    hostport = f"CASE WHEN ({var}) = 1 THEN upper({host}) || ':443' ELSE {host} END"
    path = f"'/p/' || {b} || '/item' || CASE WHEN ({var}) = 2 THEN '/' ELSE '' END"
    query = (
        f"CASE WHEN ({var}) = 0 THEN '?b=' || {b5} || '&a=1&utm_source=feed' "
        f"WHEN ({var}) = 1 THEN '?a=1&utm_campaign=c' || {b} || '&b=' || {b5} "
        f"ELSE '?gclid=g' || {b} || '&b=' || {b5} || '&a=1&fbclid=x' END"
    )
    frag = f"CASE WHEN ({var}) = 0 THEN '#sec2' ELSE '' END"
    return f"{scheme} || '://' || {hostport} || {path} || {query} || {frag}"


def canonical_url_stages(dialect: str, col: str = "url") -> list[dict[str, str]]:
    """The canonicalizer as a list of named-column stages (each stage may
    reference the previous stage's columns): Spark applies them as chained
    ``withColumns``, the DuckDB oracle as nested CTEs — one definition,
    exact expression parity, and no textual blow-up from inlining the
    parse five times into the reassembly."""
    rx = "regexp_extract"
    nofrag = f"split_part({col}, '#', 1)"
    st1 = {
        "__scheme": f"lower({rx}({nofrag}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))",
        "__hostport": f"lower({rx}({nofrag}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))",
        "__pathq": f"{rx}({nofrag}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)",
    }
    host = (
        "CASE WHEN __scheme = 'https' AND __hostport LIKE '%:443' "
        "THEN substr(__hostport, 1, length(__hostport) - 4) "
        "WHEN __scheme = 'http' AND __hostport LIKE '%:80' "
        "THEN substr(__hostport, 1, length(__hostport) - 3) "
        "ELSE __hostport END"
    )
    rawpath = "split_part(__pathq, '?', 1)"
    path = (
        f"CASE WHEN {rawpath} = '' THEN '/' "
        f"WHEN length({rawpath}) > 1 AND {rawpath} LIKE '%/' "
        f"THEN substr({rawpath}, 1, length({rawpath}) - 1) ELSE {rawpath} END"
    )
    rawq = (
        f"CASE WHEN __pathq LIKE '%?%' THEN split_part(__pathq, '?', 2) ELSE '' END"
    )
    keep = " AND ".join(
        f"NOT p LIKE '{pat}' ESCAPE '!'" for pat in TRACKING_PARAM_PATTERNS
    )
    if dialect == "spark":
        cq = (
            f"array_join(array_sort(filter(split({rawq}, '&'), "
            f"p -> p != '' AND {keep})), '&')"
        )
    else:
        # COALESCE: DuckDB array_to_string over the empty list is NULL
        # where Spark array_join is '' — without it an all-tracking query
        # NULL-propagates through the ``||`` reassembly (CLAUDE.md NULL
        # trap family)
        cq = (
            f"COALESCE(array_to_string(list_sort(list_filter(string_split({rawq}, '&'), "
            f"p -> p != '' AND {keep})), '&'), '')"
        )
    st2 = {"__host": host, "__path": path, "__cq": cq}
    st3 = {
        "canonical_url": (
            "__scheme || '://' || __host || __path || "
            "CASE WHEN __cq = '' THEN '' ELSE '?' || __cq END"
        )
    }
    return [st1, st2, st3]


def with_canonical_url(df: DataFrame, col: str = "url") -> DataFrame:
    """(…df…, canonical_url) — zero-shuffle codegen projection; the parse
    intermediates are dropped. NULL urls yield NULL (``||``
    NULL-propagates in both engines — NOT DuckDB ``concat``)."""
    out = df
    for stage in canonical_url_stages("spark", col):
        out = out.withColumns({k: F.expr(v) for k, v in stage.items()})
    return out.drop("__scheme", "__hostport", "__pathq", "__host", "__path", "__cq")


def canonical_url_cte_sql(dialect: str, source_sql: str) -> tuple[str, str]:
    """``WITH``-chain mirror of :func:`with_canonical_url` for oracles:
    ``source_sql`` must yield (doc_id, url). Returns (WITH-prefix,
    final-CTE name) — the html_cte_sql shape."""
    stages = canonical_url_stages(dialect)
    ctes, prev = [f"u0 AS ({source_sql})"], "u0"
    for i, stage in enumerate(stages, start=1):
        cols = ", ".join(f"{v} AS {k}" for k, v in stage.items())
        ctes.append(f"u{i} AS (SELECT *, {cols} FROM {prev})")
        prev = f"u{i}"
    return "WITH " + ", ".join(ctes), prev


def with_synth_url(docs: DataFrame) -> DataFrame:
    """(doc_id, url) — the deterministic fixture rows (NULL doc_ids drop,
    same filter as the oracle)."""
    return docs.where(F.col("doc_id").isNotNull()).select(
        "doc_id", F.expr(synth_url_sql("spark")).alias("url")
    )


def blocklist_sql(dialect: str) -> str:
    """The deterministic domain blocklist as a one-column relation
    ``(host)`` — ~1/4 of the fixture's 40 hosts, selected by the
    bit-portable md5 fragment (a real pipeline ships UT1/adult-domain
    lists the same shape: a tiny dim relation, thousands of rows against
    billions of docs)."""
    s = _s(dialect)
    if dialect == "spark":
        gen = "SELECT explode(sequence(0, 39)) AS i"
    else:
        gen = "SELECT unnest(range(0, 40)) AS i"
    host = f"'h' || CAST(i AS {s}) || '.example.com'"
    return (
        f"SELECT {host} AS host FROM ({gen}) "
        f"WHERE ({_md5i(dialect, f''''block:' || {host}''')}) % 4 = 0"
    )


HOST_RX = "^[a-z][a-z0-9+.-]*://([^/?#]*)"


def domain_blocklist_stats(spark, docs: DataFrame) -> DataFrame:
    """Domain-level corpus stats after blocklist filtering (the UT1-style
    domain-removal stage every webtext pipeline runs before content
    passes): docs whose canonical host is on the blocklist are removed;
    survivors aggregate to (domain, n_docs, keeper_doc_id).

    Scale shape: host extraction is part of the zero-shuffle canonical
    projection; the blocklist is a tiny independent relation joined
    LEFT ANTI under an explicit broadcast (thousands of rows vs billions
    of docs — never a shuffle side); the only exchange is the final
    domain groupBy with map-side partial min/count. The anti-join is on
    the HOST, not the full url — the natural blocklist key."""
    block = spark.sql(blocklist_sql("spark"))
    hosts = with_canonical_url(with_synth_url(docs)).select(
        "doc_id", F.regexp_extract("canonical_url", HOST_RX, 1).alias("host")
    )
    return (
        hosts.join(F.broadcast(block), "host", "left_anti")
        .groupBy(F.col("host").alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def url_dedup_canonical(docs: DataFrame) -> DataFrame:
    """Canonical-URL dedup: (canonical_url, keeper_doc_id, n_dups) — the
    keeper is the smallest doc_id in the group (deterministic, the usual
    keep-first-crawl policy). ONE hash shuffle on canonical_url with
    map-side partial min/count."""
    return (
        with_canonical_url(with_synth_url(docs))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
