"""HTML extraction: round-trip exactness, strip rules, link extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _pages(spark, rows):
    from sketchlib.htmlops import with_synth_html

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return with_synth_html(df)


def test_extraction_roundtrips_payload_exactly(spark):
    """The entity-encoded payload must come back verbatim (modulo the ws
    normalization the extractor applies to EVERYTHING) inside the
    extracted text — including adversarial raw-HTML-looking payloads."""
    from sketchlib.htmlops import with_extracted_text
    from sketchlib.textops import norm_ws_sql

    rows = [
        (1, "plain words here"),
        (2, "raw <script>alert('x')</script> & <b>tags</b> in payload"),
        (3, "pre-encoded &lt;div&gt; and &amp;amp; stay one level"),
        (4, "quotes \" and 'apostrophes' and   runs\t\nof ws"),
    ]
    out = {
        r["doc_id"]: r["main_text"]
        for r in with_extracted_text(_pages(spark, rows)).collect()
    }
    norm = {
        r["doc_id"]: r["n"]
        for r in spark.createDataFrame(rows, "doc_id long, text string")
        .selectExpr("doc_id", f"{norm_ws_sql('spark')} AS n")
        .collect()
    }
    for d, _ in rows:
        assert norm[d] in out[d], (d, norm[d], out[d])
        # boilerplate text survives around the payload
        assert out[d].startswith(f"Doc {d} & friends"), out[d]
        assert "All rights reserved." in out[d]
        # nothing tag-shaped from the FIXTURE survives; payload tags
        # (doc 2) must — they were entity-encoded upstream
        assert "<style" not in out[d] and "<div" not in out[d]
        assert "track(u)" not in out[d] and "margin: 0" not in out[d]
        assert "<!--" not in out[d]


def test_null_and_empty_handling(spark):
    from sketchlib.htmlops import html_extract_text

    df = spark.createDataFrame(
        [(1, None), (None, "x"), (2, "")], "doc_id long, text string"
    )
    rows = html_extract_text(df).collect()
    assert sorted(r["doc_id"] for r in rows) == [2]  # NULL id/text drop
    (r,) = rows
    assert r["n_chars_text"] > 0  # boilerplate remains for empty payload


def test_link_extraction_order_and_count(spark):
    from sketchlib.htmlops import html_extract_links

    df = spark.createDataFrame([(7, "t")], "doc_id long, text string")
    (r,) = html_extract_links(df).collect()
    assert r["n_links"] == 2 == len(r["hrefs"])
    assert r["hrefs"][0].startswith("https://h") and "/home" in r["hrefs"][0]
    assert r["hrefs"][1].startswith("/about?x=7")


def test_entity_table_decodes_one_level(spark):
    from sketchlib.htmlops import ENTITY_TABLE

    assert ENTITY_TABLE[-1][0] == "&amp;"  # must stay last


def test_extraction_plan_is_zero_shuffle(spark, sf_dir):
    from sketchlib.htmlops import html_extract_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = html_extract_text(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
