"""HTML extraction for Common-Crawl-style web pages: tag stripping,
block-aware newline insertion, entity decoding, and link extraction —
the "WET from WARC" stage every webtext curation pipeline runs before
any quality/dedup pass (jusText/trafilatura ancestry; the operators here
implement the deterministic, engine-portable core: script/style/comment
removal, block tags → newline, remaining tags → space, a fixed entity
table, whitespace normalization).

The documents testdata carries plain text, so the gate entries wrap each
document in a deterministic synthetic page (same discipline as the
urlops synthetic-url fixture): the document text is HTML-entity-ENCODED
into a ``<p>`` body surrounded by title/nav/footer boilerplate, with a
variant hash toggling script/style/comment blocks. Encoding the payload
makes extraction provably information-preserving — strip(tags) +
decode(entities) recovers the original text verbatim inside the
extracted body (property-tested) — and guarantees every raw tag in the
page comes from the well-formed fixture, never from adversarial
document text (fuzz corpora contain literal ``<script>`` strings; they
arrive encoded and must survive the round trip).

Scale shape: both operators are ZERO-SHUFFLE whole-stage-codegen
projections (regexp_replace / replace / regexp_extract_all chains, no
UDF, no explode). At 10^12 pages this is the map stage fused into the
scan — the only thing that moves is the scan itself.

Engine-parity notes (the CLAUDE.md trap families):
  - every regex literal goes through ``_rx`` (Spark processes backslash
    escapes in string literals, DuckDB keeps them raw);
  - DuckDB ``regexp_replace`` needs the explicit ``'g'`` flag;
  - the newline replacement is ``'\\n'`` in Spark (escape-processed) but
    ``chr(10)`` in DuckDB (raw literals);
  - no backreferences anywhere (RE2 lacks them) — script and style get
    separate non-greedy ``(?is)`` blocks;
  - ``&amp;`` decodes LAST so double-encoded entities decode exactly one
    level in both engines (plain ``replace`` chains, no regex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sketchlib.textops import _replace_all_flag, _rx, norm_ws_sql
from sketchlib.urlops import _md5i, _s

#: entity decode table, applied in order; ``&amp;`` MUST stay last (a
#: single decode level: ``&amp;lt;`` → ``&lt;``, never ``<``).
ENTITY_TABLE: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&nbsp;", " "),
    ("&copy;", "(c)"),
    ("&amp;", "&"),
]

#: block-level closers/voids replaced by a newline (everything else
#: becomes a space) — keeps paragraph structure without an HTML parser.
_BLOCK_TAG_RX = r"(?i)</?(p|div|h[1-6]|br|li|tr|title)\b[^>]*>"
_SCRIPT_RX = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RX = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_RX = r"(?s)<!--.*?-->"
_ANY_TAG_RX = r"(?s)<[^>]*>"


def _nl(dialect: str) -> str:
    """Newline as a replacement-argument expression (CLAUDE.md escape
    trap: Spark literals process ``\\n``, DuckDB's don't — use chr)."""
    return "'\\n'" if dialect == "spark" else "chr(10)"


def encode_entities_sql(expr: str) -> str:
    """Entity-ENCODE a text expression (fixture side): ``&`` first so the
    ampersands introduced by ``&lt;``/``&gt;`` never double-encode.
    Plain ``replace`` chains — identical bytes in both engines."""
    out = f"replace({expr}, '&', '&amp;')"
    out = f"replace({out}, '<', '&lt;')"
    return f"replace({out}, '>', '&gt;')"


def synth_html_sql(dialect: str) -> str:
    """Deterministic synthetic page over (doc_id, text): encoded payload
    in ``<p>``, boilerplate title/nav/footer, and a variant hash toggling
    a style block / script block / comment so the strip rules all fire.
    NULL doc_id or text NULL-propagates through ``||`` (both engines)."""
    s = _s(dialect)
    base = _md5i(dialect, f"'html-base:' || CAST(doc_id AS {s})") + " % 40"
    var = _md5i(dialect, f"'html-var:' || CAST(doc_id AS {s})") + " % 3"
    b = f"CAST(({base}) AS {s})"
    i = f"CAST(doc_id AS {s})"
    style = (
        f"CASE WHEN ({var}) = 0 THEN "
        f"'<style type=\"text/css\">p {{ margin: 0; }} .x{{color:red}}</style>' "
        f"ELSE '' END"
    )
    script = (
        f"CASE WHEN ({var}) = 1 THEN "
        f"'<script type=\"text/javascript\">var u = ' || {b} || '; track(u);</script>' "
        f"ELSE '' END"
    )
    comment = f"CASE WHEN ({var}) = 2 THEN '<!-- crawl ' || {i} || ' -->' ELSE '' END"
    return (
        f"'<!DOCTYPE html><html><head><title>Doc ' || {i} || ' &amp; friends</title>' "
        f"|| {style} || '</head><body>' || {script} || {comment} "
        f"|| '<div id=\"nav\"><a href=\"https://h' || {b} || "
        f"'.example.com/home\">Home</a><br>"
        f"<a href=\"/about?x=' || {i} || '\">About &amp; Info</a></div>' "
        f"|| '<h1>Doc ' || {i} || '</h1>' "
        f"|| '<p>' || {encode_entities_sql('text')} || '</p>' "
        f"|| '<div class=\"footer\">&copy; 2026 h' || {b} || "
        f"'.example.com &nbsp;All rights reserved.</div>' "
        f"|| '</body></html>'"
    )


def html_to_text_stages(dialect: str, col: str = "html") -> list[dict[str, str]]:
    """The extractor as named-column stages (urlops precedent: Spark
    chains ``withColumns``, the oracle nests CTEs — one definition, exact
    parity). Stages: (1) drop script/style/comment blocks, (2) block tags
    → newline, remaining tags → space, (3) decode entities, (4) collapse
    whitespace."""
    g = _replace_all_flag(dialect)
    nosc = f"regexp_replace({col}, {_rx(dialect, _SCRIPT_RX)}, ' '{g})"
    nosty = f"regexp_replace({nosc}, {_rx(dialect, _STYLE_RX)}, ' '{g})"
    nocmt = f"regexp_replace({nosty}, {_rx(dialect, _COMMENT_RX)}, ' '{g})"
    st1 = {"__noblocks": nocmt}
    blk = f"regexp_replace(__noblocks, {_rx(dialect, _BLOCK_TAG_RX)}, {_nl(dialect)}{g})"
    st2 = {"__notags": f"regexp_replace({blk}, {_rx(dialect, _ANY_TAG_RX)}, ' '{g})"}
    dec = "__notags"
    for ent, repl in ENTITY_TABLE:
        r = "chr(39)" if repl == "'" else "'" + repl.replace("'", "''") + "'"
        dec = f"replace({dec}, '{ent}', {r})"
    st3 = {"__decoded": dec}
    st4 = {"main_text": norm_ws_sql(dialect, "__decoded")}
    return [st1, st2, st3, st4]


_HTML_INTERMEDIATES = ("__noblocks", "__notags", "__decoded")

#: horizontal whitespace only — the structure-preserving normalizer keeps
#: newlines (block boundaries) intact.
_HORIZ_WS_RX = r"[ \t\r]+"


def html_to_blocks_stages(dialect: str, col: str = "html") -> list[dict[str, str]]:
    """Stages 1-3 of :func:`html_to_text_stages` plus a
    STRUCTURE-PRESERVING stage 4: horizontal whitespace collapses to one
    space but the newlines stage 2 inserted at block tags survive — the
    real WET line shape, so downstream paragraph operators (split on
    newline runs) see the page's block structure. Residual exotic
    whitespace (vtab/formfeed) inside a block is left for the paragraph
    normalizer's ``\\s+`` — both engines agree either way."""
    st = html_to_text_stages(dialect, col)[:3]
    g = _replace_all_flag(dialect)
    st.append(
        {
            "block_text": (
                f"trim(regexp_replace(__decoded, {_rx(dialect, _HORIZ_WS_RX)}, ' '{g}))"
            )
        }
    )
    return st


def with_extracted_blocks(pages: DataFrame, col: str = "html") -> DataFrame:
    """(…pages…, block_text) — zero-shuffle codegen projection, newline
    structure preserved."""
    out = pages
    for stage in html_to_blocks_stages("spark", col):
        out = out.withColumns({k: F.expr(v) for k, v in stage.items()})
    return out.drop(*_HTML_INTERMEDIATES)


def with_synth_html(docs: DataFrame) -> DataFrame:
    """(doc_id, html) — the deterministic fixture rows (NULL ids/text
    drop, same predicate as the oracles)."""
    return docs.where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    ).select("doc_id", F.expr(synth_html_sql("spark")).alias("html"))


def with_extracted_text(pages: DataFrame, col: str = "html") -> DataFrame:
    """(…pages…, main_text) — zero-shuffle codegen projection."""
    out = pages
    for stage in html_to_text_stages("spark", col):
        out = out.withColumns({k: F.expr(v) for k, v in stage.items()})
    return out.drop(*_HTML_INTERMEDIATES)


def html_extract_text(docs: DataFrame) -> DataFrame:
    """Gate shape: (doc_id, main_text, n_chars_html, n_chars_text)."""
    return with_extracted_text(with_synth_html(docs)).select(
        "doc_id",
        "main_text",
        F.expr("CAST(length(html) AS BIGINT)").alias("n_chars_html"),
        F.expr("CAST(length(main_text) AS BIGINT)").alias("n_chars_text"),
    )


_HREF_RX = r'(?i)href="([^"]*)"'


def html_extract_links(docs: DataFrame) -> DataFrame:
    """(doc_id, hrefs, n_links) — outlink extraction in document order
    (regexp_extract_all group 1), the web-graph edge stage. Zero-shuffle
    projection; the array stays a value, never an explode here."""
    return with_synth_html(docs).select(
        "doc_id",
        F.expr(f"regexp_extract_all(html, {_rx('spark', _HREF_RX)}, 1)").alias("hrefs"),
        F.expr(
            f"CAST(size(regexp_extract_all(html, {_rx('spark', _HREF_RX)}, 1)) AS BIGINT)"
        ).alias("n_links"),
    )


def html_cte_sql(
    dialect: str, source_sql: str, blocks: bool = False
) -> tuple[str, str]:
    """``WITH``-chain mirror of :func:`with_extracted_text` (or, with
    ``blocks=True``, :func:`with_extracted_blocks`) for oracles:
    ``source_sql`` must yield (doc_id, html). Returns (WITH-prefix,
    final-CTE name)."""
    stages = (html_to_blocks_stages if blocks else html_to_text_stages)(dialect)
    ctes, prev = [f"h0 AS ({source_sql})"], "h0"
    for i, stage in enumerate(stages, start=1):
        cols = ", ".join(f"{v} AS {k}" for k, v in stage.items())
        ctes.append(f"h{i} AS (SELECT *, {cols} FROM {prev})")
        prev = f"h{i}"
    return "WITH " + ", ".join(ctes), prev
