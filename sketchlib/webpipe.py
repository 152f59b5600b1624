"""The composed webtext curation pipeline — every per-stage operator in
this repo chained the way a production crawl-to-training-data run chains
them (CCNet/C4/RefinedWeb shape):

  1. canonical-URL keep-first dedup   (urlops — CC stage one)
  2. domain blocklist anti-join       (urlops — UT1 stage)
  3. HTML → block text extraction     (htmlops — WET stage, newline
                                       structure preserved)
  4. quality classifier gate          (textops — fastText-shape keep)
  5. corpus-wide paragraph dedup      (dedup — Dolma/C4 stage)

One callable so a user (and the driver gate) exercises the stage
INTERACTIONS — e.g. the shared nav/footer boilerplate the extractor
emits is exactly what the paragraph dedup must strip corpus-wide — not
just each stage in isolation.

Scale shape: stages 1-2 operate on id/url projections only (the corpus
text is untouched); the single corpus-sized text shuffle added by
composition is the keep-ids semi-join (8-byte keys on both exchanges, the
text moves once), after which extraction + classification are zero-shuffle
projections fused over the surviving partitions, and the paragraph stage
contributes its own documented two exchanges. No stage collects, no stage
broadcasts anything that grows with the corpus (the blocklist dim is the
only broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sketchlib.dedup import paragraph_dedup
from sketchlib.htmlops import with_extracted_blocks, with_synth_html
from sketchlib.textops import with_classifier_score
from sketchlib.urlops import (
    HOST_RX,
    blocklist_sql,
    with_canonical_url,
    with_synth_url,
)


def pipeline_stages(
    spark: SparkSession, docs: DataFrame, materialize: bool = False
) -> dict[str, DataFrame]:
    """The pipeline's intermediates, one (doc_id, text)-bearing relation
    per stage boundary — the pipeline itself consumes ``dedup``; the
    funnel-accounting query consumes all of them. Text per stage is the
    text the NEXT stage would consume: raw document text through the
    id-level stages, extracted block text after the classifier, the
    deduped reassembly at the end.

    ``materialize=True`` (the funnel's mode) eagerly localCheckpoints
    every relation referenced by more than one downstream branch, so the
    five funnel aggregates execute each stage subtree ONCE — the
    CLAUDE.md fan-out rule; without it the url-canonicalize subtree runs
    ~5× and the extraction+classifier subtree ~3× inside one action. The
    single-consumer ``__final`` chain leaves it False: every relation
    there is a prefix of one plan and checkpointing would only add
    materialization cost."""
    ck = (
        (lambda df: df.localCheckpoint(eager=True)) if materialize else (lambda df: df)
    )
    u = ck(with_canonical_url(with_synth_url(docs)).select("doc_id", "canonical_url"))
    keepers = ck(
        u.groupBy("canonical_url").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    hosts = u.join(keepers, "doc_id", "left_semi").select(
        "doc_id", F.regexp_extract("canonical_url", HOST_RX, 1).alias("host")
    )
    surv_ids = ck(
        hosts.join(
            F.broadcast(spark.sql(blocklist_sql("spark"))), "host", "left_anti"
        ).select("doc_id")
    )
    base = ck(docs.where(F.col("text").isNotNull()).select("doc_id", "text"))
    kept_url = base.join(keepers, "doc_id", "left_semi")
    surv = ck(base.join(surv_ids, "doc_id", "left_semi"))
    blocks = with_extracted_blocks(with_synth_html(surv)).select(
        "doc_id", F.col("block_text").alias("text")
    )
    kept = ck(
        with_classifier_score(blocks)
        .where(F.col("quality_keep"))
        .select("doc_id", "text")
    )
    dedup = paragraph_dedup(kept)
    return {
        "0_input": base,
        "1_url_dedup": kept_url,
        "2_blocklist": surv,
        "3_classifier": kept,
        "4_paragraph_dedup": dedup.selectExpr("doc_id", "kept_text AS text"),
        "__final": dedup,
    }


def web_curation_pipeline(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, final_text, n_paras, n_kept) for every document that
    survives url-dedup + blocklist + quality gate and has ≥1 non-empty
    extracted paragraph (an all-duplicate doc survives with empty
    final_text — the paragraph contract)."""
    return pipeline_stages(spark, docs)["__final"].selectExpr(
        "doc_id", "kept_text AS final_text", "n_paras", "n_kept"
    )


def curation_funnel(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(stage, n_docs, n_tokens): the curation funnel — how many
    documents and whitespace tokens survive each stage boundary (the
    observability table every production pipeline reports; stage ids
    sort lexicographically). Each row is a global aggregate of one stage
    relation; at any corpus size this is five counting passes whose
    exchanges carry one partial row per task. Runs the stage builder in
    materialize mode — the shared subtrees execute once, not once per
    branch."""
    from sketchlib.textops import token_count_sql

    tok = token_count_sql("spark")
    stages = pipeline_stages(spark, docs, materialize=True)
    outs = []
    for stage, df in stages.items():
        if stage == "__final":
            continue
        outs.append(
            df.agg(
                F.count(F.lit(1)).alias("__n"),
                F.expr(f"CAST(coalesce(sum({tok}), 0) AS BIGINT)").alias("__t"),
            ).selectExpr(
                f"'{stage}' AS stage",
                "CAST(__n AS BIGINT) AS n_docs",
                "__t AS n_tokens",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
