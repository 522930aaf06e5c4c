"""End-to-end corpus curation: the composed pretraining-data pipeline.

The reference repo's pipelines are multi-stage flows (ingest -> clean ->
load, e.g. ``week_2/data_ingest/data_ingest.py``'s fetch/clean/write chain);
this module is the training-data analogue at engine level: ONE declared
operator that runs the whole document-curation recipe a pretraining corpus
goes through, built entirely from the already-verified stage operators —

  1. quality gate        (c16's score + a minimum length)      — scan-side
  2. language gate       (c15's stopword-ratio heuristic)      — scan-side
  3. normalized dedup    (c2's min-doc_id-per-normalized-text) — 1 shuffle
  4. decontamination     (c46's shingle overlap vs held-out,
                          thresholded into a drop decision)    — broadcast
  5. token-budget mix    (c49's hash-ordered per-source cap)   — 1 shuffle
  6. shard export layout (c59's portable-hash shard/pos)       — 1 shuffle

Every stage is exact and deterministic, so the WHOLE pipeline carries a
full DuckDB oracle: the composition itself — stage ordering, column
hand-off, survivor semantics — is hash-verified end-to-end, not just the
parts.

100 TB posture: stages 1-2 are predicates inside the scan's
WholeStageCodegen (no Python, no shuffle — they prune the corpus before
anything pays a network hop). Stage 3 is one window shuffle keyed on the
normalized text. Stage 4 broadcasts only the held-out benchmark's distinct
shingles (eval sets are small by construction) and joins the per-doc hit
counts back on doc_id — the corpus is never self-joined. Stages 5-6 are one
keyed window each over the (already heavily pruned) survivor set. Total:
four shuffles over monotonically shrinking relations, zero Python rows,
zero collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    english_stopword_hits,
    normalized_text,
    token_count,
)
from ..lineage import cut as lineage_cut
from ..sources.tables import load_table
from .dedup import _SHINGLE_SET_EXPR
from .text import _HITS, _NTOK, shard_assign


def curate_corpus(
    corpus: DataFrame,
    heldout: DataFrame,
    *,
    min_tokens: int = 5,
    min_stopword_ratio: float = 0.03,
    min_quality: float = 0.32,
    max_shared_shingles: int = 7,
    budget_tokens: int = 800,
    n_shards: int = 16,
) -> DataFrame:
    """Run the full curation pipeline; returns the surviving documents with
    their training-export placement: (doc_id, source, n_tok, shard_id,
    shard_pos).

    ``max_shared_shingles`` is the contamination tolerance: a document
    sharing MORE distinct 3-token shingles than this with the held-out set
    is dropped (incidental phrase overlap is expected in any corpus; a
    near-copy of a benchmark item shares nearly all of its shingles).
    """
    ntok = token_count("text").cast("double")
    hits = english_stopword_hits("text").cast("double")
    stop_ratio = hits / ntok
    quality = stop_ratio * F.lit(0.5) + (
        F.lit(1.0)
        / (F.lit(1.0) + F.abs(F.col("n_chars").cast("double") / ntok - F.lit(5.0)))
    ) * F.lit(0.5)

    # Stages 1+2: pure scan-side predicates — pruned before any shuffle.
    gated = corpus.filter(
        (ntok >= min_tokens)
        & (stop_ratio >= min_stopword_ratio)
        & (quality >= min_quality)
    )

    # Stage 3: normalized exact dedup, keep the minimum doc_id per group.
    # One window shuffle; no join back (the window carries the row).
    from pyspark.sql.window import Window

    nt = normalized_text("text")
    w = Window.partitionBy("nt")
    # localCheckpoint: ``deduped`` feeds two consumers (the shingle-hits
    # branch and the survivor join) and Spark does not reuse the window
    # exchange across them — without materialization the corpus scan +
    # dedup shuffle would run TWICE (verified in the executed plan:
    # duplicate Exchange(nt) nodes). One materialization of the pruned
    # survivor set beats a second full-corpus pass at any scale.
    deduped = (
        gated.withColumn("nt", nt)
        .withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("rep"))
        .drop("nt", "rep")
        .transform(lineage_cut)
    )

    # Stage 4: decontamination. Held-out distinct shingles broadcast; the
    # per-doc overlap count joins back LEFT so zero-overlap docs survive
    # without appearing on the (small) hits side.
    held_sh = F.broadcast(
        heldout.select(F.explode(F.expr(_SHINGLE_SET_EXPR)).alias("sh")).distinct()
    )
    hits_per_doc = (
        deduped.select("doc_id", F.explode(F.expr(_SHINGLE_SET_EXPR)).alias("sh"))
        .join(held_sh, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    clean = (
        deduped.join(hits_per_doc, "doc_id", "left")
        .filter(
            F.coalesce(F.col("n_shared"), F.lit(0)) <= max_shared_shingles
        )
        .drop("n_shared")
    )

    # Stage 5: token-budget mix — content-hash admission order per source
    # (same parity contract as c49/c50: md5(text), doc_id tiebreak).
    wsrc = (
        Window.partitionBy("source")
        .orderBy(F.md5("text"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ntok_i = token_count("text")
    mixed = (
        clean.select(
            "doc_id",
            "source",
            ntok_i.cast("int").alias("n_tok"),
            F.sum(ntok_i.cast("long")).over(wsrc).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= budget_tokens)
        .drop("cum_tokens")
    )

    # Stage 6: deterministic shard export layout over the final mix.
    return shard_assign(mixed, n_shards=n_shards, keep_cols=("source", "n_tok"))


def c64_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'src0' plays the held-out benchmark; every other source is raw
    corpus. The output is the finished training mix: which documents
    survived every gate, and exactly where each lands in the export."""
    docs = load_table(spark, sf_dir, "documents")
    return curate_corpus(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    )


QUERIES = {
    "c64_curation_pipeline": c64_curation_pipeline,
}

_SH_SQL = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)), "
    "i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))"
)

ORACLE = {
    "c64_curation_pipeline": f"""
        WITH gated AS (
          SELECT doc_id, source, text,
                 trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                     ' +', ' ', 'g')) AS nt
          FROM documents
          WHERE source <> 'src0'
            AND {_NTOK} >= 5
            AND {_HITS} / {_NTOK} >= 0.03
            AND ({_HITS} / {_NTOK}) * 0.5
                + (1.0 / (1.0 + ABS(CAST(n_chars AS DOUBLE) / {_NTOK} - 5.0))) * 0.5
                >= 0.32
        ),
        deduped AS (
          SELECT doc_id, source, text FROM (
            SELECT *, MIN(doc_id) OVER (PARTITION BY nt) AS rep FROM gated
          ) WHERE doc_id = rep
        ),
        held_sh AS (
          SELECT DISTINCT unnest({_SH_SQL}) AS sh
          FROM documents WHERE source = 'src0'
        ),
        corp_sh AS (
          SELECT doc_id, unnest({_SH_SQL}) AS sh FROM deduped
        ),
        hits AS (
          SELECT doc_id, COUNT(*) AS n_shared
          FROM corp_sh JOIN held_sh USING (sh) GROUP BY doc_id
        ),
        clean AS (
          SELECT d.* FROM deduped d LEFT JOIN hits USING (doc_id)
          WHERE COALESCE(hits.n_shared, 0) <= 7
        ),
        mixed AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS INT) AS n_tok
          FROM (
            SELECT *, SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
                     PARTITION BY source ORDER BY md5(text), doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens
            FROM clean
          ) WHERE cum_tokens <= 800
        ),
        h AS (
          SELECT doc_id, source, n_tok,
                 (doc_id * 2654435761) % 4294967296 AS h
          FROM mixed
        )
        SELECT doc_id, source, n_tok,
               CAST(h % 16 AS INT) AS shard_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY h % 16 ORDER BY h, doc_id) - 1 AS BIGINT)
                 AS shard_pos
        FROM h
    """,
}
