"""End-to-end training-data pipeline: the engine's LLM-data operators
composed through the Stage/Pipeline runner (reference's flow-of-subflows
shape) into the canonical corpus-preparation flow:

    load -> near-dup clustering -> keep best per cluster
         -> decontaminate vs held-out source -> deterministic split
         -> land split-partitioned parquet

Each boundary is asserted: keeper count == cluster count, no contaminated
doc survives, split assignment is total and deterministic, and the landed
dataset partition-prunes on `split`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_zoomcamp_my_test_spark.operators.dedup import (
    c43_keep_best_per_cluster,
    c47_hash_split,
    decontaminate,
)
from data_engineering_zoomcamp_my_test_spark.pipeline import Pipeline
from data_engineering_zoomcamp_my_test_spark.sinks import write_parquet
from data_engineering_zoomcamp_my_test_spark.sources.tables import load_table


def test_training_corpus_pipeline(spark, sf_small, tmp_path):
    out_dir = str(tmp_path / "corpus")
    pipe = Pipeline("training_corpus")

    @pipe.stage("load", retries=0)
    def load(ctx):
        docs = load_table(spark, ctx["sf_dir"], "documents")
        return {"n_docs": docs.count()}

    @pipe.stage("keep_best", retries=0)
    def keep_best(ctx):
        keepers = c43_keep_best_per_cluster(spark, ctx["sf_dir"])
        keepers.createOrReplaceTempView("keepers")
        return {"n_keepers": keepers.count()}

    @pipe.stage("decontaminate", retries=0)
    def decon(ctx):
        docs = load_table(spark, ctx["sf_dir"], "documents")
        kept = docs.join(
            spark.table("keepers").select(
                F.col("kept_doc_id").alias("doc_id")
            ),
            "doc_id",
        )
        dirty = decontaminate(
            kept.filter(F.col("source") != "src0"),
            docs.filter(F.col("source") == "src0"),
        ).select("doc_id")
        clean = kept.filter(F.col("source") != "src0").join(
            dirty, "doc_id", "left_anti"
        )
        clean.createOrReplaceTempView("clean_corpus")
        return {"n_clean": clean.count(), "n_dirty": dirty.count()}

    @pipe.stage("split_and_land", retries=0)
    def land(ctx):
        splits = c47_hash_split(spark, ctx["sf_dir"]).select("doc_id", "split")
        final = spark.table("clean_corpus").join(splits, "doc_id")
        write_parquet(final, out_dir, partition_by=["split"])
        return {"n_landed": final.count()}

    ctx = pipe.run({"sf_dir": sf_small})

    # keeper list is one per cluster and no larger than the corpus
    assert 0 < ctx["n_keepers"] <= ctx["n_docs"]
    # decontamination only ever removes docs
    assert ctx["n_clean"] + ctx["n_dirty"] >= ctx["n_landed"]
    assert ctx["n_landed"] == ctx["n_clean"]

    back = spark.read.parquet(out_dir)
    # nothing contaminated survived: re-run the check on the landed data
    docs = load_table(spark, sf_small, "documents")
    recheck = decontaminate(
        back.select("doc_id", "source", "text"),
        docs.filter(F.col("source") == "src0"),
    )
    assert recheck.count() == 0, "contaminated docs leaked into the corpus"
    # split column is total + the landed layout partition-prunes on it
    assert back.filter(F.col("split").isNull()).count() == 0
    plan = back.filter(F.col("split") == "train")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters")[1][:200]
    # deterministic: same split assignment on a second run
    again = c47_hash_split(spark, sf_small).select("doc_id", "split")
    first = {r.doc_id: r.split for r in back.select("doc_id", "split").collect()}
    second = {r.doc_id: r.split for r in again.collect()}
    assert all(second[d] == s for d, s in first.items())


def test_corpus_export_pipeline(spark, sf_small, tmp_path):
    """Round-5 export path: repetition filter -> mixture weights ->
    sequence packing -> deterministic shard layout -> shard-partitioned
    land. Repetitive junk docs are injected so the quality gate has real
    work; every boundary is asserted, and the landed layout must
    partition-prune on shard_id."""
    from data_engineering_zoomcamp_my_test_spark.operators.text import (
        mixture_weights,
        pack_sequences,
        repetition_stats,
        shard_assign,
    )

    out_dir = str(tmp_path / "shards")
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "text", "source"
    )
    junk = spark.createDataFrame(
        [(10_000_000 + i, "spam " * 49 + "spam", "srcjunk") for i in range(20)],
        "doc_id long, text string, source string",
    )
    corpus = docs.unionByName(junk)

    stats = repetition_stats(corpus)
    kept = corpus.join(
        stats.filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    n_corpus, n_kept = corpus.count(), kept.count()
    # the gate drops every junk doc (top_word_frac = 1.0) and only them
    assert n_kept == n_corpus - 20
    assert kept.filter(F.col("source") == "srcjunk").count() == 0

    weights = {r["source"]: r for r in mixture_weights(kept).collect()}
    assert abs(sum(r["mix_weight"] for r in weights.values()) - 1.0) < 1e-4
    assert "srcjunk" not in weights

    packed = pack_sequences(kept, seq_len=128)
    assert packed.filter(F.col("seq_id").isNull()).count() == 0

    sharded = kept.join(shard_assign(kept, n_shards=8), "doc_id")
    write_parquet(sharded, out_dir, partition_by=["shard_id"])

    back = spark.read.parquet(out_dir)
    assert back.count() == n_kept  # nothing lost or duplicated in the land
    # dense positions 0..n-1 inside every shard survive the round-trip
    per_shard = (
        back.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("shard_pos").alias("mx"),
            F.min("shard_pos").alias("mn"),
        )
        .collect()
    )
    assert len(per_shard) == 8
    for r in per_shard:
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1
    plan = (
        back.filter(F.col("shard_id") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "shard_id" in plan.split("PartitionFilters")[1][:200]
