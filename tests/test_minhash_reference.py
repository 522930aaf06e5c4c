"""Engine-independent value verification of the JVM MinHash hot path (c33).

The c33 decl was rows-only: DuckDB cannot express Spark's xxhash64/Murmur3
hash family, so no SQL oracle exists. These tests close that gap with a
pure-Python reference (tests/reference_hashes.py) built from the public
XXH64 and Murmur3_x86_32 specifications:

1. the hash primitives match Spark's ``xxhash64`` / ``hash`` expressions
   bit-for-bit across length classes and edge cases;
2. the FULL c33 banded output at sf0.001 (500 docs x 8 bands) matches the
   reference recomputation row-for-row.

tools/minhash_oracle_check.py runs the same comparison as a deterministic
sample at any generated decade (sf1/sf10/sf100).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_engineering_zoomcamp_my_test_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_bands,
    minhash_bands_jvm,
)
from data_engineering_zoomcamp_my_test_spark.sources.tables import load_table

from .reference_hashes import (
    lsh_candidate_pairs_ref,
    minhash_bands_ref,
    minhash_bands_udf_ref,
    murmur3_hash_long_array,
    xxh64_signed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hash_vectors(spark):
    strs = [
        "",  # empty (len 0)
        "a",  # single byte
        "1234567",  # 7B: tail-only, 4B + bytes
        "12345678",  # 8B: one 8-byte lane
        "x" * 31,  # just below the 32B stripe loop
        "y" * 32,  # exactly one stripe
        "z" * 100,  # stripes + 8B + 4B + tail
        "the quick brown fox jumps over the lazy dog",
        "café über 中文 \U0001f600",  # multi-byte UTF-8
        " leading and trailing ",
    ]
    arrs = [
        [0],
        [1, 2, 3, 4],
        [-1, -(2**63), 2**63 - 1],
        [42] * 7,
        [1234567890123456789, -987654321098765432],
    ]
    sdf = spark.createDataFrame([(s,) for s in strs], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    adf = spark.createDataFrame([(a,) for a in arrs], "arr: array<long>").select(
        "arr", F.hash("arr").alias("h")
    )
    return sdf.collect(), adf.collect()


def test_xxh64_matches_spark(hash_vectors):
    srows, _ = hash_vectors
    for r in srows:
        assert xxh64_signed(r["s"].encode("utf-8")) == r["h"], repr(r["s"])


def test_murmur3_long_array_matches_spark(hash_vectors):
    _, arows = hash_vectors
    for r in arows:
        assert murmur3_hash_long_array(list(r["arr"])) == r["h"], r["arr"]


@pytest.fixture(scope="module")
def corpus_texts(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}


def test_c33_full_corpus_matches_reference(spark, corpus_texts):
    docs = load_table(spark, SF_DIR, "documents")
    got = {}
    for r in minhash_bands_jvm(docs).collect():
        got.setdefault(r["doc_id"], []).append((r["band"], r["band_hash"]))
    assert set(got) == set(corpus_texts)
    for doc_id, text in corpus_texts.items():
        assert sorted(got[doc_id]) == minhash_bands_ref(text), f"doc {doc_id}"


def test_c6_udf_full_corpus_matches_reference(spark, corpus_texts):
    docs = load_table(spark, SF_DIR, "documents")
    got = {}
    for r in minhash_bands(docs).collect():
        got.setdefault(r["doc_id"], []).append((r["band"], r["band_hash"]))
    assert set(got) == set(corpus_texts)
    for doc_id, text in corpus_texts.items():
        assert sorted(got[doc_id]) == minhash_bands_udf_ref(text), f"doc {doc_id}"


def test_c6_lsh_dup_pairs_match_reference(spark, corpus_texts):
    """The engine's collapse+expand candidate-pair pipeline must equal the
    direct quadratic bucket formulation computed from reference bands."""
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in lsh_candidate_pairs(docs).collect()
    }
    assert got == lsh_candidate_pairs_ref(corpus_texts)
