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

from data_engineering_zoomcamp_my_test_spark.operators.dedup import minhash_bands_jvm
from data_engineering_zoomcamp_my_test_spark.sources.tables import load_table

from .reference_hashes import (
    minhash_bands_ref,
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


def test_c33_full_corpus_matches_reference(spark):
    docs = load_table(spark, SF_DIR, "documents")
    texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    got = {}
    for r in minhash_bands_jvm(docs).collect():
        got.setdefault(r["doc_id"], []).append((r["band"], r["band_hash"]))
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        assert sorted(got[doc_id]) == minhash_bands_ref(text), f"doc {doc_id}"
