"""Oracle parity at GENERATED scale (sf1, ~6M lineitem rows) — the
correctness half of the scale story (BASELINE.md "Scale story").

Runs only when the sf1 data exists (``python tools/gen_sf.py --copies 10
--dst testdata_sf1``); the driver gate at sf0.01 covers every decl, this
sweep re-proves a representative subset at 100x that scale, where decimal
magnitudes cross the 2^53 double boundary and exact-duplicate groups are
10-deep (both found real bugs: b3's sum_charge ulp drift, the pairwise
operators' c^2 copy blowup).

Subset = oracles that stay tractable in DuckDB at 6M rows and finish in
seconds (the pairwise/recursive oracles are quadratic in DuckDB itself and
are covered by differential tests + the sf0.01 gate).
"""

from __future__ import annotations

import os

import pytest

from data_engineering_zoomcamp_my_test_spark.operators import (
    all_oracle_sql,
    all_queries,
)

from .oracle import compare

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/testdata_sf1")

TRACTABLE = [
    "b3_groupby_agg",
    "b7_join_multiway",
    "b14_win_rank",
    "b18_topk",
    "c1_dedup_exact",
    "c5_text_stats",
    "c7_tumbling",
    "c47_hash_split",
    # round-5 additions, proven tractable at sf1 (BASELINE.md round-5 notes)
    "b47_q14_promo_revenue",
    "b48_q19_disjunctive",
    "b49_q7_volume_shipping",
    "c75_bigram_logprob",
    "c76_label_centroid_cosine",
    "c77_mad_anomaly",
    "c81_group_trend",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF1_DIR),
    reason="sf1 testdata not generated (python tools/gen_sf.py --dst testdata_sf1)",
)


@pytest.mark.parametrize("name", TRACTABLE)
def test_sf1_parity(spark, name):
    res = compare(
        name, all_queries()[name](spark, SF1_DIR), all_oracle_sql()[name], SF1_DIR
    )
    assert res.ok, f"{name}: {res.mismatches}"
