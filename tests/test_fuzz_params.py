"""Fixed-seed slice of the parameter fuzzer (tools/fuzz_params.py).

The catalog referees each Tier-C operator at one fixed parameter point;
this slice pins a deterministic batch of random-parameter calls against
the parameter-templated DuckDB oracles, so a regression in parameter
handling (gap arithmetic, percentile bounds, window-width alignment,
salted-vs-window top-k arms) reproduces from the CLI:

    python tools/fuzz_params.py --seed ci --emit <i>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_params import OPERATORS, gen_case, run_campaign

SEED = "ci"


def test_case_generator_is_deterministic():
    a = [gen_case(SEED, i)[:2] for i in range(30)]
    b = [gen_case(SEED, i)[:2] for i in range(30)]
    assert a == b


def test_every_operator_is_reachable():
    seen = set()
    for name in OPERATORS:
        got, params, entry = gen_case(SEED, 0, ops=[name])
        assert got == name and isinstance(params, dict)
        sql = entry["oracle"](params)
        assert sql.strip().upper().startswith(("SELECT", "WITH"))
        seen.add(name)
    assert seen == set(OPERATORS)


def test_fixed_seed_batch_matches_duckdb(spark, sf_small):
    out = run_campaign(spark, sf_small, n=18, seed=SEED)
    assert out["fail"] == 0, out["failures"]
    assert out["err"] == 0, out["errors"]
    assert out["ok"] == 18
    # the batch must exercise more than half the registry
    assert len(out["per_op"]) >= len(OPERATORS) // 2 + 1, out["per_op"]


def test_moments_drawers_fixed_seed_slice(spark, sf_small):
    """The c84/c85 exact moments twins are the DuckDB certification of
    the whole SimHash/MinHash rows-only family, and their oracles are
    TEMPLATED over the drawn width parameters (bits / k / n_bands) —
    regression-pin the width-fuzzed templating in CI, not only in
    campaigns (VERDICT r11 #6).  The n=18 batch above draws operators at
    random, so these two are pinned explicitly."""
    out = run_campaign(
        spark,
        sf_small,
        n=6,
        seed=SEED,
        ops=["simhash_moments", "minhash_moments"],
    )
    assert out["fail"] == 0, out["failures"]
    assert out["err"] == 0, out["errors"]
    assert out["ok"] == 6
    assert set(out["per_op"]) == {"simhash_moments", "minhash_moments"}


def test_chunk_windows_validates_coverage_contract(spark, sf_small):
    """stride outside [1, window] raises instead of silently skipping
    tokens / emitting the zero-token tail chunk whose representation is
    engine-dependent (found by probing outside the contract)."""
    import pytest

    from data_engineering_zoomcamp_my_test_spark.operators.text import chunk_windows
    from data_engineering_zoomcamp_my_test_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    with pytest.raises(ValueError, match="stride"):
        chunk_windows(docs, window=4, stride=6)
    with pytest.raises(ValueError, match="stride"):
        chunk_windows(docs, window=4, stride=0)
    # boundary values are legal
    assert chunk_windows(docs, window=4, stride=4).count() > 0
    assert chunk_windows(docs, window=4, stride=1).count() > 0


def test_graph_and_ranking_drawers_fixed_seed_slice(spark, sf_small):
    """The r12 drawers — pagerank (iteration count x damping, oracle
    unrolled to the SAME depth) and bm25 (k1 x b x query-term set,
    absent-term draws must be empty on both engines) — pinned in CI the
    same way the moments drawers are, so the templated oracles cannot
    regress between campaigns."""
    out = run_campaign(
        spark, sf_small, n=6, seed=SEED, ops=["pagerank", "bm25"]
    )
    assert out["fail"] == 0, out["failures"]
    assert out["err"] == 0, out["errors"]
    assert out["ok"] == 6
    assert set(out["per_op"]) == {"pagerank", "bm25"}


def test_triangles_drawer_fixed_seed_slice(spark, sf_small):
    """The r13 triangles drawer: graph-shape draws (mod-collapse density,
    md5 edge sparsification) x physical plan (id-ordered 3-way self-join
    vs degree-ordered orientation), every draw refereed against the same
    templated id-ordered oracle — pins that the two exact plans stay
    interchangeable as code evolves."""
    out = run_campaign(spark, sf_small, n=6, seed=SEED, ops=["triangles"])
    assert out["fail"] == 0, out["failures"]
    assert out["err"] == 0, out["errors"]
    assert out["ok"] == 6
    # the seeded slice must actually exercise BOTH physical plans
    from tools.fuzz_params import gen_case

    impls = {gen_case(SEED, i, ["triangles"])[1]["impl"] for i in range(6)}
    assert impls == {"id", "oriented"}
