"""Fixed-seed slice of the differential fuzzer (tools/fuzz_differential.py).

The CI slice pins a deterministic batch of generated queries — same seed,
same index range, same literal pools (sf0.001 is immutable driver data) — so
a regression in any shared translation convention (decimal sums, null
ordering, timestamp handling, set-op multiplicity) shows up as a concrete
failing (seed, index) that reproduces from the CLI:

    python tools/fuzz_differential.py --seed ci --emit <i>
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fuzz_differential import SHAPES, build_pools, gen_query, run_campaign


SEED = "ci"


def test_generator_is_deterministic(sf_small):
    pools = build_pools(sf_small)
    a = [gen_query(SEED, i, pools) for i in range(20)]
    b = [gen_query(SEED, i, pools) for i in range(20)]
    assert a == b


def test_every_shape_is_reachable(sf_small):
    pools = build_pools(sf_small)
    seen = set()
    for shape in SHAPES:
        q = gen_query(SEED, 0, pools, shapes=[shape])
        assert q.upper().startswith("SELECT")
        seen.add(shape)
    assert seen == set(SHAPES)


@pytest.mark.parametrize("shapes", [None])
def test_fixed_seed_batch_matches_duckdb(spark, sf_small, shapes):
    out = run_campaign(spark, sf_small, n=40, seed=SEED, shapes=shapes)
    assert out["fail"] == 0, out["failures"]
    assert out["err"] == 0, out["errors"]
    assert out["ok"] == 40
