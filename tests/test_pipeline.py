"""Pipeline-runner semantics (SURVEY.md §2 A19-A22): retries, input-hash
caching with TTL, fan-out, and a full flow composition over Spark stages."""

from __future__ import annotations

import pytest

from data_engineering_zoomcamp_my_test_spark.pipeline import (
    Pipeline,
    Stage,
    fan_out,
    input_hash,
)


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky(ctx):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return {"ok": True}

    st = Stage("flaky", flaky, retries=3, retry_wait_s=0.0)
    assert st.run({}, {}) == {"ok": True}
    assert calls["n"] == 3


def test_retry_exhaustion_raises():
    def always(ctx):
        raise RuntimeError("hard")

    st = Stage("always", always, retries=2, retry_wait_s=0.0)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        st.run({}, {})


def test_cache_skips_recompute():
    calls = {"n": 0}

    def expensive(ctx):
        calls["n"] += 1
        return {"out": ctx["x"] * 2}

    p = Pipeline("cachey", [Stage("exp", expensive, cache=True)])
    assert p.run({"x": 21})["out"] == 42
    assert p.run({"x": 21})["out"] == 42
    assert calls["n"] == 1  # second run was a cache hit
    assert p.run({"x": 5})["out"] == 10  # different input -> recompute
    assert calls["n"] == 2


def test_cache_ttl_expiry():
    calls = {"n": 0}

    def fn(ctx):
        calls["n"] += 1
        return {"v": calls["n"]}

    p = Pipeline("ttl", [Stage("s", fn, cache=True, cache_ttl_s=0.0)])
    p.run({"x": 1})
    p.run({"x": 1})
    assert calls["n"] == 2  # ttl=0 -> always stale


def test_input_hash_stability():
    assert input_hash("a", 1, k=2) == input_hash("a", 1, k=2)
    assert input_hash("a", 1) != input_hash("a", 2)


def test_fan_out_runs_per_param_set():
    seen = []

    def record(ctx):
        seen.append(ctx["url"])
        return {}

    p = Pipeline("fan", [Stage("rec", record)])
    fan_out(p, [{"url": "u1"}, {"url": "u2"}, {"url": "u3"}])
    assert seen == ["u1", "u2", "u3"]


def test_spark_flow_composition(spark, sf_small, tmp_path):
    """mainflow shape: collect+store -> query+transform -> publish."""
    from data_engineering_zoomcamp_my_test_spark.operators.transforms import (
        with_literal_column,
    )
    from data_engineering_zoomcamp_my_test_spark.plans import run_sql
    from data_engineering_zoomcamp_my_test_spark.sinks import write_parquet

    p = Pipeline("mainflow")

    @p.stage("collect_store")
    def collect_store(ctx):
        df = spark.read.parquet(f"{ctx['sf_dir']}/orders.parquet")
        df.createOrReplaceTempView("orders_in")
        return {}

    @p.stage("query_transform")
    def query_transform(ctx):
        q = run_sql(spark, "SELECT * FROM orders_in WHERE o_orderstatus = 'O'")
        ctx["df"] = with_literal_column(q)
        return {}

    @p.stage("publish")
    def publish(ctx):
        out = str(tmp_path / "orders_o")
        write_parquet(ctx["df"], out)
        return {"out_path": out, "n": spark.read.parquet(out).count()}

    result = p.run({"sf_dir": sf_small})
    assert result["n"] > 0
    assert spark.read.parquet(result["out_path"]).columns[-1] == "transformation"


def test_load_deployment_yaml_fanout_and_none_normalization(tmp_path):
    """Deployment YAML in the reference's shape: flow-style parameters with
    a leaked Python 'None', a list-valued param that fans out per element,
    entrypoint-derived flow name, and a cron schedule mapping."""
    from data_engineering_zoomcamp_my_test_spark.pipeline import (
        Pipeline,
        load_deployment,
    )

    spec = tmp_path / "dep.yaml"
    spec.write_text(
        "name: PARAMETRIZED\n"
        "description: run the whole pipeline\n"
        'parameters: {"name_table": "t1", "if_exists": "replace", '
        '"url": ["u1", "u2", "u3"], "sql_query": None}\n'
        "schedule:\n  cron: '0 3 * * *'\n"
        "entrypoint: parametrized.py:mainflow\n"
    )
    dep = load_deployment(str(spec))
    assert dep.name == "PARAMETRIZED"
    assert dep.flow_name == "mainflow"
    assert dep.cron == "0 3 * * *"
    assert dep.parameters["sql_query"] is None  # 'None' string normalized

    sets = dep.param_sets()
    assert [p["url"] for p in sets] == ["u1", "u2", "u3"]
    assert all(p["name_table"] == "t1" and p["sql_query"] is None for p in sets)

    seen = []
    pipe = Pipeline("dep-test")

    @pipe.stage("record", retries=0)
    def record(ctx):
        seen.append(ctx["url"])
        return {"done": True}

    results = dep.run(pipe)
    assert seen == ["u1", "u2", "u3"]
    assert all(r["done"] for r in results)


def test_load_deployment_null_schedule_no_lists(tmp_path):
    from data_engineering_zoomcamp_my_test_spark.pipeline import load_deployment

    spec = tmp_path / "dep2.yaml"
    spec.write_text(
        "name: simple\nparameters: {\"a\": 1}\nschedule: null\n"
        "flow_name: myflow\n"
    )
    dep = load_deployment(str(spec))
    assert dep.cron is None and dep.flow_name == "myflow"
    assert dep.param_sets() == [{"a": 1}]
