"""Plain-Python pipeline runner with the reference's orchestration semantics
(SURVEY.md §2 A19-A22, §7.4).

The reference used Prefect tasks/flows with ``retries=3`` and
``cache_key_fn=task_input_hash, cache_expiration=timedelta(days=1)``
(reference week_2/data_ingest_gcp/data_ingest.py:29) plus a URL-list fan-out
that re-ran the whole flow per element (parametrized.py:386-402). Here those
semantics are a small scheduler-free runner composing Spark jobs:

- ``Stage``: a named callable with bounded retries and optional input-hash
  caching (skip-if-cached with TTL);
- ``Pipeline``: runs stages in order, threading a context dict;
- ``fan_out``: runs a pipeline once per parameter set.

Stage boundaries are Spark actions; within a stage everything stays lazy, so
Catalyst optimizes across the whole stage plan. Caching stores only small
Python results (paths, counts) — never DataFrames — so nothing is
driver-materialized.
"""

from __future__ import annotations

import hashlib
import json
import logging
import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from typing import Any

logger = logging.getLogger(__name__)


def input_hash(*args: Any, **kwargs: Any) -> str:
    """Deterministic hash of JSON-serializable stage inputs (the analog of
    the reference's ``task_input_hash``)."""
    payload = json.dumps([args, sorted(kwargs.items())], default=str, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()


@dataclass
class _CacheEntry:
    value: Any
    stored_at: float


@dataclass
class Stage:
    """One pipeline step: ``fn(ctx) -> dict`` merged into the context."""

    name: str
    fn: Callable[[dict], dict | None]
    retries: int = 3
    retry_wait_s: float = 0.1
    cache: bool = False
    cache_ttl_s: float = 24 * 3600.0
    cache_key_fn: Callable[[dict], str] | None = None

    def run(self, ctx: dict, cache_store: dict[str, _CacheEntry]) -> dict | None:
        key = None
        if self.cache:
            key_fn = self.cache_key_fn or (
                lambda c: input_hash(self.name, {k: c[k] for k in sorted(c) if isinstance(c[k], (str, int, float, bool))})
            )
            key = key_fn(ctx)
            hit = cache_store.get(key)
            if hit is not None and (time.time() - hit.stored_at) < self.cache_ttl_s:
                logger.info("stage %s: cache hit (%s)", self.name, key[:12])
                return hit.value
        last_exc: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                result = self.fn(ctx)
                if key is not None:
                    cache_store[key] = _CacheEntry(result, time.time())
                return result
            except Exception as exc:  # noqa: BLE001 - retry any stage failure
                last_exc = exc
                logger.warning(
                    "stage %s attempt %d/%d failed: %s",
                    self.name, attempt + 1, self.retries + 1, exc,
                )
                if attempt < self.retries:
                    time.sleep(self.retry_wait_s * (2**attempt))
        raise RuntimeError(f"stage {self.name} failed after {self.retries + 1} attempts") from last_exc


@dataclass
class Pipeline:
    """Ordered stage composition (the reference's flow-of-subflows)."""

    name: str
    stages: list[Stage] = field(default_factory=list)
    _cache_store: dict[str, _CacheEntry] = field(default_factory=dict)

    def stage(
        self, name: str, retries: int = 3, cache: bool = False, **kw: Any
    ) -> Callable[[Callable[[dict], dict | None]], Callable[[dict], dict | None]]:
        """Decorator registration, mirroring ``@task`` ergonomics."""

        def deco(fn: Callable[[dict], dict | None]) -> Callable[[dict], dict | None]:
            self.stages.append(Stage(name=name, fn=fn, retries=retries, cache=cache, **kw))
            return fn

        return deco

    def run(self, params: dict | None = None) -> dict:
        ctx = dict(params or {})
        for st in self.stages:
            out = st.run(ctx, self._cache_store)
            if out:
                ctx.update(out)
        return ctx


def fan_out(pipeline: Pipeline, param_sets: Iterable[dict]) -> list[dict]:
    """Run the whole pipeline once per parameter set (A21: the reference
    looped the full flow over a URL list)."""
    return [pipeline.run(p) for p in param_sets]


@dataclass
class Deployment:
    """Parsed deployment spec (the reference's Prefect deployment YAML,
    ``week_2/data_ingest/mainflow-deployment.yaml``): flow name, default
    parameters, optional cron schedule, and the fan-out expansion the
    reference applied to list-valued parameters (its ``url`` list re-ran
    the whole flow per element, parametrized.py:386-402)."""

    name: str
    flow_name: str | None
    parameters: dict
    cron: str | None = None
    description: str = ""

    def param_sets(self) -> list[dict]:
        """Expand every list-valued parameter into one parameter set per
        combination (a single list — the reference's shape — yields one
        set per element; multiple lists take the cartesian product)."""
        import itertools

        scalar = {k: v for k, v in self.parameters.items() if not isinstance(v, list)}
        listed = {k: v for k, v in self.parameters.items() if isinstance(v, list)}
        if not listed:
            return [dict(scalar)]
        keys = sorted(listed)
        out = []
        for combo in itertools.product(*(listed[k] for k in keys)):
            ps = dict(scalar)
            ps.update(zip(keys, combo))
            out.append(ps)
        return out

    def run(self, pipeline: "Pipeline") -> list[dict]:
        """Execute the pipeline once per expanded parameter set."""
        return fan_out(pipeline, self.param_sets())


def load_deployment(path: str) -> Deployment:
    """Load a deployment YAML (reference shape: ``name``, ``parameters``,
    ``schedule``, ``flow_name``/``entrypoint``). Two normalizations the
    reference file itself needs: a bare ``None`` inside the flow-style
    parameters map is YAML's *string* "None" (Python repr leaked into
    YAML) and maps to Python ``None`` here; a schedule may be ``null`` or
    a mapping carrying a ``cron`` key."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover — baked into this env
        raise RuntimeError(
            "deployment YAML support requires pyyaml; install it or build "
            "the Deployment dataclass directly"
        ) from exc

    with open(path) as fh:
        doc = yaml.safe_load(fh)
    params = {
        k: (None if v == "None" else v)
        for k, v in (doc.get("parameters") or {}).items()
    }
    sched = doc.get("schedule")
    cron = sched.get("cron") if isinstance(sched, dict) else None
    flow = doc.get("flow_name")
    if not flow and doc.get("entrypoint"):
        flow = str(doc["entrypoint"]).split(":")[-1] or None
    return Deployment(
        name=str(doc.get("name", "deployment")),
        flow_name=flow,
        parameters=params,
        cron=cron,
        description=str(doc.get("description") or ""),
    )
