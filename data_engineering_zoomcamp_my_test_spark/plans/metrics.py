"""Execution observability: read physical SQL metrics (rows, shuffle
bytes, spill) off the executed plan after an action — the measure-don't-
guess loop for plan tuning, without needing the Spark UI.

Traverses the JVM plan tree via py4j; under AQE the final plan is unwrapped
from AdaptiveSparkPlanExec. Metric names mirror the UI ("shuffle bytes
written", "number of output rows", ...), summed across operators by name.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_LOG = logging.getLogger(__name__)


def _node_label(node) -> str:
    """Best-effort JVM class name for debug logs.  Its own guard because
    ``getClass()`` is a Py4J round-trip that can itself throw on a stale
    JVM handle — a failing LABEL must never abort the metric walk that
    was tolerating the node in the first place (ADVICE r11)."""
    try:
        return node.getClass().getSimpleName()
    except Exception:  # noqa: BLE001 - stale/odd JVM handle
        return type(node).__name__


def _iter_children(node):
    ch = node.children()
    for i in range(ch.size()):
        yield ch.apply(i)
    # AQE wrapper / query-stage nodes hide the real subtree behind accessors
    for accessor in ("executedPlan", "plan"):
        if hasattr(node, accessor):
            try:
                inner = getattr(node, accessor)()
                if inner is not None and inner is not node:
                    yield inner
            except Exception as exc:  # noqa: BLE001 - accessor shape varies by node
                if _LOG.isEnabledFor(logging.DEBUG):
                    _LOG.debug(
                        "plan-walk: %s.%s() unreadable (%s); subtree skipped",
                        _node_label(node),
                        accessor,
                        exc,
                    )


def _walk(node, acc: dict[str, int]) -> None:
    try:
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metric = kv._2()
            name = metric.name().get() if metric.name().isDefined() else kv._1()
            acc[name] = acc.get(name, 0) + metric.value()
    except Exception as exc:  # noqa: BLE001 - some wrapper nodes carry no metrics
        if _LOG.isEnabledFor(logging.DEBUG):
            _LOG.debug(
                "plan-walk: metrics unreadable on %s (%s); node skipped",
                _node_label(node),
                exc,
            )
    for child in _iter_children(node):
        _walk(child, acc)


def run_with_metrics(df: DataFrame) -> dict[str, int]:
    """Execute ``df`` fully and return the summed physical metrics of its
    executed plan, e.g. ``number of output rows``, ``shuffle bytes
    written``, ``spill size``. Keys exist only for metrics the plan
    actually produced.

    The plan is driven via ``executedPlan().execute().count()`` — an RDD
    action on the *exact* physical tree we then read metrics from (a
    DataFrame ``.count()`` would compile a different query whose metrics
    live elsewhere), and rows never materialize on the driver."""
    plan = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
    plan.execute().count()
    acc: dict[str, int] = {}
    _walk(plan, acc)
    return acc


def shuffle_bytes(df: DataFrame) -> int:
    """Convenience: total shuffle bytes written by executing ``df`` — the
    single most scale-relevant number for a plan."""
    return run_with_metrics(df).get("shuffle bytes written", 0)
