"""Global physical-plan invariants over the whole suite registry.

Two things must never appear in any entry's plan, at any scale:

- ``CartesianProduct`` — an unkeyed cross product is quadratic in
  input size; every candidate-pair operator here is designed around an
  equi-joinable key (shingle hash, LSH band, IVF cell) precisely to
  avoid it.  BroadcastNestedLoopJoin is allowed: the range/theta joins
  use it deliberately with a broadcast-small side.
- ``BatchEvalPython`` — the row-at-a-time Python UDF evaluator
  (SURVEY §2.10: the reference's trans.py shape).  All Python in this
  engine crosses the boundary via Arrow (``ArrowEvalPython`` /
  ``FlatMapGroupsInPandas`` / ``MapInPandas``), which is the
  sanctioned slow path.

Streaming-backed entries execute a query to produce their result
DataFrame, so they are planned here at the smallest scale factor.
"""

from __future__ import annotations

import pytest

from nyc_taxi_data_clickhouse_spark import suite
from tests.conftest import SF_SMOKE

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def _cases():
    return sorted(suite.registry().items())


@pytest.mark.parametrize("name,spec", _cases(), ids=[n for n, _ in _cases()])
def test_no_forbidden_physical_operators(spark, name, spec):
    df = spec.spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in FORBIDDEN:
        assert op not in plan, f"{name} plans {op}:\n{plan[:1500]}"
