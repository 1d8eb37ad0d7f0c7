"""Runs every registered suite query against its DuckDB oracle at
sf0.01 — a local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from nyc_taxi_data_clickhouse_spark import suite
from tests.oracle_util import compare
from tests.conftest import SF_CORRECTNESS


def _cases():
    return [
        (name, spec) for name, spec in suite.registry().items() if spec.oracle
    ]


@pytest.mark.parametrize("name,spec", _cases(), ids=[n for n, _ in _cases()])
def test_query_matches_oracle(spark, name, spec):
    df = spec.spark(spark, SF_CORRECTNESS)
    result = compare(df, spec.oracle, SF_CORRECTNESS)
    assert result["match"], {k: v for k, v in result.items() if k != "match"}


def _rows_only_cases():
    return [
        (name, spec) for name, spec in suite.registry().items() if spec.oracle is None
    ]


@pytest.mark.parametrize(
    "name,spec", _rows_only_cases(), ids=[n for n, _ in _rows_only_cases()]
)
def test_rows_only_queries_run(spark, name, spec):
    df = spec.spark(spark, SF_CORRECTNESS)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["cnt"] > 0 for r in rows)


def test_queries_oracle_keys_consistent():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_rotation_orders_stalest_verified_first():
    """Never-driver-verified entries come first (they need their first
    hash check), and already-verified entries follow in ascending
    last-verified round, so the driver window's spare slots re-check
    the stalest green rows instead of trusting them forever."""
    from nyc_taxi_data_clickhouse_spark import suite

    order = list(suite.registry())
    rounds = suite._driver_verified_rounds()

    seen_verified = False
    last_round = 0
    for name in order:
        if name not in rounds:
            assert not seen_verified, (
                f"never-verified entry {name} sorted after verified ones"
            )
        else:
            seen_verified = True
            assert rounds[name] >= last_round, (
                f"{name} (r{rounds[name]}) sorted after a fresher entry "
                f"(r{last_round})"
            )
            last_round = rounds[name]


def test_rotation_staleness_bounded():
    """VERDICT r6 item 8: with a ~50-entry driver window over ~177
    entries and stalest-first ordering, no verified entry's green row
    may age more than 4 driver rounds — if this trips, the rotation
    stopped fronting stale entries (or the window shrank) and rows are
    being trusted forever."""
    from nyc_taxi_data_clickhouse_spark import suite

    rounds = suite._driver_verified_rounds()
    if not rounds:
        return  # fresh checkout without driver reports
    latest = max(rounds.values())
    stalest = min(rounds.values())
    assert latest - stalest <= 4, (
        f"stalest driver-green row is {latest - stalest} rounds old "
        f"(r{stalest} vs r{latest})"
    )
