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
    hash check); verified entries whose implementation module changed
    since their verification round come next (VERDICT r8 item 6 —
    the r3 events-timestamp incident class); merely-stale verified
    entries close, each verified group in ascending last-verified
    round so the window's spare slots re-check the stalest green rows
    instead of trusting them forever."""
    from nyc_taxi_data_clickhouse_spark import suite

    reg = suite.registry()
    order = list(reg)
    rounds = suite._driver_verified_rounds()

    def group(name: str) -> int:
        if name not in rounds:
            return 0
        rel = suite._entry_module_relpath(reg[name])
        changed = rel is not None and rel in suite._files_changed_since_round(
            rounds[name]
        )
        return 1 if changed else 2

    groups = [group(n) for n in order]
    assert groups == sorted(groups), "group order violated (0 < 1 < 2)"
    for g in (1, 2):
        members = [n for n in order if group(n) == g]
        member_rounds = [rounds[n] for n in members]
        assert member_rounds == sorted(member_rounds), (
            f"group {g} not stalest-first: {list(zip(members, member_rounds))[:6]}"
        )


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
