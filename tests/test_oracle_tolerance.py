"""The bounded 1-ulp rounding-flip absorption in oracle_util
(VERDICT r6 item 7): it must absorb last-decimal summation-order
flips on a few rows and NOTHING else."""

from __future__ import annotations

from tests.oracle_util import _last_decimal_unit, _rows_flip_close, _tolerant_match

COLS = ["k", "v"]
ORDER = [0, 1]


def _rows(pairs):
    return [tuple(p) for p in pairs]


def test_accepts_single_last_decimal_flip():
    s = _rows([("a", 51.5113), ("b", 2.0), ("c", 3.25)])
    o = _rows([("a", 51.5112), ("b", 2.0), ("c", 3.25)])
    assert _tolerant_match(COLS, s, COLS, o)


def test_accepts_flip_at_two_decimals():
    # queries that round(…, 2): flip unit is 0.01
    s = _rows([("a", 10.13)])
    o = _rows([("a", 10.12)])
    assert _tolerant_match(COLS, s, COLS, o)


def test_rejects_two_unit_difference():
    s = _rows([("a", 51.5114)])
    o = _rows([("a", 51.5112)])
    assert not _tolerant_match(COLS, s, COLS, o)


def test_rejects_non_numeric_difference():
    s = _rows([("a", 1.0)])
    o = _rows([("b", 1.0)])
    assert not _tolerant_match(COLS, s, COLS, o)


def test_rejects_when_residual_exceeds_cap():
    # 5 flipped rows out of 10 >> max(3, 10//100) -> a systematic
    # defect, not boundary noise
    s = _rows([(f"k{i}", 1.1113) for i in range(5)] + [(f"j{i}", 7.0) for i in range(5)])
    o = _rows([(f"k{i}", 1.1112) for i in range(5)] + [(f"j{i}", 7.0) for i in range(5)])
    assert not _tolerant_match(COLS, s, COLS, o)


def test_accepts_three_flips_in_large_result():
    n = 2000
    s = [(f"k{i}", float(i)) for i in range(n)]
    o = list(s)
    for i in (10, 500, 1500):
        o[i] = (f"k{i}", float(i) + 0.1)  # x.0 repr: last-decimal unit = 0.1
    assert _tolerant_match(COLS, _rows(s), COLS, _rows(o))
    # flips beyond the 1% cap (20 rows) must fail
    for i in range(100, 121):
        o[i] = (f"k{i}", float(i) + 0.1)
    assert not _tolerant_match(COLS, _rows(s), COLS, _rows(o))


def test_rejects_row_count_mismatch():
    assert not _tolerant_match(COLS, _rows([("a", 1.0)]), COLS, [])


def test_column_order_independent():
    s = [("a", 5.1113)]
    o_swapped_cols = [(5.1112, "a")]
    assert _tolerant_match(["k", "v"], s, ["v", "k"], o_swapped_cols)


def test_last_decimal_unit():
    assert _last_decimal_unit(51.5113, 51.5112) == 1e-4
    assert _last_decimal_unit(10.13, 10.12) == 1e-2
    # FINER side wins (ADVICE r8): a flip can shorten one repr
    # (2.1 vs 2.1001), and 1e-4 still admits it (1e-4 <= 1.05e-4)
    # without ballooning the tolerance to the first decimal.
    assert _last_decimal_unit(2.1, 2.1001) == 1e-4


def test_short_repr_does_not_balloon_tolerance():
    # The ADVICE r8 repro: with min() these were wrongly absorbed as
    # 1-ulp flips. With max() they must be rejected.
    assert not _tolerant_match(COLS, _rows([("a", 2.1)]), COLS, _rows([("a", 2.1457)]))
    assert not _tolerant_match(COLS, _rows([("a", 51.5)]), COLS, _rows([("a", 51.55)]))
    # while the genuine boundary flip with a shortened repr still passes
    assert _tolerant_match(COLS, _rows([("a", 2.1)]), COLS, _rows([("a", 2.1001)]))


def test_flip_close_rejects_nan_and_none():
    assert not _rows_flip_close(("a", float("nan")), ORDER, ("a", 1.0), ORDER)
    assert not _rows_flip_close(("a", None), ORDER, ("a", 1.0), ORDER)
    # but equal NaNs normalize identically and pass
    assert _rows_flip_close(("a", float("nan")), ORDER, ("a", float("nan")), ORDER)


def test_rejects_integer_off_by_one():
    """ADVICE r9: an integral cell (a BIGINT count) differing by exactly
    1 is a fence/logic bug, never a float-summation flip — integer-typed
    cells get no tolerance at all, so off-by-one is rejected."""
    s = _rows([("a", 7), ("b", 2)])
    o = _rows([("a", 8), ("b", 2)])
    assert not _tolerant_match(COLS, s, COLS, o)
    s = _rows([("a", 1000000)])
    o = _rows([("a", 1000001)])
    assert not _tolerant_match(COLS, s, COLS, o)
    # an int/float TYPE mismatch with equal values still normalizes
    # equal upstream; differing int/float values keep the repr-unit rule
    # (7.0 reprs as "7.0": one decimal -> unit 0.1, rejects the 1.0 gap)
    assert _last_decimal_unit(7.0, 8.0) == 0.1
    assert not _tolerant_match(COLS, _rows([("a", 7)]), COLS, _rows([("a", 8.0)]))
