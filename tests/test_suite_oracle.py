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


def test_rows_only_queries_run(spark):
    """Entries without an oracle get a rows-only smoke run.  Currently
    every registry entry carries an oracle, so this passes vacuously —
    a plain loop rather than parametrize, because an empty parametrize
    list manufactures a phantom SKIP in every report."""
    for name, spec in _rows_only_cases():
        df = spec.spark(spark, SF_CORRECTNESS)
        assert df.count() >= 0, name


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
    hash check); verified entries whose green row hit the
    MUST_REVERIFY_AGE trust bound come next, ahead of change-detection
    pressure (VERDICT r10 item 1 — in rounds 6-10 the module-granularity
    changed tier filled every window slot and starved 15 entries at
    round-5 freshness); entries whose implementation module changed
    since their verification round follow (VERDICT r8 item 6 — the r3
    events-timestamp incident class; ENTRY-level semantic deltas since
    r15); merely-stale verified entries close.  Each verified group is
    in ascending last-verified round so the window's slots re-check
    the stalest green rows first."""
    from nyc_taxi_data_clickhouse_spark import suite

    reg = suite.registry()
    order = list(reg)
    rounds = suite._driver_verified_rounds()
    latest = max(rounds.values(), default=0)

    def group(name: str) -> int:
        if name not in rounds:
            return 0
        if latest - rounds[name] >= suite.MUST_REVERIFY_AGE:
            return 1
        changed = suite._entry_changed_since_round(reg[name], rounds[name])
        return 2 if changed else 3

    groups = [group(n) for n in order]
    assert groups == sorted(groups), "group order violated (0 < 1 < 2 < 3)"
    for g in (1, 2, 3):
        members = [n for n in order if group(n) == g]
        member_rounds = [rounds[n] for n in members]
        assert member_rounds == sorted(member_rounds), (
            f"group {g} not stalest-first: {list(zip(members, member_rounds))[:6]}"
        )


def test_rotation_staleness_bounded():
    """VERDICT r6 item 8 / r10 item 1: no verified entry's green row may
    silently outlive the trust bound.  An entry is compliant when its
    age is within MUST_REVERIFY_AGE, OR it is already scheduled inside
    the next driver window (first DRIVER_WINDOW registry positions) AND
    within the absolute STALENESS_HARD_CAP.  The scheduled escape is
    what distinguishes 'the driver simply has not run yet' from the r10
    failure ('stale AND not scheduled — trusted forever'): in r10 the
    15 round-5 entries sat OUTSIDE the window prefix, which this
    formulation correctly rejects."""
    from nyc_taxi_data_clickhouse_spark import suite

    rounds = suite._driver_verified_rounds()
    if not rounds:
        return  # fresh checkout without driver reports
    latest = max(rounds.values())
    window = list(suite.registry())[: suite.DRIVER_WINDOW]
    violations = []
    for name, rnd in rounds.items():
        age = latest - rnd
        if age <= suite.MUST_REVERIFY_AGE:
            continue
        if name in window and age <= suite.STALENESS_HARD_CAP:
            continue
        violations.append((name, age, name in window))
    assert not violations, (
        f"{len(violations)} driver-green rows outlived the trust bound "
        f"without being scheduled for re-verification (name, age, "
        f"scheduled): {violations[:8]}"
    )


def test_driver_window_drains_trust_bound_violations():
    """Companion to the per-entry bound: an entry that would breach the
    absolute STALENESS_HARD_CAP if it misses the NEXT driver window
    (age >= cap - 1 now) must fit in that window alongside the
    never-verified prefix — otherwise the cap is unreachable by
    construction.  Entries merely AT the soft bound may slip one window
    (the cap's +2 headroom exists for exactly that), so they are not
    counted here."""
    from nyc_taxi_data_clickhouse_spark import suite

    rounds = suite._driver_verified_rounds()
    if not rounds:
        return
    latest = max(rounds.values())
    reg = suite.registry()
    never = sum(1 for n in reg if n not in rounds)
    critical = sum(
        1 for r in rounds.values()
        if latest - r >= suite.STALENESS_HARD_CAP - 1
    )
    assert never + critical <= suite.DRIVER_WINDOW, (
        f"{never} never-verified + {critical} about-to-breach-cap "
        f"entries exceed the {suite.DRIVER_WINDOW}-slot driver window — "
        f"staleness will compound; shrink new-entry intake or widen the "
        f"window"
    )


REGISTRY_CAP = 200  # COVERAGE.md intake policy (VERDICT r12 item 7)


def test_intake_leaves_room_for_must_reverify_cohort():
    """Intake policy (COVERAGE.md, decided r13; reformulated r15): the
    registry is capped at REGISTRY_CAP entries (4 full driver cohorts),
    and the rotation must actually deliver its staleness promise under
    the CURRENT registry + changed-tier pressure.  The r13 static bound
    (`never + due_next <= window`) silently assumed the changed tier is
    empty — any genuinely-changed entry displaces a due-next one and
    the bound reads as an intake violation even though the rotation
    self-heals through the must-reverify tier.  So assert the REAL
    invariant by forward-simulating the driver's window rule for 8
    rounds with the live registry, verified map, and semantic
    changed-detector: no entry's green-row age may ever exceed
    MUST_REVERIFY_AGE + 1 (one displaced round + the catch-up round,
    still far inside STALENESS_HARD_CAP), and the rotation must return
    to the steady state (max age < MUST_REVERIFY_AGE) by simulation
    end.  New-entry intake is covered by the same simulation: a
    too-large never-verified prefix starves the tiers behind it and
    blows the age bound."""
    from collections import Counter

    from nyc_taxi_data_clickhouse_spark import suite

    reg = suite.registry()
    assert len(reg) <= REGISTRY_CAP, (
        f"registry has {len(reg)} entries, over the {REGISTRY_CAP} cap — "
        f"consolidate or retire an entry (one-in-one-out policy) before "
        f"registering new ones"
    )
    rounds = suite._driver_verified_rounds()
    if not rounds:
        return
    order = list(reg)
    verified = dict(rounds)

    def changed(name, rnd):
        return suite._entry_changed_since_round(reg[name], rnd)

    latest = max(verified.values())
    trajectory = []
    for rnd in range(latest + 1, latest + 9):
        window = suite._ordered_names(order, verified, changed)[
            : suite.DRIVER_WINDOW
        ]
        for n in window:
            verified[n] = rnd
        ages = [rnd - verified[n] for n in reg if n in verified]
        never = sum(1 for n in reg if n not in verified)
        assert never == 0 or rnd < latest + 5, (
            f"round +{rnd - latest}: {never} entries still never-verified "
            f"— intake exceeded what the window can absorb"
        )
        trajectory.append(max(ages))
        assert max(ages) <= suite.MUST_REVERIFY_AGE + 1, (
            f"simulated round +{rnd - latest}: an entry reaches age "
            f"{max(ages)} (> {suite.MUST_REVERIFY_AGE + 1}) — the "
            f"rotation cannot keep its staleness promise with the "
            f"current registry size / changed tier; histogram "
            f"{dict(sorted(Counter(ages).items()))}"
        )
    assert trajectory[-1] < suite.MUST_REVERIFY_AGE, (
        f"rotation never returns to steady state: max-age trajectory "
        f"{trajectory}"
    )


def test_cumulative_driver_coverage_complete():
    """VERDICT r10 item 5: set-union guard, committed as a test — every
    registry entry must either be hash-green in the union of ALL driver
    CORRECTNESS_r*.json reports, or (brand-new this round) be scheduled
    in the next driver window's never-verified prefix.  This is the
    same check the r10 judge ran by hand ('no entry has never been
    driver-green'), now enforced by construction."""
    from nyc_taxi_data_clickhouse_spark import suite

    rounds = suite._driver_verified_rounds()
    if not rounds:
        return  # fresh checkout without driver reports
    reg = suite.registry()
    window = list(reg)[: suite.DRIVER_WINDOW]
    uncovered = [
        n for n in reg if n not in rounds and n not in window
    ]
    assert not uncovered, (
        f"{len(uncovered)} registry entries have never been driver-"
        f"verified AND are not scheduled in the next window: {uncovered[:8]}"
    )


def test_no_shorthand_whitespace_class_in_paired_regexes():
    """Contract lint (ADVICE r10): Java's \\s includes \\x0B, RE2's
    (DuckDB's) does not — every paired Spark/SQL regex must spell the
    class out as [ \\t\\n\\x0B\\f\\r].  This scans all oracle SQL for a
    surviving shorthand \\s inside regex-taking functions, and the
    package source for Spark-side r\"...\\s...\" regexes, so the
    divergence can never be reintroduced by a new entry.  (\\d and \\w
    agree between the engines in the ASCII subset the fixtures use;
    only \\s differs.)"""
    from pathlib import Path

    from nyc_taxi_data_clickhouse_spark import suite

    offenders = []
    for name, spec in suite.registry().items():
        if spec.oracle and "\\s" in spec.oracle:
            offenders.append(f"oracle:{name}")
    # package-wide source scan, not a call-shape regex: a call-shape
    # pattern missed 3 of the 4 shapes this repo actually uses (nested
    # F.trim/F.lower arguments defeat any [^)]* matcher).  The package
    # has NO legitimate \s left, so any literal backslash-s is an
    # offender — except catalog.py's Python-side re (parses Spark CLI
    # output, never paired with a DuckDB twin).
    pkg = Path(suite.__file__).resolve().parent
    for p in sorted(pkg.rglob("*.py")):
        if p.name == "catalog.py":
            continue
        for ln, line in enumerate(p.read_text().splitlines(), 1):
            if "\\s" in line:
                offenders.append(f"{p.relative_to(pkg)}:{ln}:{line.strip()[:70]}")
    assert not offenders, offenders[:10]


# ---------------------------------------------------------------------------
# Semantic change-detector units (r15): the driver window's changed
# tier promotes an entry only when something that can affect its
# RESULT changed — its function's same-module transitive closure
# (helpers, constants, imports, decorator SQL, unbound module residue)
# — never comments, docstrings, doc= metadata, or sibling entries.
# ---------------------------------------------------------------------------

_MOD_V1 = '''
"""module docstring"""
import math
X = 3
def helper(a):
    # a comment
    return a + X
@register("e1", "SELECT 1", doc="meta")
def e1(spark, sf):
    return helper(1)
@register("e2", "SELECT 2", doc="meta")
def e2(spark, sf):
    return math.pi
'''


def _sig(src, fname):
    from nyc_taxi_data_clickhouse_spark import suite

    defs, refs, residue = suite._graph_from_source(src)
    seen, stack = set(), [fname]
    while stack:
        cur = stack.pop()
        if cur in seen:
            continue
        seen.add(cur)
        stack.extend(refs.get(cur, ()))
    return (residue, tuple(sorted((n, defs[n]) for n in seen)))


def test_semantic_graph_ignores_comments_docstrings_doc_metadata():
    from nyc_taxi_data_clickhouse_spark import suite

    v2 = _MOD_V1.replace('"""module docstring"""', '"""rewritten"""')
    v2 = v2.replace("# a comment", "# different comment")
    v2 = v2.replace('doc="meta"', 'doc="reworded meta"')
    assert suite._graph_from_source(_MOD_V1) == suite._graph_from_source(v2)


def test_semantic_closure_isolates_siblings_but_tracks_helpers():
    # editing e2's body changes e2's closure only
    v2 = _MOD_V1.replace("return math.pi", "return math.tau")
    assert _sig(_MOD_V1, "e1") == _sig(v2, "e1")
    assert _sig(_MOD_V1, "e2") != _sig(v2, "e2")
    # editing the helper (or the constant it folds in) changes e1, not e2
    v3 = _MOD_V1.replace("return a + X", "return a - X")
    assert _sig(_MOD_V1, "e1") != _sig(v3, "e1")
    assert _sig(_MOD_V1, "e2") == _sig(v3, "e2")
    v4 = _MOD_V1.replace("X = 3", "X = 4")
    assert _sig(_MOD_V1, "e1") != _sig(v4, "e1")
    assert _sig(_MOD_V1, "e2") == _sig(v4, "e2")


def test_semantic_closure_tracks_oracle_sql_and_residue():
    # the decorator's SQL oracle is part of the entry's signature
    v2 = _MOD_V1.replace('"SELECT 1"', '"SELECT 99"')
    assert _sig(_MOD_V1, "e1") != _sig(v2, "e1")
    assert _sig(_MOD_V1, "e2") == _sig(v2, "e2")
    # an unbound module-level statement (side-effecting setup) is
    # attributed to every function in the module
    v3 = _MOD_V1 + "\nprint('side effect')\n"
    assert _sig(_MOD_V1, "e1") != _sig(v3, "e1")
    assert _sig(_MOD_V1, "e2") != _sig(v3, "e2")


def test_changed_tier_contains_only_semantic_deltas():
    """Live-repo guard: every entry the current checkout promotes into
    the changed tier must be attributable to a real semantic delta —
    and entries in touched-but-semantically-unchanged modules must NOT
    be promoted (a pure comment/doc edit to an operator module may not
    displace the stale cohort from the driver window)."""
    from nyc_taxi_data_clickhouse_spark import suite

    reg = suite.registry()
    rounds = suite._driver_verified_rounds()
    if not rounds:
        return
    for name, spec in reg.items():
        rnd = rounds.get(name)
        if rnd is None:
            continue
        if suite._entry_changed_since_round(spec, rnd):
            rev = suite._round_rev(rnd)
            rel = suite._entry_module_relpath(spec)
            fname = spec.spark.__name__
            own = rel in suite._files_changed_since_round(rnd) and (
                suite._helper_changed(rev, rel, fname)
            )
            helper = any(
                hrel in suite._files_changed_since_round(rnd)
                and suite._helper_changed(rev, hrel, hname)
                for hrel, hname in suite._entry_referenced_objects(spec)
            )
            assert own or helper, f"{name} promoted without a delta"
