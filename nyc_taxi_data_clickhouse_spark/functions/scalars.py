"""Scalar expression builders replicating the reference's cleanup
functions (SURVEY §2.8).

Everything here returns a Column built from JVM-side
``pyspark.sql.functions`` — no Python UDFs — so the curation transform
stays inside whole-stage codegen.

Semantics citations are to /root/reference/README.md unless noted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F5 ifNull / F6 assumeNotNull
# ---------------------------------------------------------------------------

#: ClickHouse ``assumeNotNull(x)`` yields the column type's default value
#: when x IS NULL (README.md:556-593).  We make that default explicit per
#: Spark type (quirk Z1) instead of relying on engine internals.
#: Lazy (lambdas) because Column construction needs an active session.
_TYPE_DEFAULTS = {
    "int": lambda: F.lit(0),
    "long": lambda: F.lit(0).cast("long"),
    "float": lambda: F.lit(0.0).cast("float"),
    "double": lambda: F.lit(0.0),
    "string": lambda: F.lit(""),
    # F7: toDateTime(0) == unix epoch (README.md:553, 555)
    "timestamp": lambda: F.lit("1970-01-01 00:00:00").cast("timestamp"),
    "date": lambda: F.lit("1970-01-01").cast("date"),
}


def if_null(col: Column | str, default) -> Column:
    """``ifNull(x, y)`` (README.md:553...594) == ``coalesce(x, y)``."""
    c = F.col(col) if isinstance(col, str) else col
    d = default if isinstance(default, Column) else F.lit(default)
    return F.coalesce(c, d)


def assume_not_null(col: Column | str, spark_type: str = "string") -> Column:
    """``assumeNotNull(x)`` with NULL -> explicit type default (Z1).

    ``spark_type`` picks the ClickHouse default-value semantics:
    0 for numerics, '' for strings, epoch for timestamps
    (README.md:556-593).
    """
    c = F.col(col) if isinstance(col, str) else col
    if spark_type not in _TYPE_DEFAULTS:
        raise ValueError(f"no ClickHouse default registered for {spark_type!r}")
    return F.coalesce(c.cast(spark_type), _TYPE_DEFAULTS[spark_type]())


# ---------------------------------------------------------------------------
# F8 Enum8 cast  /  F9 payment-type normalization
# ---------------------------------------------------------------------------

def enum8(col: Column | str, mapping: dict[str, int], strict: bool = True) -> Column:
    """``CAST(x AS Enum8('a'=1, ...))`` (README.md:551, 572, 576).

    The semantics preserved are the *normalization mapping*, not the int
    codes (SURVEY §1.2): output is the canonical string.  ``strict=True``
    mirrors ClickHouse, which throws on unmapped values (quirk Z7), via
    ``raise_error``; ``strict=False`` passes NULL through for unmapped.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for name in mapping:
        cond = c == name
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    if expr is None:
        raise ValueError("empty enum mapping")
    if strict:
        fallback = F.when(
            c.isNull(), F.lit(None).cast("string")
        ).otherwise(
            F.raise_error(F.concat(F.lit("unmapped enum value: "), c))
        )
        return expr.otherwise(fallback)
    return expr.otherwise(F.lit(None).cast("string"))


#: The 12 vendor codes of README.md:551 (CAST throws on anything else).
VENDOR_ENUM = {
    "1": 1, "2": 2, "3": 3, "4": 4, "CMT": 5, "VTS": 6, "DDS": 7,
    "B02512": 10, "B02598": 11, "B02617": 12, "B02682": 13, "B02764": 14,
}

#: Enum8('yellow'=1,'green'=2,'uber'=3) (README.md:576).
CAB_TYPE_ENUM = {"yellow": 1, "green": 2, "uber": 3}

#: payment-type spelling groups of the nested ternary at README.md:572.
_PAYMENT_GROUPS: dict[str, tuple[str, ...]] = {
    "CSH": ("CSH", "CASH", "Cash", "CAS", "Cas", "1"),
    "CRE": ("CRD", "Credit", "Cre", "CRE", "CREDIT", "2"),
    "NOC": ("NOC", "No Charge", "No", "3"),
    "DIS": ("DIS", "Dispute", "Dis", "4"),
}


def normalize_payment_type(col: Column | str) -> Column:
    """Messy payment-type spellings -> {CSH,CRE,NOC,DIS,UNK} (F9/Z4).

    Mirrors the nested ternary chain of README.md:572; everything
    unmapped (including NULL after assumeNotNull) lands in 'UNK'.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for canon, spellings in _PAYMENT_GROUPS.items():
        cond = c.isin(*spellings)
        expr = F.when(cond, F.lit(canon)) if expr is None else expr.when(cond, F.lit(canon))
    return expr.otherwise(F.lit("UNK"))


# ---------------------------------------------------------------------------
# F10 IN-list boolean flag  /  F12 toFixedString
# ---------------------------------------------------------------------------

def in_list_flag(col: Column | str, values: tuple[str, ...]) -> Column:
    """``assumeNotNull(x) IN (list)`` -> UInt8 0/1 (README.md:556)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit("")).isin(*values).cast("int")


def to_fixed_string(col: Column | str, n: int, default: str | None = None) -> Column:
    """``toFixedString(ifNull(x, default), n)`` (README.md:581-592).

    ClickHouse FixedString(n) zero-pads short values; the reference
    always wraps with an ``ifNull`` default of n zeros ('0000000' /
    '0000').  We replicate with coalesce + rpad-with-'0' and truncate
    overlong values to n (FixedString insert of longer strings errors in
    CH; the reference data never exceeds n, so truncation is the benign
    choice).
    """
    c = F.col(col) if isinstance(col, str) else col
    default = default if default is not None else "0" * n
    return F.rpad(F.coalesce(c, F.lit(default)), n, "0").substr(1, n)


# ---------------------------------------------------------------------------
# Exact fixed-point average (VERDICT r8 item 5)
# ---------------------------------------------------------------------------
#
# round(avg(double), k) is NOT reproducible across engines, twice over:
# (1) the parallel double sum is summation-order dependent (1-ulp flips
# at partition boundaries), and (2) even on identical inputs, engines
# round doubles differently at decimal boundaries — Spark's round()
# half-ups the value's SHORTEST DECIMAL REPR (BigDecimal.valueOf) while
# e.g. DuckDB rounds the binary value via multiply/round/divide, so an
# average whose exact value is x.xxxx5 (common when inputs have few
# decimals: 2-decimal values averaged over 8 rows step by 1.25e-3)
# flips by one last-decimal unit between engines.  The cure is to leave
# floating point entirely: quantize each value to exact integer
# micro-units, sum exactly, and apply the half-up rule with integer
# arithmetic.  Both halves are deterministic and engine-independent.

#: quantization: value -> integer micro-units (1e-6); the per-row
#: double->DECIMAL(18,6) cast is deterministic half-up on both engines
#: (the decimal_exact_money precedent, green at every SF)
MICRO = 1_000_000


def micro_sum(col: Column | str) -> Column:
    """Exact integer sum of ``col`` in micro-units: per-row
    ``CAST(value AS DECIMAL(18,6)) * 1e6`` is integral by construction
    and the DECIMAL(38,0) sum is exact, so partial-aggregation order
    cannot change the result.  The sum runs in DECIMAL(38,0)
    unconditionally (ADVICE r9): a long unit-sum overflows past ~9.2e12
    (a group of ~9.2M rows averaging 1e6), and under non-ANSI mode the
    overflow cast yields NULL so ``sum`` would silently SKIP those rows
    — a plausible-but-wrong average.  DECIMAL(38,0) moves the bound to
    1e38 (unreachable) at negligible cost; overflow there nulls the
    whole sum rather than dropping rows, so it can never fabricate a
    plausible value."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum((c.cast("decimal(18,6)") * MICRO).cast("decimal(38,0)"))


def micro_avg(sum_micro: Column | str, cnt: Column | str, scale: int = 4) -> Column:
    """Half-up average at ``scale`` decimals from an exact micro-unit
    sum S and count C, entirely in exact arithmetic:

        round_half_up(S / (MICRO*C) * 10^scale)
            = sign(S) * (2*|S| + q*C) intdiv (2*q*C),   q = MICRO/10^scale

    The intdiv runs in DECIMAL(38,0) via ``(n - n % d) / d`` (no long
    overflow, no float; the decimal division of an exact multiple is
    exact), and the only floating-point step is the final
    integer/10^scale — one deterministic IEEE rounding, identical in
    any engine.  Sign is factored out so truncation = floor on the
    positive magnitude, making the rule half-AWAY-FROM-ZERO for
    negatives too (what both Spark's and DuckDB's round() do).  C == 0
    (all-null group) yields NULL, matching avg().

    The DuckDB-oracle spelling of the same formula::

        CAST(CASE WHEN s6 < 0 THEN -1 ELSE 1 END
             * ((2*abs(s6) + 100*cv) // nullif(200*cv, 0)) AS DOUBLE)
            / 10000  AS avg_value        -- scale=4: q = 100
    """
    s = (F.col(sum_micro) if isinstance(sum_micro, str) else sum_micro).cast(
        "decimal(38,0)"
    )
    c = (F.col(cnt) if isinstance(cnt, str) else cnt).cast("decimal(38,0)")
    q = MICRO // 10 ** scale
    num = F.abs(s) * 2 + F.lit(q) * c
    den = F.nullif((F.lit(2 * q) * c).cast("decimal(38,0)"), F.lit(0).cast("decimal(38,0)"))
    ticks = ((num - num % den) / den).cast("decimal(38,0)")
    sign = F.when(s < 0, F.lit(-1)).otherwise(F.lit(1))
    return (sign * ticks).cast("double") / F.lit(float(10 ** scale))
