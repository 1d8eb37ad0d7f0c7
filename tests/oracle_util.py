"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs a suite query in Spark and its oracle SQL in DuckDB on the same
parquet, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name — the driver's
documented compare).  Floats are rounded to 6 decimals before hashing
to absorb representation noise; suite queries are expected to round
aggregates themselves (Z6 policy).

Tolerance policy (VERDICT r6 item 7): when the strict hash mismatches
but rows+columns agree, a bounded fallback absorbs cross-engine
float-summation-order flips — values whose UNROUNDED sums sit within
1 ulp of a rounding boundary round differently on the two engines
(e.g. avg 51.51125… → Spark 51.5113, DuckDB 51.5112; diagnosed
row-by-row in BENCH_NOTES.md round 5).  The fallback multiset-cancels
exactly-matching rows and accepts only if (a) the residual is at most
max(3, 1% of rows) rows per side, and (b) each residual row pairs with
one whose sole differences are numeric cells ONE unit in the last
rounded decimal apart.  A real logic defect — a shifted column, a
wrong group, any diff beyond the last decimal — still fails.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import numbers
from collections import Counter

import duckdb

from nyc_taxi_data_clickhouse_spark.schema import TESTDATA_TABLES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # + 0.0 collapses IEEE negative zero: a mean of -4e-8 rounds
        # to -0.0 on one engine and +0.0 on the other (observed at
        # sf0.1 in embedding_centroids), and "%.6f" would format them
        # as distinct strings for numerically-equal values
        return f"{round(v, 6) + 0.0:.6f}"
    if isinstance(v, dt.datetime):
        # duckdb's pandas bridge widens DATE to midnight Timestamp;
        # collapse midnight datetimes to the date so both sides agree
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def _hash_rows(colnames, rows) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _last_decimal_unit(a: float, b: float) -> float:
    """One unit in the last decimal of the FINER of the two values'
    shortest reprs — the magnitude of a legitimate rounding-boundary
    flip between independently-summed floats.

    Finer (max of the decimal counts), not coarser: a boundary flip can
    shorten one side's repr (2.1 vs 2.1001 — trailing zeros drop), and
    the finer side still bounds the true difference (1e-4 here). Using
    the coarser side would balloon the tolerance to one unit of the
    FIRST decimal whenever one repr happens to be short (2.1 vs 2.1457
    would be absorbed as a "flip"), letting real per-row defects through
    the correctness gate (ADVICE r8, tests/oracle_util.py:90)."""

    def dec(x: float) -> int:
        s = repr(float(x))
        if "e" in s or "E" in s:
            return 12  # sci-notation magnitudes: effectively ulp-level
        return len(s.split(".")[1]) if "." in s else 0

    return 10.0 ** -max(dec(a), dec(b))


def _rows_flip_close(ra, order_a, rb, order_b) -> bool:
    """True iff the rows differ ONLY in numeric cells that are at most
    one last-rounded-decimal unit apart (the summation-order flip
    signature); every other cell must normalize identically."""
    for i, j in zip(order_a, order_b):
        a, b = ra[i], rb[j]
        if _norm_cell(a) == _norm_cell(b):
            continue
        if (
            isinstance(a, numbers.Real)
            and isinstance(b, numbers.Real)
            and not isinstance(a, bool)
            and not isinstance(b, bool)
        ):
            if isinstance(a, numbers.Integral) and isinstance(b, numbers.Integral):
                # Integral cells (BIGINT counts): a float-summation
                # rounding flip cannot produce an off-by-one INTEGER —
                # only a fence/logic bug can — so integer-typed cells
                # get no tolerance at all (ADVICE r9: iqr_outlier_counts
                # outputs a count; an off-by-one fence bug must never be
                # absorbed as a "rounding flip").
                return False
            fa, fb = float(a), float(b)
            if math.isnan(fa) or math.isnan(fb):
                return False
            if abs(fa - fb) <= 1.05 * _last_decimal_unit(fa, fb):
                continue
        return False
    return True


def _tolerant_match(scols, srows, ocols, orows) -> bool:
    """Bounded fallback for strict-hash mismatches (module docstring)."""
    if len(srows) != len(orows) or sorted(scols) != sorted(ocols):
        return False
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])

    def line(r, order):
        return "\x01".join(_norm_cell(r[i]) for i in order)

    s_lines = Counter(line(r, order_s) for r in srows)
    o_lines = Counter(line(r, order_o) for r in orows)
    res_s_keys, res_o_keys = s_lines - o_lines, o_lines - s_lines
    cap = max(3, len(srows) // 100)
    if sum(res_s_keys.values()) > cap or sum(res_o_keys.values()) > cap:
        return False
    res_s = [r for r in srows if line(r, order_s) in res_s_keys]
    res_o = [list(r) for r in orows if line(r, order_o) in res_o_keys]
    used = [False] * len(res_o)
    for ra in res_s:
        hit = next(
            (
                j
                for j, rb in enumerate(res_o)
                if not used[j] and _rows_flip_close(ra, order_s, rb, order_o)
            ),
            None,
        )
        if hit is None:
            return False
        used[hit] = True
    return all(used)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    srows = spark_df.collect()
    scols = spark_df.columns
    pdf = duckdb_run(oracle_sql, sf_dir)
    ocols = list(pdf.columns)
    orows = [tuple(None if (isinstance(x, float) and math.isnan(x)) or x is None
                   else x for x in row)
             for row in pdf.itertuples(index=False, name=None)]
    # pandas returns numpy scalars / Timestamps; normalize via str() in hash
    result = {
        "rows_spark": len(srows),
        "rows_oracle": len(orows),
        "cols_spark": sorted(scols),
        "cols_oracle": sorted(ocols),
        "hash_spark": _hash_rows(scols, [tuple(r) for r in srows]),
        "hash_oracle": _hash_rows(ocols, orows),
    }
    result["match"] = (
        result["rows_spark"] == result["rows_oracle"]
        and result["cols_spark"] == result["cols_oracle"]
        and result["hash_spark"] == result["hash_oracle"]
    )
    if (
        not result["match"]
        and result["rows_spark"] == result["rows_oracle"]
        and result["cols_spark"] == result["cols_oracle"]
    ):
        if _tolerant_match(scols, [tuple(r) for r in srows], ocols, orows):
            result["match"] = True
            result["tol_match"] = True  # 1-ulp rounding-flip absorption
    return result
