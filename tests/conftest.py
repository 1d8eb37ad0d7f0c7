"""Shared pytest fixtures: one SparkSession per test session, and the
tiny deterministic trips fixture corpus from FIXTURES.md."""

from __future__ import annotations

import datetime as dt
import os
import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _enable_opportunistic_protobuf() -> None:
    """Make the REAL transformWithState path testable where possible
    (VERDICT r13 item 8): pyspark's TWS state server needs
    ``google.protobuf``, which this container's site-packages lacks —
    but the publicly distributed Google Cloud SDK bundles a pure-copy
    of the protobuf runtime.  If ``google.protobuf`` is not already
    importable and a bundled copy exists, put it on sys.path AND
    ``PYTHONPATH`` (so Spark's python workers — separate processes
    forked after JVM start — inherit it too), and set protobuf's own
    documented escape hatch for the one-minor gencode/runtime skew
    (pyspark 4.1.2 gencode 6.33 vs the SDK runtime 6.32; the
    StateMessage proto uses no 6.33-only feature — verified by a green
    end-to-end run of the real StatefulProcessor path, COVERAGE.md
    §2.9).  Containers without any protobuf keep the declared
    GroupState-fallback environment contract: this hook is a no-op
    there and the contract test stays the real PASS.

    Runs at conftest import time, BEFORE any SparkSession (and hence
    the worker-spawning JVM) exists — env mutations after JVM launch
    would not reach the workers."""
    import importlib.util

    def _importable() -> bool:
        # find_spec("google.protobuf") raises when the parent
        # namespace package is absent entirely
        return (
            importlib.util.find_spec("google") is not None
            and importlib.util.find_spec("google.protobuf") is not None
        )

    if _importable():
        return
    # ADVICE r14: if a 'google' package/namespace is already installed
    # (just without protobuf), do NOT add the SDK bundle at all — a
    # regular-package 'google' in the bundle would shadow the installed
    # one for EVERY google.* import, breaking unrelated packages.  The
    # TWS fallback contract covers that environment instead.
    if importlib.util.find_spec("google") is not None:
        return
    candidate = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if not os.path.isdir(os.path.join(candidate, "google", "protobuf")):
        return
    # append, not prepend (ADVICE r14): site-packages must keep
    # priority so the bundle's top-level modules (run_tests.py, ...)
    # never shadow legitimately installed ones
    sys.path.append(candidate)
    if not _importable():
        sys.path.remove(candidate)
        return
    os.environ["PYTHONPATH"] = (
        os.environ["PYTHONPATH"] + os.pathsep + candidate
        if os.environ.get("PYTHONPATH")
        else candidate
    )
    os.environ.setdefault(
        "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
    )


_enable_opportunistic_protobuf()

from nyc_taxi_data_clickhouse_spark.session import get_spark
from nyc_taxi_data_clickhouse_spark.schema import (
    CAB_TYPES_SCHEMA,
    NYCT2010_SCHEMA,
    TRIPS_STAGING_SCHEMA,
    WEATHER_SCHEMA,
)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


# ---------------------------------------------------------------------------
# trips fixture generator (FIXTURES.md §1-2): exercises every transform
# branch — NULLs, empty strings, every payment-type spelling, unmapped
# enum values, x.5 distances for round() pinning.
# ---------------------------------------------------------------------------

_PAYMENT_SPELLINGS = [
    "CSH", "CASH", "Cash", "CAS", "Cas", "1",
    "CRD", "Credit", "Cre", "CRE", "CREDIT", "2",
    "NOC", "No Charge", "No", "3",
    "DIS", "Dispute", "Dis", "4",
    "foo", None,
]
_VENDORS = ["1", "2", "3", "4", "CMT", "VTS", "DDS",
            "B02512", "B02598", "B02617", "B02682", "B02764"]
_BORO = ["Manhattan", "Bronx", "Brooklyn", "Queens", "Staten Island"]


def make_trips_rows(n: int = 200, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    for i in range(1, n + 1):
        pickup = dt.datetime(2009 + rng.randrange(10), rng.randrange(1, 13),
                             rng.randrange(1, 28), rng.randrange(24), rng.randrange(60))
        dropoff = None if rng.random() < 0.05 else pickup + dt.timedelta(
            minutes=rng.randrange(1, 120))

        def maybe(v, p=0.05):
            return None if rng.random() < p else v

        gid = maybe(rng.randrange(1, 51))
        dgid = maybe(rng.randrange(1, 51))
        # trip_distance includes exact x.5 values to pin round() half-up (F3)
        dist = maybe(rng.choice([rng.uniform(0, 100), rng.randrange(20) + 0.5]))
        rows.append((
            i,                                     # trip_id
            rng.choice(_VENDORS),                  # vendor_id
            pickup, dropoff,
            maybe(rng.choice(["Y", "N", "1", "2", "0"])),   # store_and_fwd_flag
            maybe(rng.randrange(1, 7)),            # rate_code_id
            maybe(rng.uniform(-74.3, -73.7)), maybe(rng.uniform(40.5, 41.0)),
            maybe(rng.uniform(-74.3, -73.7)), maybe(rng.uniform(40.5, 41.0)),
            maybe(rng.randrange(0, 10)),           # passenger_count
            dist,
            *[maybe(round(rng.uniform(0, 200), 2)) for _ in range(8)],  # money
            rng.choice(_PAYMENT_SPELLINGS),        # payment_type
            maybe(rng.randrange(1, 3)),            # trip_type
            maybe(rng.randrange(1, 266)), maybe(rng.randrange(1, 266)),
            rng.choice(["yellow", "green", "uber"]),
            maybe(round(rng.uniform(0, 2), 2)), maybe(round(rng.uniform(0, 10), 1)),
            maybe(round(rng.uniform(0, 5), 1)),    # precipitation/snow_depth/snowfall
            maybe(rng.randrange(-10, 40)), maybe(rng.randrange(-20, 30)),
            maybe(round(rng.uniform(0, 20), 1)),   # wind
            gid, maybe(f"{rng.randrange(1, 999)}.00"), maybe(rng.randrange(1, 6)),
            None if gid is None else rng.choice(_BORO),
            maybe(f"{rng.randrange(100000, 999999)}"),
            maybe(f"{rng.randrange(1000000, 9999999)}"),
            maybe(rng.choice(["E", "I", " "])),
            maybe(f"BK{rng.randrange(10, 99)}"), maybe("nta name"),
            maybe(f"{rng.randrange(3700, 4200)}"),
            dgid, maybe(f"{rng.randrange(1, 999)}.00"), maybe(rng.randrange(1, 6)),
            None if dgid is None else rng.choice(_BORO),
            maybe(f"{rng.randrange(100000, 999999)}"),
            maybe(f"{rng.randrange(1000000, 9999999)}"),
            maybe(rng.choice(["E", "I", " "])),
            maybe(f"BK{rng.randrange(10, 99)}"), maybe("nta name"),
            maybe(f"{rng.randrange(3700, 4200)}"),
        ))
    return rows


@pytest.fixture(scope="session")
def trips_staging(spark):
    return spark.createDataFrame(make_trips_rows(), TRIPS_STAGING_SCHEMA).cache()


@pytest.fixture(scope="session")
def dims(spark):
    rng = random.Random(7)
    cab = spark.createDataFrame(
        [(1, "yellow"), (2, "green"), (3, "uber")], CAB_TYPES_SCHEMA
    )
    weather = spark.createDataFrame(
        [
            (dt.date(2015, 1, 1) + dt.timedelta(days=i),
             round(rng.uniform(0, 2), 2), round(rng.uniform(0, 10), 1),
             round(rng.uniform(0, 5), 1), rng.randrange(-10, 40),
             rng.randrange(-20, 30), round(rng.uniform(0, 20), 1))
            for i in range(0, 365, 2)  # gaps -> LEFT-join NULL path
        ],
        WEATHER_SCHEMA,
    )
    nyct = spark.createDataFrame(
        [
            (g, f"{g}.00", 1 + g % 5, _BORO[g % 5], f"{100000 + g}",
             f"{1000000 + g}", "E" if g % 2 else "I", f"BK{10 + g % 80}",
             f"nta {g}", f"{3700 + g % 500}")
            for g in range(1, 41)  # gids 41-50 missing -> NULL path
        ],
        NYCT2010_SCHEMA,
    )
    return {"cab_types": cab, "weather": weather, "nyct": nyct}
