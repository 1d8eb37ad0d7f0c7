"""Property-based tests (hypothesis) for the scalar expression library
— SURVEY §5's upgrade from the reference's manual spot checks.

Strategy: generate a batch of adversarial inputs per property, run
them through ONE DataFrame evaluation (per-example Spark jobs would be
prohibitively slow), and check the invariant row-by-row against a pure
Python model of the ClickHouse semantics.
"""

from __future__ import annotations

import pytest
from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from nyc_taxi_data_clickhouse_spark.functions.scalars import (
    _PAYMENT_GROUPS,
    in_list_flag,
    normalize_payment_type,
    to_fixed_string,
)

# text-ish strings incl. empties, whitespace, unicode, the real spellings
payment_strings = st.one_of(
    st.sampled_from(
        [s for group in _PAYMENT_GROUPS.values() for s in group] + ["UNK", ""]
    ),
    st.text(max_size=12),
    st.none(),
)


def _py_normalize_payment(v: str | None) -> str:
    v = v if v is not None else ""
    for canon, spellings in _PAYMENT_GROUPS.items():
        if v in spellings:
            return canon
    return "UNK"


@settings(max_examples=20, deadline=None)
@given(st.lists(payment_strings, min_size=1, max_size=50))
def test_payment_normalization_matches_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "payment_type string")
    got = [
        r[0]
        for r in df.select(
            normalize_payment_type(F.coalesce(F.col("payment_type"), F.lit("")))
        ).collect()
    ]
    assert got == [_py_normalize_payment(v) for v in values]


fixed_strings = st.one_of(st.text(max_size=12), st.none())


@settings(max_examples=20, deadline=None)
@given(st.lists(fixed_strings, min_size=1, max_size=50), st.integers(1, 8))
def test_to_fixed_string_always_exact_width(spark, values, n):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r[0] for r in df.select(to_fixed_string("s", n)).collect()]
    assert all(len(g) == n for g in got)
    # NULL -> all-zero default of width n (README.md:581-583 semantics)
    for v, g in zip(values, got):
        if v is None:
            assert g == "0" * n


flag_strings = st.one_of(
    st.sampled_from(["Y", "N", "1", "2", "0", "", " ", "y"]), st.text(max_size=3), st.none()
)


@settings(max_examples=20, deadline=None)
@given(st.lists(flag_strings, min_size=1, max_size=50))
def test_in_list_flag_is_binary_and_null_free(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "f string")
    got = [r[0] for r in df.select(in_list_flag("f", ("Y", "1", "2"))).collect()]
    assert all(g in (0, 1) for g in got)
    assert got == [1 if (v in ("Y", "1", "2")) else 0 for v in values]


# ---------------------------------------------------------------------------
# merge_upsert algebraic properties
# ---------------------------------------------------------------------------

upsert_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 20), st.text(max_size=4)),
    min_size=0,
    max_size=20,
    unique_by=lambda r: (r[0], r[1]),  # unique (key, version)
)


def _apply_model(snapshot: dict, batch):
    for k, ver, v in batch:
        if k not in snapshot or ver >= snapshot[k][0]:
            snapshot[k] = (ver, v)
    return snapshot


@settings(max_examples=15, deadline=None)
@given(upsert_rows, upsert_rows, upsert_rows)
def test_merge_upsert_sequential_equals_model(spark, cur, u1, u2):
    """Applying update batches sequentially must equal the
    latest-wins reference model, and re-applying the last batch must
    be a no-op (idempotence) — the property foreachBatch reprocessing
    relies on."""
    from nyc_taxi_data_clickhouse_spark.plans.upsert import merge_upsert

    # make (key, version) unique ACROSS batches too (ambiguous ties
    # between u1 and u2 are out of contract)
    seen: set = set()
    cur, u1, u2 = (
        [r for r in batch if not ((r[0], r[1]) in seen or seen.add((r[0], r[1])))]
        for batch in (cur, u1, u2)
    )
    schema = "k long, ver long, v string"
    df = spark.createDataFrame(cur, schema) if cur else spark.createDataFrame([], schema)
    for batch in (u1, u2, u2):  # u2 twice: idempotence
        bdf = (
            spark.createDataFrame(batch, schema)
            if batch
            else spark.createDataFrame([], schema)
        )
        df = merge_upsert(df, bdf, ["k"], "ver")

    model: dict = {}
    for batch in (cur, u1, u2):
        _apply_model(model, batch)
    want = {(k, ver, v) for k, (ver, v) in model.items()}
    got = {(r["k"], r["ver"], r["v"]) for r in df.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# SCD2 build invariants (plans/surface_gaps.scd2_dimension semantics)
# ---------------------------------------------------------------------------

_scd_hist = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # custkey
        st.integers(min_value=0, max_value=400),        # day offset
        st.sampled_from(["LOW", "MED", "HIGH"]),        # priority
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(_scd_hist)
def test_scd2_intervals_partition_each_customers_timeline(spark, rows):
    """For every customer: intervals are non-overlapping, contiguous
    (each valid_to equals the next valid_from), start at the first
    order date, exactly one open-ended current row, and consecutive
    intervals always change priority."""
    import datetime as dt

    from pyspark.sql import functions as F

    from nyc_taxi_data_clickhouse_spark.plans.surface_gaps import scd2_dimension

    base = dt.datetime(2020, 1, 1)
    data = [
        (ck, i + 1, base + dt.timedelta(days=off), pr)
        for i, (ck, off, pr) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "o_custkey long, o_orderkey long, o_orderdate timestamp, "
        "o_orderpriority string"
    )

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/orders.parquet")
        out = scd2_dimension(spark, d).collect()

    sentinel = dt.date(9999, 12, 31)
    by_cust: dict[int, list] = {}
    for r in out:
        by_cust.setdefault(r["custkey"], []).append(r)
    firsts = {
        ck: min(x[2] for x in data if x[0] == ck).date() for ck, _, _, _ in data
    }
    for ck, ivs in by_cust.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert ivs[0]["valid_from"] == firsts[ck]
        assert sum(1 for r in ivs if r["is_current"]) == 1
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] == sentinel
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], "contiguous, no gaps"
            assert a["priority"] != b["priority"] or a["valid_to"] == a[
                "valid_from"
            ], "a new interval means the priority changed (or a same-day flip)"


# ---------------------------------------------------------------------------
# media codec properties (no Spark session needed)
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=10),
    st.integers(1_000, 1_000_000),
    st.integers(1, 64),
    st.integers(1, 64),
)
def test_avi_container_roundtrip_preserves_frames(frames, usec, w, h):
    """The RIFF/AVI container is a faithful envelope: parse(encode(f))
    returns exactly the frame payloads, geometry and timing — for ANY
    frame bytes (container correctness is independent of the codec)."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_avi_codec,
    )

    enc, dec = _build_avi_codec()
    v = dec(enc(w, h, usec, frames))
    assert v["width"] == w and v["height"] == h
    assert v["usec_per_frame"] == usec
    assert v["n_frames"] == len(frames)
    assert v["frames"] == [bytes(f) for f in frames]


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 3),
    st.integers(1, 3),
    st.booleans(),
    st.data(),
)
def test_jpeg_constant_blocks_roundtrip_exact_on_lattice(bw, bh, gray, data):
    """Baseline JPEG round-trips bit-exactly for constant blocks whose
    luma sits on the quantizer lattice (even Y => DC step 16 divides
    8*(Y-128)), any block-grid geometry, grayscale or YCbCr."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_jpeg_codec,
    )

    enc, dec = _build_jpeg_codec()
    dcs = {
        (by, bx): data.draw(st.integers(-64, 63))
        for by in range(bh)
        for bx in range(bw)
    }
    luma = {k: [v] + [0] * 63 for k, v in dcs.items()}
    comps = [luma] if gray else [luma, {}, {}]
    w, h = bw * 8, bh * 8
    pw, ph, c, pixels = dec(enc(w, h, comps, [(1, 1)] * len(comps)))
    assert (pw, ph, c) == (w, h, 1 if gray else 3)
    # pixel (x, y) belongs to block (y//8, x//8) with constant 2*dc+128
    for by in range(bh):
        for bx in range(bw):
            want = max(0, min(255, 2 * dcs[(by, bx)] + 128))
            px = pixels[((by * 8) * w + bx * 8) * c]
            assert px == want, (by, bx, px, want)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.sampled_from([1, 3, 4]),
    st.data(),
)
def test_png_roundtrip_arbitrary_pixels(w, h, channels, data):
    """PNG is lossless: an independently constructed PNG (zlib +
    filter-0 scanlines, built here without the codec under test)
    decodes to exactly the raw bytes that went in."""
    import struct
    import zlib

    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        decode_media,
    )

    raw = bytes(
        data.draw(st.integers(0, 255)) for _ in range(w * h * channels)
    )
    color_type = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(ctype, payload):
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scanlines = b"".join(
        b"\x00" + raw[y * w * channels : (y + 1) * w * channels]
        for y in range(h)
    )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )
    d = decode_media(png, "image/png")
    assert (d["width"], d["height"], d["channels"]) == (w, h, channels)
    assert bytes(d["pixels"]) == raw


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.sampled_from([2, 4, 16, 256]),
    st.data(),
)
def test_gif_lzw_roundtrip_arbitrary_indices(w, h, n_colors, data):
    """GIF is lossless over palette indices: encode_gif -> decode_media
    reproduces every palette-expanded pixel exactly, across palette
    sizes (2..256 colors -> LZW min code sizes 2..8) and index
    streams with and without repetition (dictionary growth paths)."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_gif_codec,
        decode_media,
    )

    enc, _ = _build_gif_codec()
    palette = bytes(
        data.draw(st.integers(0, 255)) for _ in range(3 * n_colors)
    )
    idx = [data.draw(st.integers(0, n_colors - 1)) for _ in range(w * h)]
    payload = enc(w, h, idx, palette)
    d = decode_media(payload, "image/gif")
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    expected = []
    for k in idx:
        expected.extend(palette[3 * k : 3 * k + 3])
    assert d["pixels"] == expected


def test_gif_lzw_wide_codes_and_clear_reset():
    """A large low-entropy image drives the LZW dictionary through
    every code width up to 12 bits and past a 4096-entry clear/reset;
    the decode must still be bit-exact (the width-handoff between
    encoder and decoder is the classic off-by-one trap)."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_gif_codec,
        decode_media,
    )

    enc, _ = _build_gif_codec()
    w = h = 128
    palette = bytes(v for k in range(256) for v in (k, k, k))
    idx = [(x * x + 3 * y) % 251 for y in range(h) for x in range(w)]
    payload = enc(w, h, idx, palette)
    d = decode_media(payload, "image/gif")
    assert d["pixel_sum"] == 3 * sum(idx)
    assert d["pixels"][:: 3] == idx


def test_gif_truncated_payload_raises():
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_gif_codec,
        decode_media,
    )
    import pytest as _pytest

    enc, _ = _build_gif_codec()
    palette = bytes(v for k in range(4) for v in (k, k, k)) + bytes(
        (255, 255, 255)
    ) * 0
    payload = enc(5, 4, [k % 4 for k in range(20)], palette)
    with _pytest.raises(ValueError):
        decode_media(payload[: len(payload) // 2], "image/gif")


def test_hypothesis_progressive_jpeg_equals_baseline():
    """Property fuzz: ANY quantized coefficient content, any geometry,
    any sampling layout — the progressive stream (both scan scripts)
    must decode to exactly the baseline stream's pixels."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_jpeg_codec,
    )

    enc, dec = _build_jpeg_codec()

    @settings(max_examples=25, deadline=None)
    @given(
        st.data(),
        st.sampled_from([(8, 8), (16, 8), (24, 24), (17, 9)]),
        st.sampled_from([1, 3]),
        st.booleans(),
    )
    def run(data, wh, ncomp, successive):
        w, h = wh
        samp = [(1, 1)] * ncomp
        if ncomp == 3 and data.draw(st.booleans(), label="use420"):
            samp = [(2, 2), (1, 1), (1, 1)]
        blocks = []
        for ci in range(ncomp):
            sh, sv = samp[ci]
            maxh = max(x for x, _ in samp)
            maxv = max(y for _, y in samp)
            nbx = -(-(-(-w * sh // maxh)) // 8)
            nby = -(-(-(-h * sv // maxv)) // 8)
            comp = {}
            for by in range(nby):
                for bx in range(nbx):
                    blk = [0] * 64
                    for pos in data.draw(
                        st.lists(st.integers(0, 63), max_size=8,
                                 unique=True),
                        label=f"pos{ci}",
                    ):
                        blk[pos] = data.draw(
                            st.integers(-40, 40), label="coef"
                        )
                    comp[(by, bx)] = blk
            blocks.append(comp)
        ref = dec(enc(w, h, blocks, samp))
        got = dec(enc.progressive(w, h, blocks, samp,
                                  successive=successive))
        assert got == ref

    run()


def test_gif_every_truncation_point_raises_valueerror():
    """ADVICE r4: a payload truncated mid-block-header used to escape as
    IndexError.  Sweep EVERY prefix length of a GIF that includes an
    extension block (sub-block scan) and assert the codec's ValueError
    contract holds at all of them — never IndexError/struct.error."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_gif_codec,
    )
    import pytest as _pytest

    enc, parse = _build_gif_codec()
    palette = bytes(v for k in range(4) for v in (k, k, k))
    payload = enc(5, 4, [k % 4 for k in range(20)], palette)
    # splice a graphic-control extension (0x21 0xF9, one 4-byte
    # sub-block, terminator) before the image descriptor so the
    # extension sub-block scan is on the parse path
    # image descriptor sits right after header (13 bytes) + global
    # color table (3 * 2^((flags&7)+1) bytes) — don't byte-search for
    # 0x2C, it also appears inside palette/pixel data
    flags = payload[10]
    img_at = 13 + (3 * (2 ** ((flags & 7) + 1)) if flags & 0x80 else 0)
    assert payload[img_at] == 0x2C
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    extended = payload[:img_at] + ext + payload[img_at:]
    full = parse(extended)
    assert full == parse(payload)
    for cut in range(7, len(extended)):
        try:
            got = parse(extended[:cut])
        except ValueError:
            continue
        # lenient-trailer: a prefix that contains the complete image
        # but drops the 0x3B trailer parses fine — but it must parse
        # to the SAME image, never garbage (and never escape as
        # IndexError / struct.error, which the except above enforces)
        assert got == full, f"cut={cut} parsed to a different image"


# ---------------------------------------------------------------------------
# micro_sum / micro_avg: exact fixed-point average (VERDICT r8 item 5)
# ---------------------------------------------------------------------------

# values with at most 6 decimals (the micro-unit quantum) so the
# double->DECIMAL(18,6) quantization is the identity and the Fraction
# model below is the EXACT ground truth; magnitudes cover sign, zero,
# and boundary-landing averages (x.xxxx5 steps)
_micro_vals = st.one_of(
    st.none(),
    st.integers(min_value=-10_000_000, max_value=10_000_000).map(
        lambda n: n / 1_000_000  # exact 6-decimal lattice around zero
    ),
    st.integers(min_value=-56_021, max_value=56_021).map(lambda n: n / 100),
)


def _py_micro_avg(values, scale=4):
    """Pure-Python exact model: half-away-from-zero avg at `scale`."""
    from fractions import Fraction

    present = [v for v in values if v is not None]
    if not present:
        return None
    # quantize like micro_sum: round-half-up to 6 decimals (exact here
    # by construction of the strategy)
    s = sum(round(Fraction(str(v)) * 1_000_000) for v in present)
    avg_ticks = Fraction(s, 1_000_000 * len(present)) * 10 ** scale
    sign = -1 if avg_ticks < 0 else 1
    ticks = (2 * abs(avg_ticks.numerator) + avg_ticks.denominator) // (
        2 * avg_ticks.denominator
    )
    return float(sign * ticks) / 10 ** scale


@settings(max_examples=15, deadline=None)
@given(st.lists(_micro_vals, min_size=1, max_size=40))
def test_micro_avg_matches_exact_model_and_duckdb(spark, values):
    import duckdb

    from nyc_taxi_data_clickhouse_spark.functions.scalars import (
        micro_avg,
        micro_sum,
    )

    df = spark.createDataFrame([(v,) for v in values], "value double")
    got = (
        df.agg(micro_sum("value").alias("s6"), F.count("value").alias("cv"))
        .select(micro_avg("s6", "cv", 4).alias("avg_value"))
        .collect()[0]["avg_value"]
    )
    assert got == _py_micro_avg(values)
    # the documented DuckDB-oracle spelling computes the identical value
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?::DOUBLE[]) AS value)",
        [values],
    )
    duck = con.execute(
        """
        WITH g AS (
          SELECT CAST(sum(CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                              AS BIGINT)) AS BIGINT) AS s6,
                 count(value) AS cv FROM t)
        SELECT CAST(CASE WHEN s6 < 0 THEN -1 ELSE 1 END
                    * ((2*abs(s6) + 100*cv) // nullif(200*cv, 0)) AS DOUBLE)
                   / 10000 AS avg_value
        FROM g
        """
    ).fetchone()[0]
    con.close()
    assert duck == got


def test_micro_sum_no_long_overflow(spark):
    """ADVICE r9: a per-group unit-sum past ~9.2e18 must stay EXACT —
    the former long accumulator silently dropped (nulled) overflowing
    rows, so micro_avg returned a plausible wrong value.  Ten rows of
    9.9e11 give a unit sum of 9.9e18 > LONG_MAX; the DECIMAL(38,0)
    accumulator must return the exact average."""
    from nyc_taxi_data_clickhouse_spark.functions.scalars import (
        micro_avg,
        micro_sum,
    )

    df = spark.createDataFrame([(9.9e11,)] * 10, "value double")
    row = (
        df.agg(micro_sum("value").alias("s6"), F.count("value").alias("cv"))
        .select(F.col("s6"), micro_avg("s6", "cv", 4).alias("avg_value"))
        .collect()[0]
    )
    assert int(row["s6"]) == 9_900_000_000_000_000_000
    assert row["avg_value"] == 9.9e11


# ---------------------------------------------------------------------------
# Y4M codec (VERDICT r8 item 8): raw planar roundtrip, all colorspaces
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    w=st.sampled_from([2, 4, 8, 10]),
    h=st.sampled_from([2, 4, 6, 8]),
    cs=st.sampled_from(["C420jpeg", "C444", "Cmono", "C420"]),
    n_frames=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
def test_y4m_roundtrip_arbitrary_frames(w, h, cs, n_frames, data):
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_y4m_codec,
    )

    enc, dec, frame_pixels = _build_y4m_codec()
    if cs in ("C420jpeg", "C420"):
        fsize = w * h + 2 * ((w // 2) * (h // 2))
    elif cs == "C444":
        fsize = 3 * w * h
    else:
        fsize = w * h
    frames = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=fsize, max_size=fsize
                )
            )
        )
        for _ in range(n_frames)
    ]
    payload = enc(w, h, 40_000, frames, colorspace=cs)
    video = dec(payload)
    assert video["width"] == w and video["height"] == h
    assert video["n_frames"] == n_frames
    assert video["usec_per_frame"] == 40_000
    assert video["colorspace"] == cs
    assert [bytes(f) for f in video["frames"]] == frames
    # frame decode: mono is Y passthrough; color output is clamped RGB
    w2, h2, c, px = frame_pixels(video, 0)
    assert (w2, h2) == (w, h)
    if cs == "Cmono":
        assert c == 1 and px == list(frames[0][: w * h])
    else:
        assert c == 3 and len(px) == 3 * w * h
        assert all(0 <= v <= 255 for v in px)


def test_y4m_neutral_chroma_is_luma_identity():
    """U=V=128 makes the JFIF conversion exactly (y, y, y) — the
    closed-form rule the multimodal_y4m_video oracle relies on."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_y4m_codec,
    )

    enc, dec, frame_pixels = _build_y4m_codec()
    y = bytes(range(64))
    payload = enc(8, 8, 200_000, [y + bytes([128]) * 32], colorspace="C420jpeg")
    w, h, c, px = frame_pixels(dec(payload), 0)
    assert (w, h, c) == (8, 8, 3)
    assert px == [v for v in y for _ in range(3)]


def test_y4m_rejects_malformed():
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_y4m_codec,
    )
    import pytest as _pytest

    enc, dec, _ = _build_y4m_codec()
    with _pytest.raises(ValueError):
        dec(b"NOTY4M anything")
    good = enc(4, 4, 100_000, [bytes(16 + 8)], colorspace="C420jpeg")
    with _pytest.raises(ValueError):
        dec(good[:-3])  # truncated frame data
    with _pytest.raises(ValueError):
        dec(good.replace(b"FRAME", b"FRAMX"))
    with _pytest.raises(NotImplementedError):
        dec(b"YUV4MPEG2 W4 H4 F25:1 C422\nFRAME\n" + bytes(32))


# ---------------------------------------------------------------------------
# MPEG-1 intra codec (VERDICT r9 item 5): roundtrip vs an independent
# reconstruction model, multi-macroblock DC prediction, scope bounds
# ---------------------------------------------------------------------------


def _mpeg1_expected_pixels(mbs, w, h, qscale=8):
    """Independent numpy model of the MPEG-1 intra reconstruction
    (spec 2.4.4.1: DC*8; AC 2*level*qscale*W/16 truncated toward zero,
    oddified, clamped) + float IDCT + 4:2:0 upsample + JFIF RGB —
    written against the spec text, not the codec code."""
    import math

    import numpy as np

    from nyc_taxi_data_clickhouse_spark.operators import multimodal as mm

    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    Q = [
        8, 16, 19, 22, 26, 27, 29, 34, 16, 16, 22, 24, 27, 29, 34, 37,
        19, 22, 26, 27, 29, 34, 34, 38, 22, 22, 26, 27, 29, 34, 37, 40,
        22, 26, 27, 29, 32, 35, 40, 48, 26, 27, 29, 32, 35, 40, 48, 58,
        26, 27, 29, 34, 38, 46, 56, 69, 27, 29, 35, 38, 46, 56, 69, 83,
    ]
    C = [1 / math.sqrt(2)] + [1.0] * 7
    M = np.array(
        [[C[u] * math.cos((2 * x + 1) * u * math.pi / 16) / 2
          for u in range(8)] for x in range(8)]
    )

    def recon_block(zz):
        out = np.zeros(64, dtype=np.int64)
        out[0] = zz[0] * 8
        for i in range(1, 64):
            if not zz[i]:
                continue
            pos = ZZ[i]
            mag = (2 * abs(zz[i]) * qscale * Q[pos]) // 16
            v = mag if zz[i] > 0 else -mag
            if v and v % 2 == 0:
                v -= 1 if v > 0 else -1
            out[pos] = max(-2048, min(2047, v))
        block = M @ out.reshape(8, 8).astype(np.float64) @ M.T
        return np.clip(np.rint(block), 0, 255).astype(np.int64)

    mb_cols = w // 16
    yp = np.zeros((h, w), dtype=np.int64)
    cbp = np.zeros((h // 2, w // 2), dtype=np.int64)
    crp = np.zeros((h // 2, w // 2), dtype=np.int64)
    for a, mb in enumerate(mbs):
        my, mx = divmod(a, mb_cols)
        for bi in range(4):
            by, bx = divmod(bi, 2)
            yp[
                my * 16 + by * 8 : my * 16 + by * 8 + 8,
                mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8,
            ] = recon_block(mb[bi])
        cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = recon_block(mb[4])
        crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = recon_block(mb[5])
    yv = yp.astype(np.float64)
    cb = cbp.repeat(2, 0).repeat(2, 1).astype(np.float64)
    cr = crp.repeat(2, 0).repeat(2, 1).astype(np.float64)
    r = np.rint(yv + 1.402 * (cr - 128))
    g = np.rint(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    b = np.rint(yv + 1.772 * (cb - 128))
    return (
        np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.int64)
        .reshape(-1).tolist()
    )


@settings(max_examples=20, deadline=None)
@given(data=st.data(), n_mb=st.sampled_from([1, 2, 4]), n_frames=st.integers(1, 3))
def test_mpeg1_intra_roundtrip_vs_independent_model(data, n_mb, n_frames):
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )

    enc, dec, pix = _build_mpeg1_codec()
    w, h = 16 * n_mb, 16
    frames = []
    for _ in range(n_frames):
        mbs = []
        for _ in range(n_mb):
            mb = []
            for _b in range(6):
                zz = [data.draw(st.integers(0, 255))] + [0] * 63
                for _k in range(data.draw(st.integers(0, 4))):
                    zz[data.draw(st.integers(1, 63))] = data.draw(
                        st.integers(-255, 255).filter(lambda x: x != 0)
                    )
                mb.append(zz)
            mbs.append(mb)
        frames.append(mbs)
    payload = enc(w, h, 3, frames)
    v = dec(payload)
    assert (v["width"], v["height"], v["n_frames"]) == (w, h, n_frames)
    assert v["usec_per_frame"] == 40000
    for f in range(n_frames):
        got = pix(v, f)
        assert got[:3] == (w, h, 3)
        assert got[3] == _mpeg1_expected_pixels(frames[f], w, h), f


@settings(max_examples=20, deadline=None)
@given(data=st.data())
def test_mpeg1_short_codes_decode_like_escapes(data):
    """The same coefficients encoded via table B-14 SHORT codes and via
    the always-legal ESCAPE form must decode to identical pixels — the
    bit-level self-consistency gate on the short-code decoder path
    (prefix framing, sign bit, run accumulation).  Levels/runs are
    drawn to hit every implemented short entry."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )

    enc, dec, pix = _build_mpeg1_codec()
    short_entries = [(0, 1), (1, 1), (0, 2), (2, 1), (0, 3), (3, 1),
                     (4, 1), (1, 2), (5, 1), (6, 1), (7, 1)]
    mb = []
    for _b in range(6):
        zz = [data.draw(st.integers(0, 255))] + [0] * 63
        i = 0
        for _k in range(data.draw(st.integers(1, 5))):
            run, mag = data.draw(st.sampled_from(short_entries))
            i += run + 1
            if i > 63:
                break
            zz[i] = mag * data.draw(st.sampled_from([1, -1]))
        mb.append(zz)
    frames = [[mb]]
    via_short = enc(16, 16, 3, frames, ac_short=True)
    via_escape = enc(16, 16, 3, frames, ac_short=False)
    assert via_short != via_escape  # the encodings genuinely differ
    assert len(via_short) < len(via_escape)  # short codes are shorter
    assert pix(dec(via_short), 0) == pix(dec(via_escape), 0)


def test_mpeg1_scope_bounds():
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )
    import pytest

    enc, dec, pix = _build_mpeg1_codec()
    mb = [[100] + [0] * 63] * 6
    payload = enc(16, 16, 3, [[mb]])
    # flip picture_coding_type I->B: the 3 bits after the 10-bit
    # temporal reference in the picture header; picture start is byte-
    # aligned so the type sits in the second byte after 00 00 01 00.
    # (P-pictures are IN scope since round 11, B since round 12.)  A
    # lone B picture has no I anchor, so the sampler rejects it before
    # the B-specific decode is even reached.
    p = bytearray(payload)
    start = payload.find(b"\x00\x00\x01\x00")
    # bits: [10 temporal][3 type] -> type occupies bits 2..4 of byte+5
    p[start + 5] = (p[start + 5] & 0b11000111) | (0b011 << 3)
    v = dec(bytes(p))
    with pytest.raises(ValueError, match="no I-picture anchor"):
        pix(v, 0)
    # an I,B stream reaches the B picture itself, which then lacks a
    # SECOND (backward) reference — one anchor is not enough for B
    two = enc(16, 16, 3, [[mb], [mb]])
    starts = []
    off = 0
    while True:
        s = two.find(b"\x00\x00\x01\x00", off)
        if s < 0:
            break
        starts.append(s)
        off = s + 4
    p2 = bytearray(two)
    p2[starts[1] + 5] = (p2[starts[1] + 5] & 0b11000111) | (0b011 << 3)
    v2 = dec(bytes(p2))
    with pytest.raises(ValueError, match="two preceding reference"):
        pix(v2, 1)
    # D-pictures (type 4) are the remaining declared type boundary
    p3 = bytearray(two)
    p3[starts[1] + 5] = (p3[starts[1] + 5] & 0b11000111) | (0b100 << 3)
    v3 = dec(bytes(p3))
    with pytest.raises(NotImplementedError, match="picture_coding_type 4"):
        pix(v3, 1)
    with pytest.raises(ValueError, match="sequence header"):
        dec(b"RIFFnotmpeg")
    # a P-picture as the FIRST picture has no reference
    penc = enc(48, 16, 3, [
        {"type": "P", "mbs": [{"mv": (0, 0), "blocks": [None] * 6}] * 3}
    ])
    with pytest.raises(ValueError, match="no I-picture anchor"):
        pix(dec(penc), 0)
    # ADVICE r11: a TRUNCATED stream must fail with a diagnosable
    # ValueError from the bit reader, never a raw IndexError
    head = enc(16, 16, 3, [[mb]])
    with pytest.raises(ValueError, match="exhausted|raster|truncated"):
        pix(dec(head[: len(head) - 6]), 0)


# ---------------------------------------------------------------------------
# MPEG-1 P-pictures (VERDICT r10 item 6): forward motion compensation
# vs an independent numpy prediction model, VLC table hygiene, half-pel
# rounding, PMV/DC reset rules
# ---------------------------------------------------------------------------


def _mpeg1_p_expected_luma(ref_y, mbs_spec, qscale=5):
    """Independent numpy model of P-picture LUMA reconstruction,
    written against the spec text (2.4.4.2/2.4.4.3): skipped/uncoded
    macroblocks copy the reference, motion-compensated prediction
    samples the reference at the half-pel vector with (a+b+1)>>1
    rounding, DC-only non-intra residuals dequantize as
    (2*level+sign)*q*16/16 truncated, oddified, then IDCT (flat value
    /8, rounded) and add, intra macroblocks reconstruct DC*8/8."""
    import numpy as np

    cur = ref_y.copy()
    for mbi, mb in enumerate(mbs_spec):
        x0 = mbi * 16
        if mb == "skip":
            continue
        if isinstance(mb, dict) and "intra" in mb:
            a, b = mb["intra"][0][0], mb["intra"][1][0]
            cur[:, x0:x0 + 8] = a
            cur[:, x0 + 8:x0 + 16] = b
            continue
        mvx, mvy = mb.get("mv") or (0, 0)
        ix, hx = mvx >> 1, mvx & 1
        iy, hy = mvy >> 1, mvy & 1
        sl = ref_y[iy:iy + 16 + hy, x0 + ix:x0 + ix + 16 + hx].astype(
            np.int64
        )
        if hx and hy:
            sl = (sl[:-1, :-1] + sl[:-1, 1:] + sl[1:, :-1] + sl[1:, 1:] + 2) >> 2
        elif hx:
            sl = (sl[:, :-1] + sl[:, 1:] + 1) >> 1
        elif hy:
            sl = (sl[:-1, :] + sl[1:, :] + 1) >> 1
        pred = sl.copy()
        for bi in range(4):
            blk = mb["blocks"][bi]
            if blk is None or not any(blk):
                continue
            lvl = blk[0]
            mag = ((2 * abs(lvl) + 1) * qscale * 16) // 16
            val = mag if lvl > 0 else -mag
            if val and val % 2 == 0:
                val -= 1 if val > 0 else -1
            px = int(np.rint(val * 0.125))  # flat IDCT of a DC-only block
            by, bx = divmod(bi, 2)
            pred[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] += px
        cur[:, x0:x0 + 16] = np.clip(pred, 0, 255)
    return cur


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_mpeg1_pframe_roundtrip_vs_independent_model(data):
    import numpy as np

    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )

    enc, dec, pix = _build_mpeg1_codec()
    stripes = [data.draw(st.integers(0, 199)) for _ in range(6)]
    i_mbs = []
    for mbi in range(3):
        a, b = stripes[2 * mbi], stripes[2 * mbi + 1]
        i_mbs.append([[a] + [0] * 63, [b] + [0] * 63,
                      [a] + [0] * 63, [b] + [0] * 63,
                      [128] + [0] * 63, [128] + [0] * 63])
    p_mbs = []
    pmv = 0
    for mbi in range(3):
        kind = data.draw(st.sampled_from(
            ["skip", "intra", "mc", "mc_coded", "coded"]
            if mbi == 1 else ["intra", "mc", "mc_coded", "coded"]
        ))
        if kind == "skip":
            p_mbs.append("skip")
            pmv = 0
            continue
        if kind == "intra":
            g = data.draw(st.integers(0, 199))
            h = data.draw(st.integers(0, 199))
            p_mbs.append({"intra": [[g] + [0] * 63, [h] + [0] * 63,
                                    [g] + [0] * 63, [h] + [0] * 63,
                                    [128] + [0] * 63, [128] + [0] * 63]})
            pmv = 0
            continue
        lvl = data.draw(st.sampled_from([-3, -1, 1, 2, 3]))
        res = [lvl] + [0] * 63
        blocks = (
            [res, res, res, res, None, None] if kind != "mc" else [None] * 6
        )
        if kind == "coded":
            p_mbs.append({"mv": None, "blocks": blocks})
            pmv = 0
            continue
        x0 = mbi * 16
        lo, hi = -2 * x0, 2 * (48 - 16 - x0)
        mvx = data.draw(st.integers(lo, hi))
        # encoder motion-code subset: |delta| <= 7*f (f=8) per component
        from hypothesis import assume
        assume(abs(mvx - pmv) <= 56)
        pmv = mvx
        p_mbs.append({"mv": (mvx, 0), "blocks": blocks})
    payload = enc(48, 16, 3, [i_mbs, {"type": "P", "mbs": p_mbs}],
                  quantizer_scale=5)
    v = dec(payload)
    w, h, c, px = pix(v, 1)
    got_y = np.array(px, dtype=np.int64).reshape(16, 48, 3)[:, :, 1]
    # neutral chroma: G == Y exactly (JFIF conversion is identity on Y)
    ref_y = np.zeros((16, 48), dtype=np.int64)
    for k, s in enumerate(stripes):
        ref_y[:, k * 8:(k + 1) * 8] = s
    exp_y = _mpeg1_p_expected_luma(ref_y, p_mbs)
    assert np.array_equal(got_y, exp_y)


def test_mpeg1_vlc_tables_hygiene():
    """Tables B-2b/B-3/B-4 (as transcribed): complete where the spec is
    complete, and prefix-free — a corrupted entry would break greedy
    decode for some input, so this pins the transcription's framing."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )

    enc, dec, pix = _build_mpeg1_codec()
    cbp = enc.tables["CBP_ENC"]
    mv = enc.tables["MV_ENC"]
    assert sorted(cbp) == list(range(1, 64))  # every cbp value 1..63
    assert sorted(mv) == list(range(-7, 8))

    def prefix_free(codes):
        codes = sorted(codes, key=len)
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not b.startswith(a), (a, b)

    prefix_free(list(cbp.values()))
    prefix_free(list(mv.values()))
    prefix_free(["1", "01", "001", "00011", "00010", "00001", "000001"])
    # code lengths match table B-3's published histogram
    from collections import Counter
    assert Counter(map(len, cbp.values())) == Counter(
        {3: 1, 4: 4, 5: 12, 6: 4, 7: 8, 8: 28, 9: 6}
    )


def test_mpeg1_halfpel_rounding_planted():
    """A -0.5 px vector over a two-value boundary must land exactly on
    (a+b+1)>>1 at the seam columns — MPEG-1 rounds half values UP."""
    import numpy as np

    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )

    enc, dec, pix = _build_mpeg1_codec()
    stripes = [10, 20, 31, 40, 55, 60]  # 31+40 odd sum: rounding visible
    i_mbs = []
    for mbi in range(3):
        a, b = stripes[2 * mbi], stripes[2 * mbi + 1]
        i_mbs.append([[a] + [0] * 63, [b] + [0] * 63,
                      [a] + [0] * 63, [b] + [0] * 63,
                      [128] + [0] * 63, [128] + [0] * 63])
    p_mbs = [
        {"mv": (0, 0), "blocks": [None] * 6},
        {"mv": (-1, 0), "blocks": [None] * 6},
        {"mv": (0, 0), "blocks": [None] * 6},
    ]
    v = dec(enc(48, 16, 3, [i_mbs, {"type": "P", "mbs": p_mbs}]))
    y = np.array(pix(v, 1)[3], dtype=np.int64).reshape(16, 48, 3)[:, :, 1]
    # MB1 col 16 samples avg(ref[15], ref[16]) = (20 + 31 + 1) >> 1 = 26
    assert int(y[0, 16]) == (20 + 31 + 1) >> 1 == 26
    # interior columns stay constant
    assert int(y[0, 18]) == 31
    # col 24 seam: (31 + 40 + 1) >> 1 = 36
    assert int(y[0, 24]) == 36


# ---------------------------------------------------------------------------
# MPEG-1 B-pictures (VERDICT r11 item 8): bidirectional prediction vs
# an independent numpy model, display/decode reordering, the B skip
# rule, dual-predictor independence, table B-2c hygiene
# ---------------------------------------------------------------------------


def _mpeg1_b_expected_luma(fwd_y, bwd_y, mbs_spec, qscale=5):
    """Independent numpy model of B-picture LUMA reconstruction,
    written against the spec text (2.4.4.4): forward prediction from
    the PREVIOUS anchor, backward from the NEXT anchor, interpolated =
    (fwd + bwd) // 2 with // rounding half away from zero
    ((a+b+1)>>1 on non-negative samples); skipped macroblocks repeat
    the previous macroblock's prediction mode and vectors; DC-only
    non-intra residuals as in the P model."""
    import numpy as np

    def mc(ref, x0, mvx):
        ix, hx = mvx >> 1, mvx & 1
        sl = ref[:, x0 + ix : x0 + ix + 16 + hx].astype(np.int64)
        if hx:
            sl = (sl[:, :-1] + sl[:, 1:] + 1) >> 1
        return sl

    cur = np.zeros_like(fwd_y)
    last = None  # (fmv or None, bmv or None)
    for mbi, mb in enumerate(mbs_spec):
        x0 = mbi * 16
        if mb == "skip":
            fmv, bmv = last
            pred = None
            if fmv is not None:
                pred = mc(fwd_y, x0, fmv[0])
            if bmv is not None:
                b = mc(bwd_y, x0, bmv[0])
                pred = b if pred is None else (pred + b + 1) >> 1
            cur[:, x0:x0 + 16] = pred
            continue
        if isinstance(mb, dict) and "intra" in mb:
            a, b = mb["intra"][0][0], mb["intra"][1][0]
            cur[:, x0:x0 + 8] = a
            cur[:, x0 + 8:x0 + 16] = b
            last = None
            continue
        fmv, bmv = mb.get("fmv"), mb.get("bmv")
        pred = None
        if fmv is not None:
            pred = mc(fwd_y, x0, fmv[0])
        if bmv is not None:
            bb = mc(bwd_y, x0, bmv[0])
            pred = bb if pred is None else (pred + bb + 1) >> 1
        pred = pred.copy()
        last = (fmv, bmv)
        import numpy as np
        for bi in range(4):
            blk = mb["blocks"][bi]
            if blk is None or not any(blk):
                continue
            lvl = blk[0]
            mag = ((2 * abs(lvl) + 1) * qscale * 16) // 16
            val = mag if lvl > 0 else -mag
            if val and val % 2 == 0:
                val -= 1 if val > 0 else -1
            px = int(np.rint(val * 0.125))
            by, bx = divmod(bi, 2)
            pred[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] += px
        cur[:, x0:x0 + 16] = np.clip(pred, 0, 255)
    return cur


def _stripe_i_mbs(stripes):
    mbs = []
    for mbi in range(len(stripes) // 2):
        a, b = stripes[2 * mbi], stripes[2 * mbi + 1]
        mbs.append([[a] + [0] * 63, [b] + [0] * 63,
                    [a] + [0] * 63, [b] + [0] * 63,
                    [128] + [0] * 63, [128] + [0] * 63])
    return mbs


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_mpeg1_bframe_roundtrip_vs_independent_model(data):
    """Display order I,B,P (stream order I,P,B): the B-picture's luma
    must match an independent bidirectional reconstruction, for every
    macroblock mode mix — forward/backward/interpolated, coded or not,
    intra, and skip (which repeats the previous prediction)."""
    import numpy as np

    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )
    from hypothesis import assume

    enc, dec, pix = _build_mpeg1_codec()
    W = 64
    i_str = [data.draw(st.integers(0, 199)) for _ in range(8)]
    p_str = [data.draw(st.integers(0, 199)) for _ in range(8)]
    i_mbs = _stripe_i_mbs(i_str)
    # a simple all-intra P anchor: exact, position-independent content
    p_pic = {"type": "P", "mbs": [
        {"intra": mb} for mb in _stripe_i_mbs(p_str)
    ]}
    b_mbs = []
    pmvf = pmvb = 0
    last_intra = True
    last_pred = None  # (fmv, bmv) a skip would inherit

    def _mv_in_frame_at(mv, x0):
        # skip repeats the previous prediction at a NEW column: the
        # inherited half-pel vector must stay inside the picture for
        # the 16-wide luma AND the 8-wide chroma (luma/2 trunc) there
        if mv is None:
            return True
        for mvx, col0, size, lim in (
            (mv[0], x0, 16, W),
            (abs(mv[0]) // 2 * (1 if mv[0] >= 0 else -1), x0 // 2, 8, W // 2),
        ):
            ix, hx = mvx >> 1, mvx & 1
            if col0 + ix < 0 or col0 + ix + size + hx > lim:
                return False
        return True

    for mbi in range(4):
        kinds = ["fwd", "bwd", "interp", "intra"]
        if (
            mbi in (1, 2)
            and not last_intra
            and last_pred is not None
            and all(_mv_in_frame_at(mv, mbi * 16) for mv in last_pred)
        ):
            kinds.append("skip")
        kind = data.draw(st.sampled_from(kinds))
        if kind == "skip":
            b_mbs.append("skip")
            continue
        if kind == "intra":
            g = data.draw(st.integers(0, 199))
            h = data.draw(st.integers(0, 199))
            b_mbs.append({"intra": [[g] + [0] * 63, [h] + [0] * 63,
                                    [g] + [0] * 63, [h] + [0] * 63,
                                    [128] + [0] * 63, [128] + [0] * 63]})
            pmvf = pmvb = 0
            last_intra = True
            continue
        last_intra = False
        x0 = mbi * 16
        lo, hi = -2 * x0, 2 * (W - 16 - x0)
        fmv = bmv = None
        if kind in ("fwd", "interp"):
            mvx = data.draw(st.integers(lo, hi))
            assume(abs(mvx - pmvf) <= 56)
            pmvf = mvx
            fmv = (mvx, 0)
        if kind in ("bwd", "interp"):
            mvx = data.draw(st.integers(lo, hi))
            assume(abs(mvx - pmvb) <= 56)
            pmvb = mvx
            bmv = (mvx, 0)
        lvl = data.draw(st.sampled_from([0, -3, -1, 1, 2, 3]))
        blocks = (
            [[lvl] + [0] * 63] * 4 + [None, None] if lvl else [None] * 6
        )
        b_mbs.append({"fmv": fmv, "bmv": bmv, "blocks": blocks})
        last_pred = (fmv, bmv)
    payload = enc(W, 16, 3, [i_mbs, {"type": "B", "mbs": b_mbs}, p_pic],
                  quantizer_scale=5)
    v = dec(payload)
    # display index 1 is the B-picture
    w, h, c, px = pix(v, 1)
    got_y = np.array(px, dtype=np.int64).reshape(16, W, 3)[:, :, 1]
    fwd_y = np.zeros((16, W), dtype=np.int64)
    bwd_y = np.zeros((16, W), dtype=np.int64)
    for k in range(8):
        fwd_y[:, k * 8:(k + 1) * 8] = i_str[k]
        bwd_y[:, k * 8:(k + 1) * 8] = p_str[k]
    exp_y = _mpeg1_b_expected_luma(fwd_y, bwd_y, b_mbs)
    assert np.array_equal(got_y, exp_y)
    # the anchors themselves must be untouched by the B decode
    w, h, c, px0 = pix(v, 0)
    assert np.array_equal(
        np.array(px0, dtype=np.int64).reshape(16, W, 3)[:, :, 1], fwd_y
    )
    w, h, c, px2 = pix(v, 2)
    assert np.array_equal(
        np.array(px2, dtype=np.int64).reshape(16, W, 3)[:, :, 1], bwd_y
    )


def test_mpeg1_bframe_stream_reorder_and_temporal_reference():
    """The encoder must emit DECODE order (anchor before the B's that
    display before it) with temporal_reference = display index, and
    the sampler must hand back display order."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )

    enc, dec, pix = _build_mpeg1_codec()
    i_mbs = _stripe_i_mbs([10, 20, 30, 40, 50, 60, 70, 80])
    p_pic = {"type": "P", "mbs": [
        {"intra": mb} for mb in _stripe_i_mbs([15, 25, 35, 45, 55, 65, 75, 85])
    ]}
    b_pic = {"type": "B", "mbs": [
        {"fmv": (0, 0), "bmv": None, "blocks": [None] * 6}] * 4}
    v = dec(enc(64, 16, 3, [i_mbs, b_pic, p_pic]))
    # stream order: picture 0 = I (tr 0), picture 1 = P (tr 2),
    # picture 2 = B (tr 1)
    import nyc_taxi_data_clickhouse_spark.operators.multimodal as mm
    hdrs = []
    for k in range(3):
        r_pic = v["pictures"][k][4:]
        tr = (r_pic[0] << 2) | (r_pic[1] >> 6)
        ptype = (r_pic[1] >> 3) & 7
        hdrs.append((tr, ptype))
    assert hdrs == [(0, 1), (2, 2), (1, 3)]
    # display 1 (the B, forward zero-motion from I) equals the I frame
    assert pix(v, 1)[3] == pix(v, 0)[3]
    # display 2 is the P anchor content, not the B
    assert pix(v, 2)[3] != pix(v, 0)[3]


def test_mpeg1_bframe_encoder_validation():
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )
    import pytest

    enc, dec, pix = _build_mpeg1_codec()
    i_mbs = _stripe_i_mbs([10, 20, 30, 40, 50, 60, 70, 80])
    bmb = {"fmv": (0, 0), "bmv": None, "blocks": [None] * 6}
    b_pic = {"type": "B", "mbs": [bmb] * 4}
    p_pic = {"type": "P", "mbs": [
        {"intra": mb} for mb in _stripe_i_mbs([1, 2, 3, 4, 5, 6, 7, 8])
    ]}
    # trailing B without a following anchor
    with pytest.raises(ValueError, match="trailing B"):
        enc(64, 16, 3, [i_mbs, b_pic])
    # B before the first anchor
    with pytest.raises(ValueError, match="before the first anchor"):
        enc(64, 16, 3, [b_pic, i_mbs])
    # B macroblock without any motion vector
    with pytest.raises(ValueError, match="at least one motion"):
        enc(64, 16, 3, [i_mbs, {"type": "B", "mbs": [
            bmb, {"fmv": None, "bmv": None, "blocks": [None] * 6},
            bmb, bmb]}, p_pic])
    # skipped B macroblock right after an intra macroblock
    with pytest.raises(ValueError, match="follow an intra"):
        enc(64, 16, 3, [i_mbs, {"type": "B", "mbs": [
            bmb, {"intra": i_mbs[1]}, "skip", bmb]}, p_pic])
    # backward vector outside the backward f_code range
    with pytest.raises(ValueError, match="backward motion vector"):
        enc(64, 16, 3, [i_mbs, {"type": "B", "mbs": [
            bmb, {"fmv": None, "bmv": (0, -40), "blocks": [None] * 6},
            bmb, bmb]}, p_pic], backward_f_code=2)
    # skipped B macroblock inheriting a vector that goes out of frame
    # at the skipped address: fwd +33 half-pel is legal at column 0
    # (0 + 16 + 16 + 1 <= 64) but NOT at skipped column 2
    # (32 + 16 + 16 + 1 > 64) — the hypothesis-found r13 case; the
    # encoder must reject the GOP spec instead of authoring a stream
    # the decoder cannot motion-compensate
    with pytest.raises(ValueError, match="references outside the picture"):
        enc(64, 16, 3, [i_mbs, {"type": "B", "mbs": [
            {"fmv": (33, 0), "bmv": None, "blocks": [None] * 6},
            "skip", "skip", bmb]}, p_pic])
    # the same inherited vector used only at a VALID skipped address
    # must still encode and decode cleanly (the guard is per-address)
    payload = enc(64, 16, 3, [i_mbs, {"type": "B", "mbs": [
        {"fmv": (33, 0), "bmv": None, "blocks": [None] * 6},
        "skip", bmb, bmb]}, p_pic])
    assert pix(dec(payload), 1)[0] == 64


def test_mpeg1_bframe_dual_predictors_independent():
    """Forward and backward vector predictors must be tracked
    independently, and a direction ABSENT from a macroblock must leave
    its predictor unchanged (B rule — unlike P's reset-to-zero): MB3's
    forward delta is differenced against MB0's forward vector even
    though MB1/MB2 carried no forward vector."""
    import numpy as np

    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )

    enc, dec, pix = _build_mpeg1_codec()
    i_str = [10, 20, 30, 40, 50, 60, 70, 81]
    p_str = [15, 25, 35, 45, 55, 65, 75, 85]
    i_mbs = _stripe_i_mbs(i_str)
    p_pic = {"type": "P", "mbs": [
        {"intra": mb} for mb in _stripe_i_mbs(p_str)
    ]}
    b_mbs = [
        {"fmv": (16, 0), "bmv": None, "blocks": [None] * 6},    # fwd +8px
        {"fmv": None, "bmv": (-16, 0), "blocks": [None] * 6},   # bwd -8px
        {"fmv": None, "bmv": (-16, 0), "blocks": [None] * 6},   # delta 0
        # fwd -8px: differenced against MB0's +16 predictor (delta -32)
        # — MB1/MB2 carried no forward vector, so a buggy P-style reset
        # would reconstruct -32 (-16px) here and land on I stripes 4/5
        {"fmv": (-16, 0), "bmv": None, "blocks": [None] * 6},
    ]
    v = dec(enc(64, 16, 3, [i_mbs, {"type": "B", "mbs": b_mbs}, p_pic]))
    y = np.array(pix(v, 1)[3], dtype=np.int64).reshape(16, 64, 3)[:, :, 1]
    assert int(y[0, 0]) == i_str[1]    # MB0: I col 8 at col 0
    assert int(y[0, 8]) == i_str[2]
    assert int(y[0, 16]) == p_str[1]   # MB1: P col 8 at col 16
    assert int(y[0, 24]) == p_str[2]
    assert int(y[0, 32]) == p_str[3]   # MB2: P col 24 at col 32
    assert int(y[0, 40]) == p_str[4]
    assert int(y[0, 48]) == i_str[5]   # MB3: I col 40 at col 48
    assert int(y[0, 56]) == i_str[6]


# ---------------------------------------------------------------------------
# Bit-I/O primitives vs naive per-bit models (r13: the bulk-read /
# int-keyed-VLC / deferred-write rewrite must be bit-equivalent)
# ---------------------------------------------------------------------------

def _naive_reader_bits(data: bytes):
    """Every bit of ``data``, MSB-first — the reference stream."""
    return [
        (byte >> (7 - k)) & 1 for byte in data for k in range(8)
    ]


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=48),
    widths=st.lists(st.integers(min_value=0, max_value=40), max_size=24),
    seed=st.integers(min_value=0, max_value=2**31),
)
# pinned r13 falsifying example: zero-width read at exact end-of-stream
# (incl. empty input) must return 0, not index past the buffer
@example(data=b"", widths=[0], seed=0)
@example(data=b"\xff", widths=[8, 0], seed=0)
def test_bitreader_matches_naive_model(data, widths, seed):
    """read(n)/nextbits(n) against a pure-Python per-bit fold: same
    values in stream order, same exhaustion error, nextbits never
    advances."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )

    _BitWriter, _BitReader = _build_mpeg1_codec()[0].bit_io
    bits = _naive_reader_bits(data)
    r = _BitReader(data)
    pos = 0
    for n in widths:
        expect_peek = None
        if pos + n <= len(bits):
            expect_peek = 0
            for b in bits[pos:pos + n]:
                expect_peek = (expect_peek << 1) | b
        assert r.nextbits(n) == expect_peek
        assert r.pos == pos  # peek never advances
        if expect_peek is None:
            with pytest.raises(ValueError, match="exhausted"):
                r.read(n)
            assert r.pos == pos  # failed read does not advance
        else:
            assert r.read(n) == expect_peek
            pos += n
            assert r.pos == pos


@settings(max_examples=60, deadline=None)
@given(
    chunks=st.lists(
        st.text(alphabet="01", min_size=0, max_size=19), max_size=24
    ),
    aligns=st.sets(st.integers(min_value=0, max_value=23)),
)
def test_bitwriter_matches_naive_model(chunks, aligns):
    """bits()/align()/start_code() against a naive 1-bit-at-a-time
    accumulator: identical bytes for arbitrary chunkings and
    interleaved alignment points."""
    from nyc_taxi_data_clickhouse_spark.operators.multimodal import (
        _build_mpeg1_codec,
    )

    _BitWriter, _BitReader = _build_mpeg1_codec()[0].bit_io

    # naive model
    buf = bytearray()
    acc = n = 0
    def model_bits(s):
        nonlocal acc, n
        for ch in s:
            acc = (acc << 1) | (ch == "1")
            n += 1
            if n == 8:
                buf.append(acc)
                acc = n = 0
    w = _BitWriter()
    for k, s in enumerate(chunks):
        w.bits(s)
        model_bits(s)
        if k in aligns:
            w.start_code(0xB3)
            while n:
                model_bits("0")
            buf.extend((0, 0, 1, 0xB3))
    w.align()
    while n:
        model_bits("0")
    assert bytes(w.buf) == bytes(buf)
