"""Multimodal column plumbing (SURVEY §7): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side plumbing — schema, batching, partition sizing, UDF
signatures — is real and tested.  The actual codec work (JPEG decode,
audio resample, video frame extraction) is STUBBED: the container has
no image/audio libraries, so ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic hash-derived feature vector with the exact shape a real
decoder would emit.  Swapping in a real decoder changes ONE inner
function; none of the distributed plumbing moves.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical media column bundle: payload + typed metadata
MEDIA_STRUCT = T.StructType(
    [
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

#: schema appended by featurize_media
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 16


def pack_media(df: DataFrame, bytes_col: str, mime: str) -> DataFrame:
    """Wrap a raw binary column into the canonical media struct."""
    return df.withColumn(
        "media",
        F.struct(
            F.col(bytes_col).alias("bytes"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats in
    [0,1) derived from the payload's sha256.  Same length/dtype/range a
    tiny image-embedding head would emit."""
    h = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def decode_media(payload: bytes, mime: str, fake: bool = False) -> list[float]:
    """Decode one media payload to a feature vector.

    STUB: real decoding needs codec libraries not present in this
    container.  ``fake=True`` returns the deterministic hash feature.
    """
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        f"no codec available for {mime!r}; install a decoder and replace "
        "decode_media, or run with fake=True"
    )


def featurize_media(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over a media-struct column.

    ``mapInPandas`` streams record batches through Python: bytes never
    amplify to one-row-per-call overhead, and partition boundaries are
    preserved (no shuffle).  At 100 TB: size input partitions so one
    batch of payloads fits comfortably in worker memory
    (``spark.sql.files.maxPartitionBytes`` + maxRecordsPerBatch).
    """

    # NOTE: the closure must be fully self-contained (stdlib imports
    # inside, no references to this module's globals).  cloudpickle
    # ships nested functions by value, but any referenced module-level
    # symbol is pickled by REFERENCE and would require this package to
    # be importable on every Python worker — not guaranteed when the
    # consuming driver runs from another working directory.
    feature_dim = FEATURE_DIM

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _decode(payload: bytes, mime: str) -> list[float]:
            if fake:
                h = _hashlib.sha256(payload).digest()
                return [
                    int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65536.0
                    for i in range(feature_dim)
                ]
            raise NotImplementedError(
                f"no codec available for {mime!r}; install a decoder and "
                "replace decode_media, or run with fake=True"
            )

        for pdf in batches:
            payloads = pdf["__bytes"]
            mimes = pdf["__mime"]
            out = {
                "media_id": pdf[id_col],
                "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                "sha256": payloads.map(
                    lambda b: _hashlib.sha256(b).hexdigest() if b is not None else None
                ),
                "feature": [
                    None if b is None else _decode(bytes(b), m)
                    for b, m in zip(payloads, mimes)
                ],
            }
            yield _pd.DataFrame(out)

    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.bytes").alias("__bytes"),
        F.col(f"{media_col}.mime").alias("__mime"),
    )
    return flat.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled timestamp with a (stub) frame payload.  The timestamp grid
    comes from metadata (duration_ms), JVM-side via sequence+explode;
    only the per-frame decode would live in Python."""
    grid = df.select(
        F.col(id_col),
        F.col(f"{media_col}.bytes").alias("__payload"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col(f"{media_col}.duration_ms"), F.lit(0)) - 1,
                    F.lit(0),
                ),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    # frame payload extraction is the stubbed codec step; keep the
    # deterministic stand-in (offset-keyed slice of the source bytes)
    return grid.select(
        id_col,
        "frame_ts_ms",
        F.sha2(
            F.concat(F.col("__payload"), F.col("frame_ts_ms").cast("string").cast("binary")),
            256,
        ).alias("frame_digest"),
    )


#: schema emitted by resize_images
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    max_side: int = 256,
    id_col: str = "media_id",
    media_col: str = "media",
    fake: bool = True,
) -> DataFrame:
    """Aspect-preserving image resize plumbing.

    The OUTPUT GEOMETRY is real and computed JVM-side from metadata
    (scale = max_side / longest side, never upscale); only the pixel
    resample is the stubbed codec step (``fake=True`` emits a
    deterministic digest payload of plausible size).  At 100 TB this
    is a map-only narrow transform; payload bytes stay inside their
    partition end to end.
    """
    w = F.col(f"{media_col}.width")
    h = F.col(f"{media_col}.height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h))
    out_w = F.greatest(F.lit(1), F.floor(w * scale)).cast("int")
    out_h = F.greatest(F.lit(1), F.floor(h * scale)).cast("int")
    geom = df.select(
        F.col(id_col),
        F.col(f"{media_col}.bytes").alias("__bytes"),
        F.col(f"{media_col}.mime").alias("__mime"),
        out_w.alias("out_width"),
        out_h.alias("out_height"),
    )

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            if fake:
                resized = [
                    None
                    if b is None or ow is None
                    else _hashlib.sha256(
                        bytes(b) + f"{ow}x{oh}".encode()
                    ).digest()
                    for b, ow, oh in zip(
                        pdf["__bytes"], pdf["out_width"], pdf["out_height"]
                    )
                ]
            else:
                raise NotImplementedError(
                    "no image codec in this container; replace resample "
                    "or run with fake=True"
                )
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": pdf["out_width"],
                    "out_height": pdf["out_height"],
                    "resized": resized,
                }
            )

    return geom.mapInPandas(resample, schema=RESIZE_SCHEMA)


def resample_audio(
    df: DataFrame,
    target_hz: int = 16_000,
    source_hz: int = 44_100,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """Audio resample plumbing: output sample count is exact metadata
    arithmetic (duration_ms * target_hz / 1000), JVM-side; the PCM
    interpolation itself is the stubbed codec step, represented by a
    deterministic digest so downstream schema/partitioning is real."""
    dur = F.coalesce(F.col(f"{media_col}.duration_ms"), F.lit(0))
    return df.select(
        F.col(id_col),
        F.lit(target_hz).alias("target_hz"),
        (dur * target_hz / 1000).cast("long").alias("n_samples"),
        F.sha2(
            F.concat(
                F.col(f"{media_col}.bytes"),
                F.lit(f"@{source_hz}->{target_hz}").cast("binary"),
            ),
            256,
        ).alias("pcm_digest"),
    )
