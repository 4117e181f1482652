"""Multimodal column operators (scale extension per BASELINE.json):
image/audio/video as opaque binary columns with typed metadata
(schemas.MEDIA_SCHEMA), processed via Arrow-batched mapInPandas.

The decode/resample kernels need codec libraries that are not in this
container, so the kernel layer is pluggable: real decoders slot in behind
the same signature, and a deterministic fake (seeded from the payload
digest) keeps the Spark-side plumbing — schema, partitioning, UDF signature,
batch shape — real and tested. The fake is clearly marked; calling the real
kernel without a decoder installed raises NotImplementedError.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def real_decode_kernel(payload: bytes, kind: str) -> list[float]:
    """The slot for a real decoder (PIL/ffmpeg/torchaudio). STUB: those
    libraries are not in this container."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment; "
        "inject fake_decode_kernel or a real decoder"
    )


def fake_decode_kernel(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake decoder: FEATURE_DIM floats derived from the
    payload digest. Same signature, same batch shape as a real kernel."""
    d = hashlib.md5(payload or b"").digest()
    return [round(b / 255.0, 6) for b in d[:FEATURE_DIM]]


def extract_features(
    media: DataFrame,
    *,
    kernel: Callable[[bytes, str], list[float]] = real_decode_kernel,
) -> DataFrame:
    """Decode + featurize each media row. One kernel call per row inside an
    Arrow batch; partitioning is inherited (repartition upstream to spread
    decode cost — decode is CPU-bound, so partitions ≈ cores)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "digest": [hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]],
                    "features": [
                        kernel(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    *,
    every_n_bytes: int = 64,
    max_frames: int = 4,
) -> DataFrame:
    """Frame sampling plumbing: emit ≤ max_frames byte-slices per video row
    (a real implementation decodes at timestamps; the slicing fake keeps the
    one-to-many mapInPandas shape and partition behavior identical)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video" or not r["payload"]:
                    continue
                payload = r["payload"]
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "frame_payload": payload[
                                i * every_n_bytes : (i + 1) * every_n_bytes
                            ],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: build a MEDIA_SCHEMA-shaped frame from the documents table
    (text bytes as payload) so the plumbing is exercisable on driver data."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def real_resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """The slot for a real image resize (PIL). STUB: not in this container."""
    raise NotImplementedError(
        "image resize requires codec libraries not present in this environment; "
        "inject fake_resize_kernel or a real resizer"
    )


def fake_resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: cycle the payload bytes to exactly
    width*height bytes (truncate or repeat). Same signature and batch shape
    as a real kernel; output size is what a real w*h*1-channel raster is."""
    target = max(1, width * height)
    src = payload or b"\x00"
    reps = target // len(src) + 1
    return (src * reps)[:target]


def resize_media(
    media: DataFrame,
    *,
    width: int = 16,
    height: int = 16,
    kernel: Callable[[bytes, int, int], bytes] = real_resize_kernel,
) -> DataFrame:
    """Resize plumbing for image rows: binary in → fixed-size binary out via
    Arrow-batched mapInPandas (CPU-bound per row, so partitions ≈ cores; the
    output column carries the new raster dims as typed metadata)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "image" or r["payload"] is None:
                    continue
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "width": width,
                        "height": height,
                        "payload": kernel(bytes(r["payload"]), width, height),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)
