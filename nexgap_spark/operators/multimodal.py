"""Multimodal column operators (scale extension per BASELINE.json):
image/audio/video as opaque binary columns with typed metadata
(schemas.MEDIA_SCHEMA), processed via Arrow-batched mapInPandas.

The kernel layer is pluggable: real decoders slot in behind one signature,
and a deterministic fake (seeded from the payload digest) keeps the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
real and tested. Four formats now have REAL pure-stdlib codecs behind
stdlib_decode_kernel: WAV, netpbm, PNG (struct+zlib) and JPEG — baseline
since r8, progressive (SOF2) since r9 (operators/jpeg.py — the published
T.81 algorithm on numpy, incl. real libjpeg-produced 4:2:0 and
progressive files). The remaining NotImplementedError sites are the
genuinely codec-bound formats (video) and the explicitly-marked
external-library slots (real_decode_kernel / real_resize_kernel).
"""

from __future__ import annotations

import hashlib
import struct
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
    """Frame sampling: emit ≤ max_frames payloads per video row. For
    ISO-BMFF (MP4) payloads this is REAL demuxing — the sample table
    (stsc/stsz/stco, operators/mp4.py) resolves each frame's byte range in
    mdat and the raw encoded samples are returned (decoding them to pixels
    is the codec-bound part). Other payloads fall back to fixed-stride
    byte slices, keeping the one-to-many mapInPandas shape identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nexgap_spark.operators.mp4 import demux_video_samples, is_mp4

        for pdf in batches:
            rows = []
            for mid, kind, payload_raw in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or not payload_raw:
                    continue
                payload = bytes(payload_raw)
                slices = None
                if is_mp4(payload):
                    try:
                        slices = demux_video_samples(payload, max_samples=max_frames)
                    except (ValueError, struct.error, IndexError, OverflowError):
                        # struct.error is NOT a ValueError subclass: raw
                        # unpack_from on a truncated box raises it directly
                        # crawl corpora routinely contain truncated or
                        # malformed containers; one bad row must not kill
                        # the Arrow stage — degrade to the stride slicer
                        # (the strict raise stays on the kernel/
                        # extract_features path, where tests pin it)
                        slices = None
                if slices is None:
                    slices = [
                        payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                        for i in range(
                            min(max_frames, max(1, len(payload) // every_n_bytes))
                        )
                    ]
                for i, sl in enumerate(slices):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_payload": sl,
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
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image" or payload is None:
                    continue
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "width": width,
                        "height": height,
                        "payload": kernel(bytes(payload), width, height),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# REAL kernels for codec-free formats (round 6). The container has no
# JPEG/PNG/MP4 codecs, but WAV is stdlib (`wave`) and PPM/PGM are plain
# headers + raw rasters — so for these formats the decode/resize kernels
# are genuine, not fakes. Formats that truly need codecs still raise.
# ---------------------------------------------------------------------------


def encode_wav(samples, *, rate: int = 8000) -> bytes:
    """16-bit mono PCM WAV from integer samples (stdlib `wave`). Fixture
    generator for tests and the synthetic media catalog query — a data
    pipeline needs deterministic media synthesis for its own harness."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Stdlib WAV decode → {rate, channels, n_samples, samples (np.int16/32
    mono-mixed not applied — channels interleaved)}; raises ValueError on
    non-WAV bytes."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate, channels = w.getframerate(), w.getnchannels()
            width, n = w.getsampwidth(), w.getnframes()
            raw = w.readframes(n)
    except Exception as exc:
        raise ValueError(f"not a decodable WAV payload: {exc}") from exc
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = samples - 128.0
    return {"rate": rate, "channels": channels, "n_samples": n, "samples": samples}


def encode_ppm(arr) -> bytes:
    """P6 (RGB) / P5 (gray) binary netpbm from a (h, w[, 3]) uint8 array."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic, body = b"P5", a
    elif a.ndim == 3 and a.shape[2] == 3:
        magic, body = b"P6", a
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + body.tobytes()


def decode_ppm(payload: bytes):
    """Binary netpbm decode (P5 gray / P6 RGB) → uint8 array (h, w[, 3]).
    Raises ValueError on anything else (comments supported per spec)."""
    import numpy as np

    if not payload or payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm (P5/P6) payload")
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if payload[:2] == b"P6" else 1
    need = w * h * channels
    body = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return body.reshape((h, w, 3)) if channels == 3 else body.reshape((h, w))


def stdlib_decode_kernel(payload: bytes, kind: str) -> list[float]:
    """REAL decoder for codec-free formats — the non-stub half of
    real_decode_kernel's slot:

    * WAV (RIFF/WAVE magic) → [duration_s, rms, peak, zcr, mean,
      n_samples, rate, channels] in raw sample units;
    * P5/P6 netpbm → [width, height, channels, mean, std, min, max,
      aspect];
    * PNG (8-bit, non-interlaced — struct + zlib are stdlib) → the same
      8 raster features;
    * JPEG (baseline sequential + progressive, operators/jpeg.py — the
      public T.81 algorithm on numpy, no codec library) → the same 8
      raster features;
    * MP4 / ISO-BMFF (operators/mp4.py — pure struct box walk) →
      [width, height, n_tracks, duration_s, fps, n_video_samples,
      avg_sample_bytes, aspect] from the CONTAINER level (mvhd/tkhd/
      mdhd/stsd/stts/stsz); decoding frame payloads to pixels is the
      codec-bound part and still raises via real_decode_kernel;
    * GIF87a/89a (operators/gif.py — LZW + interlace + frame-disposal
      composition, an INTER-frame format) → [width, height, n_frames,
      mean, std, min, max, aspect] over the composed frames;
    * anything else raises NotImplementedError exactly like
      real_decode_kernel (inter-frame MOTION-COMPENSATED codecs —
      H.26x/VP/AV1 — genuinely need codec libraries).
    """
    import numpy as np

    p = payload or b""
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        d = decode_wav(p)
        # de-interleave and mix down to mono BEFORE featurizing: rms/zcr on
        # the raw interleaved array would compare samples of DIFFERENT
        # channels, and len(interleaved) would disagree with duration by the
        # channel factor. Frame count is the sample axis everywhere.
        s = d["samples"]
        if d["channels"] > 1:
            s = s.reshape(-1, d["channels"]).mean(axis=1)
        n = len(s)
        if n == 0:
            return [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, float(d["rate"]), float(d["channels"])]
        zcr = (
            float(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))) / (n - 1)
            if n > 1
            else 0.0
        )
        return [
            n / d["rate"],
            float(np.sqrt(np.mean(s * s))),
            float(np.max(np.abs(s))),
            zcr,
            float(np.mean(s)),
            float(n),
            float(d["rate"]),
            float(d["channels"]),
        ]
    if (
        p[:2] in (b"P5", b"P6")
        or p[:8] == b"\x89PNG\r\n\x1a\n"
        or p[:2] == b"\xff\xd8"
    ):
        if p[:1] == b"\x89":
            a = decode_png(p)
        elif p[:2] == b"\xff\xd8":
            from nexgap_spark.operators.jpeg import decode_jpeg

            a = decode_jpeg(p)
        else:
            a = decode_ppm(p)
        a = a.astype(np.float64)
        h, w = a.shape[0], a.shape[1]
        channels = a.shape[2] if a.ndim == 3 else 1
        return [
            float(w),
            float(h),
            float(channels),
            float(a.mean()),
            float(a.std()),
            float(a.min()),
            float(a.max()),
            w / h,
        ]
    if len(p) >= 12 and p[4:8] == b"ftyp":
        from nexgap_spark.operators.mp4 import mp4_features

        return mp4_features(p)
    if p[:6] in (b"GIF87a", b"GIF89a"):
        # the second REAL kernel behind the plug point (round 15): a
        # genuinely inter-frame format — frame N's pixels depend on frames
        # 0..N-1 via disposal/transparency composition (operators/gif.py).
        # Returns [width, height, n_frames, mean, std, min, max, aspect]
        # over the COMPOSED frames, so the inter-frame state is
        # load-bearing in the feature values.
        from nexgap_spark.operators.gif import gif_features

        return gif_features(p)
    raise NotImplementedError(
        f"no codec-free decoder for this payload (kind={kind!r}); decoding "
        "video FRAME PAYLOADS to pixels needs codec libraries not present "
        "in this environment (the MP4 container level is handled above)"
    )


def decode_video_frames(payload: bytes, *, max_frames: int | None = None):
    """Video → per-frame PIXEL arrays for intra-frame codecs: real
    demuxing (operators/mp4.py sample tables / trun runs) followed by the
    from-scratch T.81 JPEG decoder on each sample. This closes the
    frame-pixel boundary for MJPEG (Motion-JPEG-in-MP4 — every sample is
    a complete JPEG image), which needs no inter-frame codec at all;
    H.26x/VP/AV1 samples still raise the documented NotImplementedError
    (an inter-frame codec stack is genuinely out of scope — the reference
    ships no codec of any kind).

    Returns a list of uint8 numpy arrays, one per decoded frame.
    """
    from nexgap_spark.operators.jpeg import decode_jpeg
    from nexgap_spark.operators.mp4 import demux_video_samples, parse_mp4

    samples = demux_video_samples(payload, max_samples=max_frames)
    frames = []
    for s in samples:
        if s[:2] != b"\xff\xd8":
            parsed = parse_mp4(bytes(payload))
            codec = next(
                (t["codec"] for t in parsed["tracks"] if t["handler"] == "vide"),
                None,
            )
            raise NotImplementedError(
                f"frame-pixel decode for codec {codec!r}: only MJPEG "
                "(JPEG-in-MP4) samples decode here; inter-frame codecs "
                "need libraries not present in this environment"
            )
        frames.append(decode_jpeg(s))
    return frames


def ppm_resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize for netpbm payloads: nearest-neighbor via numpy
    index maps, re-encoded as the same P5/P6 format. Slots into
    resize_media(kernel=...) — for raster formats the resize story needs no
    codec at all."""
    import numpy as np

    a = decode_ppm(payload)
    h, w = a.shape[0], a.shape[1]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return encode_ppm(a[rows][:, cols])


def encode_png(arr) -> bytes:
    """Stdlib-only PNG encode from a (h, w[, channels]) uint8 array —
    8-bit gray/gray+alpha/RGB/RGBA, filter 0 scanlines, one IDAT. No codec
    library involved: PNG's container is struct + zlib, both stdlib."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    channels = a.shape[2]
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if ctype is None:
        raise ValueError(f"expected 1/2/3/4 channels, got {channels}")
    h, w = a.shape[0], a.shape[1]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Stdlib-only PNG decode (struct chunk walk + zlib inflate + scanline
    unfilter) → uint8 array (h, w) or (h, w, channels). Supports 8-bit
    depth, color types 0/2/3/4/6 (palette expanded to RGB), non-interlaced
    — i.e. what the overwhelming majority of real-world PNGs are. Filters
    0-2 (None/Sub/Up) unfilter vectorized; 3-4 (Average/Paeth) take the
    sequential per-byte path their left+up dependency requires."""
    import struct
    import zlib

    import numpy as np

    if not payload or payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # header + data + CRC
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth={depth}")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT stream corrupt/truncated: {e}") from e
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG payload truncated")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    bpp = channels  # 8-bit depth → bytes per pixel = channels
    for r in range(h):
        f, line = int(filters[r]), data[r].copy()
        up = out[r - 1] if r else np.zeros(stride, np.int32)
        if f == 0:
            out[r] = line
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp] → per-lane cumsum
            for k in range(bpp):
                lane = line[k::bpp]
                out[r, k::bpp] = np.cumsum(lane) & 0xFF
        elif f == 2:  # Up
            out[r] = (line + up) & 0xFF
        elif f == 3:  # Average: left dependency → sequential
            for i in range(stride):
                left = out[r, i - bpp] if i >= bpp else 0
                out[r, i] = (line[i] + (left + up[i]) // 2) & 0xFF
        elif f == 4:  # Paeth predictor: sequential
            for i in range(stride):
                a_ = out[r, i - bpp] if i >= bpp else 0
                b_ = up[i]
                c_ = out[r - 1, i - bpp] if (r and i >= bpp) else 0
                p = a_ + b_ - c_
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                out[r, i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
    img = out.astype(np.uint8).reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
        channels = 3
    return img[:, :, 0] if channels == 1 else img


def png_resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """REAL PNG resize: stdlib decode → nearest-neighbor index maps →
    stdlib re-encode. Same slot as ppm_resize_kernel."""
    import numpy as np

    a = decode_png(payload)
    h, w = a.shape[0], a.shape[1]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return encode_png(a[rows][:, cols])


def jpeg_resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """REAL JPEG resize: pure-stdlib baseline decode (operators/jpeg.py) →
    nearest-neighbor index maps → baseline re-encode. Same slot as
    ppm_resize_kernel/png_resize_kernel; re-encode is lossy (it is JPEG)
    but deterministic."""
    import numpy as np

    from nexgap_spark.operators.jpeg import decode_jpeg, encode_jpeg

    a = decode_jpeg(payload)
    h, w = a.shape[0], a.shape[1]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return encode_jpeg(a[rows][:, cols])
