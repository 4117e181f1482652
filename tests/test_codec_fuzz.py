"""Systematic codec/container fuzzing (VERDICT r11 item 4).

The production robustness contract lives in the Arrow-stage wrappers:
``multimodal.sample_frames`` degrades any payload whose demux raises
(ValueError, struct.error, IndexError, OverflowError) to the stride
slicer, so one malformed crawl row can never kill a stage. The r11 fixes
(`mp4._check_count`, the broadened catch) were reactive; this file makes
the property systematic — seeded, deterministic mutations (byte flips,
truncations, insertions) over every valid fixture the from-scratch
encoders produce, asserting every strict decoder either succeeds or
raises INSIDE the documented tuple. Any other exception type is exactly
the class of bug that kills an executor stage in production.

Seeds are fixed (no wall-clock / PRNG nondeterminism): mutation i of a
fixture is a pure function of (format, i).
"""

from __future__ import annotations

import random
import struct
import zlib

import numpy as np
import pytest

from nexgap_spark.operators import gif as gifmod
from nexgap_spark.operators import mp4 as mp4mod
from nexgap_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from nexgap_spark.operators.multimodal import (
    decode_png,
    decode_ppm,
    decode_video_frames,
    decode_wav,
    encode_png,
    encode_ppm,
    encode_wav,
)

# What the Arrow-stage wrappers catch (sample_frames' tuple), plus the two
# raise types that are themselves the documented contract for structurally
# valid but unsupported inputs: NotImplementedError (codec boundary) and
# zlib.error (PNG inflate of corrupt streams — a cpython-exception leaf the
# PNG wrapper surfaces with context).
ALLOWED = (
    ValueError,
    struct.error,
    IndexError,
    OverflowError,
    NotImplementedError,
    zlib.error,
)

N_MUTATIONS = 220  # per format, > the 200 floor


def _gradient(h=16, w=16):
    return (np.add.outer(np.arange(h), np.arange(w)) * 3 % 256).astype(np.uint8)


def _rgb(h=16, w=16):
    g = _gradient(h, w)
    return np.stack([g, g[::-1], g.T[:h, :w]], axis=-1).astype(np.uint8)


def _fixtures() -> dict[str, tuple[bytes, callable]]:
    jpg_frames = [
        encode_jpeg(np.full((16, 16), 40 + 20 * j, dtype=np.uint8)) for j in range(3)
    ]
    return {
        "jpeg_baseline": (encode_jpeg(_rgb()), decode_jpeg),
        "jpeg_subsampled_dri": (
            encode_jpeg(_rgb(), subsampling=(2, 2), restart_interval=2),
            decode_jpeg,
        ),
        "jpeg_progressive": (encode_jpeg_progressive(_rgb()), decode_jpeg),
        "png": (encode_png(_rgb()), decode_png),
        "ppm": (encode_ppm(_rgb()), decode_ppm),
        "wav": (
            encode_wav(np.sin(np.arange(400) / 7.0), rate=8000),
            decode_wav,
        ),
        "mp4": (
            mp4mod.encode_mp4(16, 16, 5, fps=10, frame_bytes=32, audio_samples=64),
            lambda p: (mp4mod.parse_mp4(p), mp4mod.demux_video_samples(p)),
        ),
        "fmp4": (
            mp4mod.encode_fmp4(16, 16, 8, fps=10, frame_bytes=32),
            lambda p: (mp4mod.parse_mp4_fragments(p), mp4mod.demux_video_samples(p)),
        ),
        "mjpeg_mp4": (
            mp4mod.encode_mp4(16, 16, 3, fps=10, frames=jpg_frames, codec=b"jpeg"),
            decode_video_frames,
        ),
        "gif": (
            gifmod.encode_gif(
                [
                    {"indices": _gradient(), "disposal": 2, "interlace": True},
                    {
                        "indices": _gradient(8, 8),
                        "left": 4, "top": 4,
                        "disposal": 3, "transparent": 7,
                    },
                    {"indices": _gradient(8, 8), "left": 8, "top": 8},
                ],
                width=16, height=16, bg_index=3,
            ),
            gifmod.decode_gif_frames,
        ),
    }


def _mutate(payload: bytes, fmt: str, i: int) -> bytes:
    """Deterministic mutation i: byte flips (weighted toward the header,
    where parsers branch), truncations, and small insertions/deletions."""
    rng = random.Random(f"{fmt}:{i}")
    b = bytearray(payload)
    op = i % 4
    if op == 0:  # single-byte flip
        pos = rng.randrange(min(len(b), 64)) if i % 8 < 4 else rng.randrange(len(b))
        b[pos] ^= 1 << rng.randrange(8)
    elif op == 1:  # multi-byte stomp
        pos = rng.randrange(len(b))
        for k in range(min(4, len(b) - pos)):
            b[pos + k] = rng.randrange(256)
    elif op == 2:  # truncation
        b = b[: rng.randrange(1, len(b))]
    else:  # insertion or deletion
        pos = rng.randrange(len(b))
        if rng.random() < 0.5:
            b[pos:pos] = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 5)))
        else:
            del b[pos : pos + rng.randrange(1, 5)]
    return bytes(b)


@pytest.mark.parametrize("fmt", sorted(_fixtures()))
def test_fuzz_decoders_fail_inside_contract(fmt):
    payload, decoder = _fixtures()[fmt]
    # sanity: the unmutated fixture decodes
    decoder(payload)
    crashes = []
    for i in range(N_MUTATIONS):
        mutated = _mutate(payload, fmt, i)
        try:
            decoder(mutated)
        except ALLOWED:
            pass
        except Exception as exc:  # noqa: BLE001 — the point of the fuzz
            crashes.append((i, type(exc).__name__, str(exc)[:120]))
    assert not crashes, f"{fmt}: {len(crashes)} out-of-contract crashes: {crashes[:5]}"


def test_fuzz_sample_frames_stage_survives(spark):
    """End-to-end Arrow-stage assert: a batch of mutated MP4 payloads runs
    through sample_frames and the stage COMPLETES — every malformed row
    degrades to the stride slicer, none kills the stage."""
    from nexgap_spark.operators.multimodal import sample_frames

    base = mp4mod.encode_mp4(16, 16, 5, fps=10, frame_bytes=32)
    rows = [(0, "video", bytearray(base))]  # one pristine row
    rows += [
        (i, "video", bytearray(_mutate(base, "mp4_stage", i))) for i in range(1, 64)
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    # the property is that collect() COMPLETES: no mutated row may raise
    # outside the wrapper's documented catch tuple and kill the stage
    out = sample_frames(media, max_frames=3).collect()
    # the pristine row demuxes to exactly 3 real samples
    pristine = [r for r in out if r.media_id == 0]
    assert len(pristine) == 3
    # mutants may demux to 0 samples (e.g. a stomped frame count) — legal —
    # but nothing outside the input id set may appear
    assert {r.media_id for r in out} <= set(range(64))
