"""GIF89a codec tests (round 15): LZW both directions across width
boundaries and the 12-bit cap, interlace row order, disposal-method
composition, transparency pass-through, kernel routing, and the q119
closed-form contract the oracle relies on.

GIF is the second REAL kernel behind multimodal's codec slot — the
inter-frame one — so these tests pin the composition semantics
pixel-exactly, not just aggregate features.
"""

from __future__ import annotations

import numpy as np
import pytest

from nexgap_spark.operators.gif import (
    decode_gif_frames,
    encode_gif,
    gif_features,
    gray_palette,
    lzw_decode,
    lzw_encode,
    parse_gif,
)
from nexgap_spark.operators.multimodal import stdlib_decode_kernel


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mcs", [2, 4, 8])
@pytest.mark.parametrize("n", [0, 1, 7, 255, 4096, 30000])
def test_lzw_roundtrip_random(mcs, n):
    rng = np.random.default_rng(mcs * 1000 + n)
    data = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, mcs), mcs) == data


def test_lzw_roundtrip_repetitive_hits_dict_cap():
    # long repeats grow the dictionary to 4096 -> mid-stream CLEAR reset;
    # 2-bit symbols reach the cap fastest
    data = (b"\x00\x01\x02\x03" * 4000) + bytes(
        np.random.default_rng(3).integers(0, 4, 9000, dtype=np.uint8)
    )
    enc = lzw_encode(data, 2)
    assert lzw_decode(enc, 2) == data


def test_lzw_code_width_boundary_exact():
    # constant runs exercise the KwKwK special case (code == next) and the
    # width bump at exactly 2^width entries on the decoder side
    for mcs in (2, 3, 7):
        data = bytes([1]) * 1000
        assert lzw_decode(lzw_encode(data, mcs), mcs) == data


def test_lzw_decode_rejects_out_of_range_codes():
    with pytest.raises(ValueError):
        # width 3 stream whose first code is 7 (= beyond end code for mcs=2
        # with an empty dictionary)
        lzw_decode(bytes([0b111]), 2)


# ---------------------------------------------------------------------------
# container + raster
# ---------------------------------------------------------------------------

def _gradient(h=16, w=16):
    return (np.add.outer(np.arange(h), np.arange(w)) * 5 % 256).astype(np.uint8)


def test_roundtrip_plain_and_interlaced_pixel_exact():
    img = _gradient()
    for interlace in (False, True):
        payload = encode_gif(
            [{"indices": img, "interlace": interlace}], width=16, height=16
        )
        g = parse_gif(payload)
        assert g["version"] == "89a"
        assert g["frames"][0]["interlaced"] is interlace
        assert (g["frames"][0]["indices"] == img).all()


def test_interlace_is_load_bearing():
    # flipping the interlace BIT without re-ordering rows must change the
    # parsed raster (guards against a de-interlace that is a no-op)
    img = _gradient()
    plain = encode_gif([{"indices": img}], width=16, height=16)
    # image descriptor: search past header+LSD+768-byte gray GCT (0x2c is
    # also a palette byte)
    pos = plain.index(b"\x2c", 13 + 768)
    flipped = bytearray(plain)
    flipped[pos + 9] |= 0x40
    got = parse_gif(bytes(flipped))["frames"][0]["indices"]
    assert not (got == img).all()


def test_non_square_and_odd_sizes():
    img = _gradient(5, 11)
    payload = encode_gif([{"indices": img, "interlace": True}], width=11, height=5)
    assert (parse_gif(payload)["frames"][0]["indices"] == img).all()


def test_palette_lookup_rgb():
    pal = np.zeros((4, 3), np.uint8)
    pal[1] = (255, 0, 0)
    pal[2] = (0, 255, 0)
    img = np.array([[1, 2], [2, 1]], np.uint8)
    payload = encode_gif([{"indices": img}], width=2, height=2, palette=pal)
    fr = decode_gif_frames(payload)[0]
    assert fr.shape == (2, 2, 3)
    assert tuple(fr[0, 0]) == (255, 0, 0) and tuple(fr[0, 1]) == (0, 255, 0)


# ---------------------------------------------------------------------------
# composition: disposal + transparency (the inter-frame semantics)
# ---------------------------------------------------------------------------

def test_disposal_2_restores_rect_to_background():
    base = np.full((16, 16), 100, np.uint8)
    patch = np.full((8, 8), 200, np.uint8)
    payload = encode_gif(
        [
            {"indices": base, "disposal": 2},
            {"indices": patch, "left": 8, "top": 0, "disposal": 2},
            {"indices": patch, "left": 0, "top": 8},
        ],
        width=16, height=16, bg_index=30,
    )
    f0, f1, f2 = (f[..., 0] for f in decode_gif_frames(payload))
    assert (f0 == 100).all()
    # frame 0's disposal-2 cleared the WHOLE canvas to bg
    assert (f1[:8, 8:] == 200).all() and (f1[:, :8] == 30).all()
    # frame 1's disposal-2 cleared its rect again
    assert (f2[:8, 8:] == 30).all() and (f2[8:, :8] == 200).all()


def test_disposal_3_restores_previous_canvas():
    base = np.full((16, 16), 100, np.uint8)
    payload = encode_gif(
        [
            {"indices": base, "disposal": 1},
            {
                "indices": np.full((8, 8), 250, np.uint8),
                "left": 4, "top": 4, "disposal": 3,
            },
            {"indices": np.full((2, 2), 9, np.uint8)},
        ],
        width=16, height=16,
    )
    fs = decode_gif_frames(payload)
    assert fs[1][4, 4, 0] == 250
    # disposal 3: the 250-patch vanishes, the 100 base is back
    assert fs[2][4, 4, 0] == 100 and fs[2][0, 0, 0] == 9


def test_transparency_shows_pixels_beneath():
    base = np.full((8, 8), 100, np.uint8)
    patch = np.full((8, 8), 200, np.uint8)
    patch[::2, :] = 7
    payload = encode_gif(
        [
            {"indices": base, "disposal": 1},
            {"indices": patch, "transparent": 7},
        ],
        width=8, height=8,
    )
    f1 = decode_gif_frames(payload)[1][..., 0]
    assert (f1[::2, :] == 100).all() and (f1[1::2, :] == 200).all()


def test_composition_rejects_conflicting_local_palettes():
    # hand-build a frame with a local color table differing from the GCT
    payload = bytearray(
        encode_gif([{"indices": np.zeros((2, 2), np.uint8)}], width=2, height=2)
    )
    pos = payload.index(b"\x2c", 13 + 768)
    # set LCT flag + size 1 (2 entries) and splice in a 6-byte table
    payload[pos + 9] |= 0x80
    payload[pos + 10 : pos + 10] = bytes([9, 9, 9, 200, 200, 200])
    with pytest.raises(NotImplementedError):
        decode_gif_frames(bytes(payload))
    # parse_gif still reads it structurally
    assert parse_gif(bytes(payload))["frames"][0]["lct"] is not None


def test_max_frames_cap():
    frames = [{"indices": np.full((4, 4), i, np.uint8)} for i in range(5)]
    payload = encode_gif(frames, width=4, height=4)
    assert len(decode_gif_frames(payload, max_frames=2)) == 2


# ---------------------------------------------------------------------------
# kernel routing + q119's closed forms
# ---------------------------------------------------------------------------

def test_stdlib_kernel_routes_gif():
    img = np.full((10, 5), 60, np.uint8)
    payload = encode_gif([{"indices": img}], width=5, height=10)
    w, h, nf, mean, std, mn, mx, aspect = stdlib_decode_kernel(payload, "gif")
    assert (w, h, nf) == (5.0, 10.0, 1.0)
    assert mean == 60.0 and std == 0.0 and mn == 60.0 == mx
    assert aspect == 0.5


def test_q119_closed_forms():
    """The exact synth q119 runs, checked against the oracle's formulas
    for a handful of doc ids."""
    for i in (0, 1, 7, 123, 499):
        nf = 2 + i % 3
        b = (i * 5) % 200 + 10
        base = np.repeat(
            (b + 3 * np.arange(16, dtype=np.int64)).astype(np.uint8), 16
        ).reshape(16, 16)
        frames = [{"indices": base, "disposal": 2, "interlace": True}]
        for j in range(1, nf):
            v = (i * 7 + j * 11) % 200 + 12
            patch = np.full((8, 8), v, np.uint8)
            patch[1::2, :] = 7
            q = (j - 1) % 4
            frames.append(
                {
                    "indices": patch,
                    "left": (q % 2) * 8, "top": (q // 2) * 8,
                    "disposal": 2, "transparent": 7,
                }
            )
        payload = encode_gif(frames, width=16, height=16, bg_index=40)
        decoded = decode_gif_frames(payload)
        assert len(decoded) == nf
        assert decoded[0].mean() == b + 22.5
        rowsum = int(
            (decoded[0][:, 0, 0].astype(np.int64) * (np.arange(16) + 1)).sum()
        )
        assert rowsum == 136 * b + 4080
        for j in range(1, nf):
            v = (i * 7 + j * 11) % 200 + 12
            assert decoded[j].mean() == (40 * 224 + v * 32) / 256


def test_gray_palette_identity():
    assert gray_palette().shape == (256, 3)
    assert (gray_palette()[:, 0] == np.arange(256)).all()


def test_features_on_multiframe():
    payload = encode_gif(
        [
            {"indices": np.full((4, 4), 10, np.uint8), "disposal": 2},
            {"indices": np.full((4, 4), 30, np.uint8)},
        ],
        width=4, height=4,
    )
    f = gif_features(payload)
    assert f[2] == 2.0 and f[3] == 20.0 and f[5] == 10.0 and f[6] == 30.0
