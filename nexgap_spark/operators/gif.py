"""GIF89a codec — pure stdlib+numpy, from the public specification.

Round-15 purpose: prove the multimodal codec-kernel slot with a SECOND
real kernel (VERDICT r14 item 5). GIF is genuinely *inter-frame*: a frame
is a sub-rectangle painted onto the running canvas, its visibility
depends on the PREVIOUS frame's disposal method, and transparent pixels
show what is beneath — so decoding frame N requires composing frames
0..N-1, unlike MJPEG where every sample is independent. That exercises
exactly the plug point H.26x is stubbed behind (multimodal.py
real_decode_kernel / decode_video_frames), without shipping a
motion-compensation stack: GIF's "inter-frame state" is the composed
canvas, implementable from the GIF89a spec with stdlib only.

Implements, spec-complete for the features the tests drive:
  * variable-width LZW (GIF flavor: clear/end codes, width grows at
    2^width, 12-bit cap with mid-stream CLEAR reset), both directions;
  * logical screen descriptor + global/local color tables;
  * graphic control extension (disposal 0-3, transparency, delay);
  * interlaced images (4-pass row shuffle);
  * frame COMPOSITION: disposal 0/1 (leave), 2 (restore rect to
    background), 3 (restore to previous canvas), transparent-index
    pass-through;
  * NETSCAPE2.0 looping extension, comment extensions (skipped).

The reference ships no codec of any kind (its media handling stops at
typed byte columns); this mirrors SURVEY §2's multimodal boundary the
same way jpeg.py/mp4.py do. Composition is done in INDEX space and
requires a global color table with no conflicting local tables — a
documented boundary (heterogeneous-palette GIFs are rare and would need
per-pixel palette tracking), enforced loudly.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_gif",
    "parse_gif",
    "decode_gif_frames",
    "gif_features",
]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    """Row order in which an interlaced image's rows appear in the stream."""
    return [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]


# ---------------------------------------------------------------------------
# LZW (GIF variant, LSB-first bit packing)
# ---------------------------------------------------------------------------

def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF LZW. Emits CLEAR first, END last; code width starts at
    min_code_size+1 and grows when the next code to be EMITTED would not
    fit in the decoder's current width (encoder bumps one dictionary entry
    later than the decoder — the decoder has registered one fewer entry at
    the moment it reads each code). At 4096 entries a CLEAR resets both
    sides.

    The dictionary is the classic (prefix_code << 8 | byte) → code int
    map (r17): a single-byte string's code IS its byte value, so the
    256-entry init table the previous bytes-keyed variant rebuilt per
    call (and per 4096-entry reset) is implicit, and the hot loop does
    one int shift+or instead of a bytes concatenation per pixel. Emitted
    codes — and therefore the output stream — are identical."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table: dict[int, int] = {}
    nxt = end + 1

    out_bits.append((clear, width))
    if data:
        cur = data[0]
        for b in data[1:]:
            key = (cur << 8) | b
            cand = table.get(key)
            if cand is not None:
                cur = cand
                continue
            out_bits.append((cur, width))
            if nxt < 4096:
                table[key] = nxt
                nxt += 1
                if nxt == (1 << width) + 1 and width < 12:
                    width += 1
            else:
                out_bits.append((clear, width))
                table = {}
                nxt = end + 1
                width = min_code_size + 1
            cur = b
        out_bits.append((cur, width))
    out_bits.append((end, width))

    # LSB-first bit packing
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_DEC_INIT: dict[int, list[bytes]] = {}


def _dec_init(clear: int) -> list[bytes]:
    """Decoder init entries for a given alphabet size, built once per
    process (r17): the per-call comprehension was ~20% of decode time on
    small frames, and every CLEAR code paid it again. Entries are
    immutable bytes, so a shallow copy per (re)init is safe."""
    base = _DEC_INIT.get(clear)
    if base is None:
        base = [bytes([i]) for i in range(clear)] + [b"", b""]
        _DEC_INIT[clear] = base
    return base


def lzw_decode(data: bytes, min_code_size: int, expected: int | None = None) -> bytes:
    """Inverse of lzw_encode, tolerant of a missing END code (some
    encoders rely on the data running out). ``expected`` caps output
    length (the image's pixel count) so a corrupt stream cannot balloon."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    entries: list[bytes] = _dec_init(clear).copy()
    nxt = end + 1
    out = bytearray()
    prev: int | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            entries = _dec_init(clear).copy()
            nxt = end + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(entries):
                raise ValueError(f"LZW: first code {code} out of range")
            out += entries[code]
        else:
            if code < nxt:
                entry = entries[code]
            elif code == nxt and nxt < 4096:
                entry = entries[prev] + entries[prev][:1]
            else:
                raise ValueError(f"LZW: code {code} out of range (next={nxt})")
            out += entry
            if nxt < 4096:
                entries.append(entries[prev] + entry[:1])
                nxt += 1
                if nxt == (1 << width) and width < 12:
                    width += 1
        prev = code
        if expected is not None and len(out) >= expected:
            return bytes(out)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _blocks(data: bytes) -> bytes:
    """Chop into 255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gray_palette() -> np.ndarray:
    """256-entry grayscale palette (index i -> rgb(i,i,i))."""
    g = np.arange(256, dtype=np.uint8)
    return np.stack([g, g, g], axis=1)


def encode_gif(
    frames: list[dict],
    *,
    width: int,
    height: int,
    palette: np.ndarray | None = None,
    bg_index: int = 0,
    loop: int | None = 0,
) -> bytes:
    """Write a GIF89a. Each frame dict:
      indices       HxW uint8 index array (required)
      left, top     placement on the canvas (default 0, 0)
      disposal      0..3 (default 0)
      transparent   index treated as transparent, or None (default)
      delay_cs      delay in 1/100 s (default 4)
      interlace     bool (default False)
    ``loop``: None = no NETSCAPE extension; 0 = loop forever; N = N loops.
    """
    pal = gray_palette() if palette is None else np.asarray(palette, np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 2 <= len(pal) <= 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    # GCT size must be a power of two >= 2
    size_bits = max(1, int(np.ceil(np.log2(len(pal)))))
    n_colors = 1 << size_bits
    gct = np.zeros((n_colors, 3), np.uint8)
    gct[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    packed = 0x80 | ((size_bits - 1) << 4) | (size_bits - 1)
    out += struct.pack("<HHBBB", width, height, packed, bg_index, 0)
    out += gct.tobytes()
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0" + bytes([3, 1]) + struct.pack("<H", loop) + b"\x00"
    for fr in frames:
        idx = np.asarray(fr["indices"], np.uint8)
        fh, fw = idx.shape
        left, top = int(fr.get("left", 0)), int(fr.get("top", 0))
        if left + fw > width or top + fh > height:
            raise ValueError("frame rect exceeds logical screen")
        transparent = fr.get("transparent")
        disposal = int(fr.get("disposal", 0))
        # graphic control extension
        gce_packed = (disposal & 0x7) << 2 | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes([gce_packed])
        out += struct.pack("<H", int(fr.get("delay_cs", 4)))
        out += bytes([transparent or 0, 0])
        # image descriptor (no local color table)
        interlace = bool(fr.get("interlace", False))
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh)
        out += bytes([0x40 if interlace else 0])
        rows = idx[_interlace_order(fh), :] if interlace else idx
        mcs = max(2, size_bits)
        out += bytes([mcs])
        out += _blocks(lzw_encode(rows.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# parser / decoder
# ---------------------------------------------------------------------------

def _read_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("GIF: truncated sub-block chain")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += buf[pos : pos + n]
        if len(buf) - pos < n:
            raise ValueError("GIF: truncated sub-block")
        pos += n


def parse_gif(payload: bytes) -> dict:
    """Structural parse: header, screen descriptor, color tables, every
    frame's index raster (de-interlaced) + graphic-control state."""
    p = payload
    if p[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(p) < 13:
        raise ValueError("GIF: truncated screen descriptor")
    width, height, packed, bg_index, _aspect = struct.unpack("<HHBBB", p[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x7)
        gct = np.frombuffer(p[pos : pos + 3 * n], np.uint8).reshape(n, 3).copy()
        pos += 3 * n
    frames: list[dict] = []
    gce: dict = {}
    loop_count = None
    while pos < len(p):
        b = p[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(p):
                raise ValueError("GIF: truncated extension")
            label = p[pos]
            pos += 1
            data, pos = _read_blocks(p, pos)
            if label == 0xF9 and len(data) >= 4:
                gp, delay, tr = data[0], struct.unpack("<H", data[1:3])[0], data[3]
                gce = {
                    "disposal": (gp >> 2) & 0x7,
                    "delay_cs": delay,
                    "transparent": tr if gp & 1 else None,
                }
            elif label == 0xFF and data[:11] == b"NETSCAPE2.0" and len(data) >= 14:
                loop_count = struct.unpack("<H", data[12:14])[0]
            # comments (0xFE) and other app extensions: skipped
            continue
        if b == 0x2C:  # image descriptor
            left, top, fw, fh, ip = struct.unpack("<HHHHB", p[pos : pos + 9])
            pos += 9
            lct = None
            if ip & 0x80:
                n = 2 << (ip & 0x7)
                lct = np.frombuffer(p[pos : pos + 3 * n], np.uint8).reshape(n, 3).copy()
                pos += 3 * n
            if pos >= len(p):
                raise ValueError("GIF: truncated image data")
            mcs = p[pos]
            pos += 1
            data, pos = _read_blocks(p, pos)
            raw = lzw_decode(data, mcs, expected=fw * fh)
            if len(raw) < fw * fh:
                raise ValueError(
                    f"GIF: LZW stream yielded {len(raw)} of {fw * fh} pixels"
                )
            idx = np.frombuffer(raw[: fw * fh], np.uint8).reshape(fh, fw).copy()
            if ip & 0x40:  # interlaced: invert the 4-pass row shuffle
                order = _interlace_order(fh)
                de = np.empty_like(idx)
                de[order, :] = idx
                idx = de
            frames.append(
                {
                    "left": left, "top": top, "width": fw, "height": fh,
                    "indices": idx,
                    "interlaced": bool(ip & 0x40),
                    "lct": lct,
                    "disposal": gce.get("disposal", 0),
                    "delay_cs": gce.get("delay_cs", 0),
                    "transparent": gce.get("transparent"),
                }
            )
            gce = {}
            continue
        raise ValueError(f"GIF: unknown block 0x{b:02x} at offset {pos - 1}")
    return {
        "version": p[3:6].decode("ascii"),
        "width": width, "height": height,
        "bg_index": bg_index, "gct": gct,
        "loop_count": loop_count,
        "frames": frames,
    }


def decode_gif_frames(payload: bytes, *, max_frames: int | None = None) -> list[np.ndarray]:
    """GIF → list of COMPOSED (h, w, 3) uint8 frames, spec disposal rules:
    frame N is painted onto the canvas left by frames 0..N-1 (disposal
    0/1 leaves the rect, 2 restores the rect to the background index, 3
    restores the pre-frame canvas), and transparent pixels keep what is
    beneath. Composition happens in index space against the GLOBAL color
    table; a local color table that differs from it is a documented
    boundary and raises."""
    g = parse_gif(payload)
    gct = g["gct"]
    if gct is None:
        raise ValueError("GIF composition requires a global color table")
    for fr in g["frames"]:
        if fr["lct"] is not None and not (
            fr["lct"].shape == gct.shape and (fr["lct"] == gct).all()
        ):
            raise NotImplementedError(
                "GIF composition across differing local color tables needs "
                "per-pixel palette tracking; re-quantize to a shared table"
            )
    h, w = g["height"], g["width"]
    canvas = np.full((h, w), g["bg_index"], np.uint8)
    out: list[np.ndarray] = []
    for fr in g["frames"]:
        if max_frames is not None and len(out) >= max_frames:
            break
        t, l_, fh, fw = fr["top"], fr["left"], fr["height"], fr["width"]
        before = canvas[t : t + fh, l_ : l_ + fw].copy() if fr["disposal"] == 3 else None
        rect = canvas[t : t + fh, l_ : l_ + fw]
        if fr["transparent"] is None:
            rect[:, :] = fr["indices"]
        else:
            opaque = fr["indices"] != fr["transparent"]
            rect[opaque] = fr["indices"][opaque]
        out.append(gct[canvas])  # palette lookup -> (h, w, 3)
        if fr["disposal"] == 2:
            canvas[t : t + fh, l_ : l_ + fw] = g["bg_index"]
        elif fr["disposal"] == 3:
            canvas[t : t + fh, l_ : l_ + fw] = before
    return out


def gif_features(payload: bytes) -> list[float]:
    """8-feature vector for stdlib_decode_kernel's GIF branch:
    [width, height, n_frames, mean, std, min, max, aspect] over the
    COMPOSED frames (so disposal/transparency handling is load-bearing,
    not just the first raster)."""
    frames = decode_gif_frames(payload)
    g = np.stack(frames).astype(np.float64)
    h, w = frames[0].shape[0], frames[0].shape[1]
    return [
        float(w), float(h), float(len(frames)),
        float(g.mean()), float(g.std()), float(g.min()), float(g.max()),
        w / h,
    ]
