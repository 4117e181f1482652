"""Pure-stdlib baseline JPEG codec (ITU-T T.81 / ISO 10918-1, the public
spec) — closes the documented pluggable-codec boundary in
operators/multimodal.py for the most common compressed-image format, the
same way round 6 did for PNG (struct + zlib): no codec library, just the
published algorithm on numpy.

Decoder (`decode_jpeg`) is a GENERAL Huffman-mode decoder:

* any DQT (8- and 16-bit precision) and any DHT (tables built canonically
  from BITS/HUFFVAL, so libjpeg-standard and custom tables both work);
* SOF0/SOF1 baseline sequential AND SOF2 progressive (round 9): spectral
  selection, successive approximation (DC and AC first + refinement
  scans, EOBRUN), interleaved and single-component scans — cross-checked
  against Java ImageIO on real libjpeg progressive files; the remaining
  SOF variants (lossless, hierarchical, arithmetic) raise
  NotImplementedError with a clear message;
* arbitrary per-component sampling factors (4:4:4, 4:2:0, 4:2:2, ...)
  with nearest-neighbor chroma upsampling;
* restart markers (DRI/RSTn): byte-realign + DC-predictor reset (both
  directions round-trip-tested via the encoder's restart_interval);
* 1-component (grayscale) and 3-component (JFIF YCbCr→RGB) images.

Encoders are the deterministic test-vector generators — `encode_jpeg`
(baseline; grayscale or RGB, 4:4:4 or 4:2:0, optional DRI/RSTn) and
`encode_jpeg_progressive` (SOF2; interleaved DC first scan with optional
successive approximation + refinement scans, per-component spectral-band
AC scans) — with flat quantization tables and simple fixed-length Huffman
tables (valid per spec: the all-ones code is never assigned, so 1-padding
cannot alias a symbol). With the default all-8s quant table a DC-only
(solid-color) block survives the pipeline EXACTLY: FDCT of a flat block
has DC = 8·(v-128) and zero AC, and 8·(v-128)/8 is integral — which is
what gives the q110 (baseline) and q111 (progressive) catalog queries a
closed-form oracle, mirroring the q101 PNG construction.

Scale note: these are row-local kernels — Spark-side they run inside the
same mapInPandas plumbing as every other multimodal kernel
(operators/multimodal.py extract_features / resize_media), so the
parallelism story is the partition count, not this file.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

# zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient
_ZZ_INDEX: list[tuple[int, int]] = []
for _s in range(15):
    _d = (
        [(_s - j, j) for j in range(_s + 1)]
        if _s % 2 == 0
        else [(j, _s - j) for j in range(_s + 1)]
    )
    _ZZ_INDEX.extend((r, c) for r, c in _d if r < 8 and c < 8)

_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman table from a DHT's BITS/HUFFVAL (T.81 C.2).

    ``lut`` is an 8-bit-prefix fast path: every code of length ≤ 8 fills
    all 256>>(8-len) slots it prefixes with (symbol, length), so one peek
    resolves the common case without the bit-at-a-time walk (standard
    tables put nearly all symbols at ≤ 8 bits; longer codes fall back)."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        self.lut: list[tuple[int, int] | None] = [None] * 256
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if code >= (1 << length):
                    # more codes than the length can hold — keep the
                    # module's ValueError convention (the old dict-only
                    # build deferred this to a decode-time ValueError; the
                    # LUT fill would otherwise IndexError here)
                    raise ValueError("invalid JPEG: over-subscribed Huffman table")
                self.lookup[(length, code)] = vals[k]
                if length <= 8:
                    base = code << (8 - length)
                    entry = (vals[k], length)
                    for i in range(1 << (8 - length)):
                        self.lut[base + i] = entry
                code += 1
                k += 1
            code <<= 1


_HUFF_CACHE: dict[tuple[tuple[int, ...], bytes], _HuffTable] = {}


def _huff_table(bits: list[int], vals: bytes) -> _HuffTable:
    """Memoized table construction: a media corpus decodes thousands of
    frames carrying IDENTICAL DHT segments (every MJPEG sample, every
    frame of a deterministic encoder), and the 256-slot LUT fill per
    table per frame measurably taxed tiny frames. Bounded cache."""
    key = (tuple(bits), bytes(vals))
    tbl = _HUFF_CACHE.get(key)
    if tbl is None:
        if len(_HUFF_CACHE) >= 256:
            _HUFF_CACHE.clear()
        tbl = _HuffTable(bits, vals)
        _HUFF_CACHE[key] = tbl
    return tbl


class _BitReader:
    """MSB-first entropy-coded-segment reader with 0xFF00 unstuffing;
    surfaces RSTn markers to the caller and stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:  # stuffed literal 0xFF
                self.pos += 2
            else:  # a real marker terminates the segment here
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.nbits += 8
        # mask to the valid window: without it the Python bignum grows one
        # byte per fill for the whole entropy segment, making every shift/
        # mask O(segment size) and whole-scan decode quadratic on large
        # JPEGs without restart intervals
        self.bitbuf = ((self.bitbuf << 8) | b) & ((1 << self.nbits) - 1)
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # spec: pad with 1s; 0 only past EOI — decode ends anyway
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            if not self._fill():
                # segment exhausted: same semantics as n read_bit() calls —
                # each missing bit contributes 0 at the LSB end
                have = self.nbits
                v = (self.bitbuf & ((1 << have) - 1)) << (n - have) if have else 0
                self.nbits = 0
                return v
        self.nbits -= n
        return (self.bitbuf >> self.nbits) & ((1 << n) - 1)

    def decode(self, table: _HuffTable) -> int:
        # fast path: one 8-bit peek resolves codes of length <= 8
        while self.nbits < 8:
            if not self._fill():
                break
        if self.nbits >= 8:
            entry = table.lut[(self.bitbuf >> (self.nbits - 8)) & 0xFF]
            if entry is not None:
                self.nbits -= entry[1]
                return entry[0]
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG: no Huffman code matched in 16 bits")

    def restart(self) -> None:
        """Consume the pending RSTn and byte-realign (T.81 E.2.4).

        At a restart boundary the usual state is ``marker is None``: the
        decoder finished the interval's last MCU with 0-7 leftover padding
        bits buffered, so ``_fill`` never reached the marker bytes. Discard
        the padding, then scan raw bytes for the RSTn — skipping optional
        fill bytes (FF FF..., B.1.1.2) and any stuffed FF00 padding byte the
        entropy decoder never pulled. ``marker`` is already set only when a
        Huffman/receive call ran past the segment end into the marker."""
        if self.marker is None:
            self.bitbuf = 0
            self.nbits = 0
            p = self.pos
            while p + 1 < len(self.data) and self.data[p] == 0xFF:
                nxt = self.data[p + 1]
                if nxt == 0x00:  # unconsumed stuffed padding byte
                    p += 2
                elif nxt == 0xFF:  # fill byte
                    p += 1
                else:
                    self.pos = p
                    self.marker = nxt
                    break
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("invalid JPEG: expected restart marker")
        self.pos += 2  # skip FF Dx
        self.marker = None
        self.bitbuf = 0
        self.nbits = 0


def _extend(v: int, size: int) -> int:
    """Magnitude-category sign extension (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _req(tables: dict, key, kind: str):
    """Dict lookup that turns a dangling reference (a scan naming a table
    or component that was never defined — routine in corrupted crawl
    payloads; found by the r12 fuzz harness as bare KeyErrors) into the
    documented ValueError the Arrow-stage wrappers catch."""
    try:
        return tables[key]
    except KeyError:
        raise ValueError(
            f"invalid JPEG: reference to undefined {kind} {key}"
        ) from None


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential (SOF0/1) or progressive (SOF2) JPEG → uint8
    array, (h, w) grayscale or (h, w, 3) RGB. See module docstring."""
    data = payload
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) where comps = [(cid, hi, vi, tq)]
    progressive = False
    prog: _ProgressiveState | None = None

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT — may hold several tables
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qt[tq] = vals[_ZZ_PERM].reshape(8, 8)
        elif marker == 0xC4:  # DHT — may hold several tables
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = seg[i + 17 : i + 17 + n]
                (huff_ac if tc else huff_dc)[th] = _huff_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if seg[0] != 8:
                raise NotImplementedError(
                    f"JPEG sample precision {seg[0]}: only 8-bit baseline "
                    "is implemented"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:  # SOF2 progressive (Huffman)
            if seg[0] != 8:
                raise NotImplementedError(
                    f"JPEG sample precision {seg[0]}: only 8-bit is implemented"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            progressive = True
            prog = _ProgressiveState(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential (SOF0/1) "
                "and progressive (SOF2) are implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            scan = {}
            scan_order = []
            for c in range(ns):
                cs, tbl = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tbl >> 4, tbl & 0x0F)
                scan_order.append(cs)
            if not progressive:
                return _decode_scan(
                    data, pos + 2 + seglen, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            pos = prog.decode_scan(
                data, pos + 2 + seglen, scan_order, scan, ss, se, a >> 4,
                a & 0x0F, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += 2 + seglen
    if progressive and prog is not None and prog.any_scan:
        return prog.render(qt)
    raise ValueError("invalid JPEG: no SOS segment")


# raster-to-zigzag gather permutation: _ZZ_PERM[r*8+c] = zigzag index of
# (r, c) — un-zigzagging a whole (BY, BX, 64) grid is ONE fancy-index
# gather, not 64 slice writes (the slice loop's fixed overhead dominated
# small frames — exactly the MJPEG video shape)
_ZZ_PERM = np.zeros(64, dtype=np.int64)
for _k, (_r, _c) in enumerate(_ZZ_INDEX):
    _ZZ_PERM[_r * 8 + _c] = _k
# inverse gather: _ZZ_RASTER[k] = flat raster index of zigzag position k
# (zigzag-ordering a raster-flat block is one fancy index)
_ZZ_RASTER = np.array([_r * 8 + _c for _r, _c in _ZZ_INDEX], dtype=np.int64)


def _render_zz_blocks(zz: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(BY, BX, 64) zigzag coefficient grid → (BY*8, BX*8) sample plane:
    vectorized un-zigzag, dequantize, and ONE batched IDCT over every
    block (shared by the baseline scan and the progressive render — the
    per-block 8×8 matmul loop was the q113 media family's hot spot)."""
    by, bx = zz.shape[:2]
    # float64 BEFORE the dequantize multiply: the progressive path hands
    # int32 coefficients, and coef*q with a 16-bit DQT can exceed 2^31 —
    # an int32 product would wrap silently
    nat = zz[:, :, _ZZ_PERM].reshape(by, bx, 8, 8).astype(np.float64) * q
    blocks = (_DCT_M.T @ nat) @ _DCT_M + 128
    return blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # Entropy decoding is inherently sequential (a bit stream), so the
    # Huffman pass only COLLECTS (flat index, value) pairs into Python
    # lists — no per-block numpy allocation, no scalar array writes. All
    # array math (un-zigzag, dequantize, IDCT, block scatter) runs ONCE
    # per component over every block at the end (_render_zz_blocks):
    # 2.9× frames/s on the MJPEG family vs the per-block matmul loop.
    grid = {cid: (mcus_y * vi, mcus_x * hi) for cid, hi, vi, _ in comps}
    idxs: dict[int, list[int]] = {cid: [] for cid, *_ in comps}
    vals: dict[int, list[int]] = {cid: [] for cid, *_ in comps}
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hi, vi, _tq in comps:
                sc = _req(scan, cid, "scan component")
                dc_t = _req(huff_dc, sc[0], "DC Huffman table")
                ac_t = _req(huff_ac, sc[1], "AC Huffman table")
                bxs = grid[cid][1]
                ci, cv = idxs[cid], vals[cid]
                for by in range(vi):
                    for bx in range(hi):
                        base = ((my * vi + by) * bxs + (mx * hi + bx)) * 64
                        size = reader.decode(dc_t)
                        pred[cid] += _extend(reader.receive(size), size)
                        ci.append(base)
                        cv.append(pred[cid])
                        k = 1
                        while k < 64:
                            sym = reader.decode(ac_t)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0 and run == 15:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("invalid JPEG: AC index overflow")
                            ci.append(base + k)
                            cv.append(_extend(reader.receive(size), size))
                            k += 1
            n_mcu += 1
    raw = []
    for cid, _hi, _vi, tq in comps:
        by, bx = grid[cid]
        zz = np.zeros(by * bx * 64, dtype=np.float64)
        if idxs[cid]:
            zz[idxs[cid]] = vals[cid]
        raw.append(
            _render_zz_blocks(zz.reshape(by, bx, 64), _req(qt, tq, "quantization table"))
        )
    return _finish_planes(raw, comps, h, w, hmax, vmax)


def _finish_planes(raw_planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Upsample each component plane to full resolution, crop, and color-
    convert (shared by the baseline and progressive paths)."""
    out_planes = []
    for (cid, hi, vi, _), p in zip(comps, raw_planes):
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — T.81 G.2: coefficients accumulate across
# scans (spectral selection bands x successive-approximation bit planes)
# and render once at EOI.
# ---------------------------------------------------------------------------


class _ProgressiveState:
    """Per-image coefficient store + the four progressive scan kinds
    (DC/AC × first/refinement), T.81 G.1.2. Coefficients are kept in
    ZIGZAG order per block; :meth:`render` dequantizes, IDCTs every block
    vectorized, and reuses the baseline upsample/color tail."""

    def __init__(self, frame) -> None:
        h, w, comps = frame
        self.h, self.w, self.comps = h, w, comps
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        self.coefs: dict[int, np.ndarray] = {}
        self.nblocks: dict[int, tuple[int, int]] = {}
        self.sampling: dict[int, tuple[int, int]] = {}
        self.any_scan = False
        for cid, hi, vi, _ in comps:
            # full MCU grid so interleaved DC scans can address edge-pad
            # blocks; non-interleaved scans cover only the real blocks
            self.coefs[cid] = np.zeros(
                (self.mcus_y * vi, self.mcus_x * hi, 64), dtype=np.int32
            )
            cw = -(-w * hi // self.hmax)  # comp width in samples
            ch = -(-h * vi // self.vmax)
            self.nblocks[cid] = (-(-ch // 8), -(-cw // 8))
            self.sampling[cid] = (hi, vi)

    # -- scan driver --------------------------------------------------------

    def decode_scan(
        self, data, pos, scan_order, scan_tables, ss, se, ah, al,
        huff_dc, huff_ac, restart_interval,
    ) -> int:
        """Decode one SOS's entropy segment into the coefficient store;
        returns the byte offset of the next marker."""
        self.any_scan = True
        reader = _BitReader(data, pos)
        pred = {cid: 0 for cid in scan_order}
        eobrun = 0
        n_unit = 0
        if len(scan_order) > 1:
            # interleaved scan: DC only (G.1.1.1.1), MCU order
            if ss != 0:
                raise ValueError("invalid JPEG: interleaved progressive AC scan")
            dc_tables = {
                cid: _req(
                    huff_dc,
                    _req(scan_tables, cid, "scan component")[0],
                    "DC Huffman table",
                )
                if ah == 0
                else None
                for cid in scan_order
            }
            for cid in scan_order:
                # a scan naming a component the frame never declared must
                # fail as a ValueError, not a KeyError mid-MCU-loop
                _req(self.sampling, cid, "frame component")
            for my in range(self.mcus_y):
                for mx in range(self.mcus_x):
                    if restart_interval and n_unit and n_unit % restart_interval == 0:
                        reader.restart()
                        pred = {cid: 0 for cid in scan_order}
                        eobrun = 0
                    for cid in scan_order:
                        hi, vi = self.sampling[cid]
                        for by in range(vi):
                            for bx in range(hi):
                                blk = self.coefs[cid][my * vi + by, mx * hi + bx]
                                self._dc(reader, blk, dc_tables[cid], pred, cid, ah, al)
                    n_unit += 1
        else:
            cid = scan_order[0]
            by_n, bx_n = _req(self.nblocks, cid, "frame component")
            if ss == 0:
                dc_t = (
                    _req(
                        huff_dc,
                        _req(scan_tables, cid, "scan component")[0],
                        "DC Huffman table",
                    )
                    if ah == 0
                    else None
                )
                ac_t = None
            else:
                dc_t = None
                ac_t = _req(
                    huff_ac,
                    _req(scan_tables, cid, "scan component")[1],
                    "AC Huffman table",
                )
            for by in range(by_n):
                for bx in range(bx_n):
                    if restart_interval and n_unit and n_unit % restart_interval == 0:
                        reader.restart()
                        pred[cid] = 0
                        eobrun = 0
                    blk = self.coefs[cid][by, bx]
                    if ss == 0:
                        self._dc(reader, blk, dc_t, pred, cid, ah, al)
                    elif ah == 0:
                        eobrun = self._ac_first(reader, blk, ac_t, ss, se, al, eobrun)
                    else:
                        eobrun = self._ac_refine(reader, blk, ac_t, ss, se, al, eobrun)
                    n_unit += 1
        # advance to the next true marker (skip stuffed FF00 and stray RSTn)
        p = reader.pos
        while p + 1 < len(data):
            if (
                data[p] == 0xFF
                and data[p + 1] != 0x00
                and not (0xD0 <= data[p + 1] <= 0xD7)
            ):
                break
            p += 1
        return p

    # -- block decoders (G.1.2) ---------------------------------------------

    @staticmethod
    def _dc(reader, blk, dc_t, pred, cid, ah, al) -> None:
        if ah == 0:  # first DC scan: baseline DPCM at precision Al
            size = reader.decode(dc_t)
            pred[cid] += _extend(reader.receive(size), size)
            blk[0] = pred[cid] << al
        elif reader.read_bit():  # refinement: one bit appends at plane Al
            blk[0] |= 1 << al

    @staticmethod
    def _ac_first(reader, blk, ac_t, ss, se, al, eobrun) -> int:
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            sym = reader.decode(ac_t)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1  # EOBn: this block + eobrun more
                if r:
                    eobrun += reader.receive(r)
                return eobrun
            k += r
            if k > se:
                raise ValueError("invalid JPEG: progressive AC index overflow")
            blk[k] = _extend(reader.receive(s), s) << al
            k += 1
        return 0

    @staticmethod
    def _ac_refine(reader, blk, ac_t, ss, se, al, eobrun) -> int:
        """Correction-bit pass (G.1.2.3): newly-nonzero coefficients arrive
        as ±2^Al; every already-nonzero coefficient crossed on the way
        carries one correction bit."""
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = reader.decode(ac_t)
                r, s = sym >> 4, sym & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break
                    # ZRL: advance over 16 zero-history coefficients
                else:  # s == 1 per spec: a coefficient newly becomes ±2^Al
                    newval = p1 if reader.read_bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        if reader.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:  # correction bits through the rest of the band
                if blk[k] != 0 and reader.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    # -- final render ---------------------------------------------------------

    def render(self, qt: dict[int, np.ndarray]) -> np.ndarray:
        raw = [
            _render_zz_blocks(self.coefs[cid], _req(qt, tq, "quantization table"))
            for cid, _hi, _vi, tq in self.comps
        ]
        return _finish_planes(raw, self.comps, self.h, self.w, self.hmax, self.vmax)


# ---------------------------------------------------------------------------
# encoder (test-vector generator)
# ---------------------------------------------------------------------------

# 12 DC symbols at 4 bits each (codes 0..11; all-ones 0b1111 unassigned)
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = bytes(range(12))
# every possible baseline AC symbol at 8 bits each: EOB, ZRL, and
# (run 0..15) x (size 1..10) = 162 symbols (codes 0..161; 0xFF unassigned)
_ENC_AC_VALS = bytes(
    [0x00]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
    + [0xF0]
)
_ENC_AC_BITS = [0] * 7 + [len(_ENC_AC_VALS)] + [0] * 8

_ENC_QUANT = np.full((8, 8), 8, dtype=np.int32)
_ENC_QUANT_ZZ = bytes(int(_ENC_QUANT[r, c]) for r, c in _ZZ_INDEX)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad


def _enc_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _enc_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_AC_CODES = _enc_codes(_ENC_AC_BITS, _ENC_AC_VALS)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) per T.81 F.1.2.1 — negatives as one's complement."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _rgb_to_ycbcr(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """BT.601 full-range RGB→YCbCr (JFIF) — the single definition both
    encoders share, so their coefficient streams cannot diverge."""
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return y, cb, cr


def _encode_ac_band(bw: "_BitWriter", zz: list[int], ss: int, se: int) -> None:
    """Run-length-code one block's zigzag band [ss, se] — the shared AC
    body of the baseline block coder (full band 1..63) and the progressive
    spectral-band scans, where the trailing EOB doubles as EOB0 (an EOBRUN
    of exactly 1, valid in both modes)."""
    last_nz = ss - 1
    for k in range(ss, se + 1):
        if zz[k]:
            last_nz = k
    run = 0
    for k in range(ss, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = _AC_CODES[0xF0]
            bw.put(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        ln, code = _AC_CODES[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits, size)
        run = 0
    if last_nz < se:
        ln, code = _AC_CODES[0x00]
        bw.put(code, ln)


def _encode_zz_block(bw: _BitWriter, zz: list[int], pred: int) -> int:
    """Entropy-code one block already FDCT'd/quantized/zigzagged (the
    batched front half lives in _plane_zz_blocks — only the inherently
    sequential bit writing stays per-block)."""
    dc = zz[0]
    size, bits = _magnitude(dc - pred)
    ln, code = _DC_CODES[size]
    bw.put(code, ln)
    bw.put(bits, size)
    _encode_ac_band(bw, zz, 1, 63)
    return dc


def _plane_zz_blocks(p: np.ndarray) -> np.ndarray:
    """(BY*8, BX*8) MCU-padded plane → (BY, BX, 64) int zigzag coefficient
    grid: ONE batched FDCT + quantize + zigzag gather over every block
    (the per-block matmul loop was ~70 % of q113's per-doc cost)."""
    by, bx = p.shape[0] // 8, p.shape[1] // 8
    blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = _DCT_M @ blocks @ _DCT_M.T
    zz = np.round(coef / _ENC_QUANT).astype(np.int64).reshape(by, bx, 64)
    return zz[:, :, _ZZ_RASTER]


def _pad_to_blocks(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // bh) * bh
    pw = -(-w // bw_) * bw_
    if (ph, pw) == (h, w):  # np.pad costs even at zero padding
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    arr: np.ndarray,
    *,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG bytes.
    ``subsampling=(2, 2)`` emits 4:2:0 (RGB only); default is 4:4:4.
    ``restart_interval=n`` emits a DRI segment and an RSTn marker (with
    byte-realign + DC-predictor reset) every n MCUs (T.81 E.2.4)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    sh, sv = (1, 1) if gray else subsampling
    if gray:
        planes = [(1, 1, 1, arr)]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if (sh, sv) != (1, 1):
            cbp = _pad_to_blocks(cb, sv, sh)
            crp = _pad_to_blocks(cr, sv, sh)
            cb = cbp.reshape(cbp.shape[0] // sv, sv, cbp.shape[1] // sh, sh).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // sv, sv, crp.shape[1] // sh, sh).mean(axis=(1, 3))
        planes = [(1, sh, sv, y), (2, 1, 1, cb), (3, 1, 1, cr)]

    out = bytearray(b"\xff\xd8")
    # DQT (table 0, used by every component)
    zzq = _ENC_QUANT_ZZ
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + zzq
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for cid, hi, vi, _ in planes:
        sof += bytes([cid, (hi << 4) | vi, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table 0 + AC table 0 in one segment
    dht = (
        b"\x00" + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + b"\x10" + bytes(_ENC_AC_BITS) + _ENC_AC_VALS
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([len(planes)])
    for cid, *_ in planes:
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # edge-pad every plane to its own MCU-aligned size, then run the whole
    # FDCT/quantize/zigzag front half batched per plane — the MCU loop
    # below only entropy-codes precomputed coefficient lists
    full = []
    for cid, hi, vi, p in planes:
        need_h, need_w = mcus_y * vi * 8, mcus_x * hi * 8
        if (need_h, need_w) != p.shape:  # np.pad costs even at zero padding
            p = np.pad(
                p, ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])), mode="edge"
            )
        full.append((cid, hi, vi, _plane_zz_blocks(p).tolist()))

    bw = _BitWriter()
    pred = {cid: 0 for cid, *_ in planes}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            n_mcu = my * mcus_x + mx
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()  # 1-pad to a byte boundary before the marker
                bw.out += bytes(
                    [0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)]
                )
                pred = {cid: 0 for cid, *_ in planes}
            for cid, hi, vi, zzgrid in full:
                for by in range(vi):
                    for bx in range(hi):
                        pred[cid] = _encode_zz_block(
                            bw, zzgrid[my * vi + by][mx * hi + bx], pred[cid]
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (test-vector generator, T.81 G.1): spectral-selection
# scans plus optional DC successive approximation — enough surface to
# exercise every decoder scan kind deterministically (AC SA refinement is
# additionally covered by real libjpeg progressive files in the tests).
# ---------------------------------------------------------------------------


def _quantized_blocks(plane: np.ndarray) -> tuple[int, int, list[list[int]]]:
    """Pad to 8×8 blocks and return (blocks_y, blocks_x, zigzag coef lists)."""
    p = _pad_to_blocks(plane, 8, 8)
    by, bx = p.shape[0] // 8, p.shape[1] // 8
    return by, bx, _plane_zz_blocks(p).reshape(by * bx, 64).tolist()


def _sos(comp_specs: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comp_specs)])
    for cid, tbl in comp_specs:
        body += bytes([cid, tbl])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg_progressive(
    arr: np.ndarray, *, spectral_split: int = 6, dc_al: int = 0
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → progressive (SOF2) JPEG,
    4:4:4, flat quantization (the q110/q111 closed-form construction).

    Scan script: one interleaved DC first scan (at precision ``dc_al``),
    a DC refinement scan per remaining bit plane when ``dc_al > 0``, then
    per component the AC band split [1, spectral_split] +
    [spectral_split+1, 63] — libjpeg's default-script shape."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [(1, arr)]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        planes = [(1, y), (2, cb), (3, cr)]
    blocks: dict[int, list[list[int]]] = {}
    for cid, p in planes:
        _, _, blocks[cid] = _quantized_blocks(p)
    n_blocks = len(blocks[planes[0][0]])

    out = bytearray(b"\xff\xd8")
    zzq = _ENC_QUANT_ZZ
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + zzq
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for cid, _ in planes:
        sof += bytes([cid, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = (
        b"\x00" + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + b"\x10" + bytes(_ENC_AC_BITS) + _ENC_AC_VALS
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht

    # scan 1: interleaved DC first at precision dc_al (4:4:4 → MCU = one
    # block per component, raster order)
    out += _sos([(cid, 0x00) for cid, _ in planes], 0, 0, 0, dc_al)
    bw = _BitWriter()
    pred = {cid: 0 for cid, _ in planes}
    for i in range(n_blocks):
        for cid, _ in planes:
            v = blocks[cid][i][0] >> dc_al  # arithmetic shift per G.1.2.1
            size, bits = _magnitude(v - pred[cid])
            ln, code = _DC_CODES[size]
            bw.put(code, ln)
            bw.put(bits, size)
            pred[cid] = v
    bw.flush()
    out += bw.out

    # DC refinement scans: one bit plane per scan, Al descending
    for al in range(dc_al - 1, -1, -1):
        out += _sos([(cid, 0x00) for cid, _ in planes], 0, 0, al + 1, al)
        bw = _BitWriter()
        for i in range(n_blocks):
            for cid, _ in planes:
                bw.put((blocks[cid][i][0] >> al) & 1, 1)
        bw.flush()
        out += bw.out

    # AC scans: per component, two spectral bands (single band if the
    # split covers everything), non-interleaved, Al=0
    split = max(1, min(spectral_split, 63))
    bands = [(1, split)] + ([(split + 1, 63)] if split < 63 else [])
    for cid, _ in planes:
        for ss, se in bands:
            out += _sos([(cid, 0x00)], ss, se, 0, 0)
            bw = _BitWriter()
            for zz in blocks[cid]:
                _encode_ac_band(bw, zz, ss, se)
            bw.flush()
            out += bw.out

    out += b"\xff\xd9"
    return bytes(out)
