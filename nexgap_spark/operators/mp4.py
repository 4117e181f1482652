"""Pure-stdlib ISO-BMFF (MP4) container parsing and demuxing.

Implements the public ISO/IEC 14496-12 box format from scratch — no codec
library. The container level of a video file is plain struct parsing:
box walk (32/64-bit sizes), movie/track/media headers, sample tables
(stsd/stts/stsz/stsc/stco/co64), and sample-range resolution that slices
raw frame payloads out of ``mdat`` — i.e. REAL demuxing. What genuinely
needs a codec is decoding those frame payloads to pixels; that boundary
stays a documented ``NotImplementedError``
(multimodal.real_decode_kernel), exactly like the reference pipeline's
media columns are opaque bytes plus typed metadata (SURVEY §2 multimodal
row). ``encode_mp4`` is the deterministic fixture generator — the same
role encode_wav/encode_png/encode_jpeg play for their formats.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts", b"udta"}

_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


# ---------------------------------------------------------------------------
# Writer (fixture generator)
# ---------------------------------------------------------------------------


def _box(typ: bytes, *payload: bytes) -> bytes:
    data = b"".join(payload)
    return struct.pack(">I", 8 + len(data)) + typ + data


def _full(typ: bytes, version: int, flags: int, *payload: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big"), *payload)


def _video_sample_entry(width: int, height: int, codec: bytes = b"avc1") -> bytes:
    return _box(
        codec,
        b"\x00" * 6,
        struct.pack(">H", 1),  # data_reference_index
        struct.pack(">HH", 0, 0),
        b"\x00" * 12,
        struct.pack(">HH", width, height),
        struct.pack(">II", 0x00480000, 0x00480000),  # 72 dpi
        struct.pack(">I", 0),
        struct.pack(">H", 1),  # frame_count
        b"\x00" * 32,  # compressorname
        struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )


def _audio_sample_entry(rate: int) -> bytes:
    return _box(
        b"mp4a",
        b"\x00" * 6,
        struct.pack(">H", 1),
        b"\x00" * 8,
        struct.pack(">HH", 1, 16),  # channels, sample size
        struct.pack(">HH", 0, 0),
        struct.pack(">I", rate << 16),  # 16.16 fixed
    )


def _track(
    track_id: int,
    handler: bytes,
    sample_entry: bytes,
    *,
    timescale: int,
    n_samples: int,
    sample_sizes: list[int],
    chunk_offset: int,
    width: int = 0,
    height: int = 0,
) -> bytes:
    tkhd = _full(
        b"tkhd",
        0,
        0x7,  # enabled | in_movie | in_preview
        struct.pack(">III", 0, 0, track_id),
        struct.pack(">I", 0),
        struct.pack(">I", n_samples),
        b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0x0100 if handler == b"soun" else 0, 0),
        _UNITY_MATRIX,
        struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">II", 0, 0),
        struct.pack(">II", timescale, n_samples),
        struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0, struct.pack(">I", 0), handler, b"\x00" * 12, b"demo\x00"
    )
    media_hdr = (
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        if handler == b"vide"
        else _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    )
    dinf = _box(
        b"dinf",
        _full(b"dref", 0, 0, struct.pack(">I", 1), _full(b"url ", 0, 1)),
    )
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, struct.pack(">I", 1), sample_entry),
        _full(b"stts", 0, 0, struct.pack(">III", 1, n_samples, 1)),
        _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_samples, 1)),
        _full(
            b"stsz",
            0,
            0,
            struct.pack(">II", 0, n_samples),
            b"".join(struct.pack(">I", s) for s in sample_sizes),
        ),
        _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset)),
    )
    return _box(
        b"trak", tkhd, _box(b"mdia", mdhd, hdlr, _box(b"minf", media_hdr, dinf, stbl))
    )


def encode_mp4(
    width: int,
    height: int,
    n_frames: int,
    *,
    fps: int = 10,
    frame_bytes: int = 32,
    audio_samples: int = 0,
    audio_rate: int = 8000,
    frames: list[bytes] | None = None,
    codec: bytes = b"avc1",
) -> bytes:
    """Deterministic minimal-but-valid MP4: ftyp + moov (video trak, and an
    audio trak when ``audio_samples`` > 0) + mdat. Frame k's payload is
    ``frame_bytes`` bytes of value ``k % 256`` (so demuxed samples are
    closed-form checkable); audio samples are 2 bytes each. Written
    moov-before-mdat, so chunk offsets are resolved with a second pass at
    identical byte length (stco payloads are fixed-width).

    ``frames``: explicit per-sample payloads instead of the synthetic
    fill — with JPEG-encoded images and ``codec=b"jpeg"`` this writes a
    real MJPEG (Motion-JPEG-in-MP4) file whose samples round-trip through
    multimodal.decode_video_frames. ``n_frames`` must match len(frames)."""
    if frames is not None:
        if n_frames != len(frames):
            raise ValueError(f"n_frames={n_frames} != len(frames)={len(frames)}")
        v_sizes = [len(f) for f in frames]
        v_payload = b"".join(frames)
    else:
        v_sizes = [frame_bytes] * n_frames
        v_payload = b"".join(bytes([k % 256]) * frame_bytes for k in range(n_frames))
    if n_frames <= 0 or width <= 0 or height <= 0:
        raise ValueError("need positive width/height/n_frames")
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 512), b"isom", b"iso2", b"mp41")
    a_sizes = [2] * audio_samples
    audio = b"".join(
        struct.pack(">h", (k % 128) - 64) for k in range(audio_samples)
    )

    def build(v_off: int, a_off: int) -> bytes:
        mvhd = _full(
            b"mvhd",
            0,
            0,
            struct.pack(">II", 0, 0),
            struct.pack(">II", 1000 * fps, 1000 * n_frames),  # duration_s = n/fps
            struct.pack(">I", 0x00010000),
            struct.pack(">H", 0x0100),
            b"\x00" * 10,
            _UNITY_MATRIX,
            b"\x00" * 24,
            struct.pack(">I", 3),
        )
        traks = [
            _track(
                1,
                b"vide",
                _video_sample_entry(width, height, codec),
                timescale=fps,
                n_samples=n_frames,
                sample_sizes=v_sizes,
                chunk_offset=v_off,
                width=width,
                height=height,
            )
        ]
        if audio_samples:
            traks.append(
                _track(
                    2,
                    b"soun",
                    _audio_sample_entry(audio_rate),
                    timescale=audio_rate,
                    n_samples=audio_samples,
                    sample_sizes=a_sizes,
                    chunk_offset=a_off,
                )
            )
        return _box(b"moov", mvhd, *traks)

    moov_len = len(build(0, 0))
    mdat_payload_at = len(ftyp) + moov_len + 8
    moov = build(mdat_payload_at, mdat_payload_at + len(v_payload))
    assert len(moov) == moov_len
    return ftyp + moov + _box(b"mdat", v_payload, audio)


# ---------------------------------------------------------------------------
# Parser / demuxer
# ---------------------------------------------------------------------------


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _iter_boxes4(buf: bytes, start: int, end: int):
    """Yield (typ, box_start, payload_start, end). box_start is the first
    byte of the size field — the anchor default-base-is-moof offsets need,
    and box_start == payload_start - 8 only for 32-bit headers (a moof
    written with size==1 largesize has a 16-byte header)."""
    pos = start
    while pos + 8 <= end:
        size, typ = struct.unpack_from(">I4s", buf, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated 64-bit box header")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"invalid box size {size} for {typ!r}")
        yield typ, pos, pos + hdr, pos + size
        pos += size


def _iter_boxes(buf: bytes, start: int, end: int):
    for typ, _box_start, payload_start, box_end in _iter_boxes4(buf, start, end):
        yield typ, payload_start, box_end


def _find(buf: bytes, start: int, end: int, typ: bytes):
    for t, s, e in _iter_boxes(buf, start, end):
        if t == typ:
            return s, e
    return None


def _fullbox(buf: bytes, start: int) -> tuple[int, int]:
    version = buf[start]
    return version, start + 4


def _check_count(n: int, entry_size: int, pos: int, box_end: int, typ: str) -> int:
    """Validate an entry count read from the file against the enclosing
    box's remaining payload. Corrupt/hostile sample tables can claim
    billions of entries; unpacking f">{n}I" would then build a huge format
    string and allocation before failing. Raising ValueError here keeps it
    a clean parse error (sample_frames' stride fallback applies)."""
    if n < 0 or pos + n * entry_size > box_end:
        raise ValueError(
            f"{typ} claims {n} entries but box has only {box_end - pos} payload bytes"
        )
    return n


def _parse_track(buf: bytes, start: int, end: int) -> dict:
    info: dict = {
        "track_id": 0,
        "handler": None,
        "codec": None,
        "width": 0,
        "height": 0,
        "timescale": 0,
        "duration": 0,
        "n_samples": 0,
        "sample_sizes": [],
        "chunk_offsets": [],
        "stsc": [],
        "stts": [],
    }
    tk = _find(buf, start, end, b"tkhd")
    if tk:
        v, p = _fullbox(buf, tk[0])
        (info["track_id"],) = struct.unpack_from(
            ">I", buf, p + (16 if v == 1 else 8)
        )
        # width/height are the last two 16.16 fields of the box
        w, h = struct.unpack_from(">II", buf, tk[1] - 8)
        info["width"], info["height"] = w >> 16, h >> 16
    mdia = _find(buf, start, end, b"mdia")
    if not mdia:
        return info
    md = _find(buf, mdia[0], mdia[1], b"mdhd")
    if md:
        v, p = _fullbox(buf, md[0])
        if v == 1:
            _, _, ts, dur = struct.unpack_from(">QQIQ", buf, p)
        else:
            _, _, ts, dur = struct.unpack_from(">IIII", buf, p)
        info["timescale"], info["duration"] = ts, dur
    hd = _find(buf, mdia[0], mdia[1], b"hdlr")
    if hd:
        _, p = _fullbox(buf, hd[0])
        info["handler"] = buf[p + 4 : p + 8].decode("latin-1")
    minf = _find(buf, mdia[0], mdia[1], b"minf")
    if not minf:
        return info
    stbl = _find(buf, minf[0], minf[1], b"stbl")
    if not stbl:
        return info
    s, e = stbl
    sd = _find(buf, s, e, b"stsd")
    if sd:
        _, p = _fullbox(buf, sd[0])
        (n_entries,) = struct.unpack_from(">I", buf, p)
        if n_entries:
            info["codec"] = buf[p + 8 : p + 12].decode("latin-1")
    tt = _find(buf, s, e, b"stts")
    if tt:
        _, p = _fullbox(buf, tt[0])
        (n,) = struct.unpack_from(">I", buf, p)
        _check_count(n, 8, p + 4, tt[1], "stts")
        info["stts"] = [
            struct.unpack_from(">II", buf, p + 4 + 8 * i) for i in range(n)
        ]
    sz = _find(buf, s, e, b"stsz")
    if sz:
        _, p = _fullbox(buf, sz[0])
        fixed, n = struct.unpack_from(">II", buf, p)
        info["n_samples"] = n
        if fixed:
            # fixed-size table carries no per-sample array; bound n·fixed
            # by the FILE size (each sample occupies >= fixed bytes of
            # mdat, so a valid table can never claim more total bytes than
            # the file holds) — a constant cap would reject structurally
            # valid long tracks (e.g. per-frame PCM audio passes 16.7M
            # samples in ~6 minutes), while n alone would let a hostile
            # (fixed=4096, n=len(buf)) table allocate ~8x the file size
            if n * fixed > len(buf):
                raise ValueError(
                    f"stsz claims {n} samples x {fixed} bytes but the file "
                    f"has only {len(buf)} bytes"
                )
            info["sample_sizes"] = [fixed] * n
        else:
            _check_count(n, 4, p + 8, sz[1], "stsz")
            info["sample_sizes"] = list(
                struct.unpack_from(f">{n}I", buf, p + 8)
            )
    sc = _find(buf, s, e, b"stsc")
    if sc:
        _, p = _fullbox(buf, sc[0])
        (n,) = struct.unpack_from(">I", buf, p)
        _check_count(n, 12, p + 4, sc[1], "stsc")
        info["stsc"] = [
            struct.unpack_from(">III", buf, p + 4 + 12 * i) for i in range(n)
        ]
    co = _find(buf, s, e, b"stco")
    if co:
        _, p = _fullbox(buf, co[0])
        (n,) = struct.unpack_from(">I", buf, p)
        _check_count(n, 4, p + 4, co[1], "stco")
        info["chunk_offsets"] = list(struct.unpack_from(f">{n}I", buf, p + 4))
    else:
        co = _find(buf, s, e, b"co64")
        if co:
            _, p = _fullbox(buf, co[0])
            (n,) = struct.unpack_from(">I", buf, p)
            _check_count(n, 8, p + 4, co[1], "co64")
            info["chunk_offsets"] = list(
                struct.unpack_from(f">{n}Q", buf, p + 4)
            )
    return info


def parse_mp4(payload: bytes) -> dict:
    """Parse an ISO-BMFF container → brand, movie duration, per-track
    metadata (handler, codec fourcc, dims, timescale, sample count, fps)
    and raw sample tables. Raises ValueError on malformed boxes."""
    buf = bytes(payload)
    if not is_mp4(buf):
        raise ValueError("not an ISO-BMFF payload (no ftyp)")
    out: dict = {"brand": None, "timescale": 0, "duration": 0, "tracks": []}
    for typ, s, e in _iter_boxes(buf, 0, len(buf)):
        if typ == b"ftyp":
            out["brand"] = buf[s : s + 4].decode("latin-1")
        elif typ == b"moov":
            for t2, s2, e2 in _iter_boxes(buf, s, e):
                if t2 == b"mvhd":
                    v, p = _fullbox(buf, s2)
                    if v == 1:
                        _, _, ts, dur = struct.unpack_from(">QQIQ", buf, p)
                    else:
                        _, _, ts, dur = struct.unpack_from(">IIII", buf, p)
                    out["timescale"], out["duration"] = ts, dur
                elif t2 == b"trak":
                    out["tracks"].append(_parse_track(buf, s2, e2))
    for tr in out["tracks"]:
        tr["duration_s"] = (
            tr["duration"] / tr["timescale"] if tr["timescale"] else 0.0
        )
        # fps from the time-to-sample table: timescale / per-sample delta
        tr["fps"] = (
            tr["timescale"] / tr["stts"][0][1]
            if tr["stts"] and tr["stts"][0][1]
            else 0.0
        )
    out["duration_s"] = out["duration"] / out["timescale"] if out["timescale"] else 0.0
    return out


def sample_ranges(track: dict) -> list[tuple[int, int]]:
    """Resolve a track's sample table to absolute (offset, size) per sample
    — the full stsc expansion: each stsc entry (first_chunk,
    samples_per_chunk, _) applies from its first_chunk until the next
    entry's; samples are laid out consecutively within each chunk."""
    sizes = track["sample_sizes"]
    chunks = track["chunk_offsets"]
    stsc = track["stsc"]
    if not sizes or not chunks or not stsc:
        return []
    ranges: list[tuple[int, int]] = []
    si = 0
    for i, (first, per_chunk, _sdi) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(chunks)
        for ci in range(first - 1, last):
            off = chunks[ci]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return ranges
                ranges.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return ranges


def demux_video_samples(payload: bytes, *, max_samples: int | None = None) -> list[bytes]:
    """Slice the video track's raw sample payloads out of mdat — real
    demuxing, no codec. Handles both monolithic (stbl sample tables) and
    fragmented (moof/trun runs) layouts. Decoding these samples to pixels
    IS codec-bound and stays out of scope
    (multimodal.real_decode_kernel)."""
    buf = bytes(payload)
    parsed = parse_mp4(buf)
    for tr in parsed["tracks"]:
        if tr["handler"] == "vide":
            ranges = sample_ranges(tr)
            if not ranges:
                ranges = parse_mp4_fragments(buf).get(tr["track_id"], [])
            if max_samples is not None:
                ranges = ranges[:max_samples]
            for o, s in ranges:
                if o < 0 or o + s > len(buf):
                    # same strict stance as the box parser: a sample table
                    # pointing past a truncated mdat must not silently
                    # yield short/empty 'frames' downstream
                    raise ValueError(
                        f"sample range [{o}, {o + s}) exceeds file size {len(buf)}"
                    )
            return [buf[o : o + s] for o, s in ranges]
    return []


def mp4_features(payload: bytes) -> list[float]:
    """8-feature vector for the multimodal kernel: [width, height,
    n_tracks, duration_s, fps, n_video_samples, avg_sample_bytes,
    aspect]."""
    p = parse_mp4(payload)
    vid = next((t for t in p["tracks"] if t["handler"] == "vide"), None)
    if vid is None:
        raise ValueError("no video track")
    n = vid["n_samples"]
    total = sum(vid["sample_sizes"])
    duration = p["duration_s"]
    if n == 0:  # fragmented layout: samples live in moof/trun runs
        frags = parse_mp4_fragments(bytes(payload)).get(vid["track_id"], [])
        n = len(frags)
        total = sum(s for _, s in frags)
        if not duration and vid["fps"]:
            duration = n / vid["fps"]
    avg = total / n if n else 0.0
    return [
        float(vid["width"]),
        float(vid["height"]),
        float(len(p["tracks"])),
        duration,
        vid["fps"],
        float(n),
        avg,
        vid["width"] / vid["height"] if vid["height"] else 0.0,
    ]


# ---------------------------------------------------------------------------
# Fragmented MP4 (fMP4 / CMAF / DASH layout): moov carries only trex
# defaults; samples arrive in moof+mdat fragments described by trun runs.
# This is the layout streaming corpora actually contain — a crawl's video
# payloads are far more often DASH segments than monolithic files.
# ---------------------------------------------------------------------------

_TFHD_BASE_DATA_OFFSET = 0x1
_TFHD_DEFAULT_SAMPLE_SIZE = 0x10
_TFHD_DEFAULT_BASE_IS_MOOF = 0x20000
_TRUN_DATA_OFFSET = 0x1
_TRUN_FIRST_SAMPLE_FLAGS = 0x4
_TRUN_SAMPLE_DURATION = 0x100
_TRUN_SAMPLE_SIZE = 0x200
_TRUN_SAMPLE_FLAGS = 0x400
_TRUN_SAMPLE_CTS = 0x800


def encode_fmp4(
    width: int,
    height: int,
    n_frames: int,
    *,
    fps: int = 10,
    frame_bytes: int = 32,
    frames_per_fragment: int = 4,
) -> bytes:
    """Deterministic fragmented MP4: ftyp + moov (trak with EMPTY sample
    tables + mvex/trex defaults) followed by one moof+mdat pair per
    fragment. Frame k's payload is ``frame_bytes`` bytes of value
    ``k % 256``, same contract as encode_mp4."""
    if n_frames <= 0 or frames_per_fragment <= 0:
        raise ValueError("need positive n_frames/frames_per_fragment")
    ftyp = _box(b"ftyp", b"iso5", struct.pack(">I", 512), b"iso5", b"cmfc")
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">II", 0, 0),
        struct.pack(">II", 1000 * fps, 0),  # duration unknown up front
        struct.pack(">I", 0x00010000), struct.pack(">H", 0x0100),
        b"\x00" * 10, _UNITY_MATRIX, b"\x00" * 24, struct.pack(">I", 2),
    )
    trak = _track(
        1, b"vide", _video_sample_entry(width, height),
        timescale=fps, n_samples=0, sample_sizes=[], chunk_offset=0,
        width=width, height=height,
    )
    mvex = _box(
        b"mvex",
        _full(b"trex", 0, 0, struct.pack(">IIIII", 1, 1, 1, frame_bytes, 0)),
    )
    moov = _box(b"moov", mvhd, trak, mvex)
    out = [ftyp, moov]
    seq = 1
    k = 0
    while k < n_frames:
        run = min(frames_per_fragment, n_frames - k)
        sizes = [frame_bytes] * run
        payload = b"".join(bytes([(k + j) % 256]) * frame_bytes for j in range(run))
        # trun data_offset is from moof start (default-base-is-moof):
        # moof header + mfhd + traf(tfhd+tfdt+trun) + mdat header
        trun_flags = _TRUN_DATA_OFFSET | _TRUN_SAMPLE_SIZE
        trun = _full(
            b"trun", 0, trun_flags,
            struct.pack(">I", run),
            struct.pack(">i", 0),  # patched below
            b"".join(struct.pack(">I", s) for s in sizes),
        )
        tfhd = _full(
            b"tfhd", 0, _TFHD_DEFAULT_BASE_IS_MOOF, struct.pack(">I", 1)
        )
        tfdt = _full(b"tfdt", 1, 0, struct.pack(">Q", k))
        traf = _box(b"traf", tfhd, tfdt, trun)
        moof = _box(b"moof", _full(b"mfhd", 0, 0, struct.pack(">I", seq)), traf)
        # patch data_offset: moof length + mdat header
        moof = bytearray(moof)
        ti = bytes(moof).find(b"trun")
        struct.pack_into(">i", moof, ti + 12, len(moof) + 8)
        out.append(bytes(moof))
        out.append(_box(b"mdat", payload))
        seq += 1
        k += run
    return b"".join(out)


def _parse_traf(
    buf: bytes,
    start: int,
    end: int,
    moof_start: int,
    implicit_base: int | None = None,
) -> tuple[int, list[tuple[int, int]], int | None]:
    """One track fragment → (track_id, [(abs_offset, size), ...], data_end).

    ``implicit_base``: ISO 14496-12 §8.8.7 — when tfhd carries neither
    base-data-offset nor default-base-is-moof, the 2nd+ traf in a moof
    defaults its base to the END of the previous traf's data; the first
    traf defaults to the moof start. Within a traf, a 2nd+ trun without
    data_offset likewise continues after the previous run. ``data_end``
    (max end of this traf's resolved ranges, or the incoming implicit
    base when it had no runs) feeds the next traf's implicit base.
    """
    track_id = 0
    base = moof_start
    default_size = 0
    runs: list[tuple[int, int]] = []
    cursor: int | None = None  # end of previous run within this traf
    for typ, s, e in _iter_boxes(buf, start, end):
        if typ == b"tfhd":
            flags = int.from_bytes(buf[s + 1 : s + 4], "big")
            (track_id,) = struct.unpack_from(">I", buf, s + 4)
            pos = s + 8
            if flags & _TFHD_BASE_DATA_OFFSET:
                (base,) = struct.unpack_from(">Q", buf, pos)
                pos += 8
            elif flags & _TFHD_DEFAULT_BASE_IS_MOOF:
                base = moof_start
            else:
                base = moof_start if implicit_base is None else implicit_base
            if flags & 0x2:
                pos += 4  # sample_description_index
            if flags & 0x8:
                pos += 4  # default_sample_duration
            if flags & _TFHD_DEFAULT_SAMPLE_SIZE:
                (default_size,) = struct.unpack_from(">I", buf, pos)
        elif typ == b"trun":
            version = buf[s]
            flags = int.from_bytes(buf[s + 1 : s + 4], "big")
            (count,) = struct.unpack_from(">I", buf, s + 4)
            pos = s + 8
            if flags & _TRUN_DATA_OFFSET:
                (doff,) = struct.unpack_from(">i", buf, pos)
                off = base + doff
                pos += 4
            elif cursor is not None:
                off = cursor  # 2nd+ trun continues after the previous run
            else:
                off = base
            if flags & _TRUN_FIRST_SAMPLE_FLAGS:
                pos += 4
            per = (
                (4 if flags & _TRUN_SAMPLE_DURATION else 0),
                (4 if flags & _TRUN_SAMPLE_SIZE else 0),
                (4 if flags & _TRUN_SAMPLE_FLAGS else 0),
                (4 if flags & _TRUN_SAMPLE_CTS else 0),
            )
            for _ in range(count):
                p = pos
                if per[0]:
                    p += 4
                size = default_size
                if per[1]:
                    (size,) = struct.unpack_from(">I", buf, p)
                    p += 4
                runs.append((off, size))
                off += size
                pos += sum(per)
            cursor = off
    data_end = max((o + sz for o, sz in runs), default=implicit_base)
    return track_id, runs, data_end


def parse_mp4_fragments(payload: bytes) -> dict[int, list[tuple[int, int]]]:
    """Walk every moof and resolve its trun runs to absolute (offset,
    size) ranges, keyed by track_id. Empty for unfragmented files."""
    buf = bytes(payload)
    out: dict[int, list[tuple[int, int]]] = {}
    for typ, box_start, s, e in _iter_boxes4(buf, 0, len(buf)):
        if typ != b"moof":
            continue
        # offsets are from the moof box START (the size field), which is
        # NOT payload_start - 8 when the moof uses a 64-bit largesize
        implicit: int | None = None
        for t2, s2, e2 in _iter_boxes(buf, s, e):
            if t2 == b"traf":
                tid, runs, implicit = _parse_traf(buf, s2, e2, box_start, implicit)
                out.setdefault(tid, []).extend(runs)
    return out
