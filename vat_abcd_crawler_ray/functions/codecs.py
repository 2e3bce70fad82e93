"""Pure-numpy media codecs — REAL decoders for the uncompressed
container formats that need no external library:

- PPM (P6) / PGM (P5) binary images: header parse + ``np.frombuffer``
  pixel load; grayscale expands to 3 channels.
- PNG (bit depth 8, color types 0/2/3/4/6, non-interlaced): chunk
  walk with CRC verification, stdlib-zlib inflate, numpy per-row
  unfilter of all five spec filters — a REAL compressed-format
  decoder with no external library.
- WAV RIFF PCM-16: chunk walk + sample load.
- nearest-neighbor resize via strided index sampling.

These give the multimodal stages (stages/multimodal.py) a genuine
bytes→pixels/samples path in this container; the remaining
entropy-coded formats (JPEG/MP3/MP4) still require PIL/ffmpeg and
stay behind the documented ``decoder="real"`` seam. Encoders are
included so tests and oracle-gated queries can synthesize
deterministic media.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# PPM / PGM
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "encode_ppm expects (h, w, 3)"
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _read_ppm_tokens(data: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-separated header tokens (with ``#``
    comment lines skipped, per the netpbm spec) and the offset just
    past the single whitespace byte that terminates the last one."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(data[i:j])
        i = j
    return toks, i + 1  # past the single whitespace after the last token


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) or PGM (P5) → (h, w, 3) uint8 (gray expands)."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic={magic!r}")
    toks, off = _read_ppm_tokens(data, 4)
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    pix = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    img = pix.reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    return img


def resize_nearest(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize by strided index sampling (pure numpy)."""
    oh, ow = out_hw
    h, w = img.shape[:2]
    ri = (np.arange(oh) * h // oh).astype(np.int64)
    ci = (np.arange(ow) * w // ow).astype(np.int64)
    return img[ri][:, ci]


# ---------------------------------------------------------------------------
# WAV (RIFF PCM-16)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 → RIFF WAVE PCM-16 bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF WAVE PCM-16 bytes → ((n, channels) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = channels = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack("<HHI", payload[:8])
            bits = struct.unpack("<H", payload[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM-16 supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            raw = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    s = np.frombuffer(raw, dtype=np.int16)
    return s.reshape(-1, channels), sample_rate


# ---------------------------------------------------------------------------
# PNG (RFC 2083 / W3C PNG spec) — a REAL compressed-format decoder:
# zlib inflate is in the stdlib, so PNG needs no external library.
# Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
# 4 (gray+alpha), 6 (RGBA), non-interlaced. JPEG/MP4 remain the
# documented PIL/ffmpeg seam (entropy coding + DCT are out of scope
# for a stdlib decoder).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, bit depth 8).

    ``filter_type`` picks the per-row filter (0 none, 1 sub, 2 up,
    3 average, 4 paeth) so tests can exercise every unfilter branch of
    :func:`decode_png` against known pixels; real encoders choose per
    row, which changes size, not semantics."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, "encode_png expects (h, w, 3)"
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for r in range(h):
        line = img[r].reshape(-1).astype(np.int32)
        left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            filt = line - left
        elif filter_type == 2:
            filt = line - prev
        elif filter_type == 3:
            filt = line - (left + prev) // 2
        elif filter_type == 4:
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, ul)
            )
            filt = line - pred
        else:
            raise ValueError(f"unknown filter {filter_type}")
        raw.append(filter_type)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Per-row unfilter (spec §6): returns (h, w*bpp) uint8. Sub is an
    exact per-lane cumsum mod 256 (addition mod 256 commutes with
    cumsum); up is one vector add; average/paeth carry a left-pixel
    serial dependency → per-pixel loop of bpp-lane vector ops."""
    stride = w * bpp + 1
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    prev = np.zeros(w * bpp, dtype=np.int32)
    for r in range(h):
        ft = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 1:  # sub: recon[i] = raw[i] + recon[i-bpp]
            rec = np.cumsum(line.reshape(w, bpp), axis=0).reshape(-1) % 256
        elif ft == 2:  # up
            rec = (line + prev) % 256
        elif ft == 3:  # average
            rec = np.empty(w * bpp, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            lw = line.reshape(w, bpp)
            pw = prev.reshape(w, bpp)
            rw = rec.reshape(w, bpp)
            for x in range(w):
                left = (lw[x] + (left + pw[x]) // 2) % 256
                rw[x] = left
        elif ft == 4:  # paeth
            rec = np.empty(w * bpp, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            ulp = np.zeros(bpp, dtype=np.int32)
            lw = line.reshape(w, bpp)
            pw = prev.reshape(w, bpp)
            rw = rec.reshape(w, bpp)
            for x in range(w):
                p = left + pw[x] - ulp
                pa_ = np.abs(p - left)
                pb = np.abs(p - pw[x])
                pc_ = np.abs(p - ulp)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_),
                    left,
                    np.where(pb <= pc_, pw[x], ulp),
                )
                left = (lw[x] + pred) % 256
                rw[x] = left
                ulp = pw[x]
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Gray/palette/alpha normalize to
    RGB (alpha dropped — these stages feed RGB feature extractors).
    Raises ``ValueError`` on anything malformed (CRC mismatch,
    truncation, unsupported depth/interlace) — the decode stages turn
    that into a ``decode_error`` row, never a task failure."""
    import zlib

    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) != 4 or struct.unpack(">I", crc)[0] != (
            zlib.crc32(ctype + body) & 0xFFFFFFFF
        ):
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only bit depth 8 supported, got {depth}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_i)
    if nch is None:
        raise ValueError(f"unknown color type {ctype_i}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if raw.size != h * (w * nch + 1):
        raise ValueError("PNG pixel data size mismatch")
    px = _png_unfilter(raw, h, w, nch).reshape(h, w, nch)
    if ctype_i == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_i == 2:
        return px
    if ctype_i == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    if ctype_i == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA → drop alpha
