"""Pure-numpy media codecs — REAL decoders for the uncompressed
container formats that need no external library:

- PPM (P6) / PGM (P5) binary images: header parse + ``np.frombuffer``
  pixel load; grayscale expands to 3 channels.
- WAV RIFF PCM-16: chunk walk + sample load.
- nearest-neighbor resize via strided index sampling.

These give the multimodal stages (stages/multimodal.py) a genuine
bytes→pixels/samples path in this container; compressed formats
(JPEG/PNG/MP3/MP4) still require PIL/ffmpeg and stay behind the
documented ``decoder="real"`` seam. Encoders are included so tests and
oracle-gated queries can synthesize deterministic media.
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
