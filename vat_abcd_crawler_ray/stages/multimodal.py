"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample
as actor-pool ``map_batches`` stages.

Decoders, by honesty level:

- ``decoder="png"`` (images) is a REAL compressed-format decode path:
  functions/codecs.decode_png — stdlib-zlib inflate + numpy per-row
  unfilter (all five PNG filters), CRC-checked, gray/palette/alpha
  normalized to RGB.
- ``decoder="jpeg"`` (images) is a REAL entropy-coded decode path:
  functions/codecs.decode_jpeg — baseline SOF0 AND progressive SOF2
  (spectral selection + successive approximation); grayscale, 4:4:4,
  4:2:2 and 4:2:0 chroma; Huffman decode, dequantize + IDCT, restart
  markers, multi-scan. Extended/lossless/arithmetic SOFn raise
  NotImplementedError.
- ``decoder="gif"`` (images/animations) is a REAL LZW decode path:
  functions/codecs.decode_gif — variable-width LZW, global/local
  palettes, interlacing, GCE transparency + frame compositing
  (``FrameSampleStage(container="gif")`` samples animation frames).
- ``decoder="ppm"`` (images) and the WAV audio stage are REAL,
  library-free decode paths (functions/codecs.py: netpbm header
  parse + ``np.frombuffer``; RIFF chunk walk) — bytes go in, pixels /
  samples come out, resize and features operate on the decoded data.
- ``decoder="auto"`` sniffs each blob's magic bytes (PNG signature,
  JPEG SOI, GIF87a/89a, BMP, netpbm P3/P6) and routes to the matching
  real decoder —
  the realistic mixed-corpus configuration for a crawled image
  column, where format is per-row data, not stage configuration.
- ``decoder="fake"`` is a deterministic content-derived stand-in
  (tests and format-agnostic plumbing checks).
- ``decoder="real"`` marks the seam where PIL/ffmpeg would decode
  the remaining formats (arithmetic-coded JPEG, WebP/AVIF, MP4) —
  not in this container, raises ``NotImplementedError``.

At 100 TB: media bytes dominate block size → run these stages with
small ``batch_size`` (16-64) and ``batch_format="pyarrow"`` so the
binary column stays zero-copy until the decode call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codecs import (
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_ppm,
    decode_wav,
    resize_nearest,
)
from ..functions.urlkeys import murmur3_x64_128


_REAL_DECODERS = {
    "png": decode_png,
    "ppm": decode_ppm,
    "jpeg": decode_jpeg,
    "gif": decode_gif,
    "bmp": decode_bmp,
}


def _sniff_format(blob: bytes) -> str:
    """Magic-byte format sniff for ``decoder="auto"``: PNG signature,
    JPEG SOI, GIF87a/89a, BMP, netpbm P3/P6. Unknown prefixes raise
    ValueError so the caller's soft-error path turns them into a
    decode_error row."""
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if blob[:2] == b"\xff\xd8":
        return "jpeg"
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if blob[:2] == b"BM":
        return "bmp"
    if blob[:2] in (b"P3", b"P6"):
        return "ppm"
    raise ValueError(f"unrecognized image format (prefix {blob[:4]!r})")


def _fake_pixels(data: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic content-derived fake decode: seeds a PRNG from the
    content hash; same bytes → same 'image'."""
    h1, h2 = murmur3_x64_128(data)
    rng = np.random.RandomState((h1 ^ h2) & 0xFFFFFFFF)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class DecodeImageStage:
    """binary → fixed-size RGB tensor column (+ width/height metadata).

    Usage: ``ds.map_batches(DecodeImageStage, fn_constructor_kwargs=
    {...}, batch_format="pyarrow", batch_size=32, concurrency=N)``.
    """

    def __init__(self, media_col: str = "media", out_hw: tuple[int, int] = (32, 32),
                 decoder: str = "fake", resample: str = "nearest"):
        from ..functions.codecs import resize_bilinear

        self.media_col = media_col
        self.h, self.w = out_hw
        self.decoder = decoder
        if resample not in ("nearest", "bilinear"):
            raise ValueError(f"unknown resample {resample!r}")
        # bilinear = half-pixel-center lerp, the model-input
        # preprocessing convention; nearest keeps constant-color
        # images exact (what the hash oracle relies on)
        self._resize = resize_nearest if resample == "nearest" else resize_bilinear
        if decoder == "real":
            # the real path would `import PIL.Image` here (once per actor)
            raise NotImplementedError(
                "arithmetic-coded JPEG / WebP / AVIF decoding requires "
                "PIL/libvips — not in this container; use decoder='jpeg' "
                "for baseline or progressive JPEG (any integer chroma "
                "sampling, functions/codecs.decode_jpeg), decoder='png' "
                "for PNG bytes, or decoder='ppm' for netpbm"
            )

    def _decode(self, blob: bytes) -> tuple[np.ndarray, int, int, str | None]:
        """→ (pixels, src_h, src_w, error). C2 'errors are data': a
        null/corrupt blob yields zero pixels + a decode_error string,
        never a task failure (same soft-error model as the audio and
        extract stages)."""
        if self.decoder in ("ppm", "png", "jpeg", "gif", "bmp", "auto"):
            try:
                img = _REAL_DECODERS[
                    _sniff_format(blob) if self.decoder == "auto" else self.decoder
                ](blob)
            # NotImplementedError too: an exotic-profile blob in
            # a crawled corpus is DATA, not configuration — it
            # dead-letters like any corrupt blob instead of killing the
            # task (C2 soft-error model)
            except (ValueError, NotImplementedError) as exc:
                return (
                    np.zeros((self.h, self.w, 3), np.uint8),
                    0,
                    0,
                    f"DecodeError: {exc}",
                )
            sh, sw = img.shape[:2]
            return self._resize(img, (self.h, self.w)), sh, sw, None
        return _fake_pixels(blob, self.h, self.w), self.h, self.w, None

    def __call__(self, batch: pa.Table) -> pa.Table:
        decoded = [
            self._decode(b if b else b"")
            for b in batch[self.media_col].to_pylist()
        ]
        pixels = np.stack([d[0] for d in decoded])
        n = len(decoded)
        flat = pixels.reshape(n, -1)
        return (
            batch.drop_columns([self.media_col])
            .append_column(
                "pixels",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.reshape(-1), pa.uint8()), flat.shape[1]
                ),
            )
            .append_column("height", pa.array([self.h] * n, pa.int32()))
            .append_column("width", pa.array([self.w] * n, pa.int32()))
            .append_column(
                "src_height", pa.array([d[1] for d in decoded], pa.int32())
            )
            .append_column(
                "src_width", pa.array([d[2] for d in decoded], pa.int32())
            )
            .append_column(
                "image_decode_error",
                pa.array([d[3] for d in decoded], pa.string()),
            )
        )


class ImageFeatureStage:
    """pixels → embedding vector (mean-pool per channel + histogram) —
    a stand-in for batched model inference; the model load would happen
    once per actor in ``__init__``."""

    def __init__(self, bins: int = 8):
        self.bins = bins  # uniform [0, 256] bins (edges k*256/bins)

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["height"][0].as_py()
        w = batch["width"][0].as_py()
        flat = np.stack(batch["pixels"].to_numpy(zero_copy_only=False))
        imgs = flat.reshape(len(flat), h, w, 3)
        means = imgs.mean(axis=(1, 2))  # (N, 3)
        # all-images histogram in ONE bincount (the per-image
        # np.histogram loop was the last Python row loop in a hot
        # stage): uniform [0,256] edges make the bin index a pure
        # integer transform, and offsetting each image's indices by
        # i*bins turns N histograms into one flat count
        n = len(imgs)
        px = flat.reshape(n, -1).astype(np.int64)
        idx = np.minimum(px * self.bins // 256, self.bins - 1)
        idx += np.arange(n, dtype=np.int64)[:, None] * self.bins
        hists = np.bincount(
            idx.ravel(), minlength=n * self.bins
        ).reshape(n, self.bins) / px.shape[1]
        feats = np.concatenate([means / 255.0, hists], axis=1)
        return batch.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), feats.shape[1]
            ),
        )


class AudioFeatureStage:
    """WAV binary → per-clip scalar features, REAL decode path
    (functions/codecs.decode_wav — RIFF chunk walk dispatching on the
    per-blob format tag: PCM-16, G.711 mu-law, or IMA ADPCM — a mixed
    crawled corpus of uncompressed, companded and predictive-coded
    clips needs no stage configuration): sample count, rate, integer
    sum of |mono samples| and zero-crossing count — exact integers,
    so the stage is oracle-checkable end to end (the audio third of
    ``q_multimodal_features``). A model-embedding variant would load
    its model here in ``__init__`` (once per actor)."""

    def __init__(self, media_col: str = "media"):
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, rates, sum_abs, zc, errs = [], [], [], [], []
        for blob in batch[self.media_col].to_pylist():
            # C2 'errors are data': a null/corrupt blob yields NULL
            # feature columns + decode_error, never a task failure
            # (matching the extract stage's per-record soft errors)
            try:
                samples, rate = decode_wav(blob if blob else b"")
            except ValueError as exc:
                ns.append(None)
                rates.append(None)
                sum_abs.append(None)
                zc.append(None)
                errs.append(f"DecodeError: {exc}")
                continue
            mono = samples.mean(axis=1, dtype=np.int64) if samples.shape[1] > 1 \
                else samples[:, 0].astype(np.int64)
            ns.append(samples.shape[0])
            rates.append(rate)
            sum_abs.append(int(np.abs(mono).sum()))
            sign = mono >= 0
            zc.append(int((sign[1:] != sign[:-1]).sum()))
            errs.append(None)
        return (
            batch.drop_columns([self.media_col])
            .append_column("n_samples", pa.array(ns, pa.int64()))
            .append_column("sample_rate", pa.array(rates, pa.int64()))
            .append_column("sum_abs", pa.array(sum_abs, pa.int64()))
            .append_column("zero_crossings", pa.array(zc, pa.int64()))
            .append_column("audio_decode_error", pa.array(errs, pa.string()))
        )


class FrameSampleStage:
    """'video' binary → every Nth frame as a row (flat-map shape:
    1 row in → F rows out).

    ``container="avi"`` is a REAL demux path: Motion-JPEG AVI → RIFF
    movi walk (functions/codecs.demux_avi_mjpeg) → each sampled frame
    emitted as its JPEG blob, ready for ``DecodeImageStage``
    downstream (``decoder="jpeg"``/``"auto"``). ``container="bytes"``
    keeps the fixed-size chunking stand-in for format-agnostic
    plumbing tests. ``decoder="real"`` stays the honest seam for
    inter-frame codecs (H.264/MP4 — ffmpeg, not in this container).
    A corrupt container dead-letters as a zero-frame doc (C2 soft
    errors), never a task failure."""

    def __init__(self, media_col: str = "media", frame_bytes: int = 256,
                 every_n: int = 2, decoder: str = "fake",
                 container: str = "bytes"):
        self.media_col = media_col
        self.frame_bytes = frame_bytes
        self.every_n = every_n
        if container not in ("bytes", "avi", "gif"):
            raise ValueError(f"unknown container {container!r}")
        self.container = container
        if decoder == "real":
            raise NotImplementedError(
                "inter-frame video codecs (H.264/MP4) require ffmpeg — "
                "not in this container; use container='avi' for "
                "Motion-JPEG AVI (functions/codecs.demux_avi_mjpeg)"
            )

    def _frames(self, blob: bytes) -> list[bytes]:
        if self.container == "avi":
            from ..functions.codecs import demux_avi_mjpeg

            return demux_avi_mjpeg(blob)
        if self.container == "gif":
            # animated GIF: composited frames re-wrapped as netpbm
            # blobs so the downstream DecodeImageStage(auto) path is
            # format-uniform with the AVI/JPEG case
            from ..functions.codecs import decode_gif_frames, encode_ppm

            return [encode_ppm(f) for f in decode_gif_frames(blob)]
        return [
            blob[i : i + self.frame_bytes]
            for i in range(0, len(blob), self.frame_bytes)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs, errs = [], [], [], []
        id_col = batch.column_names[0]
        for rid, blob in zip(batch[id_col].to_pylist(), batch[self.media_col].to_pylist()):
            try:
                chunks = self._frames(blob or b"")
            except ValueError as exc:
                ids.append(rid)
                frames.append(b"")
                idxs.append(-1)
                errs.append(str(exc))
                continue
            for fi, ch in enumerate(chunks[:: self.every_n]):
                ids.append(rid)
                frames.append(ch)
                idxs.append(fi)
                errs.append(None)
        return pa.table(
            {
                id_col: pa.array(ids),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
                "frame_error": pa.array(errs, pa.string()),
            }
        )


class VideoFeatureStage:
    """Per-doc video features WITHOUT the flat-map explode (one row in
    → one row out, so per-doc pipelines keep their partitioning and
    need no re-aggregation shuffle): MJPEG-AVI demux → every
    ``every_n``-th frame through the real JPEG decoder → frame count +
    mean luma over the sampled frames. Null/corrupt containers or
    frames dead-letter via ``video_decode_error`` (C2 soft errors).

    At 100 TB video dominates block size: run with small
    ``batch_size`` and actor-pool ``concurrency``, same sizing rule as
    the image/audio stages (module docstring)."""

    def __init__(self, media_col: str = "media", every_n: int = 2):
        from ..functions.codecs import decode_jpeg, demux_avi_mjpeg

        self.media_col = media_col
        self.every_n = every_n
        self._demux = demux_avi_mjpeg
        self._decode = decode_jpeg

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames, n_sampled, means, errs = [], [], [], []
        for blob in batch[self.media_col].to_pylist():
            try:
                if not blob:
                    raise ValueError("null/empty video payload")
                frames = self._demux(blob)
                sampled = frames[:: self.every_n]
                # mean of per-frame means: frames can differ in size,
                # so a pixel-weighted mean would not be closed-form
                m = float(
                    np.mean([self._decode(f).mean() for f in sampled])
                )
                n_frames.append(len(frames))
                n_sampled.append(len(sampled))
                means.append(m)
                errs.append(None)
            except (ValueError, NotImplementedError) as exc:
                n_frames.append(0)
                n_sampled.append(0)
                means.append(0.0)
                errs.append(str(exc))
        return (
            batch.drop_columns([self.media_col])
            .append_column("n_frames", pa.array(n_frames, pa.int32()))
            .append_column("n_sampled", pa.array(n_sampled, pa.int32()))
            .append_column("frame_mean", pa.array(means, pa.float64()))
            .append_column("video_decode_error", pa.array(errs, pa.string()))
        )
