"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample
as actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED — the image/audio libraries
are not in this container — behind ``decoder="fake"`` (a deterministic
content-derived fake, default for tests) or ``decoder="real"`` (raises
``NotImplementedError`` at the exact seam where PIL/ffmpeg would be
called). Everything Ray-side is real and tested: schema contract,
actor-pool signature, batch sizing for wide binary rows, output layout.

At 100 TB: media bytes dominate block size → run these stages with
small ``batch_size`` (16-64) and ``batch_format="pyarrow"`` so the
binary column stays zero-copy until the decode call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urlkeys import murmur3_x64_128


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
                 decoder: str = "fake"):
        self.media_col = media_col
        self.h, self.w = out_hw
        self.decoder = decoder
        if decoder == "real":
            # the real path would `import PIL.Image` here (once per actor)
            raise NotImplementedError(
                "real image decoding requires PIL/libvips — not in this container"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.media_col].to_pylist()
        pixels = np.stack([_fake_pixels(b or b"", self.h, self.w) for b in blobs])
        flat = pixels.reshape(len(blobs), -1)
        return (
            batch.drop_columns([self.media_col])
            .append_column(
                "pixels",
                pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.reshape(-1), pa.uint8()), flat.shape[1]
                ),
            )
            .append_column("height", pa.array([self.h] * len(blobs), pa.int32()))
            .append_column("width", pa.array([self.w] * len(blobs), pa.int32()))
        )


class ImageFeatureStage:
    """pixels → embedding vector (mean-pool per channel + histogram) —
    a stand-in for batched model inference; the model load would happen
    once per actor in ``__init__``."""

    def __init__(self, bins: int = 8):
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["height"][0].as_py()
        w = batch["width"][0].as_py()
        flat = np.stack(batch["pixels"].to_numpy(zero_copy_only=False))
        imgs = flat.reshape(len(flat), h, w, 3)
        means = imgs.mean(axis=(1, 2))  # (N, 3)
        hists = np.stack(
            [
                np.histogram(img.reshape(-1), bins=self.edges)[0] / img.size
                for img in imgs
            ]
        )
        feats = np.concatenate([means / 255.0, hists], axis=1)
        return batch.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), feats.shape[1]
            ),
        )


class FrameSampleStage:
    """'video' binary → every Nth chunk as a frame row (flat-map shape:
    1 row in → F rows out). Chunking stands in for ffmpeg frame
    extraction; the schema and explode mechanics are the real thing."""

    def __init__(self, media_col: str = "media", frame_bytes: int = 256,
                 every_n: int = 2, decoder: str = "fake"):
        self.media_col = media_col
        self.frame_bytes = frame_bytes
        self.every_n = every_n
        if decoder == "real":
            raise NotImplementedError(
                "real frame sampling requires ffmpeg — not in this container"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        id_col = batch.column_names[0]
        for rid, blob in zip(batch[id_col].to_pylist(), batch[self.media_col].to_pylist()):
            blob = blob or b""
            chunks = [
                blob[i : i + self.frame_bytes]
                for i in range(0, len(blob), self.frame_bytes)
            ]
            for fi, ch in enumerate(chunks[:: self.every_n]):
                ids.append(rid)
                frames.append(ch)
                idxs.append(fi)
        return pa.table(
            {
                id_col: pa.array(ids),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )
