"""functions/codecs GIF — LZW-compressed images and animations
(public GIF87a/89a spec; encoder exists for round-trip testing)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from vat_abcd_crawler_ray.functions.codecs import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)
from vat_abcd_crawler_ray.stages.multimodal import (
    DecodeImageStage,
    FrameSampleStage,
)


def _limited(h, w, colors=6, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, colors, (h, w, 3)) * (255 // colors)).astype(
        np.uint8
    )


class TestGifCodec:
    def test_round_trip_exact(self):
        # GIF is lossless for palettized content
        img = _limited(23, 31)
        out = decode_gif(encode_gif(img))
        assert out.shape == img.shape and (out == img).all()

    def test_interlaced_round_trip(self):
        img = _limited(29, 17, seed=1)
        assert (decode_gif(encode_gif(img, interlace=True)) == img).all()

    def test_single_color_and_two_color(self):
        for img in (np.full((5, 7, 3), 200, np.uint8),
                    np.tile(np.array([[0, 0, 0], [255, 255, 255]],
                            np.uint8)[None], (4, 3, 1)).reshape(4, 6, 3)):
            assert (decode_gif(encode_gif(img)) == img).all()

    def test_dictionary_reset_on_big_image(self):
        # enough pixels to overflow the 4096-entry LZW dict repeatedly
        img = _limited(120, 130, colors=5, seed=2)
        assert (decode_gif(encode_gif(img)) == img).all()

    def test_animation_frames_composited(self):
        frames = [np.full((10, 12, 3), g, np.uint8) for g in (10, 80, 200)]
        out = decode_gif_frames(encode_gif(frames, delay_cs=5))
        assert len(out) == 3
        assert all((a == b).all() for a, b in zip(out, frames))

    def test_signature_and_trailer(self):
        b = encode_gif(_limited(8, 8))
        assert b[:6] == b"GIF89a" and b[-1] == 0x3B
        w, h = struct.unpack("<HH", b[6:10])
        assert (w, h) == (8, 8)

    def test_palette_limit_enforced(self):
        rng = np.random.default_rng(9)
        with pytest.raises(ValueError, match="256"):
            encode_gif(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))

    @pytest.mark.parametrize("blob", [
        b"", b"GIF", b"NOTGIF" + bytes(20),
        b"GIF89a" + bytes(7),  # truncated header
    ])
    def test_corrupt_rejected(self, blob):
        with pytest.raises(ValueError):
            decode_gif(blob)

    def test_truncated_pixel_data(self):
        b = encode_gif(_limited(16, 16))
        with pytest.raises(ValueError):
            decode_gif(b[: len(b) - 20])


class TestGifStages:
    def test_auto_sniff_decodes_gif(self):
        img = np.full((8, 8, 3), 120, np.uint8)
        t = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "media": pa.array([encode_gif(img)], pa.binary()),
        })
        out = DecodeImageStage(out_hw=(4, 4), decoder="auto")(t)
        px = np.asarray(out["pixels"].to_pylist()[0]).reshape(4, 4, 3)
        assert (px == 120).all()
        assert out["image_decode_error"].to_pylist() == [None]

    def test_explicit_gif_decoder(self):
        img = np.full((6, 6, 3), 33, np.uint8)
        t = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "media": pa.array([encode_gif(img)], pa.binary()),
        })
        out = DecodeImageStage(out_hw=(3, 3), decoder="gif")(t)
        assert (np.asarray(out["pixels"].to_pylist()[0]) == 33).all()

    def test_frame_sample_animated_gif(self):
        anim = encode_gif(
            [np.full((6, 6, 3), g, np.uint8) for g in (10, 90, 170, 250)]
        )
        t = pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "media": pa.array([anim], pa.binary()),
        })
        fs = FrameSampleStage(every_n=2, container="gif")(t)
        assert fs.num_rows == 2  # frames 0 and 2
        assert all(f[:2] == b"P6" for f in fs["frame"].to_pylist())
        # sampled frames feed the image decoder (netpbm path)
        dec = DecodeImageStage(out_hw=(2, 2), decoder="auto")(
            fs.rename_columns(
                ["doc_id", "frame_idx", "media", "frame_error"]
            )
        )
        means = [np.asarray(p).mean() for p in dec["pixels"].to_pylist()]
        assert means == [10.0, 170.0]

    def test_corrupt_gif_dead_letters(self):
        t = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "media": pa.array([b"GIF89a junk"], pa.binary()),
        })
        out = DecodeImageStage(out_hw=(2, 2), decoder="auto")(t)
        assert out["image_decode_error"].to_pylist()[0] is not None


class TestDecoderFuzzContract:
    """Corrupt media blobs must ALWAYS raise ValueError (or decode) —
    never IndexError/KeyError/OverflowError/MemoryError: a crawled
    corpus contains every corruption, and anything but ValueError
    escapes the stages' dead-letter path and kills the actor.
    Includes dimension-field decompression bombs (gigapixel claims)."""

    def _fuzz(self, good: bytes, dec, trials=600):
        rng = np.random.default_rng(7)
        good = bytearray(good)
        for trial in range(trials):
            b = bytearray(good)
            mode = trial % 3
            if mode == 0:
                b = b[: rng.integers(6, len(b))]
            elif mode == 1:
                for _ in range(rng.integers(1, 6)):
                    b[rng.integers(0, len(b))] = rng.integers(0, 256)
            else:
                i = rng.integers(6, len(b))
                b = b[:i] + bytes(rng.integers(0, 256, 5).tolist()) + b[i:]
            try:
                dec(bytes(b))
            except (ValueError, NotImplementedError):
                pass

    def test_gif(self):
        self._fuzz(encode_gif(_limited(16, 20)), decode_gif)

    def test_jpeg_baseline_and_progressive(self):
        from vat_abcd_crawler_ray.functions.codecs import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = _limited(16, 20)
        self._fuzz(encode_jpeg(img, 90), decode_jpeg)
        self._fuzz(encode_jpeg_progressive(img, 90), decode_jpeg)

    def test_png(self):
        from vat_abcd_crawler_ray.functions.codecs import (
            decode_png,
            encode_png,
        )

        self._fuzz(encode_png(_limited(16, 20)), decode_png)

    def test_dimension_bomb_rejected(self):
        import struct

        from vat_abcd_crawler_ray.functions.codecs import decode_jpeg

        # GIF claiming a 65535x65535 canvas
        bomb = bytearray(encode_gif(_limited(8, 8)))
        bomb[6:10] = struct.pack("<HH", 65535, 65535)
        with pytest.raises(ValueError, match="out of bounds"):
            decode_gif(bytes(bomb))
        # JPEG SOF claiming the same
        from vat_abcd_crawler_ray.functions.codecs import encode_jpeg

        jb = bytearray(encode_jpeg(_limited(8, 8), 90))
        i = bytes(jb).index(b"\xff\xc0")
        jb[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
        with pytest.raises(ValueError):
            decode_jpeg(bytes(jb))

    def test_wav_all_codecs(self):
        from vat_abcd_crawler_ray.functions.codecs import (
            decode_wav,
            encode_wav,
            encode_wav_adpcm,
            encode_wav_mulaw,
        )

        sig = (8000 * np.sin(np.arange(400) / 9)).astype(np.int16)
        for blob in (encode_wav(sig, 16000),
                     encode_wav_mulaw(bytes(range(256)), 8000),
                     encode_wav_adpcm(sig, 8000, 64)):
            self._fuzz(blob, decode_wav, trials=400)

    def test_avi_and_webdataset_containers(self):
        from vat_abcd_crawler_ray.functions.codecs import (
            demux_avi_mjpeg,
            encode_avi_mjpeg,
            encode_jpeg,
        )
        from vat_abcd_crawler_ray.sources.webdataset import (
            parse_shard,
            write_webdataset_shard,
        )

        frames = [encode_jpeg(_limited(8, 8), 90) for _ in range(2)]
        self._fuzz(encode_avi_mjpeg(frames, 8, 8), demux_avi_mjpeg,
                   trials=400)
        wds = write_webdataset_shard([("a", {"jpg": b"x" * 50})])
        # parse_shard must NEVER raise (it dead-letters internally)
        self._fuzz(wds, lambda b: parse_shard("s", b, ["jpg"]),
                   trials=400)
