"""Motion-JPEG AVI: the REAL video container path (RIFF mux/demux in
functions/codecs + frame sampling and per-doc features in
stages/multimodal). Reference parity: the reference has no video at
all — this family is part of the engine's LLM-training-data surface
(multimodal columns as opaque binary + typed metadata)."""

import numpy as np
import pyarrow as pa
import pytest

from vat_abcd_crawler_ray.functions.codecs import (
    decode_jpeg,
    demux_avi_mjpeg,
    encode_avi_mjpeg,
    encode_jpeg,
)
from vat_abcd_crawler_ray.stages.multimodal import (
    DecodeImageStage,
    FrameSampleStage,
    VideoFeatureStage,
)


def _gray_frames(grays, hw=(8, 8), q=100):
    return [encode_jpeg(np.full(hw, g, np.uint8), quality=q) for g in grays]


class TestAviCodec:
    def test_roundtrip_exact_blobs(self):
        frames = _gray_frames([0, 128, 255, 17])
        avi = encode_avi_mjpeg(frames, 8, 8, fps=10)
        assert demux_avi_mjpeg(avi) == frames

    def test_decoded_frames_bit_exact(self):
        # constant gray at q=100 decodes bit-exactly (DC-only, unit
        # quantizer) — so the whole container+codec chain is checkable
        frames = _gray_frames(range(0, 256, 31), hw=(6, 9))
        out = demux_avi_mjpeg(encode_avi_mjpeg(frames, 9, 6))
        for g, f in zip(range(0, 256, 31), out):
            px = decode_jpeg(f)
            assert px.shape == (6, 9, 3)
            assert (px == g).all()

    def test_word_alignment_odd_sizes(self):
        # JPEG blobs are arbitrary-length; odd sizes force pad bytes
        frames = [f + b"\x00" * (i % 2) for i, f in
                  enumerate(_gray_frames([5, 6, 7, 8, 9]))]
        assert [len(f) for f in demux_avi_mjpeg(
            encode_avi_mjpeg(frames, 8, 8))] == [len(f) for f in frames]

    def test_rec_groups(self):
        # interleaved files wrap frames in LIST('rec ') groups — build
        # one by hand around the encoder's movi payload
        import struct

        from vat_abcd_crawler_ray.functions.codecs import _riff_chunk

        frames = _gray_frames([50, 60])
        rec = _riff_chunk(
            b"LIST",
            b"rec " + b"".join(_riff_chunk(b"00dc", f) for f in frames),
        )
        body = b"AVI " + _riff_chunk(b"LIST", b"movi" + rec)
        avi = b"RIFF" + struct.pack("<I", len(body)) + body
        assert demux_avi_mjpeg(avi) == frames

    @pytest.mark.parametrize("blob", [
        b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE",
        b"RIFF\x10\x00\x00\x00AVI LIST\x04\x00\x00\x00movi",
    ])
    def test_rejects_non_avi(self, blob):
        with pytest.raises(ValueError):
            demux_avi_mjpeg(blob)

    def test_truncated_chunk_raises(self):
        avi = encode_avi_mjpeg(_gray_frames([1, 2, 3]), 8, 8)
        with pytest.raises(ValueError):
            demux_avi_mjpeg(avi[: len(avi) - 30])

    def test_empty_frames_rejected(self):
        with pytest.raises(ValueError):
            encode_avi_mjpeg([], 8, 8)


def _batch(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "media": pa.array([r[1] for r in rows], pa.binary()),
    })


class TestFrameSampleAvi:
    def test_every_n_real_jpeg_frames(self):
        frames = _gray_frames([10, 20, 30, 40, 50])
        out = FrameSampleStage(every_n=2, container="avi")(
            _batch([(7, encode_avi_mjpeg(frames, 8, 8))])
        )
        assert out["frame_idx"].to_pylist() == [0, 1, 2]
        assert out["frame"].to_pylist() == frames[::2]
        assert out["frame_error"].to_pylist() == [None] * 3

    def test_frames_feed_decode_image_stage(self):
        # the composition the pipeline uses: demux → DecodeImageStage
        frames = _gray_frames([70, 170])
        sampled = FrameSampleStage(every_n=1, container="avi")(
            _batch([(1, encode_avi_mjpeg(frames, 8, 8))])
        ).rename_columns(["doc_id", "frame_idx", "media", "frame_error"])
        dec = DecodeImageStage(out_hw=(4, 4), decoder="auto")(sampled)
        px = [np.asarray(p).reshape(4, 4, 3) for p in
              dec["pixels"].to_pylist()]
        assert [p[..., 0].mean() for p in px] == [70.0, 170.0]

    def test_corrupt_container_dead_letters(self):
        good = encode_avi_mjpeg(_gray_frames([9]), 8, 8)
        out = FrameSampleStage(container="avi")(
            _batch([(1, b"not an avi"), (2, good), (3, None)])
        )
        rows = out.to_pylist()
        bad = [r for r in rows if r["frame_error"]]
        assert {r["doc_id"] for r in bad} == {1, 3}
        assert all(r["frame_idx"] == -1 for r in bad)
        assert [r["doc_id"] for r in rows if not r["frame_error"]] == [2]

    def test_real_decoder_still_the_seam(self):
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            FrameSampleStage(decoder="real")

    def test_bytes_container_unchanged(self):
        out = FrameSampleStage(frame_bytes=4, every_n=1)(
            _batch([(1, b"abcdefgh")])
        )
        assert out["frame"].to_pylist() == [b"abcd", b"efgh"]


class TestVideoFeatureStage:
    def test_closed_form_means(self):
        # per-frame means are exact for constant-gray q=100 frames
        rows = []
        for i in (3, 4, 5):
            grays = [(i * 17 + f * 29) % 256 for f in range(2 + i % 3)]
            rows.append((i, encode_avi_mjpeg(_gray_frames(grays), 8, 8)))
        out = VideoFeatureStage(every_n=2)(_batch(rows)).to_pylist()
        for r, i in zip(out, (3, 4, 5)):
            grays = [(i * 17 + f * 29) % 256 for f in range(2 + i % 3)]
            assert r["n_frames"] == len(grays)
            assert r["n_sampled"] == len(grays[::2])
            assert r["frame_mean"] == pytest.approx(
                float(np.mean(grays[::2])), abs=0)
            assert r["video_decode_error"] is None

    def test_dead_letter_rows(self):
        out = VideoFeatureStage()(
            _batch([(1, b"junk"), (2, None)])
        ).to_pylist()
        for r in out:
            assert r["n_frames"] == 0 and r["n_sampled"] == 0
            assert r["frame_mean"] == 0.0
            assert r["video_decode_error"]

    def test_keeps_other_columns_one_row_per_doc(self):
        avi = encode_avi_mjpeg(_gray_frames([42]), 8, 8)
        t = pa.table({
            "doc_id": pa.array([11], pa.int64()),
            "lang": pa.array(["en"]),
            "media": pa.array([avi], pa.binary()),
        })
        out = VideoFeatureStage(every_n=1)(t)
        assert out.num_rows == 1
        assert out["lang"].to_pylist() == ["en"]
        assert "media" not in out.column_names
        assert out["frame_mean"].to_pylist() == [42.0]
