"""Pure-numpy media codec tests (no Ray)."""

from __future__ import annotations

import numpy as np
import pytest

from vat_abcd_crawler_ray.functions.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    resize_nearest,
)


def test_ppm_roundtrip():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (13, 9, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()


def test_pgm_gray_expands_and_comments_skipped():
    pgm = b"P5\n# comment line\n4 2\n255\n" + bytes(range(8))
    img = decode_ppm(pgm)
    assert img.shape == (2, 4, 3)
    assert (img[:, :, 0] == img[:, :, 1]).all()
    assert img[0, 0, 0] == 0 and img[1, 3, 2] == 7


def test_ppm_rejects_garbage():
    with pytest.raises(ValueError):
        decode_ppm(b"\x89PNG not a ppm")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # 16-bit maxval


def test_resize_nearest():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    up = resize_nearest(img, (12, 8))
    assert up.shape == (12, 8, 3)
    assert (up[::2, ::2] == img).all()  # every source pixel survives
    down = resize_nearest(img, (3, 2))
    assert (down == img[[0, 2, 4]][:, [0, 2]]).all()


def test_wav_roundtrip_stereo_and_mono():
    rng = np.random.RandomState(3)
    s = rng.randint(-30000, 30000, (555, 2)).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, 22050))
    assert rate == 22050 and (dec == s).all()
    mono, rate = decode_wav(encode_wav(s[:, 0], 8000))
    assert mono.shape == (555, 1) and (mono[:, 0] == s[:, 0]).all()


def test_wav_rejects_non_pcm16():
    with pytest.raises(ValueError):
        decode_wav(b"OggS not a wav")
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32 fmt
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_decode_stages_dead_letter_corrupt_blobs():
    """C2 'errors are data': corrupt/null media blobs must yield NULL/
    zero features + a decode_error column, never a raised exception
    (which would kill the whole map_batches task)."""
    import pyarrow as pa

    from vat_abcd_crawler_ray.functions.codecs import encode_ppm, encode_wav
    from vat_abcd_crawler_ray.stages.multimodal import (
        AudioFeatureStage,
        DecodeImageStage,
    )

    good_img = encode_ppm(np.full((4, 4, 3), 7, np.uint8))
    out = DecodeImageStage(out_hw=(4, 4), decoder="ppm")(
        pa.table({"media": pa.array([good_img, b"not a ppm", None], pa.binary())})
    )
    assert out["image_decode_error"].to_pylist()[0] is None
    assert out["image_decode_error"].to_pylist()[1].startswith("DecodeError")
    assert out["image_decode_error"].to_pylist()[2].startswith("DecodeError")
    assert out["src_height"].to_pylist() == [4, 0, 0]

    good_wav = encode_wav(np.array([1, -2, 3], np.int16), 8000)
    out = AudioFeatureStage()(
        pa.table({"media": pa.array([good_wav, b"RIFFgarbage", None], pa.binary())})
    )
    assert out["n_samples"].to_pylist() == [3, None, None]
    errs = out["audio_decode_error"].to_pylist()
    assert errs[0] is None and errs[1] and errs[2]
