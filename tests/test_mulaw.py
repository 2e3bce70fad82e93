"""G.711 mu-law: real compressed audio through the WAV path
(functions/codecs). Reference parity: the reference has no audio —
this is the engine's LLM-training-data multimodal surface. The
expansion formula is closed-form integer arithmetic, which is what
lets mu-law clips sit inside q_multimodal_features' SQL hash oracle."""

import numpy as np
import pyarrow as pa
import pytest

from vat_abcd_crawler_ray.functions.codecs import (
    decode_wav,
    encode_wav,
    encode_wav_mulaw,
    mulaw_compress,
    mulaw_expand,
)
from vat_abcd_crawler_ray.stages.multimodal import AudioFeatureStage

ALL_CODES = np.arange(256, dtype=np.uint8)


class TestG711:
    def test_expand_matches_stdlib_reference(self):
        audioop = pytest.importorskip("audioop")
        ref = np.frombuffer(audioop.ulaw2lin(ALL_CODES.tobytes(), 2), np.int16)
        assert (mulaw_expand(ALL_CODES) == ref).all()

    def test_expand_range_and_symmetry(self):
        lin = mulaw_expand(ALL_CODES)
        assert lin.min() == -32124 and lin.max() == 32124
        # code 0xFF is +0, 0x7F is -0; the two halves mirror
        assert (lin[:128] == -lin[128:]).all()

    def test_compress_inverts_expand(self):
        # exact except negative zero (0x7F → 0xFF, both expand to 0 —
        # same collapse as audioop's reference encoder)
        back = mulaw_compress(mulaw_expand(ALL_CODES))
        mism = np.flatnonzero(back != ALL_CODES)
        assert list(mism) == [0x7F]
        assert back[0x7F] == 0xFF

    def test_compress_matches_stdlib_reference(self):
        audioop = pytest.importorskip("audioop")
        rng = np.random.default_rng(7)
        pcm = rng.integers(-32768, 32768, 4096).astype(np.int16)
        ref = np.frombuffer(audioop.lin2ulaw(pcm.tobytes(), 2), np.uint8)
        assert (mulaw_compress(pcm) == ref).all()

    def test_companding_error_bounded(self):
        # log companding over the WHOLE int16 domain: coarse steps at
        # high amplitude, fine steps near zero (int32 before abs —
        # abs(int16 -32768) overflows)
        pcm = np.arange(-32768, 32768, dtype=np.int16)
        rt = mulaw_expand(mulaw_compress(pcm)).astype(np.int32)
        err = np.abs(rt - pcm.astype(np.int32))
        # seg-7 step is 1024; +clip at |pcm| > 32124 (expand max)
        assert err.max() <= 32767 - 32124 + 1
        small = np.abs(pcm.astype(np.int32)) < 100
        assert err[small].max() <= 8  # smallest step: 2 in 14-bit = 8


class TestMulawWav:
    def test_roundtrip_bit_exact_code_stream(self):
        enc = ((np.arange(777) * 37 + 11) % 256).astype(np.uint8)
        s, rate = decode_wav(encode_wav_mulaw(enc.tobytes(), 12000))
        assert rate == 12000 and s.shape == (777, 1)
        assert (s[:, 0] == mulaw_expand(enc)).all()

    def test_odd_data_chunk_padded(self):
        s, _ = decode_wav(encode_wav_mulaw(bytes([1, 2, 3]), 8000))
        assert s.shape == (3, 1)

    def test_pcm_still_decodes(self):
        pcm = np.arange(-50, 50, dtype=np.int16)
        s, rate = decode_wav(encode_wav(pcm, 16000))
        assert rate == 16000 and (s[:, 0] == pcm).all()

    def test_unsupported_fmt_rejected(self):
        wav = bytearray(encode_wav_mulaw(bytes(8), 8000))
        wav[20] = 2  # fmt tag 7 → 2 (ADPCM): unsupported
        with pytest.raises(ValueError, match="only PCM-16"):
            decode_wav(bytes(wav))

    def test_mixed_corpus_through_audio_stage(self):
        # the crawled-corpus case: PCM and mu-law blobs in one column,
        # dispatched per blob by the fmt tag — no stage configuration
        pcm = np.array([100, -100, 50, -50], np.int16)
        enc = np.array([0x00, 0xFF, 0x80, 0x7F], np.uint8)
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "media": pa.array(
                [encode_wav(pcm, 16000), encode_wav_mulaw(enc, 8000), None],
                pa.binary(),
            ),
        })
        out = AudioFeatureStage()(t).to_pylist()
        assert out[0]["n_samples"] == 4 and out[0]["zero_crossings"] == 3
        exp = mulaw_expand(enc).astype(np.int64)
        assert out[1]["n_samples"] == 4
        assert out[1]["sum_abs"] == int(np.abs(exp).sum())
        assert out[1]["sample_rate"] == 8000
        assert out[2]["audio_decode_error"]
