"""IMA ADPCM (WAV fmt 0x11): real predictive audio compression (4:1).
The core decode step is cross-checked nibble-for-nibble against the
stdlib audioop IMA variant; the block layer (headers, low-nibble-first
packing, fact-chunk tail strip) is the WAV spec's. Blocks are
independent — the decoder vectorizes across blocks, serial only in
the per-block sample position (the PNG-Paeth pattern)."""

import numpy as np
import pyarrow as pa
import pytest

from vat_abcd_crawler_ray.functions.codecs import (
    _ima_step,
    decode_adpcm_ima,
    decode_wav,
    encode_adpcm_ima,
    encode_wav_adpcm,
)
from vat_abcd_crawler_ray.stages.multimodal import AudioFeatureStage


def _smooth(n=5000):
    t = np.arange(n)
    return (12000 * np.sin(t / 30) + 3000 * np.sin(t / 7)).astype(np.int16)


class TestCore:
    def test_step_matches_stdlib_reference(self):
        # replay audioop's own nibble stream through OUR step function
        audioop = pytest.importorskip("audioop")
        rng = np.random.default_rng(3)
        pcm = np.cumsum(rng.integers(-300, 301, 2000)).clip(
            -30000, 30000).astype(np.int16)
        adp, _ = audioop.lin2adpcm(pcm.tobytes(), 2, None)
        ref = np.frombuffer(audioop.adpcm2lin(adp, 2, None)[0], np.int16)
        by = np.frombuffer(adp, np.uint8)
        nibs = np.empty(2 * len(by), np.uint8)
        nibs[0::2] = by >> 4  # audioop packs the high nibble first
        nibs[1::2] = by & 0x0F
        pred = np.zeros(1, np.int32)
        idx = np.zeros(1, np.int32)
        out = np.array([
            _ima_step(np.array([n], np.uint8), pred, idx)[0] for n in nibs
        ], np.int16)
        assert (out == ref).all()

    def test_roundtrip_snr(self):
        sig = _smooth()
        dec = decode_adpcm_ima(encode_adpcm_ima(sig, 256), 256, len(sig))
        err = dec.astype(np.float64) - sig.astype(np.float64)
        snr = 10 * np.log10(
            (sig.astype(np.float64) ** 2).mean() / (err ** 2).mean())
        assert snr > 35  # predictive 4:1 on a smooth signal

    def test_vectorized_blocks_equal_serial(self):
        # many blocks decoded in lockstep == one block at a time
        sig = _smooth(3030)
        enc = encode_adpcm_ima(sig, 64)
        whole = decode_adpcm_ima(enc, 64)
        spb = (64 - 4) * 2 + 1
        per_block = np.concatenate([
            decode_adpcm_ima(enc[i : i + 64], 64)
            for i in range(0, len(enc), 64)
        ])
        assert (whole == per_block).all() and len(whole) % spb == 0

    def test_first_sample_exact(self):
        # the block header carries sample 0 verbatim
        sig = _smooth(1000)
        dec = decode_adpcm_ima(encode_adpcm_ima(sig, 256), 256)
        assert dec[0] == sig[0]

    def test_bad_payload_rejected(self):
        with pytest.raises(ValueError, match="whole blocks"):
            decode_adpcm_ima(b"\x00" * 100, 256)
        bad = bytearray(encode_adpcm_ima(_smooth(505), 256))
        bad[2] = 120  # step index out of range
        with pytest.raises(ValueError, match="step index"):
            decode_adpcm_ima(bytes(bad), 256)

    def test_empty_input_rejected(self):
        with pytest.raises(ValueError):
            encode_adpcm_ima(np.array([], np.int16))


class TestAdpcmWav:
    def test_wav_roundtrip_exact_length(self):
        sig = _smooth(4999)  # NOT a multiple of samples-per-block
        s, rate = decode_wav(encode_wav_adpcm(sig, 22050, 256))
        assert rate == 22050 and s.shape == (4999, 1)
        err = s[:, 0].astype(np.float64) - sig.astype(np.float64)
        assert np.abs(err).mean() < 200

    def test_compression_ratio(self):
        sig = _smooth(50000)
        wav = encode_wav_adpcm(sig, 8000, 256)
        assert len(wav) < 2 * len(sig) * 0.27  # ~4:1 vs PCM-16

    def test_three_format_corpus_through_audio_stage(self):
        from vat_abcd_crawler_ray.functions.codecs import (
            encode_wav,
            encode_wav_mulaw,
        )

        sig = _smooth(600)
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "media": pa.array([
                encode_wav(sig, 16000),
                encode_wav_adpcm(sig, 8000),
                encode_wav_mulaw(bytes([0, 255, 128]), 8000),
            ], pa.binary()),
        })
        out = AudioFeatureStage()(t).to_pylist()
        assert [r["audio_decode_error"] for r in out] == [None] * 3
        assert out[0]["n_samples"] == 600
        assert out[1]["n_samples"] == 600  # fact chunk strips padding
        assert out[1]["sample_rate"] == 8000
        # lossy but close: feature magnitudes within 2%
        assert abs(out[1]["sum_abs"] - out[0]["sum_abs"]) < 0.02 * out[0]["sum_abs"]
        assert out[2]["n_samples"] == 3

    def test_stereo_adpcm_rejected(self):
        wav = bytearray(encode_wav_adpcm(_smooth(600), 8000))
        wav[22] = 2  # channels 1 → 2
        with pytest.raises(ValueError, match="mono"):
            decode_wav(bytes(wav))
