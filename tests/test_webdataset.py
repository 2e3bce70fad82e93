"""sources/webdataset — tar-shard samples (the LAION-style packaging
for multimodal training sets)."""

import numpy as np
import pytest

from vat_abcd_crawler_ray.functions.codecs import encode_jpeg
from vat_abcd_crawler_ray.sources.webdataset import (
    iter_tar_samples,
    parse_shard,
    read_webdataset,
    write_webdataset_shard,
)


def _samples(n=6):
    out = []
    for i in range(n):
        img = encode_jpeg(np.full((8, 8), (i * 9) % 256, np.uint8), 100)
        out.append((f"{i:04d}", {
            "jpg": img,
            "txt": f"caption {i}".encode(),
            "json": b'{"id": %d}' % i,
        }))
    return out


class TestTarSamples:
    def test_grouping_by_stem(self):
        shard = write_webdataset_shard(_samples(3))
        got = list(iter_tar_samples(shard))
        assert [k for k, _ in got] == ["0000", "0001", "0002"]
        assert all(set(s) == {"jpg", "txt", "json"} for _, s in got)

    def test_multi_dot_extension(self):
        shard = write_webdataset_shard(
            [("a", {"seg.png": b"x", "jpg": b"y"})]
        )
        (_, sample), = iter_tar_samples(shard)
        assert sample == {"seg.png": b"x", "jpg": b"y"}

    def test_missing_modality_is_null(self):
        shard = write_webdataset_shard([
            ("a", {"jpg": b"1", "txt": b"t"}),
            ("b", {"jpg": b"2"}),  # no caption
        ])
        t = parse_shard("s", shard, ["jpg", "txt"])
        assert t["txt"].to_pylist() == [b"t", None]

    def test_malformed_shard_dead_letters(self):
        t = parse_shard("s", b"definitely not a tar", ["jpg"])
        assert t.num_rows == 1
        assert t["wds_error"].to_pylist()[0] is not None

    def test_roundtrip_payloads_exact(self):
        samples = _samples(4)
        t = parse_shard("s", write_webdataset_shard(samples), ["jpg", "txt"])
        assert t["jpg"].to_pylist() == [s["jpg"] for _, s in samples]


@pytest.mark.usefixtures("ray_session")
class TestReadWebdataset:
    def test_shards_to_decoded_pixels(self, tmp_path):
        # the real composition: WDS shards → image decode stage
        from vat_abcd_crawler_ray.stages.multimodal import DecodeImageStage

        for s in range(3):
            p = tmp_path / f"shard-{s:05d}.tar"
            p.write_bytes(write_webdataset_shard(_samples(5)))
        ds = read_webdataset(
            [str(tmp_path / f"shard-{s:05d}.tar") for s in range(3)],
            ["jpg", "txt"],
        )
        out = ds.map_batches(
            DecodeImageStage,
            fn_constructor_kwargs={
                "media_col": "jpg", "out_hw": (4, 4), "decoder": "auto",
            },
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        ).to_pandas()
        assert len(out) == 15
        assert out["image_decode_error"].isna().all()
        # captions rode along untouched
        assert all(bytes(b).startswith(b"caption") for b in out["txt"])
        for _, r in out.iterrows():
            want = (int(r["key"]) * 9) % 256
            assert (np.asarray(r["pixels"]) == want).all()
