"""WebDataset tar-shard source — the de-facto packaging for large
multimodal training sets (LAION et al.): a dataset is a list of
``.tar`` shards; each SAMPLE is a group of adjacent members sharing a
basename stem with one extension per modality (``0001.jpg`` +
``0001.txt`` + ``0001.json``). The convention is public
(webdataset/tarp docs); ``tarfile`` is stdlib, so no dependency.

Scale shape: shards are the unit of parallelism BY DESIGN (the
convention exists so loaders can shard-shuffle); one shard reads
inside one task (``read_binary_files`` granularity, like the WARC
source), samples explode to rows with one binary column per
extension. Keys preserve shard-relative order — WebDataset's
sequential-sample contract."""

from __future__ import annotations

import io
import tarfile

import pyarrow as pa


def iter_tar_samples(data: bytes):
    """Tar bytes → (key, {ext: payload}) groups, in member order.
    Adjacent members group by stem (everything before the FIRST dot of
    the basename — WebDataset's rule, so ``a.seg.png`` has extension
    ``seg.png``). Non-file members are skipped; a malformed tar raises
    ValueError."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data))
    except tarfile.TarError as exc:
        raise ValueError(f"not a tar archive: {exc}") from exc
    cur_key = None
    cur: dict[str, bytes] = {}
    # mid-iteration corruption raises TarError LAZILY (inside the
    # member loop's next()/extractfile) — convert at this boundary so
    # the caller's dead-letter contract stays ValueError (fuzz-found)
    try:
        with tf:
            for member in tf:
                if not member.isfile():
                    continue
                name = member.name.rsplit("/", 1)[-1]
                stem, _, ext = name.partition(".")
                if not ext:
                    continue  # extension-less member: not a modality
                if stem != cur_key:
                    if cur_key is not None and cur:
                        yield cur_key, cur
                    cur_key, cur = stem, {}
                payload = tf.extractfile(member)
                cur[ext.lower()] = payload.read() if payload else b""
    except tarfile.TarError as exc:
        raise ValueError(f"corrupt tar archive: {exc}") from exc
    if cur_key is not None and cur:
        yield cur_key, cur


def parse_shard(name: str, data: bytes, columns: list[str]) -> pa.Table:
    """One shard's bytes → Arrow rows ``(shard, key, <ext>...,
    wds_error)``: one binary column per requested extension (NULL when
    the sample lacks it). A malformed shard yields one dead-letter
    row (C2 errors-are-data)."""
    keys: list[str] = []
    cols: dict[str, list] = {c: [] for c in columns}
    errs: list[str | None] = []
    try:
        for key, sample in iter_tar_samples(data):
            keys.append(key)
            for c in columns:
                cols[c].append(sample.get(c))
            errs.append(None)
    except ValueError as exc:
        keys.append("")
        for c in columns:
            cols[c].append(None)
        errs.append(str(exc))
    n = len(keys)
    return pa.table(
        {
            "shard": pa.array([name] * n, pa.string()),
            "key": pa.array(keys, pa.string()),
            **{c: pa.array(cols[c], pa.binary()) for c in columns},
            "wds_error": pa.array(errs, pa.string()),
        }
    )


def read_webdataset(paths: list[str] | str, columns: list[str]):
    """WebDataset shard path(s) → Dataset of sample rows with one
    binary column per extension in ``columns`` (e.g. ``["jpg", "txt",
    "json"]``). One read task per shard — the format's own
    parallelism unit."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def explode(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                parse_shard(p, b, columns)
                for p, b in zip(
                    batch["path"].to_pylist(), batch["bytes"].to_pylist()
                )
            ]
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=1)


def write_webdataset_shard(samples: list[tuple[str, dict]]) -> bytes:
    """(key, {ext: payload}) groups → tar shard bytes (test fixture
    writer, deterministic member metadata)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key, parts in samples:
            for ext, payload in parts.items():
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()
