"""WebDataset-style tar-shard export/import — the sequential-read
training format (Aizman et al., "High Performance I/O For Large Scale
Deep Learning"; the `webdataset` library's convention): each sample is
a group of same-stem members (`{key}.txt`, `{key}.json`, and for
multimodal corpora `{key}.jpg` / `{key}.flac` …) inside fixed-size
`.tar` shards that a dataloader streams without random access.

Spark shape: rows are hash-assigned to shards (`pmod(xxhash64(id),
n_shards)` — reproducible across runs and partitionings), the frame is
hash-REPARTITIONED on the shard id and sorted within partitions on
``(_shard, _id)``, so each shard's rows arrive at exactly one task in
final member order; `mapInPandas` then STREAMS each Arrow batch into
the open shard tar — only one batch is ever resident in the Python
worker, so a shard of any size writes in bounded memory. Tar metadata
is pinned (mtime=0, uid/gid=0, ustar), so shard bytes are
bit-reproducible for identical input. Returns a manifest DataFrame,
not the rows — the write IS the result.

Single-writer contract: the writer clears existing ``shard-*.tar``
files under the target path first (a re-export with fewer shards must
not leave stale tars for the reader's glob) and renames each finished
tar atomically, so a retried task never exposes a torn file. Do not
run two writers against one path concurrently.

Local-path writes here (single-node container); on a cluster the same
code points at a fuse/NFS mount or writes to a staging dir + uploads —
the tar assembly is already executor-side either way.

Reading back: `spark.read.format("binaryFile")` over the shard glob +
an Arrow `mapInPandas` that re-groups tar members by stem — binary
plumbing identical to `operators/multimodal.py`'s contract (the
decode-free path works on any member payload). ALL non-txt/json
members come back in a ``bins`` map column keyed by extension, so a
foreign shard carrying several modalities per sample loses nothing.
"""

from __future__ import annotations

import glob
import io
import os
import tarfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MANIFEST_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("path", T.StringType()),
    T.StructField("n_docs", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])

_READ_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType()),
    T.StructField("key", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("meta", T.StringType()),
    T.StructField("bins", T.MapType(T.StringType(), T.BinaryType())),
])


def _add_member(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(payload))


class _ShardWriter:
    """Streams rows (already in (_shard, _id) order) into shard tars,
    one open tar at a time, bounded memory."""

    def __init__(self, path: str, bin_ext: str):
        self.path = path
        self.bin_ext = bin_ext
        self.cur: int | None = None
        self.tar: tarfile.TarFile | None = None
        self.tmp = ""
        self.n = 0
        self.manifest: list[tuple[int, str, int, int]] = []

    def _close_current(self) -> None:
        if self.tar is not None:
            self.tar.close()
            final = os.path.join(self.path, f"shard-{self.cur:05d}.tar")
            os.replace(self.tmp, final)  # atomic: retries never tear
            self.manifest.append(
                (self.cur, final, self.n, os.path.getsize(final)))
        self.tar, self.cur, self.n = None, None, 0

    def add(self, shard: int, _id: int, text, meta, binv) -> None:
        if shard != self.cur:
            self._close_current()
            self.cur = shard
            self.tmp = os.path.join(
                self.path, f"shard-{shard:05d}.tar.tmp.{os.getpid()}")
            self.tar = tarfile.open(self.tmp, "w",
                                    format=tarfile.USTAR_FORMAT)
        key = f"{_id:012d}"
        if text is not None:  # NULL text → member omitted (≠ empty '')
            _add_member(self.tar, f"{key}.txt", text.encode("utf-8"))
        _add_member(self.tar, f"{key}.json",
                    (meta or "{}").encode("utf-8"))
        if binv is not None:
            _add_member(self.tar, f"{key}.{self.bin_ext}", bytes(binv))
        self.n += 1

    def finish(self) -> list[tuple[int, str, int, int]]:
        self._close_current()
        return self.manifest


def write_webdataset(df: DataFrame, path: str, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     meta_cols: list[str] | None = None,
                     bin_col: str | None = None, bin_ext: str = "bin",
                     n_shards: int = 8) -> DataFrame:
    """Export ``df`` as ``shard-{k:05d}.tar`` files under ``path``;
    returns the manifest ``(shard, path, n_docs, n_bytes)`` (consume it
    to run the job). Keys are zero-padded ids so tar member order ==
    id order. ``bin_col`` adds a ``{key}.{bin_ext}`` member per row
    from a binary column — the multimodal payload path (bytes ride the
    same Arrow batches); NULL text or NULL payload → member omitted,
    matching the webdataset convention of absent extensions (so NULL
    and empty-string text survive a round trip DISTINGUISHABLY).
    Rows with a NULL id are rejected with a clear error."""
    meta_cols = meta_cols or []
    os.makedirs(path, exist_ok=True)
    for stale in glob.glob(os.path.join(path, "shard-*.tar")):
        os.remove(stale)  # re-export must not leave stale shards
    bin_expr = (F.col(bin_col).cast("binary") if bin_col
                else F.lit(None).cast("binary"))
    prepped = (df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(text_col).cast("string").alias("_text"),
        F.to_json(F.struct(*[F.col(c) for c in meta_cols])).alias("_meta"),
        bin_expr.alias("_bin"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(n_shards))
        .cast("int").alias("_shard"))
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_id"))

    def write_partition(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
        w = _ShardWriter(path, bin_ext)
        for b in batches:
            if b["_id"].isna().any():
                raise ValueError(
                    f"write_webdataset: NULL {id_col!r} rows cannot be "
                    "exported — filter or repair ids first")
            for _id, _text, _meta, _bin, _shard in zip(
                    b["_id"], b["_text"], b["_meta"], b["_bin"],
                    b["_shard"]):
                w.add(int(_shard), int(_id),
                      _text if _text is not None else None, _meta, _bin)
        yield pd.DataFrame(w.finish(), columns=["shard", "path",
                                                "n_docs", "n_bytes"])

    return prepped.mapInPandas(write_partition, _MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Stream shard tars back into rows ``(shard, key, text, meta,
    bins)``. One `binaryFile` row per shard; member re-grouping happens
    inside an Arrow batch — no Python per-member round trips. ``text``
    is NULL when the ``.txt`` member is absent; every other extension
    lands in the ``bins`` map (ext → bytes), so multi-modality samples
    are preserved in full."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "shard-*.tar"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for fpath, content in zip(b["path"], b["content"]):
                shard = int(os.path.basename(fpath).split("-")[1]
                            .split(".")[0])
                with tarfile.open(fileobj=io.BytesIO(content)) as tar:
                    samples: dict[str, dict[str, bytes]] = {}
                    for m in tar.getmembers():
                        stem, ext = m.name.rsplit(".", 1)
                        samples.setdefault(stem, {})[ext] = \
                            tar.extractfile(m).read()
                    for stem, parts in samples.items():
                        txt = parts.get("txt")
                        bins = {k: v for k, v in parts.items()
                                if k not in ("txt", "json")} or None
                        out.append((shard, stem,
                                    txt.decode("utf-8")
                                    if txt is not None else None,
                                    parts.get("json", b"{}")
                                    .decode("utf-8"),
                                    bins))
            yield pd.DataFrame(out, columns=["shard", "key",
                                             "text", "meta", "bins"])

    return files.select("path", "content").mapInPandas(parse, _READ_SCHEMA)
