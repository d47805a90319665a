"""WebDataset-style tar-shard export/import — the sequential-read
training format (Aizman et al., "High Performance I/O For Large Scale
Deep Learning"; the `webdataset` library's convention): each sample is
a group of same-stem members (`{key}.txt`, `{key}.json`, and for
multimodal corpora `{key}.jpg` / `{key}.flac` …) inside fixed-size
`.tar` shards that a dataloader streams without random access.

Spark shape: rows are hash-assigned to shards (`pmod(xxhash64(id),
n_shards)` — reproducible across runs and partitionings), the frame is
hash-REPARTITIONED on the shard id so each shard's rows land in exactly
one task, and one `mapInPandas` pass per partition aggregates its
Arrow batches and writes each complete shard tar. Members are sorted
by key within a shard and tar metadata is pinned (mtime=0, uid/gid=0,
ustar), so shard bytes are bit-reproducible for identical input.
Returns a manifest DataFrame, not the rows — the write IS the result.

Local-path writes here (single-node container); on a cluster the same
code points at a fuse/NFS mount or writes to a staging dir + uploads —
the tar assembly is already executor-side either way.

Reading back: `spark.read.format("binaryFile")` over the shard glob +
an Arrow `mapInPandas` that re-groups tar members by stem — binary
plumbing identical to `operators/multimodal.py`'s contract (the
decode-free path works on any member payload).
"""

from __future__ import annotations

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
    T.StructField("bin", T.BinaryType()),
])


def _add_member(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(payload))


def write_webdataset(df: DataFrame, path: str, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     meta_cols: list[str] | None = None,
                     bin_col: str | None = None, bin_ext: str = "bin",
                     n_shards: int = 8) -> DataFrame:
    """Export ``df`` as ``shard-{k:05d}.tar`` files under ``path``;
    returns the manifest ``(shard, path, n_docs, n_bytes)``. Keys are
    zero-padded ids so tar member order == id order. ``bin_col`` adds a
    ``{key}.{bin_ext}`` member per row from a binary column — the
    multimodal payload path (image/audio bytes ride the same Arrow
    batches; NULL payload → member omitted, matching the webdataset
    convention of absent extensions)."""
    meta_cols = meta_cols or []
    os.makedirs(path, exist_ok=True)
    bin_expr = (F.col(bin_col).cast("binary") if bin_col
                else F.lit(None).cast("binary"))
    prepped = (df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(text_col).cast("string").alias("_text"),
        F.to_json(F.struct(*[F.col(c) for c in meta_cols])).alias("_meta"),
        bin_expr.alias("_bin"),
        F.pmod(F.xxhash64(F.col(id_col).cast("long")), F.lit(n_shards))
        .cast("int").alias("_shard"))
        .repartition(n_shards, "_shard"))

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[int, list[tuple[int, str, str, bytes | None]]] = {}
        for b in batches:
            for _id, _text, _meta, _bin, _shard in zip(
                    b["_id"], b["_text"], b["_meta"], b["_bin"],
                    b["_shard"]):
                rows.setdefault(int(_shard), []).append(
                    (int(_id), _text, _meta,
                     bytes(_bin) if _bin is not None else None))
        out = []
        for shard, members in rows.items():
            p = os.path.join(path, f"shard-{shard:05d}.tar")
            # tmp + atomic rename: a retried task never exposes a torn
            # tar, and the last attempt wins with identical bytes
            tmp = f"{p}.tmp.{os.getpid()}"
            with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tar:
                for _id, _text, _meta, _bin in sorted(
                        members, key=lambda m: m[0]):
                    key = f"{_id:012d}"
                    _add_member(tar, f"{key}.txt",
                                (_text or "").encode("utf-8"))
                    _add_member(tar, f"{key}.json",
                                (_meta or "{}").encode("utf-8"))
                    if _bin is not None:
                        _add_member(tar, f"{key}.{bin_ext}", _bin)
            os.replace(tmp, p)
            out.append((shard, p, len(members), os.path.getsize(p)))
        yield pd.DataFrame(out, columns=["shard", "path",
                                         "n_docs", "n_bytes"])

    return prepped.mapInPandas(write_partition, _MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Stream shard tars back into rows ``(shard, key, text, meta)``.
    One `binaryFile` row per shard; member re-grouping happens inside
    an Arrow batch — no Python per-member round trips."""
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
                        extra = [v for k, v in sorted(parts.items())
                                 if k not in ("txt", "json")]
                        out.append((shard, stem,
                                    parts.get("txt", b"").decode("utf-8"),
                                    parts.get("json", b"{}")
                                    .decode("utf-8"),
                                    extra[0] if extra else None))
            yield pd.DataFrame(out, columns=["shard", "key",
                                             "text", "meta", "bin"])

    return files.select("path", "content").mapInPandas(parse, _READ_SCHEMA)
