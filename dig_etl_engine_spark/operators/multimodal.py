"""Multimodal column plumbing (BASELINE.json north star): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by Arrow-batched
pandas functions via mapInPandas.

The decode step itself (PIL/ffmpeg/torchaudio) is STUBBED — those libs are
not in this container — behind ``decode_image``; everything Spark-side is
real: the schema contract, the mapInPandas batch shape, the deterministic
fake feature used by tests, and the partitioning notes.

Scale notes: binary payloads ride the same parquet row-groups as their
metadata; `spark.sql.files.maxPartitionBytes` bounds per-task bytes, and a
`repartition(n)` before a heavy decode evens out skew from variable blob
sizes. Feature extraction is a narrow map — no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The typed-metadata contract for a multimodal asset column.
ASSET_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType()),      # image/png, audio/wav …
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),          # media-specific metadata
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.DoubleType()),
])


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real decoder (PIL.Image.open) — unavailable in this image."""
    raise NotImplementedError(
        "image decode requires PIL/pillow (not in container); "
        "use fake_decode_features for plumbing tests")


def fake_decode_features(payload: bytes) -> tuple[int, str, str]:
    """Deterministic stand-in for decode+feature-extract: byte length,
    first-4-bytes hex header, md5 'feature'. Exercises the exact batch
    path a real decoder would use."""
    return (len(payload), payload[:4].hex(), hashlib.md5(payload).hexdigest())


FEATURE_SCHEMA = ("doc_id long, n_bytes long, header_hex string, "
                  "feature_md5 string")


def extract_features(df: DataFrame, *, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow batches
    in, one feature row per asset out. Swap `fake_decode_features` for a
    real decoder without touching the Spark plumbing."""
    from dig_etl_engine_spark.session import ship_package

    ship_package(df.sparkSession)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads yield NULL features instead of killing the
            # job (the reference's per-doc error isolation, C5
            # etk_worker.py:98-139) — a corrupt/absent asset is a row to
            # quarantine downstream, not a stage failure
            feats = [fake_decode_features(b) if b is not None
                     else (None, None, None)
                     for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pd.array([f[0] for f in feats],
                                    dtype="Int64"),
                "header_hex": [f[1] for f in feats],
                "feature_md5": [f[2] for f in feats],
            })

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, *, every_ms: int = 1000,
                      duration_col: str = "duration_ms") -> DataFrame:
    """Video frame-sampling *plan*: explode one row per sampled timestamp
    (decode stubbed; the row fan-out and partitioning are the real part).
    A 2-hour video at 1 fps → 7200 rows — the explode keeps them in the
    source partition, so downstream decode parallelism follows data size."""
    n = F.greatest((F.col(duration_col) / every_ms).cast("int"), F.lit(1))
    return df.withColumn(
        "sample_ms",
        F.explode(F.transform(F.sequence(F.lit(0), n - 1),
                              lambda i: i * every_ms)),
    )
