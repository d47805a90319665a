"""Pins the file-stream source contract the registry's stream queries
rely on: a ``Trigger.AvailableNow`` drain over ``file_stream_source``
(which sets no ``maxFilesPerTrigger``) processes every file present at
start in ONE micro-batch. The queries write their stream inputs fully
parallel (no ``coalesce(1)`` — a single-task serialization of the whole
corpus) and their oracles replay the result as one batch; if a Spark
upgrade ever changed the availableNow default to split by file count,
this test fails before any oracle silently diverges."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_available_now_drains_many_files_in_one_batch(spark, tmp_path):
    from dig_etl_engine_spark.streaming.ingest import file_stream_source

    in_dir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    (spark.range(20000)
     .select(F.col("id").alias("doc_id"),
             F.md5(F.col("id").cast("string")).alias("text"))
     .repartition(16)
     .write.mode("overwrite").json(in_dir))
    n_files = len(glob.glob(os.path.join(in_dir, "part-*")))
    assert n_files > 1, "need a multi-file input to pin the contract"

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    batches: list[tuple[int, int]] = []

    def fb(b, bid):
        batches.append((bid, b.count()))

    q = (file_stream_source(spark, in_dir, schema)
         .writeStream.outputMode("append").foreachBatch(fb)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert batches == [(0, 20000)], (n_files, batches)
