"""Kafka producer sink (K1) — gated: no broker (or kafka client jar) in
this container; the builder returns a configured writer the caller
starts/tests in a Kafka-equipped deployment.

Reference: ``etk_worker.py:56-64,133-134`` — JSON docs → ``{project}_out``,
synchronous per-doc send, gzip compression, 10 MB max request.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_REQUEST_BYTES = 10 * 1024 * 1024   # KAFKA_MESSAGE_MAX_BYTES parity


def to_kafka_batch(df: DataFrame, *, bootstrap_servers: str, topic: str,
                   key_col: str = "doc_id"):
    """Batch write: docs serialized as JSON values keyed by doc_id (keyed →
    log compaction can retain the newest version per doc). Returns the
    configured DataFrameWriter; call ``.save()`` where a broker exists."""
    payload = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"))
    return (payload.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("kafka.compression.type", "gzip")
            .option("kafka.max.request.size", str(MAX_REQUEST_BYTES))
            .option("topic", topic))


def to_kafka_stream(df: DataFrame, *, bootstrap_servers: str, topic: str,
                    checkpoint_dir: str, key_col: str = "doc_id"):
    """Streaming write (the ``{project}_out`` leg of the worker loop).
    Returns the configured DataStreamWriter; call ``.start()`` where a
    broker exists."""
    payload = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"))
    return (payload.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("kafka.compression.type", "gzip")
            .option("checkpointLocation", checkpoint_dir)
            .option("topic", topic))
