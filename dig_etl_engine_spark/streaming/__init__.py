"""Structured Streaming ingest (SURVEY.md §2.9 C1-C6 + §1.2): the Spark
re-architecture of the reference's Kafka worker loop."""
