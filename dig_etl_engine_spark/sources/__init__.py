"""Source operators (SURVEY.md §2.1, S1-S9): file formats → the canonical
document DataFrame. Streaming sources (S5-S7 Kafka/RSS/ACHE) live in
``dig_etl_engine_spark.streaming``."""
