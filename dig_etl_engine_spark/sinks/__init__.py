"""Sink operators (SURVEY.md §2.2, K1-K4): KG-table upsert, JSON-lines
export, Kafka producer."""
