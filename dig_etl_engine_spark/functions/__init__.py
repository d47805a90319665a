"""Scalar-function library: extraction column functions (SURVEY §2.5) and
knowledge-graph assembly/indexing (§1.1, §3.1 stage 7)."""
