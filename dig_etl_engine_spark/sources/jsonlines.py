"""JSON-lines / HTML / paired raw-data file sources (S1, S4, S8).

Reference:
  * S1 — ``docs/advanced.md:204-206,252-253``: upload ``.jl``/``.jl.gz``,
    one CDR doc per line (gzip mandatory over 200 MB).
  * S4 — ``docs/advanced.md:297-308``: an HTML file becomes one doc with
    the file content as ``raw_content`` plus a dataset tag.
  * S8 — ``utilities/export_raw_data.py:17-42``: walk ``data/<tld>/``
    pairing ``{name}.json`` + ``{name}.html`` into one doc per stem.

Spark-first notes: ``spark.read.json`` handles gzip transparently and
splits large line-delimited files across tasks; S4/S8 use ``wholetext``
reads with ``input_file_name()`` — each file is one row, so parallelism
follows the file count (fine: these sources exist for many-small-file
crawl dumps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonlines(spark: SparkSession, path: str,
                   schema: T.StructType | str | None = None) -> DataFrame:
    """S1: one JSON doc per line; ``.gz`` decompresses transparently.

    Pass a schema for the CDR contract (stable column set + types); without
    one Spark samples the file (fine interactively, never in pipelines —
    schema drift then changes the plan).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_html_files(spark: SparkSession, path_glob: str,
                    dataset: str | None = None) -> DataFrame:
    """S4: each HTML file → one doc ``(doc_id, raw_content, dataset)``;
    doc_id = sha256 of the content (the reference's convention for
    generated docs, `utilities/timeseries/ts_converter.py:30-33`)."""
    df = (spark.read.option("wholetext", True).text(path_glob)
          .select(F.input_file_name().alias("path"),
                  F.col("value").alias("raw_content")))
    return df.select(
        F.sha2(F.col("raw_content"), 256).alias("doc_id"),
        "raw_content",
        F.lit(dataset).alias("dataset"),
        F.regexp_extract("path", r"([^/]+)\.[a-zA-Z]+$", 1).alias("stem"),
    )


def pair_raw_data(spark: SparkSession, root: str) -> DataFrame:
    """S8: pair ``<root>/<tld>/{stem}.json`` with ``{stem}.html`` → one row
    per stem carrying both payloads. The pairing join is broadcast-friendly
    per-directory; at lake scale partition the root by tld and the join
    keys co-locate."""
    def side(glob: str, col: str) -> DataFrame:
        return (spark.read.option("wholetext", True).text(glob)
                .select(F.input_file_name().alias("path"),
                        F.col("value").alias(col))
                .select(
                    F.regexp_extract("path", r"([^/]+)/[^/]+$", 1).alias("tld"),
                    F.regexp_extract("path", r"([^/]+)\.[a-z]+$", 1).alias("stem"),
                    col))

    meta = side(f"{root}/*/*.json", "meta_json")
    html = side(f"{root}/*/*.html", "raw_content")
    return meta.join(html, ["tld", "stem"], "full_outer")
