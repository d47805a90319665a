"""Core schemas: CDR document, knowledge graph, long-format index,
time-series records, and the project-config (master_config) model.

Reference data model (SURVEY.md §1; /root/reference):
  * CDR doc — schemaless JSON with conventional keys
    (``docs/advanced.md:63-69``, ``etk_worker.py:93-95``).
  * ``knowledge_graph`` — ``{field: [{value, key, …provenance}]}`` built by
    ``doc.kg.add_value`` (``docs/advanced.md:151-181``).
  * ``indexed.<field>.<method>.<segment>.{value,key}`` — the search-ready
    flattening (``sandpaper/sandbox/config/etk/type_field_mappings.json:51-75``).

Spark mapping decisions (SURVEY.md §1.1 table): fixed well-known columns +
``extra map<string,string>`` for the long tail; KG as a MapType so the field
set stays per-project config, not code; the 3-level nested ES column names
become one exploded long-format table — the Spark-idiomatic, pushdown-friendly
representation (partition/cluster by ``field`` at scale).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T

# --- CDR document -----------------------------------------------------------

KG_VALUE = T.StructType([
    T.StructField("value", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("confidence", T.DoubleType()),
    T.StructField("method", T.StringType()),
    T.StructField("segment", T.StringType()),
])

KG_TYPE = T.MapType(T.StringType(), T.ArrayType(KG_VALUE))

CDR_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("url", T.StringType()),
    T.StructField("tld", T.StringType()),
    T.StructField("website", T.StringType()),
    T.StructField("dataset", T.StringType()),
    T.StructField("raw_content", T.StringType()),
    T.StructField("raw_content_path", T.StringType()),
    T.StructField("type", T.ArrayType(T.StringType())),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("extra", T.MapType(T.StringType(), T.StringType())),
    T.StructField("raw_json", T.StringType()),
    T.StructField("knowledge_graph", KG_TYPE),
])

# --- long-format index table (the queryable core) ---------------------------
# One row per (doc, field, method, segment, value). Replaces the reference's
# indexed.<field>.<method>.<segment>.{value,key} nested ES columns.

INDEX_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("field", T.StringType(), False),
    T.StructField("method", T.StringType()),
    T.StructField("segment", T.StringType()),
    T.StructField("value", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("confidence", T.DoubleType()),
])

# --- time-series records (ts_converter.py:19-98) -----------------------------

MEASURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    T.StructField("provenance_filename", T.StringType()),
    T.StructField("temporal_region", T.StructType([
        T.StructField("start_date_time", T.StringType()),
        T.StructField("end_date_time", T.StringType()),
    ])),
])

MEASUREMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("timeseries", T.StringType(), False),  # FK → measure.doc_id
    T.StructField("date", T.StringType()),
    T.StructField("number", T.DoubleType()),
    T.StructField("text", T.StringType()),
])

TREND_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("timeseries", T.StringType(), False),
    T.StructField("value", T.MapType(T.StringType(), T.StringType())),
])


# --- project config (master_config.json equivalent) --------------------------

FIELD_TYPES = {"string", "date", "location", "phone", "email", "number", "kg_id"}


@dataclass
class FieldConfig:
    """One searchable field (master_config ``fields`` entry: name, type,
    glossaries, search weight — elicit tarball master_config.json)."""
    name: str
    type: str = "string"
    glossaries: list[str] = dc_field(default_factory=list)
    search_importance: int = 1
    predefined_extractor: str | None = None

    def spark_type(self) -> T.DataType:
        if self.type == "date":
            return T.TimestampType()
        if self.type == "number":
            return T.DoubleType()
        # location / phone / email stay string + validator (SURVEY §1.1)
        return T.StringType()


@dataclass
class ProjectConfig:
    name: str
    fields: dict[str, FieldConfig] = dc_field(default_factory=dict)
    glossaries: dict[str, list[str]] = dc_field(default_factory=dict)

    def index_partition_columns(self) -> list[str]:
        """At 100 TB the long index table is partitioned by ``field`` —
        every sandpaper-style query fans out to a known field list, so
        partition pruning removes everything else from the scan."""
        return ["field"]
