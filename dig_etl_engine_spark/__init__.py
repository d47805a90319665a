"""dig_etl_engine_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of usc-isi-i2/dig-etl-engine (document ETL + KG construction +
structured search), extended with the operators a large-scale (100 TB)
training-data pipeline needs: deduplication, similarity search, multimodal
columns, and text analysis.

Design principles (see SURVEY.md §7):
  * DataFrame/SQL first — Catalyst owns pushdown/pruning/join strategy.
  * UDFs only where built-ins genuinely cannot express the semantics,
    and then always Arrow-batched (pandas_udf / mapInPandas).
  * Every operator is designed partition-scalable: no driver-side
    collect in any hot path.
"""

__version__ = "0.1.0"

from dig_etl_engine_spark.session import get_spark  # noqa: F401
from dig_etl_engine_spark.catalog import load_tables  # noqa: F401
