"""text_grabr_orc_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference service ``SihleGatsheni/text-grabr-orc`` (a Go/Tesseract OCR
HTTP microservice, see ``/root/reference/main.go``), extended into a
full analytics engine: relational queries, ORC/Parquet I/O with
predicate pushdown, a multimodal (binary-column) OCR pipeline,
LLM-data-pipeline operators (dedup, similarity search, text analysis)
and Structured Streaming over event data.

Design principles (see SURVEY.md):
  - DataFrame/SQL first; Catalyst plans everything relational.
  - Python only at the edges, always Arrow-batched (pandas UDFs).
  - Every operator designed for 100 TB scale: broadcast small dims,
    pre-aggregate before shuffles, push filters to the scan.
"""

from text_grabr_orc_spark.session import get_spark
from text_grabr_orc_spark.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLE_NAMES"]

__version__ = "0.1.0"
