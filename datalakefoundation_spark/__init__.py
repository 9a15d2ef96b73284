"""datalakefoundation_spark — a PySpark-native lakehouse ingestion + analytics engine.

A from-scratch rebuild of the capabilities of the reference library
``Rucal-Data-Solutions/datalakefoundation`` (a Scala bronze->silver ingestion layer,
see /root/reference), re-expressed Spark-first:

* metadata-driven entities (JSON config -> dataclass models)
* a deterministic 12-step column transformation pipeline (pure DataFrame fns)
* three load strategies: Full (dynamic-partition overwrite), Merge (upsert +
  soft-delete inference), Historic (SCD Type 2) — implemented as pure
  DataFrame state transitions over a versioned-Parquet lakehouse table
  (no Delta jars available in this environment; the merge semantics are
  identical and the storage layer is swappable).
* watermark-based incremental bookmarks (system table + window builder)
* large-scale training-data operators: dedup (exact/MinHash-LSH/SimHash/
  n-gram-Jaccard/embedding-cosine), similarity search, text analysis,
  multimodal column plumbing.

Everything is declarative DataFrame API so Catalyst supplies pushdown,
pruning, join selection, AQE and codegen for free.
"""

__version__ = "0.1.0"

from datalakefoundation_spark.session import get_spark  # noqa: F401
