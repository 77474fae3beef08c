"""simple_vector_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference vector database
(TalpsG/simple-vector), re-expressed Spark-first.

The reference is a single-node C++ vector store (FAISS flat + HNSW +
roaring-bitmap metadata filters + RocksDB doc store + WAL); see
SURVEY.md for the full operator inventory.  This package maps that
surface — and the LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal plumbing) — onto the Spark
DataFrame/SQL/Structured-Streaming stack:

- ``functions/``  : vector & text expression builders (pure
  ``pyspark.sql.functions`` compositions — JVM-side, codegen-friendly).
- ``operators/``  : the query operators (k-NN, filtered k-NN, ANN,
  mutation/upsert, dedup, relational, events).
- ``sources/``    : table loaders for the driver's Parquet fixtures.
- ``streaming/``  : Structured Streaming jobs (tumbling windows,
  watermark dedup) with batch-equivalent semantics.
- ``plans/``      : plan-inspection helpers used to keep every operator
  shuffle-conscious at the 100-TB design point.

Every operator is a function ``(DataFrame...) -> DataFrame``; nothing
collects to the driver.  Declared queries live in ``__spark_entry__.py``
with DuckDB oracle SQL for the driver's correctness gate.
"""

__version__ = "0.1.0"
