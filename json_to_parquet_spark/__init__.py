"""json_to_parquet_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``nsmithuk/json-to-parquet`` (an AWS-Lambda NDJSON→Parquet
converter; see SURVEY.md), extended with the relational query core and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) required for 100 TB-scale training-data processing.

Layout:
    session     — SparkSession factory with tuned writer/exec confs
    sources     — readers: NDJSON(.gz), parquet catalog over the test tables
    functions   — column-expression builders (the ``_dt`` schema rewriter,
                  text/vector/hashing helpers); pure ``schema -> Column`` code
    operators   — whole-DataFrame operators (convert pipeline, dedup,
                  similarity, text stats, multimodal)
    plans       — plan inspection / explain helpers
    streaming   — Structured Streaming wrapper reproducing the reference's
                  one-object-per-event semantics
"""

__version__ = "0.1.0"
