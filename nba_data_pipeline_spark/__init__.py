"""nba_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
pipeline ``rd11490/nba_data_pipeline`` (batch NBA analytics: ingest ->
shape -> incremental merge -> derived analytics) as an idiomatic Spark
DataFrame library, extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7): a library of composable, pure
``DataFrame -> DataFrame`` transforms plus a thin lakehouse writer.
Declared StructType schemas replace pandas inference; native
ArrayType(StructType) replaces JSON-string nesting; partition layout
replaces b-tree indexes; Catalyst replaces hand-rolled pushdown.
"""

__version__ = "0.1.0"
