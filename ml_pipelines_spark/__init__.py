"""ml_pipelines_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference library ``permaling/ml-pipelines`` (an Arrow/pandas data-pipeline
library for ML training data), extended with the operators a large-scale
(100 TB) training-data pipeline needs: deduplication, similarity search,
multimodal binary columns, and text analysis.

Design principles (see SURVEY.md):
- Declarative DataFrame/SQL plans; let Catalyst do pushdown/pruning/join
  planning. No hand-scheduling.
- Entity-keyed sampling/splitting (leakage-safe), seeded and deterministic.
- Pandas UDFs only for the irreducible Python core (geometry kernel,
  image decode); everything else is built-in `pyspark.sql.functions`.
- Partition by low-cardinality keys; broadcast dimension joins; AQE on.
"""

__version__ = "0.1.0"
