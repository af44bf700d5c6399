"""team_aragon_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo (talzab/team_aragon — a healthcare
ETL + reporting pipeline, see SURVEY.md) as an idiomatic Spark engine:

- declarative DataFrame/SQL plans (Catalyst optimizes; no hand scheduling)
- batch ETL with validation / quarantine / first-wins dedup semantics
- the reference's seven report-query shapes as parameterized plans
- LLM-data-pipeline extensions: exact + near dedup (MinHash-LSH,
  SimHash, n-gram Jaccard), embedding similarity search, text
  analysis, multimodal column plumbing, streaming aggregates.

Designed for a 1000-executor / 100 TB deployment; tested on local[*].
"""

from team_aragon_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
