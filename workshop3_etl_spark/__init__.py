"""workshop3_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the full capability surface of the reference pipeline
(``ShadowBlack33/workshop3-etl``: pandas ETL -> sklearn model -> Kafka
stream -> Postgres upsert -> SQL KPIs, see SURVEY.md) as an idiomatic
Spark library: DataFrame/SQL declarative plans optimized by Catalyst,
Structured Streaming for the stream leg, MLlib for the model leg, and a
set of large-scale data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB workloads.

Nothing in here is a translation of the reference's imperative code;
the reference defines *what* is computed (operator semantics, pipeline
topology, KPI formulas), this package defines *how* on Spark.
"""

__version__ = "0.1.0"
