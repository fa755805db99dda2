"""air_quality_etl_pipeline_spark — a PySpark-native analytics engine.

Brand-new implementation of the query/data-processing surface of the
reference repo ``ajramos31/Air-Quality-ETL-pipeline`` (a Microsoft Fabric
medallion ETL: Bronze → Silver → Gold → Warehouse → semantic/DAX layer),
re-expressed idiomatically on open-source PySpark:

- ``session``    — SparkSession factory tuned for scale (AQE, dynamic
                   partition overwrite, Arrow).
- ``schemas``    — canonical declared schemas (31-col AQS bronze row,
                   gold star-schema tables).
- ``sources``    — REST/CSV/parquet readers and partitioned writers.
- ``operators``  — reusable relational building blocks (cleaning,
                   dedup, bucketing, dates) plus the LLM-data-pipeline
                   extensions (near-dup dedup, similarity search, text
                   analysis, multimodal plumbing).
- ``plans``      — the medallion pipelines (silver, gold, merge) and the
                   DAX-equivalent metrics layer.
- ``streaming``  — Structured Streaming twin of the incremental path.

Everything is declarative DataFrame API so Catalyst handles pushdown,
pruning, join selection and AQE does runtime re-planning; Python UDFs are
confined to the multimodal decode stubs where no built-in exists.
"""

__version__ = "0.1.0"
