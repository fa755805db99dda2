"""Sources and sinks: REST-shaped ingest, CSV/parquet/table readers,
partitioned + managed-table writers (SURVEY §2.1 S1-S7 / K1-K6)."""
