"""Sources & sinks: CSV bulk loader (LOAD statement), parquet-backed
contexts with time-bucket partitioning."""
