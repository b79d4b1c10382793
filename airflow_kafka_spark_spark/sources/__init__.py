"""Sources & sinks: parquet fixtures, Kafka wrappers, synthetic generators."""
