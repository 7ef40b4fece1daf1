"""Sources/sinks: transcript Parquet readers and partitioned writers."""
