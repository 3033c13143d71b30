"""Sources: materializers that turn plain parquet logs into azof-format
tables, plus readers for the driver test data."""
