"""Storage: segment store (parquet + manifest generations), corpus synthesis."""
