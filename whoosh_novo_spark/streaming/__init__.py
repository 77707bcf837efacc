"""Structured Streaming incremental ingest (BufferedWriter analogue)."""
