"""Streaming: incremental page ingestion via Structured Streaming."""
