"""Structured Streaming ingestion pipeline (Layer A)."""
