"""Ingestion sources: event-family registry, subject routing, decode,
and the append writer (Layer A of SURVEY.md §2)."""
