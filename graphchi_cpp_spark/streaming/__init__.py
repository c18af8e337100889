"""Streaming graph ingestion (reference dynamic-graph engine, SURVEY §2.7)."""
