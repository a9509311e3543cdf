"""Streaming leg."""
