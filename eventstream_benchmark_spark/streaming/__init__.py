"""Structured Streaming package."""
