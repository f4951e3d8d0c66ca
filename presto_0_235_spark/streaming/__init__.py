"""Structured Streaming surface (beyond-reference extension)."""
