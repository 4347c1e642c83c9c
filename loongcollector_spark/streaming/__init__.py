"""Structured Streaming surface: the same operator chain over readStream."""
