"""Structured Streaming: watch-mode continuous view maintenance."""
