"""Structured-Streaming extensions: incremental index maintenance."""
