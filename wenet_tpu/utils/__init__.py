"""Utilities: probe/tracing, profiling helpers."""
