"""Utilities: logging, metric sinks, profiling."""
