"""Utilities: logging, timers, profiling hooks."""
