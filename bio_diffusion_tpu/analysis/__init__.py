"""Offline analysis: aggregation, bust comparisons, plots."""
