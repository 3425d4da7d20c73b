"""Sinks: bounded driver-side exports (plot data, inspection tables)."""
