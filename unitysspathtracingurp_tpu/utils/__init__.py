"""Utility layer: image math, metrics, profiling, checkpointing."""
