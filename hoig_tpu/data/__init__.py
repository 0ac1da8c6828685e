"""Data pipelines (reference data/ package)."""
