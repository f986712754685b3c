"""Composite operators: splitting, deduplication, similarity, interpolation."""
