"""External sources — CVAT REST ingestion (S6-S9)."""
