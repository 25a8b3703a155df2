"""Spark operators: routing, HTML extraction, PDF split/rasterize, OCR,
layout reconstruction, skew-aware repartitioning, status aggregation, and
chunk assembly (SURVEY.md §2 inventory)."""
