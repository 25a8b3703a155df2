"""Structured Streaming front-end for the extraction pipeline.

The reference has no true streaming (SURVEY.md §2.9) — its incremental
behaviors (per-page emission, continuation jobs, status polling) are batch
semantics we restate as checkpointed batch (plans/run.py). This module adds
the genuinely-streaming capability a crawl pipeline wants anyway: a
file-source ``readStream`` over arriving corpus parquet, the same extraction
transformations (they are stateless per row/group), and an idempotent
``writeStream`` with checkpointing — plus a watermarked per-window throughput
aggregation as the streaming metrics analog.
"""
