"""Logical plans: the end-to-end extraction pipeline and run orchestration
(checkpointed resume, per-partition lineage + metrics)."""
