"""Structured Streaming surface.

The reference has no streaming path at all (SURVEY.md §2.5) — this module
exists for the engine's training-data-pipeline role: incremental ingest of
an events/pages stream with event-time windows + watermark, runnable in
batch-catchup mode via the availableNow trigger.
"""
