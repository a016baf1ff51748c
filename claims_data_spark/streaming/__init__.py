"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2.11); its
monthly replace-duplicates refresh is batch. This package is the
optional streaming extension: file-source ingest with the same
natural-key dedup contract, plus watermarked event-time aggregation
for the `events` table.
"""
