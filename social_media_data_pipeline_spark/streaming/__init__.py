"""Structured Streaming surface (SURVEY.md §2.11): the reference's
batch-shaped incremental behaviors re-expressed as streaming queries."""
