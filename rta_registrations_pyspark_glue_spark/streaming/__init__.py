"""Structured Streaming operators (beyond reference surface — the
reference is batch-only, SURVEY.md §2.11; the events table exercises
this extension)."""
