"""Typed source readers and sinks (SURVEY.md §2.1)."""
