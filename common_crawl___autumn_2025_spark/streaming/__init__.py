"""Streaming semantics: micro-batch crawl rounds (crawl/frontier.py is
the engine's foreachBatch-style loop) plus Structured Streaming
equivalents of the windowed aggregations."""
