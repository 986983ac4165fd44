"""Crawl-loop subsystem: frontier rounds, URL-seen dedup, politeness
scheduling, checkpoint/resume — the north-rule core of the engine."""
