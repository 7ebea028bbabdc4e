"""Structured Streaming CDC engine (SURVEY.md §2.8, §3 entry point B)."""
