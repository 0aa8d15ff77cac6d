"""Structured Streaming query registrations (SURVEY.md §2.2-J) — filled in M5."""
