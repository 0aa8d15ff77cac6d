"""LLM-pipeline query registrations (SURVEY.md §2.2-L) — filled in M4."""
