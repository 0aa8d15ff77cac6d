"""Diversity-native query registrations (SURVEY.md §2.2-I) — filled in M3."""
