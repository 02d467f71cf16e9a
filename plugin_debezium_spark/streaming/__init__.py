"""Micro-batch replay engine + stop conditions (SURVEY.md §3.1, §2.7)."""
