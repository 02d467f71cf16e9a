"""Scalar function surface: envelope decode (vectorized Arrow + native),
content hashing, text analysis (SURVEY.md §2.3 P7, §2.8)."""
