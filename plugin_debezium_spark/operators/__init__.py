"""Dataflow operators (SURVEY.md §2.2-2.5) plus the training-data
pipeline suite (dedup, similarity, multimodal, text analysis)."""
