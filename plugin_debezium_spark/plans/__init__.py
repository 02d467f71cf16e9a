"""Physical plans: lake-table format, MERGE, schema evolution,
checkpointing (SURVEY.md §2.6-2.7)."""
