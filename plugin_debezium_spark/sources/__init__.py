"""Sources: synthetic binlog/WAL generator, log reader, snapshot reader,
connector config surface (SURVEY.md §2.1 S1-S4)."""
