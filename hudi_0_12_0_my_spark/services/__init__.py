"""Table services: compaction, clustering, cleaning, rollback, savepoint,
archival (SURVEY.md §2.7)."""
