"""Source/sink surface (SURVEY.md §2.1)."""
