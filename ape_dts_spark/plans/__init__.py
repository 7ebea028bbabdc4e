"""Schema/DDL planning: structure migration and struct check (SURVEY.md §2.2/§2.7)."""
