"""Generic runtime utilities (L1 of SURVEY.md §2.1)."""
