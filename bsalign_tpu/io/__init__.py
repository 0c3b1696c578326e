"""I/O layer: pgzf parallel gzip, file readers/writers (L2 of SURVEY.md)."""
