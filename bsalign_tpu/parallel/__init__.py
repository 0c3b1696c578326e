"""Multi-chip / multi-host scaling (data-parallel over pairs)."""
