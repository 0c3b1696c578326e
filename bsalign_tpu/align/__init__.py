"""High-level batched alignment drivers."""
