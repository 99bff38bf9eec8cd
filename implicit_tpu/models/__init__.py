"""Model implementations for implicit_tpu."""
