"""Device compute kernels (XLA + Pallas) for implicit_tpu."""
