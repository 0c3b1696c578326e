"""Device compute kernels (jax/XLA/Pallas)."""
