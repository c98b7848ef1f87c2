"""Batched geometry / perception kernels (pure JAX + Pallas)."""
