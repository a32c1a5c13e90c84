"""map_batches stages (stateless kernels and actor-pool classes)."""
