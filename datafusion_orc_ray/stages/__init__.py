"""map_batches-ready stages (stateless fns + actor-pool classes)."""
