"""Multi-chip parallelism: device meshes, sharded PM steps, halo exchange."""
