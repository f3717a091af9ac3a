"""Multi-chip parallelism: tile sharding of the device pipeline over
`jax.sharding.Mesh` (see parallel/tiles.py; SURVEY §2.5 tile-parallel axis)."""
