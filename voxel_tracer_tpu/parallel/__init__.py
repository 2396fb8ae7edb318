"""Scale-out: device meshes, sharded render/train steps and distributed
bootstrap (the reference has no distributed code — SURVEY.md §2.4 maps its
OpenMP pixel loop to ray-sharded `shard_map` over a `jax.sharding.Mesh`)."""
