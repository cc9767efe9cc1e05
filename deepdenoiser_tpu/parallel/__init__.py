"""Parallelism layer: device meshes, data-parallel training, spatial
(halo-exchange) sharding for tiled inference.

The reference is single-process/single-device (SURVEY.md §2b); everything
here is new TPU-native design: XLA collectives over ICI via shard_map on a
jax.sharding.Mesh — psum/pmean for gradient allreduce (BASELINE config #4),
ppermute for spatial halo exchange, all_gather for eval.
"""
