"""Pure compiled sampler kernels: ``(state) -> (state, output)`` step
functions over pytrees, designed for ``lax.scan`` over steps, ``vmap`` over
chains/walkers/temperature rungs, and ``shard_map`` over device meshes."""
