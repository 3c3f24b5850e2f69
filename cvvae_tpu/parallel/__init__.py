from cvvae_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, replicated, batch_sharding, spatial_sharding,
    shard_parallel_step, multihost_init)
