"""Device meshes and sharding rules.

The reference's only parallelism is DDP over NCCL
(configs/cvvae_sd3_constraint_training.yaml:188-191, main.py:741-756,
lvdm/dist_utils.py:56-87).  The TPU-native equivalent needs no user-level
communication code: we lay a `jax.sharding.Mesh` over the chips, shard
the batch on a `data` axis, keep parameters replicated, and XLA inserts
the gradient all-reduce over ICI/DCN.

Beyond DDP parity, `spatial_sharding` shards the *height* axis of video
tensors for inference — XLA's SPMD partitioner handles conv halo
exchanges automatically, giving a context/spatial-parallel decode the
reference does not have (its substitute is single-device tiling,
SURVEY §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def multihost_init() -> None:
    """Initialise multi-host JAX (torchrun/SLURM analogue,
    lvdm/dist_utils.py:56-87).  No-op in single-process runs."""
    import os
    if "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",),
              axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == n, (axis_sizes, n)
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(axis))


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the H axis of (B, T, H, W, C) video across devices.

    Convolutions over the sharded axis get halo exchanges from the SPMD
    partitioner (ppermute over ICI) — effectively distributed spatial
    tiling with exact seams.
    """
    return NamedSharding(mesh, P(None, None, axis))


def temporal_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the T axis of (B, T, H, W, C) video across devices —
    context-parallel long-video encode/decode (the sequence axis of this
    model family).  Causal convs need only one-sided halos; the SPMD
    partitioner inserts the ppermutes.  The reference's substitute is
    single-device temporal chunking (SURVEY §2.3)."""
    return NamedSharding(mesh, P(None, axis))


def shard_parallel_step(step_fn, mesh: Mesh, *, batch_axis: str = "data",
                        donate_state: bool = True):
    """jit a (state, batch, rng) -> (state, metrics) step over the mesh.

    State/rng replicated, batch sharded on axis 0; gradient averaging is
    inserted by the partitioner (the DDP all-reduce equivalent).
    """
    repl = replicated(mesh)
    bsh = batch_sharding(mesh, batch_axis)
    return jax.jit(
        step_fn,
        in_shardings=(repl, bsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def put_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def put_replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda a: jax.device_put(a, replicated(mesh)), tree)
