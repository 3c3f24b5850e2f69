"""Checkpointing: orbax-backed save/restore with the reference cadences.

The reference keeps (a) a rolling checkpoint every 2000 steps with
save_last + top-k (main.py:718-737) and (b) permanent weights-only
checkpoints every 10000 steps (main.py:794-811).  Resume re-globs the
latest (main.py:204-228,564-587); warm-start loads are non-strict
(lvdm/models/autoencoder.py:68-86).

Orbax writes asynchronously, so checkpointing overlaps device compute.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, *, rolling_every: int = 2000,
                 keep: int = 3, permanent_every: int = 10000,
                 monitor: Optional[str] = "train/loss/rec",
                 best_k: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.rolling_every = rolling_every
        self.permanent_every = permanent_every
        self.monitor = monitor
        # rolling-by-recency doubles as the reference's save_last
        self._rolling = ocp.CheckpointManager(
            os.path.join(directory, "rolling"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=rolling_every,
                enable_async_checkpointing=True))
        # top-k on the monitored metric (reference ModelCheckpoint:
        # save_top_k=3, monitor="train/loss/rec", main.py:718-737 +
        # configs/cvvae_sd3_constraint_training.yaml:193-196)
        self._best = None
        if monitor and best_k:
            self._best = ocp.CheckpointManager(
                os.path.join(directory, "best"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=best_k, save_interval_steps=rolling_every,
                    best_fn=lambda m: m[self.monitor], best_mode="min",
                    enable_async_checkpointing=True))
        self._permanent = ocp.CheckpointManager(
            os.path.join(directory, "permanent"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=None, save_interval_steps=permanent_every,
                enable_async_checkpointing=True))

    def maybe_save(self, step: int, state: Any,
                   metrics: Optional[dict] = None) -> None:
        self._rolling.save(step, args=ocp.args.StandardSave(state))
        if (self._best is not None and metrics is not None
                and self.monitor in metrics):
            self._best.save(
                step, args=ocp.args.StandardSave(state),
                metrics={self.monitor: float(metrics[self.monitor])})
        if self.permanent_every and step and step % self.permanent_every == 0:
            # permanent checkpoints are weights-only (main.py:794-811)
            self._permanent.save(
                step, args=ocp.args.StandardSave({"params": state.params}),
                force=True)

    def best_step(self) -> Optional[int]:
        return self._best.best_step() if self._best is not None else None

    def save_now(self, step: int, state: Any) -> None:
        """melk(): forced checkpoint on signal/exception (main.py:881-919)."""
        self._rolling.save(step, args=ocp.args.StandardSave(state), force=True)
        self._rolling.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._rolling.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore the latest (or given) rolling checkpoint.

        ``state_like`` may be a concrete state or an abstract one (see
        :func:`abstract_state`) — abstract restore places each leaf
        directly onto its recorded sharding instead of round-tripping a
        replicated copy through host memory."""
        step = step if step is not None else self._rolling.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        return self._rolling.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def close(self):
        self._rolling.wait_until_finished()
        if self._best is not None:
            self._best.wait_until_finished()
        self._permanent.wait_until_finished()


def abstract_state(state: Any) -> Any:
    """Concrete (possibly sharded) state -> ShapeDtypeStruct tree with
    shardings preserved, for direct-to-device orbax restore."""
    import jax

    def leaf(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=getattr(x, "sharding", None))
        return x

    return jax.tree.map(leaf, state)
